"""Exact-duplicate detection — the engine's ``dedupe_naive``
(``/root/reference/R/deduplicaters.R:208-223``: group by a standardized field,
assign the group an id).

Here the group key is the 128-bit content identity ``(t_hash, b_hash)``
(64-bit alone would collide ~1e7 times at 10^12 rows — birthday bound), and
instead of ``cur_group_id()`` we emit *star edges* (every member linked to
the group's min clip_id) feeding the union-find reduce — O(group size), no
cap needed, no verification needed (equal 128-bit content hash == equal
content for all practical purposes; transcript equality is additionally
asserted by the per-row invariant tests).

Partitioning: coarse ``part = exact_key % P`` groupby, with full star
expansion segment-wise inside each partition (see stages/pairs.py for the
pattern rationale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from who_owns_mass_processing_ray.config import DedupConfig


def exact_edges(features_ds, cfg: DedupConfig, num_parts: int):
    """features -> edge Dataset (left_id, right_id, kind='exact').

    left_id is always the group min (deterministic representative; the
    reference's implicit "first row of the group" made arrival order matter
    — SURVEY.md §4 Determinism).
    """
    narrow = features_ds.select_columns(["exact_key", "t_hash", "b_hash", "clip_id"])

    def add_part(t: pa.Table) -> pa.Table:
        part = (t["exact_key"].to_numpy() % np.uint64(num_parts)).astype(np.int32)
        return t.append_column("part", pa.array(part))

    def expand(group: pa.Table) -> pa.Table:
        th = group["t_hash"].to_numpy()
        bh = group["b_hash"].to_numpy()
        ids = np.asarray(group["clip_id"].to_pylist(), dtype=object)
        order = np.lexsort((ids, bh, th))
        th, bh, ids = th[order], bh[order], ids[order]
        same = (th[1:] == th[:-1]) & (bh[1:] == bh[:-1])
        change = np.flatnonzero(~same) + 1
        starts = np.concatenate(([0], change)) if len(ids) else np.empty(0, np.int64)
        ends = np.concatenate((change, [len(ids)])) if len(ids) else np.empty(0, np.int64)
        lefts, rights = [], []
        for s, e in zip(starts, ends):
            if e - s > 1:
                lefts.append(np.full(e - s - 1, ids[s], dtype=object))
                rights.append(ids[s + 1 : e])
        if not lefts:
            return pa.table({"left_id": pa.array([], pa.string()),
                             "right_id": pa.array([], pa.string()),
                             "kind": pa.array([], pa.string())})
        left = np.concatenate(lefts)
        right = np.concatenate(rights)
        return pa.table({
            "left_id": pa.array(left.tolist(), pa.string()),
            "right_id": pa.array(right.tolist(), pa.string()),
            "kind": pa.array(["exact"] * len(left), pa.string()),
        })

    return narrow.map_batches(add_part, batch_format="pyarrow") \
                 .groupby("part").map_groups(expand, batch_format="pyarrow")
