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
        """Star edges per (t_hash, b_hash) group — fully vectorized: sort
        with Arrow's C kernels, segment with numpy, gather with take."""
        empty = pa.table({"left_id": pa.array([], pa.string()),
                          "right_id": pa.array([], pa.string()),
                          "kind": pa.array([], pa.string()),
                          "dropped": pa.array([], pa.int64())})
        if group.num_rows == 0:
            return empty
        tbl = group.sort_by([("t_hash", "ascending"), ("b_hash", "ascending"),
                             ("clip_id", "ascending")])
        th = tbl["t_hash"].to_numpy()
        bh = tbl["b_hash"].to_numpy()
        same = (th[1:] == th[:-1]) & (bh[1:] == bh[:-1])
        change = np.flatnonzero(~same) + 1
        starts = np.concatenate(([0], change))
        sizes = np.diff(np.concatenate((starts, [len(th)])))
        n_edges = sizes - 1
        tot = int(n_edges.sum())
        if tot == 0:
            return empty
        seg = np.repeat(np.arange(len(sizes)), n_edges)
        left_idx = starts[seg]                      # group min (star center)
        offs = np.arange(tot, dtype=np.int64)
        cum = np.zeros(len(sizes) + 1, dtype=np.int64)
        np.cumsum(n_edges, out=cum[1:])
        right_idx = left_idx + 1 + (offs - cum[seg])
        ids_arr = tbl["clip_id"]
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        return pa.table({
            "left_id": ids_arr.take(pa.array(left_idx)),
            "right_id": ids_arr.take(pa.array(right_idx)),
            "kind": pa.array(["exact"] * tot, pa.string()),
            "dropped": pa.array(np.zeros(tot, dtype=np.int64)),
        })

    return narrow.map_batches(add_part, batch_format="pyarrow") \
                 .groupby("part").map_groups(expand, batch_format="pyarrow")
