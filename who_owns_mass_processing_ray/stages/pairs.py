"""Partitioned bucket-local candidate-pair generation.

The scalable pattern used by every blocking stage (exact-hash groups, LSH
bands, SimHash bands, containment anchors):

1. a ``map_batches`` stage emits narrow ``(bucket_key:uint64, clip_id, ...)``
   rows and a coarse ``part = bucket_key % P`` column,
2. ``groupby("part").map_groups`` shuffles each coarse partition to one task
   (P ~ 4x cluster CPUs, so partitions are balanced and worker-sized),
3. inside the task, rows are sorted by ``(bucket_key, clip_id)`` and pairs
   are expanded segment-wise with numpy — all buckets of the partition in
   one vectorized pass, no per-bucket Python dispatch.

Hot buckets (degenerate shingles, silence fingerprints — the skew the
reference never had to handle because it was single-process, SURVEY.md §4)
are capped at ``max_bucket`` members: the lexicographically smallest
``max_bucket`` clip_ids are kept, the rest are dropped and the drop is
COUNTED into the emitted ``dropped`` metric — never silent.  Determinism:
membership and pair order depend only on (bucket_key, clip_id), not on
arrival order or parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_TRIU_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _triu(n: int) -> tuple[np.ndarray, np.ndarray]:
    if n not in _TRIU_CACHE:
        _TRIU_CACHE[n] = np.triu_indices(n, k=1)
    return _TRIU_CACHE[n]


def bucket_pairs(
    keys: np.ndarray,
    ids: np.ndarray,
    max_bucket: int,
    payloads: dict[str, np.ndarray] | None = None,
) -> tuple[np.ndarray, np.ndarray, int, dict[str, np.ndarray]]:
    """All within-bucket unordered pairs (left_id < right_id), capped.

    ``payloads`` maps column name -> per-row values carried onto pairs as
    ``left_<name>`` / ``right_<name>`` (e.g. fingerprints for hamming
    verification).  Returns ``(left, right, dropped_rows, pair_payloads)``.
    """
    payloads = payloads or {}
    order = np.lexsort((ids, keys))
    keys = keys[order]
    ids = ids[order]
    payloads = {k: v[order] for k, v in payloads.items()}
    change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    starts = np.concatenate(([0], change)) if len(keys) else np.empty(0, np.int64)
    ends = np.concatenate((change, [len(keys)])) if len(keys) else np.empty(0, np.int64)
    sizes = ends - starts
    dropped = int(np.maximum(sizes - max_bucket, 0).sum()) if len(keys) else 0
    lefts, rights = [], []
    pair_pl: dict[str, list[np.ndarray]] = {k: [] for k in payloads}
    pair_pr: dict[str, list[np.ndarray]] = {k: [] for k in payloads}
    for s, e in zip(starts[sizes > 1], ends[sizes > 1]):
        n = min(int(e - s), max_bucket)
        ii, jj = _triu(n)
        seg_ids = ids[s : s + n]
        lefts.append(seg_ids[ii])
        rights.append(seg_ids[jj])
        for k, v in payloads.items():
            seg = v[s : s + n]
            pair_pl[k].append(seg[ii])
            pair_pr[k].append(seg[jj])
    if not lefts:
        out = {f"left_{k}": np.empty(0, v.dtype) for k, v in payloads.items()}
        out |= {f"right_{k}": np.empty(0, v.dtype) for k, v in payloads.items()}
        return np.empty(0, dtype=object), np.empty(0, dtype=object), dropped, out
    out = {f"left_{k}": np.concatenate(pair_pl[k]) for k in payloads}
    out |= {f"right_{k}": np.concatenate(pair_pr[k]) for k in payloads}
    return np.concatenate(lefts), np.concatenate(rights), dropped, out


def pairs_from_bucket_rows(
    ds,
    key_col: str,
    id_col: str,
    max_bucket: int,
    num_parts: int,
    payload_cols: list[str] | None = None,
):
    """(bucket_key, clip_id[, payloads]) Dataset -> distinct candidate-pair
    Dataset ``(left_id, right_id, left_*, right_*, dropped)``."""
    payload_cols = payload_cols or []

    def add_part(t: pa.Table) -> pa.Table:
        part = (t[key_col].to_numpy() % np.uint64(num_parts)).astype(np.int32)
        return t.append_column("part", pa.array(part))

    def expand(group: pa.Table) -> pa.Table:
        keys = group[key_col].to_numpy()
        ids = np.asarray(group[id_col].to_pylist(), dtype=object)
        payloads = {c: group[c].to_numpy() for c in payload_cols}
        left, right, dropped, pays = bucket_pairs(keys, ids, max_bucket, payloads)
        if len(left):
            # in-partition pair dedup BEFORE the global shuffle: a doc pair
            # sharing m bucket keys in this partition emits m copies; collapse
            # them here so the global distinct aggregate shuffles far less.
            # (payloads are identical across copies of a pair, keep first)
            pair_key = np.char.add(np.char.add(left.astype(str), "\x1f"),
                                   right.astype(str))
            _, first_idx = np.unique(pair_key, return_index=True)
            left, right = left[first_idx], right[first_idx]
            pays = {k: v[first_idx] for k, v in pays.items()}
        cols: dict[str, pa.Array] = {
            "left_id": pa.array(left.tolist(), pa.string()),
            "right_id": pa.array(right.tolist(), pa.string()),
        }
        for k, v in pays.items():
            cols[k] = pa.array(v)
        cols["dropped"] = pa.array(np.full(len(left), dropped, dtype=np.int64))
        return pa.table(cols)

    bucketed = ds.map_batches(add_part, batch_format="pyarrow")
    pairs = bucketed.groupby("part").map_groups(expand, batch_format="pyarrow")
    extra = [f"left_{c}" for c in payload_cols] + [f"right_{c}" for c in payload_cols]
    return dedup_pairs(pairs, extra_cols=extra)


def dedup_pairs(pairs_ds, extra_cols: list[str] | None = None):
    """Distinct (left_id, right_id) pairs — a pair found in several buckets
    must be verified only once.  Max-aggregates carried payloads (identical
    across duplicates of a pair) and the ``dropped`` metric."""
    from ray.data.aggregate import Max

    extra_cols = extra_cols or []
    aggs = [Max("dropped", alias_name="dropped")]
    aggs += [Max(c, alias_name=c) for c in extra_cols]
    return pairs_ds.groupby(["left_id", "right_id"]).aggregate(*aggs)


def attach_feature(pairs_ds, features_ds, pair_key: str, feat_col: str,
                   out_col: str, num_partitions: int):
    """Hash-join one feature column onto pair rows.

    Used by verify stages to fetch both sides' normalized transcripts; the
    features side is projected to (clip_id, feat_col) first so only narrow
    rows move.  Broadcast vs shuffle strategy is adaptive — see
    stages/joins.py.
    """
    from who_owns_mass_processing_ray.stages import joins

    return joins.attach_columns(
        pairs_ds, features_ds, pair_key, "clip_id", {feat_col: out_col},
        num_partitions, how="inner",
    )
