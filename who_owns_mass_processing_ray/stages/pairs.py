"""Partitioned bucket-local candidate-pair generation.

The scalable pattern used by every blocking stage (exact-hash groups, LSH
bands, SimHash bands, containment anchors):

1. a ``map_batches`` stage emits narrow ``(bucket_key:uint64, id, ...)``
   rows and a coarse ``part = bucket_key % P`` column,
2. ``groupby("part").map_groups`` shuffles each coarse partition to one task
   (P ~ 4x cluster CPUs, so partitions are balanced and worker-sized),
3. inside the task the partition is sorted by ``(bucket_key, id)`` with
   Arrow's C kernels and ALL buckets expand to pairs in one vectorized pass:
   per-segment pair ranks decode to (i, j) index pairs via triangular-number
   arithmetic — no per-bucket Python dispatch, no Python-object id arrays.

Candidate pairs are deduped IN-PARTITION only (vectorized, exact — via
dictionary codes); duplicates that survive across partitions are deduped
AFTER verification with ``distinct_edges`` — the verified edge set is orders
of magnitude smaller than the candidate set, so the global distinct shuffle
moves almost nothing (vs. shuffling every candidate pre-verify, which
profiling showed dominated stage wall time).

Hot buckets (degenerate shingles, silence fingerprints — the skew the
reference never had to handle because it was single-process, SURVEY.md §4)
are SALTED, not truncated: members split into hash-salted sub-buckets
(size min(max_bucket, 64)) with full pairs inside each — TWO independent
saltings so cross-group connectivity never hinges on one edge — plus a star
from the bucket minimum: O(n·group) pairs, with union-find transitivity
through the overlapping salt partitions recovering cross-salt merges after
verification.  The affected
member count is emitted in the ``dropped`` column (the skew metric — never
silent).  Determinism: membership, orientation (left < right by value) and
pair order depend only on (bucket_key, id), not on arrival order or
parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _decode_triangular(r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """pair rank r -> (i, j), i < j, pairs ordered by j then i:
    j = floor((1+sqrt(8r+1))/2), i = r - j(j-1)/2  (exact for j <= ~2^25)."""
    j = ((1.0 + np.sqrt(8.0 * r + 1.0)) // 2.0).astype(np.int64)
    j = np.where(r < j * (j - 1) // 2, j - 1, j)
    j = np.where(r >= (j + 1) * j // 2, j + 1, j)
    i = r - j * (j - 1) // 2
    return i, j


def _auto_parts_cached() -> int:
    """auto_parts(), memoized per process: partition closures run per batch
    and must not hit ray.cluster_resources() each time."""
    global _AUTO_PARTS
    if _AUTO_PARTS is None:
        from who_owns_mass_processing_ray.stages import auto_parts

        _AUTO_PARTS = auto_parts()
    return _AUTO_PARTS


_AUTO_PARTS: int | None = None


def _triangular_pairs(sizes: np.ndarray, cap: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Vectorized within-segment pair expansion with SALTED hot buckets.

    ``sizes`` are segment lengths after sorting by (key, id).  Segments up
    to ``cap`` expand to all i<j pairs.  HOT segments (> cap) are not
    silently truncated: members split into hash-salted sub-buckets of size
    min(cap, 64), with full pairs inside each, under TWO independent
    saltings, plus a star from the segment minimum to every member —
    O(n·group) pairs instead of O(n²).  A pair of genuinely-duplicate
    members in different salt groups still merges after verification via
    union-find transitivity: round-1 groups bridge round-0 groups (hot
    buckets are overwhelmingly near-identical content), and the star adds a
    further hub.  ``salted`` counts the hot-segment members for the stage
    metrics (visible, never silent).

    Returns (seg_of_pair, left_local, right_local, salted_members): local
    indices relative to each segment start.
    """
    n_seg = len(sizes)
    small = sizes <= cap
    m = np.where(small, sizes, 0)
    P = m * (m - 1) // 2
    tot = int(P.sum())
    lefts: list[np.ndarray] = []
    rights: list[np.ndarray] = []
    if tot:
        cum = np.zeros(n_seg + 1, dtype=np.int64)
        np.cumsum(P, out=cum[1:])
        r = np.arange(tot, dtype=np.int64) - np.repeat(cum[:-1], P)
        i, j = _decode_triangular(r)
        seg = np.repeat(np.arange(n_seg), P)
        lefts.append(i)
        rights.append(j)
        segs = [seg]
    else:
        segs = []

    hot = np.flatnonzero(~small)
    salted = int(sizes[hot].sum())
    # Salt-group size: sub-buckets of the configured cap, bounded at 64 so a
    # huge cap never re-creates the quadratic blowup (pairs per hot member
    # ~ SALT_ROUNDS * g/2 + 1).  TWO independent saltings are run so
    # connectivity inside a hot bucket does NOT hinge on the star center
    # being a true duplicate: round-0 groups merge internally, and round-1
    # groups (an independent partition of the same members) bridge across
    # round-0 groups, so a true cross-group pair connects through verified
    # intermediate edges even when the star-center edge is refuted.
    g_size = max(2, min(cap, 64))
    SALT_ROUNDS = 2
    for h in hot:
        n = int(sizes[h])
        # star: min member to every other member
        star_lefts = [np.zeros(n - 1, np.int64)]
        star_rights = [np.arange(1, n, dtype=np.int64)]
        n_groups = -(-n // g_size)
        for rnd in range(SALT_ROUNDS):
            # salt groups: member k -> group hash(k, round) % n_groups
            # (deterministic in the member's position within the sorted
            # segment — independent permutations per round)
            mix = np.uint64([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F][rnd])
            grp = ((np.arange(n, dtype=np.uint64) + np.uint64(rnd * 0x10001))
                   * mix >> np.uint64(40)) % np.uint64(n_groups)
            order = np.argsort(grp, kind="stable")
            gs = grp[order]
            change = np.flatnonzero(gs[1:] != gs[:-1]) + 1
            g_starts = np.concatenate(([0], change))
            g_sizes = np.diff(np.concatenate((g_starts, [n])))
            gp = g_sizes * (g_sizes - 1) // 2
            g_tot = int(gp.sum())
            if not g_tot:
                continue
            gcum = np.zeros(len(gp) + 1, dtype=np.int64)
            np.cumsum(gp, out=gcum[1:])
            gr = np.arange(g_tot, dtype=np.int64) - np.repeat(gcum[:-1], gp)
            gi, gj = _decode_triangular(gr)
            gseg = np.repeat(np.arange(len(gp)), gp)
            base = g_starts[gseg]
            li = order[base + gi]
            rj = order[base + gj]
            # canonical orientation within the sorted segment
            star_lefts.append(np.minimum(li, rj))
            star_rights.append(np.maximum(li, rj))
        seg_l = np.concatenate(star_lefts)
        seg_r = np.concatenate(star_rights)
        lefts.append(seg_l)
        rights.append(seg_r)
        segs.append(np.full(len(seg_l), h, dtype=np.int64))

    if not lefts:
        e = np.empty(0, np.int64)
        return e, e, e, salted
    left = np.concatenate(lefts)
    right = np.concatenate(rights)
    seg_all = np.concatenate(segs)
    return seg_all, left, right, salted


def expand_partition_pairs(
    group: pa.Table,
    key_col: str,
    id_col: str,
    max_bucket: int,
    payload_cols: list[str] | None = None,
) -> pa.Table:
    """One coarse partition -> its deduped candidate pairs (vectorized)."""
    payload_cols = payload_cols or []
    if group.num_rows == 0:
        cols = {"left_id": pa.array([], group[id_col].type),
                "right_id": pa.array([], group[id_col].type)}
        for c in payload_cols:
            cols[f"left_{c}"] = pa.array([], group[c].type)
            cols[f"right_{c}"] = pa.array([], group[c].type)
        cols["dropped"] = pa.array([], pa.int64())
        return pa.table(cols)
    tbl = group.sort_by([(key_col, "ascending"), (id_col, "ascending")])
    keys = tbl[key_col].to_numpy()
    change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    starts = np.concatenate(([0], change))
    sizes = np.diff(np.concatenate((starts, [len(keys)])))
    seg_of_pair, li, lj, dropped = _triangular_pairs(sizes, max_bucket)
    base = starts[seg_of_pair]
    left_idx = base + li
    right_idx = base + lj
    # exact in-partition pair dedup via dictionary codes (a pair found in
    # several buckets of this partition verifies once)
    ids_arr = tbl[id_col]
    if isinstance(ids_arr, pa.ChunkedArray):
        ids_arr = ids_arr.combine_chunks()
    codes = pc.dictionary_encode(ids_arr).indices.to_numpy().astype(np.int64)
    lc, rc = codes[left_idx], codes[right_idx]
    order = np.lexsort((rc, lc))
    lc_s, rc_s = lc[order], rc[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (lc_s[1:] != lc_s[:-1]) | (rc_s[1:] != rc_s[:-1])
    keep = order[first]
    left_idx, right_idx = left_idx[keep], right_idx[keep]
    take_l = pa.array(left_idx)
    take_r = pa.array(right_idx)
    cols: dict[str, pa.Array] = {
        "left_id": ids_arr.take(take_l),
        "right_id": ids_arr.take(take_r),
    }
    for c in payload_cols:
        col = tbl[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols[f"left_{c}"] = col.take(take_l)
        cols[f"right_{c}"] = col.take(take_r)
    cols["dropped"] = pa.array(np.full(len(left_idx), dropped, dtype=np.int64))
    return pa.table(cols)


def pairs_from_bucket_rows(
    ds,
    key_col: str,
    id_col: str,
    max_bucket: int,
    num_parts: int | None = None,
    payload_cols: list[str] | None = None,
):
    """(bucket_key, id[, payloads]) Dataset -> candidate-pair Dataset
    ``(left_id, right_id, left_*, right_*, dropped)``, deduped per
    partition (dedup the *verified* edges globally with ``distinct_edges``)."""
    payload_cols = payload_cols or []

    def add_part(t: pa.Table) -> pa.Table:
        part = (t[key_col].to_numpy()
                % np.uint64(num_parts or _auto_parts_cached())).astype(np.int32)
        return t.append_column("part", pa.array(part))

    def expand(group: pa.Table) -> pa.Table:
        return expand_partition_pairs(
            group.drop_columns(["part"]), key_col, id_col, max_bucket,
            payload_cols)

    bucketed = ds.map_batches(add_part, batch_format="pyarrow")
    return bucketed.groupby("part").map_groups(expand, batch_format="pyarrow")


def _dedup_pair_table(t: pa.Table, num_cols: list[str]) -> pa.Table:
    """Vectorized (left_id, right_id) distinct with per-pair MAX of the
    numeric columns: dictionary codes -> lexsort -> segment boundaries ->
    ``np.maximum.reduceat`` — all C, no per-key dispatch."""
    if t.num_rows == 0:
        return t
    l, r = t["left_id"], t["right_id"]
    if isinstance(l, pa.ChunkedArray):
        l = l.combine_chunks()
    if isinstance(r, pa.ChunkedArray):
        r = r.combine_chunks()
    lc = pc.dictionary_encode(l).indices.to_numpy().astype(np.int64)
    rc = pc.dictionary_encode(r).indices.to_numpy().astype(np.int64)
    order = np.lexsort((rc, lc))
    ls, rs = lc[order], rc[order]
    starts = np.flatnonzero(np.r_[True, (ls[1:] != ls[:-1])
                                  | (rs[1:] != rs[:-1])])
    first = pa.array(order[starts])
    cols = {"left_id": l.take(first), "right_id": r.take(first)}
    for c in num_cols:
        v = t[c].to_numpy(zero_copy_only=False)[order]
        cols[c] = pa.array(np.maximum.reduceat(v, starts))
    return pa.table(cols)


def distinct_edges(edges_ds, kind: str, extra_num_cols: list[str] | None = None,
                   num_parts: int | None = None):
    """Globally dedup verified edges (left_id, right_id[, numeric extras])
    and stamp the ``kind`` column.  Runs on the post-verify set — small
    relative to candidates — but "small" can still be tens of millions of
    rows on dense corpora, and Ray's per-key ``groupby().aggregate(Max)``
    measured ~20 us/row there (473 CPU-s for the 160k audio stage, with a
    13 s max reduce task).  So: the repo's standard coarse-partition
    pattern instead — in-batch vectorized pre-dedup (a pair recurs across
    bands mostly WITHIN a partition's output block), hash-partition on the
    pair, one vectorized lexsort/segment-max per partition.  ``dropped``
    (the skew-cap metric) is max-aggregated and kept visible."""
    from who_owns_mass_processing_ray.functions import hashing as hx

    num_cols = ["dropped"] + list(extra_num_cols or [])

    def _id_hash(col) -> np.ndarray:
        # ids are strings in the audio pipeline, int64 in the doc queries
        if pa.types.is_integer(col.type):
            return hx.splitmix64(
                col.to_numpy(zero_copy_only=False).astype(np.uint64))
        return hx.hash_strings(col)

    def pre(t: pa.Table) -> pa.Table:
        t = _dedup_pair_table(t.select(["left_id", "right_id"] + num_cols),
                              num_cols)
        with np.errstate(over="ignore"):
            h = _id_hash(t["left_id"]) * np.uint64(3) \
                + _id_hash(t["right_id"])
        part = (h % np.uint64(num_parts or _auto_parts_cached())).astype(np.int32)
        return t.append_column("part", pa.array(part))

    def finish(g: pa.Table) -> pa.Table:
        g = _dedup_pair_table(g.drop_columns(["part"]), num_cols)
        cols = {"left_id": g["left_id"], "right_id": g["right_id"],
                "kind": pa.array([kind] * g.num_rows, pa.string()),
                "dropped": g["dropped"]}
        for c in num_cols[1:]:
            cols[c] = g[c]
        return pa.table(cols)

    return edges_ds.map_batches(pre, batch_format="pyarrow") \
        .groupby("part").map_groups(finish, batch_format="pyarrow")


def attach_pair_features(pairs_ds, features_ds, feat_col: str,
                         num_partitions: int | None = None,
                         side_key: str = "clip_id",
                         out_prefix: str = ""):
    """Attach ``feat_col`` for BOTH endpoints of each pair in one pass.

    Small side (the common case — features are narrow): broadcast the
    projected (side_key, feat_col) table once via ray.put and run two Acero
    hash joins inside a single ``map_batches`` — one probe task per pair
    block, no shuffle, no double execution.  Large side: two partitioned
    ``Dataset.join`` shuffles.  Output columns: ``left_<feat_col>`` /
    ``right_<feat_col>`` (or ``<out_prefix>`` variants).
    """
    import ray

    from who_owns_mass_processing_ray.stages import joins

    left_out = f"left_{out_prefix or feat_col}"
    right_out = f"right_{out_prefix or feat_col}"
    proj = features_ds.select_columns([side_key, feat_col]).materialize()
    if proj.count() <= joins.BROADCAST_ROW_LIMIT:
        tables = [t for t in ray.get(proj.to_arrow_refs()) if t.num_rows]
        if tables:
            side = pa.concat_tables(tables).combine_chunks()
        else:
            side = pa.table({side_key: pa.array([], pa.string()),
                             feat_col: pa.array([], pa.string())})
        side_ref = ray.put(side)

        def probe(batch: pa.Table) -> pa.Table:
            s = ray.get(side_ref)
            ls = s.rename_columns(["left_id", left_out])
            rs = s.rename_columns(["right_id", right_out])
            out = batch.join(ls, keys=["left_id"], join_type="inner")
            out = out.join(rs, keys=["right_id"], join_type="inner")
            return out

        return pairs_ds.map_batches(probe, batch_format="pyarrow")

    out = joins.attach_columns(pairs_ds, features_ds, "left_id", side_key,
                               {feat_col: left_out}, num_partitions,
                               how="inner")
    return joins.attach_columns(out, features_ds, "right_id", side_key,
                                {feat_col: right_out}, num_partitions,
                                how="inner")


def attach_feature(pairs_ds, features_ds, pair_key: str, feat_col: str,
                   out_col: str, num_partitions: int | None = None,
                   side_key: str = "clip_id"):
    """Hash-join one feature column onto pair rows (adaptive broadcast /
    shuffle — see stages/joins.py)."""
    from who_owns_mass_processing_ray.stages import joins

    return joins.attach_columns(
        pairs_ds, features_ds, pair_key, side_key, {feat_col: out_col},
        num_partitions, how="inner",
    )


def pair_intersect(keep_ds, bound_ds, num_partitions: int | None = None):
    """Rows of ``keep_ds`` whose (left_id, right_id) pair also appears in
    ``bound_ds`` — the compound (AND) bound of dedupe_cosine_bounded
    (/root/reference/R/deduplicaters.R:446-539).

    Both edge sets orient pairs identically (left < right, this module), so
    intersecting on a composite pair key is exact.  Built on
    joins.attach_columns (adaptive broadcast / shuffle) rather than
    Dataset.join: only the bounding side's narrow DISTINCT pair keys move.
    """
    from ray.data.aggregate import Count

    from who_owns_mass_processing_ray.stages import joins

    def keyed(t: pa.Table) -> pa.Table:
        l, r = t["left_id"], t["right_id"]
        if not pa.types.is_string(l.type if not isinstance(l, pa.ChunkedArray)
                                  else l.type):
            l = pc.cast(l, pa.string())
            r = pc.cast(r, pa.string())
        return t.append_column("__pair",
                               pc.binary_join_element_wise(l, r, "|"))

    # distinct bound keys (bound candidates may repeat across partitions —
    # dedup them so the inner join cannot row-multiply keep_ds)
    bound_keys = bound_ds.map_batches(
        lambda t: keyed(t).select(["__pair"]), batch_format="pyarrow"
    ).groupby("__pair").aggregate(Count(alias_name="__b"))

    out = joins.attach_columns(
        keep_ds.map_batches(keyed, batch_format="pyarrow"), bound_keys,
        "__pair", "__pair", {"__b": "__b"}, num_partitions, how="inner")
    return out.map_batches(
        lambda t: t.drop_columns([c for c in ("__pair", "__b")
                                  if c in t.column_names]),
        batch_format="pyarrow")
