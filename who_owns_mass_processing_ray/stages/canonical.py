"""Cluster outputs: assignment table, canonical-record election, rollups.

Reference analogs:
- ``clip_to_cluster``  ≙ ``sites_to_owners`` relation
  (``/root/reference/R/deduplicaters.R:684-710``)
- canonical (mode) transcript ≙ ``dedupe_text_mode`` most-frequent-name
  election with deterministic tie-breaks
  (``/root/reference/R/deduplicaters.R:290-311`` — the reference breaks ties
  by arrival order via ``arrange(desc(count)) |> slice_head``; here ties
  break by lexicographic min, so results are parallelism-invariant)
- ``clusters`` rollup ≙ ``summ_site_group`` per-metacorp aggregates
  (``/root/reference/R/summarizers.R:1-25``)

The election shuffles by ``cluster_part = cluster_id % P`` and processes all
clusters of a partition in one vectorized pandas pass (value_counts per
group), not one Python call per cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from who_owns_mass_processing_ray.synth import clip_id_to_int


def _cluster_id_of_root(roots: pa.Array | pa.ChunkedArray) -> pa.Array:
    """int64 cluster id from the root clip_id: numeric suffix when the id
    follows the ``clip-%012d`` convention, else a stable 63-bit hash.

    Fully vectorized: one RE2 extract + cast for the whole batch; the hash
    fallback is computed per BATCH (and only when some row needs it), not
    per row — this runs in the flagship's hot tail three times per
    assignment/edge row."""
    from who_owns_mass_processing_ray.functions import hashing as hx

    if isinstance(roots, pa.ChunkedArray):
        roots = roots.combine_chunks()
    # <= 18 digits so the int64 cast can never overflow; longer suffixes
    # fall through to the hash path like any other non-conforming id
    parsed = pc.cast(pc.struct_field(
        pc.extract_regex(roots, r"-(?P<n>\d{1,18})$"), "n"), pa.int64())
    if parsed.null_count == 0:
        return parsed
    hashed = pa.array((hx.hash_strings(pc.fill_null(roots, ""))
                       >> np.uint64(1)).astype(np.int64))
    return pc.if_else(pc.is_valid(parsed), parsed, hashed)


def clip_to_cluster(assignment_ds, edges_ds, num_partitions: int):
    """(clip_id, root_id) + edges -> (clip_id, cluster_id:int64,
    edge_kinds:list<string> — sorted distinct kinds incident to the clip)."""
    # per-clip incident kinds: explode each edge to both endpoints
    def explode(t: pa.Table) -> pa.Table:
        return pa.table({
            "clip_id": pa.concat_arrays([t["left_id"].combine_chunks(), t["right_id"].combine_chunks()])
            if isinstance(t["left_id"], pa.ChunkedArray)
            else pa.concat_arrays([t["left_id"], t["right_id"]]),
            "kind": pa.concat_arrays([t["kind"].combine_chunks(), t["kind"].combine_chunks()])
            if isinstance(t["kind"], pa.ChunkedArray)
            else pa.concat_arrays([t["kind"], t["kind"]]),
        })

    incident = edges_ds.map_batches(explode, batch_format="pyarrow")

    # kinds as a bitmask: per-(clip, kind-bit) rows OR-reduce via a plain
    # Sum-free two-level aggregate — fully vectorized, and the mask decodes
    # to a canonical sorted kind string (Arrow joins can't carry
    # list<string> non-key fields, so the string survives the join)
    KIND_BITS = {"exact": 1, "near": 2, "containment": 4, "audio": 8}
    MASK_STR = {0: ""}
    for m in range(1, 16):
        MASK_STR[m] = ",".join(k for k in ["audio", "containment", "exact", "near"]
                               if KIND_BITS[k] & m)

    _KIND_ARR = pa.array(["exact", "near", "containment", "audio"])
    _BIT_ARR = pa.array([1, 2, 4, 8], pa.int64())

    def to_bits(t: pa.Table) -> pa.Table:
        bits = pc.fill_null(_BIT_ARR.take(
            pc.index_in(t["kind"], value_set=_KIND_ARR)), 0)
        return pa.table({"clip_id": t["clip_id"], "bit": bits})

    _MASK_ARR = pa.array([MASK_STR[m] for m in range(16)], pa.string())
    # the same 16 masks as prebuilt list<string> values: decoding the joined
    # mask string back to a list is one index_in + one take (no per-row split)
    _MASK_LISTS = pa.array(
        [MASK_STR[m].split(",") if MASK_STR[m] else [] for m in range(16)],
        pa.list_(pa.string()))
    _KINDS_SCHEMA = pa.schema([("clip_id", pa.string()),
                               ("edge_kinds_str", pa.string())])

    def or_reduce(g: pa.Table) -> pa.Table:
        """Bits are powers of two, so OR == sum over DISTINCT (clip, bit)
        pairs — one dictionary encode + one np.unique + one bincount, all C
        (the r1 pandas drop_duplicates/groupby pass is gone)."""
        if g.num_rows == 0:
            return _KINDS_SCHEMA.empty_table()
        ids = g["clip_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        enc = pc.dictionary_encode(ids)
        codes = enc.indices.to_numpy().astype(np.int64)
        uniq_ids = enc.dictionary
        bits = g["bit"].to_numpy()
        pair = np.unique(codes * 16 + bits)
        mask = np.bincount(pair >> 4, weights=pair & 15,
                           minlength=len(uniq_ids)).astype(np.int64)
        return pa.table({
            "clip_id": uniq_ids,
            "edge_kinds_str": _MASK_ARR.take(pa.array(mask, pa.int64())),
        }, schema=_KINDS_SCHEMA)

    # coarse partition on clip_id hash so one task handles many clips
    def add_part(t: pa.Table) -> pa.Table:
        from who_owns_mass_processing_ray.functions import hashing as hx
        part = (hx.hash_strings(t["clip_id"]) % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("part", pa.array(part))

    kinds_ds = (
        incident.map_batches(to_bits, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: or_reduce(g.drop_columns(["part"])),
                    batch_format="pyarrow")
    )
    from who_owns_mass_processing_ray.stages import joins

    joined = joins.attach_columns(
        assignment_ds, kinds_ds, "clip_id", "clip_id",
        {"edge_kinds_str": "edge_kinds_str"}, num_partitions, how="left",
    )

    def finish(t: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.fill_null(t["edge_kinds_str"], ""),
                          value_set=_MASK_ARR)
        return pa.table({
            "clip_id": t["clip_id"],
            "cluster_id": _cluster_id_of_root(t["root_id"]),
            "edge_kinds": _MASK_LISTS.take(idx),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def clusters_table(assignment_ds, features_ds, edges_ds, num_partitions: int):
    """-> (cluster_id, canonical_clip_id, canonical_transcript, size,
    total_dur_ms, exact_ct, near_ct, containment_ct, audio_ct)."""
    from ray.data.aggregate import Count, Min, Sum

    from who_owns_mass_processing_ray.stages import joins

    member = joins.attach_columns(
        assignment_ds, features_ds, "clip_id", "clip_id",
        {"transcript_norm": "transcript_norm", "dur_ms": "dur_ms"},
        num_partitions, how="inner",
    )

    def add_part(t: pa.Table) -> pa.Table:
        cid = _cluster_id_of_root(t["root_id"])
        part = (cid.to_numpy() % num_partitions).astype(np.int32)
        return t.append_column("cluster_id", cid).append_column("part", pa.array(part))

    _ELECT_SCHEMA = pa.schema([
        ("cluster_id", pa.int64()), ("canonical_clip_id", pa.string()),
        ("size", pa.int64()), ("total_dur_ms", pa.int64()),
        ("canonical_transcript", pa.string()),
    ])

    def elect(g: pa.Table) -> pa.Table:
        """Vectorized election across every cluster in this partition —
        Arrow C sort + numpy segment reduces (the r1 pandas groupby pass
        converted every partition to Python objects)."""
        if g.num_rows == 0:
            return _ELECT_SCHEMA.empty_table()
        g = g.sort_by([("cluster_id", "ascending"), ("clip_id", "ascending")])
        cid = g["cluster_id"].to_numpy()
        n = len(cid)
        starts = np.concatenate(([0], np.flatnonzero(cid[1:] != cid[:-1]) + 1))
        sizes = np.diff(np.concatenate((starts, [n])))
        dur = g["dur_ms"].to_numpy().astype(np.int64)
        cs = np.concatenate(([0], np.cumsum(dur)))
        totals = cs[starts + sizes] - cs[starts]
        take_first = pa.array(starts)
        clusters = cid[starts]
        # mode transcript per cluster, ties -> lexicographic min transcript:
        # count (cluster, transcript) runs, order runs by (cluster, ct desc,
        # transcript asc == run position), take first run per cluster
        valid = pc.is_valid(g["transcript_norm"])
        sub = g.filter(valid).select(["cluster_id", "transcript_norm"]) \
            .sort_by([("cluster_id", "ascending"),
                      ("transcript_norm", "ascending")])
        mode_str = pa.nulls(len(starts), pa.string())
        if sub.num_rows:
            c2 = sub["cluster_id"].to_numpy()
            t2 = sub["transcript_norm"]
            if isinstance(t2, pa.ChunkedArray):
                t2 = t2.combine_chunks()
            tcodes = pc.dictionary_encode(t2).indices.to_numpy() \
                .astype(np.int64)
            m = len(c2)
            r_starts = np.concatenate(
                ([0], np.flatnonzero((c2[1:] != c2[:-1])
                                     | (tcodes[1:] != tcodes[:-1])) + 1))
            r_ct = np.diff(np.concatenate((r_starts, [m])))
            r_cid = c2[r_starts]
            # stable pick: (cluster asc, ct desc, run position asc) — run
            # position already orders transcripts ascending within cluster
            order = np.lexsort((np.arange(len(r_ct)), -r_ct, r_cid))
            keep = np.ones(len(order), dtype=bool)
            keep[1:] = r_cid[order][1:] != r_cid[order][:-1]
            win = order[keep]
            pos = np.searchsorted(clusters, r_cid[win])
            mode_np = np.full(len(starts), -1, dtype=np.int64)
            mode_np[pos] = r_starts[win]
            mode_str = pc.if_else(
                pa.array(mode_np >= 0),
                t2.take(pa.array(np.maximum(mode_np, 0))),
                pa.nulls(len(starts), pa.string()))
        return pa.table({
            "cluster_id": pa.array(clusters),
            "canonical_clip_id": g["clip_id"].take(take_first),
            "size": pa.array(sizes.astype(np.int64)),
            "total_dur_ms": pa.array(totals.astype(np.int64)),
            "canonical_transcript": mode_str,
        }, schema=_ELECT_SCHEMA)

    base = (
        member.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: elect(g.drop_columns(["part"])),
                    batch_format="pyarrow")
    )

    # per-cluster edge-kind counts: map left endpoint -> cluster, pivot
    edge_cluster = joins.attach_columns(
        edges_ds, assignment_ds, "left_id", "clip_id",
        {"root_id": "root_id"}, num_partitions, how="inner",
    )
    kind_counts = edge_cluster.map_batches(
        lambda t: pa.table({"cluster_id": _cluster_id_of_root(t["root_id"]),
                            "kind": t["kind"]}),
        batch_format="pyarrow",
    ).groupby(["cluster_id", "kind"]).count()

    _PIVOT_SCHEMA = pa.schema([
        ("cluster_id", pa.int64()), ("exact_ct", pa.int64()),
        ("near_ct", pa.int64()), ("containment_ct", pa.int64()),
        ("audio_ct", pa.int64()),
    ])
    _PIV_KINDS = pa.array(["exact", "near", "containment", "audio"])

    def pivot(g: pa.Table) -> pa.Table:
        """kind-count pivot as one bincount over (cluster code, kind index)
        — no pandas pivot_table object pass."""
        if g.num_rows == 0:
            return _PIVOT_SCHEMA.empty_table()
        cid = g["cluster_id"]
        if isinstance(cid, pa.ChunkedArray):
            cid = cid.combine_chunks()
        enc = pc.dictionary_encode(cid)
        codes = enc.indices.to_numpy().astype(np.int64)
        kidx = pc.index_in(g["kind"], value_set=_PIV_KINDS).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cnt = g["count()"].to_numpy().astype(np.int64)
        wide = np.bincount(codes * 4 + kidx, weights=cnt,
                           minlength=len(enc.dictionary) * 4) \
            .astype(np.int64).reshape(-1, 4)
        return pa.table({
            "cluster_id": enc.dictionary,
            "exact_ct": pa.array(wide[:, 0]),
            "near_ct": pa.array(wide[:, 1]),
            "containment_ct": pa.array(wide[:, 2]),
            "audio_ct": pa.array(wide[:, 3]),
        }, schema=_PIVOT_SCHEMA)

    def add_part2(t: pa.Table) -> pa.Table:
        part = (t["cluster_id"].to_numpy() % num_partitions).astype(np.int32)
        return t.append_column("part", pa.array(part))

    kind_wide = (
        kind_counts.map_batches(add_part2, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: pivot(g.drop_columns(["part"])),
                    batch_format="pyarrow")
    )

    out = joins.attach_columns(
        base, kind_wide, "cluster_id", "cluster_id",
        {c: c for c in ["exact_ct", "near_ct", "containment_ct", "audio_ct"]},
        num_partitions, how="left",
    )

    def finish(t: pa.Table) -> pa.Table:
        cols = {}
        for name in ["cluster_id", "canonical_clip_id", "canonical_transcript",
                     "size", "total_dur_ms"]:
            cols[name] = t[name]
        for name in ["exact_ct", "near_ct", "containment_ct", "audio_ct"]:
            cols[name] = pa.compute.fill_null(t[name].cast(pa.int64()), 0)
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow")
