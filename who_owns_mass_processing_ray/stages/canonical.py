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

from who_owns_mass_processing_ray.synth import clip_id_to_int


def _cluster_id_of_root(roots: pa.Array | pa.ChunkedArray) -> pa.Array:
    """int64 cluster id from the root clip_id: numeric suffix when the id
    follows the ``clip-%012d`` convention, else a stable 63-bit hash."""
    from who_owns_mass_processing_ray.functions import hashing as hx

    ids = roots.to_pylist()
    out = np.empty(len(ids), dtype=np.int64)
    hashed = None
    for i, s in enumerate(ids):
        try:
            out[i] = int(s.rsplit("-", 1)[1])
        except (ValueError, IndexError, AttributeError):
            if hashed is None:
                if isinstance(roots, pa.ChunkedArray):
                    roots = roots.combine_chunks()
                hashed = (hx.hash_strings(roots) >> np.uint64(1)).astype(np.int64)
            out[i] = hashed[i]
    return pa.array(out)


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

    def to_bits(t: pa.Table) -> pa.Table:
        kinds = t["kind"].to_pylist()
        bits = np.array([KIND_BITS.get(k, 0) for k in kinds], dtype=np.int64)
        return pa.table({"clip_id": t["clip_id"], "bit": pa.array(bits)})

    def or_reduce(g: pd.DataFrame) -> pd.DataFrame:
        # bits are powers of two, so OR of DISTINCT bits == their sum —
        # dedup + sum keeps the whole reduce in vectorized C
        agg = g.drop_duplicates().groupby("clip_id")["bit"].sum()
        out = agg.map(MASK_STR).rename("edge_kinds_str").reset_index()
        return out

    # coarse partition on clip_id hash so one task handles many clips
    def add_part(t: pa.Table) -> pa.Table:
        from who_owns_mass_processing_ray.functions import hashing as hx
        part = (hx.hash_strings(t["clip_id"]) % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("part", pa.array(part))

    kinds_ds = (
        incident.map_batches(to_bits, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: or_reduce(g.drop(columns=["part"])),
                    batch_format="pandas")
    )
    from who_owns_mass_processing_ray.stages import joins

    joined = joins.attach_columns(
        assignment_ds, kinds_ds, "clip_id", "clip_id",
        {"edge_kinds_str": "edge_kinds_str"}, num_partitions, how="left",
    )

    def finish(t: pa.Table) -> pa.Table:
        kinds = t["edge_kinds_str"].to_pylist()
        filled = [k.split(",") if k else [] for k in kinds]
        return pa.table({
            "clip_id": t["clip_id"],
            "cluster_id": _cluster_id_of_root(t["root_id"]),
            "edge_kinds": pa.array(filled, pa.list_(pa.string())),
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

    def elect(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized election across every cluster in this partition."""
        g = g.sort_values(["cluster_id", "clip_id"])
        agg = g.groupby("cluster_id").agg(
            canonical_clip_id=("clip_id", "min"),
            size=("clip_id", "size"),
            total_dur_ms=("dur_ms", "sum"),
        )
        # mode transcript per cluster, ties -> lexicographic min transcript
        tn = g.dropna(subset=["transcript_norm"])
        if len(tn):
            counts = (
                tn.groupby(["cluster_id", "transcript_norm"]).size().rename("ct").reset_index()
                .sort_values(["cluster_id", "ct", "transcript_norm"],
                             ascending=[True, False, True])
            )
            mode = counts.groupby("cluster_id").head(1).set_index("cluster_id")["transcript_norm"]
        else:
            mode = pd.Series(dtype=object)
        agg["canonical_transcript"] = mode.reindex(agg.index)
        agg["total_dur_ms"] = agg["total_dur_ms"].astype("int64")
        agg["size"] = agg["size"].astype("int64")
        return agg.reset_index()

    base = (
        member.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: elect(g.drop(columns=["part"])), batch_format="pandas")
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

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        w = g.pivot_table(index="cluster_id", columns="kind", values="count()",
                          aggfunc="sum", fill_value=0)
        for k in ["exact", "near", "containment", "audio"]:
            if k not in w.columns:
                w[k] = 0
        w = w[["exact", "near", "containment", "audio"]].astype("int64")
        w.columns = ["exact_ct", "near_ct", "containment_ct", "audio_ct"]
        return w.reset_index()

    def add_part2(t: pa.Table) -> pa.Table:
        part = (t["cluster_id"].to_numpy() % num_partitions).astype(np.int32)
        return t.append_column("part", pa.array(part))

    kind_wide = (
        kind_counts.map_batches(add_part2, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: pivot(g.drop(columns=["part"])), batch_format="pandas")
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
