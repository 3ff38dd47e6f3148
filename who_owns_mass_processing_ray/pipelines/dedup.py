"""The flagship dedup pipeline — the engine's ``dedupe_all``
(``/root/reference/R/deduplicaters.R:563-1078``), re-expressed as a DAG of
Ray Data stages:

    read clips (one wide pass)
      └─ features (actor pool: decode + fingerprint + hashes + normalize)
           ├─ exact edges        (128-bit content identity, star expansion)
           ├─ near edges         (MinHash + LSH bands + exact-Jaccard verify)
           ├─ audio edges        (SimHash bands + hamming verify)
           └─ containment edges  (winnowed anchors + substring verify)
      └─ union(edges) ─ connected components (DSU / label propagation)
           ├─ clip_to_cluster (assignment + incident edge kinds)
           └─ clusters (canonical election + rollups)

Every intermediate that crosses a shuffle is NARROW (ids + hashes); the
encoded audio is read exactly once.  All stages checkpoint under
``checkpoint_dir`` (stage-level Parquet + per-partition lineage) so a killed
run resumes without recomputing finished stages.
"""

from __future__ import annotations

import pyarrow as pa

from who_owns_mass_processing_ray.config import DEFAULT_CONFIG, DedupConfig
from who_owns_mass_processing_ray.stages import (
    audio_fp,
    canonical,
    checkpoint,
    components,
    containment,
    exact,
    features as features_mod,
    lsh,
)


def _auto_parts() -> int:
    from who_owns_mass_processing_ray.stages import auto_parts

    return auto_parts()


def read_clips(clips_path: str):
    """Source: the clip input contract (clip_id, bytes, sr_hz, dur_ms,
    codec, transcript).  Dispatches on storage format: a Lance dataset path
    routes through ``ray.data.read_lance`` when the ``lance`` package is
    importable (the north-rule input format), anything else reads as
    Parquet — the same columnar contract and projection pushdown.  See
    ``io_utils.read_table_auto`` for the gating semantics."""
    from who_owns_mass_processing_ray.io_utils import read_table_auto

    return read_table_auto(clips_path)


def dedup_pipeline(
    clips_path: str,
    cfg: DedupConfig = DEFAULT_CONFIG,
    checkpoint_dir: str | None = None,
    components_method: str = "auto",
):
    """Run end-to-end from a Parquet path; returns dict of Datasets:
    ``features``, ``edges``, ``clip_to_cluster``, ``clusters``.

    With a ``checkpoint_dir``, the feature stage resumes at INPUT-FILE
    granularity (checkpoint.partitioned_features) — only missing partitions
    of the wide audio pass recompute after a kill."""
    return dedup_pipeline_from_dataset(
        read_clips(clips_path), cfg, checkpoint_dir=checkpoint_dir,
        components_method=components_method, input_tag=clips_path,
        clips_path=clips_path)


def dedup_pipeline_from_dataset(
    clips_ds,
    cfg: DedupConfig = DEFAULT_CONFIG,
    checkpoint_dir: str | None = None,
    components_method: str = "auto",
    input_tag: str = "<dataset>",
    clips_path: str | None = None,
):
    """Same DAG over an already-constructed clips Dataset (any source that
    matches the clip contract).  ``input_tag`` keys the checkpoint lineage."""
    import os
    import sys
    import time

    timing: dict[str, float] = {}
    _trace = bool(os.environ.get("GRAFT_STAGE_TIMING"))

    def _timed(name, fn):
        t0 = time.time()
        out = fn()
        timing[name] = round(time.time() - t0, 3)
        if _trace:
            print(f"[stage-timing] {name}: {timing[name]}s",
                  file=sys.stderr, flush=True)
        return out

    num_parts = cfg.num_parts or _auto_parts()
    num_partitions = max(8, num_parts // 4)
    cache = checkpoint.StageCache(checkpoint_dir)
    cfg_fp = checkpoint.fingerprint_of(cfg, input_tag)

    def _pin(ds):
        # Each stage output is consumed by several downstream stages.  With a
        # checkpoint dir the output is Parquet-backed (re-reads are cheap and
        # resumable); without one, pin it in the object store so Ray doesn't
        # re-execute the producing stage once per consumer.
        return ds if checkpoint_dir else ds.materialize()

    def _coalesce(ds):
        """Collapse pathological tiny-block layouts before the fan of
        downstream shuffles: a materialized stage that inherited one block
        per input file / actor task (e.g. 332 blocks of 240 rows at 80k
        clips) makes EVERY downstream groupby/sort pay per-block fixed
        costs — measured 46s -> 3.6s for the canonical stage at 80k just
        from this.  Block target = max(2 blocks/CPU, 128 MB/block), so at
        real scale (blocks already >= 128 MB) this is a no-op."""
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8))
            size = ds.size_bytes() or 0
            want = max(cpus * 2, -(-size // (128 << 20)))
            if ds.num_blocks() > want * 2:
                return ds.repartition(int(want)).materialize()
        except Exception:
            pass
        return ds

    if checkpoint_dir and clips_path:
        feats = checkpoint.partitioned_features(clips_path, cfg, cache, cfg_fp)
    else:
        feats = _timed("features", lambda: _pin(cache.run(
            "features", cfg_fp,
            lambda: features_mod.extract_features(clips_ds, cfg),
        )))
    feats = _coalesce(feats)

    # Scheduling: the four edge stages all read `feats`.  On BIG inputs each
    # one materializes ALONE, getting the whole cluster in turn, instead of
    # overlapping inside one union materialize.  Measured on the identical
    # job: 8 CPUs / 80k clips 426 s overlapped vs 234 s sequential (the
    # stages' concurrent actor-pool minimums, pool_bounds lo = cpus/2
    # EACH, oversubscribe the node and shuffle tasks starve); 32 CPUs /
    # 160k clips 280 s overlapped vs ~165 s sequential (two candidate
    # streams with attached transcripts in flight at once saturate the
    # object store and spill).  Output is identical either way
    # (determinism-under-parallelism tests).
    #
    # On SMALL inputs the trade inverts: each barrier costs a near-constant
    # ~0.5–1 s of shuffle/pool setup that nothing amortizes (measured
    # 19.4 s vs 15.8 s for the 5k-clip flagship, 4 barriers of pure fixed
    # cost), so below ``cfg.sequential_stage_rows`` the stages stay lazy
    # and overlap inside the union materialize.  `feats` is materialized
    # at this point, so the row count is free metadata.
    sequential = (checkpoint_dir is None
                  and feats.count() >= cfg.sequential_stage_rows)

    def _stage(ds):
        if sequential:
            return ds.materialize()
        return ds

    e_exact = _timed("edges_exact", lambda: _stage(cache.run(
        "edges_exact", cfg_fp, lambda: exact.exact_edges(feats, cfg, num_parts))))
    e_near = _timed("edges_near", lambda: _stage(cache.run(
        "edges_near", cfg_fp,
        lambda: lsh.near_edges(feats, cfg, num_parts, num_partitions))))
    e_audio = _timed("edges_audio", lambda: _stage(cache.run(
        "edges_audio", cfg_fp, lambda: audio_fp.audio_edges(feats, cfg, num_parts))))
    e_contain = _timed("edges_containment", lambda: _stage(cache.run(
        "edges_containment", cfg_fp,
        lambda: containment.containment_edges(feats, cfg, num_parts, num_partitions))))

    if cfg.compound_bound:
        # ≙ dedupe_cosine_bounded (/root/reference/R/deduplicaters.R:446-539):
        # text-similar pairs merge only when they ALSO share the audio
        # bounding dimension (edge intersection on the pair key), and the
        # bounding dimension alone never merges; exact/containment evidence
        # always does.  Only narrow (left_id, right_id) pairs cross the
        # intersection shuffle.
        from who_owns_mass_processing_ray.stages import pairs as pr

        e_near_bound = pr.pair_intersect(e_near, e_audio, num_partitions)
        edges = _timed("edges_union", lambda: _coalesce(
            _pin(e_exact.union(e_near_bound).union(e_contain))))
    else:
        edges = _timed("edges_union", lambda: _coalesce(_pin(
            e_exact.union(e_near).union(e_audio).union(e_contain))))

    assignment = _timed("assignment", lambda: _coalesce(_pin(cache.run(
        "assignment", cfg_fp,
        lambda: components.assignment_dataset(
            feats, edges, cfg, num_partitions, method=components_method),
    ))))

    c2c = cache.run(
        "clip_to_cluster", cfg_fp,
        lambda: canonical.clip_to_cluster(assignment, edges, num_partitions))
    clusters = cache.run(
        "clusters", cfg_fp,
        lambda: canonical.clusters_table(assignment, feats, edges, num_partitions))

    return {
        "features": feats,
        "edges": edges,
        "clip_to_cluster": c2c,
        "clusters": clusters,
        "timing": timing,
    }


def write_outputs(results: dict, out_dir: str) -> None:
    """Persist the public output tables (≙ the reference's final
    ``load_write`` of sites/owners/metacorps tables,
    ``/root/reference/R/deduplicaters.R:663-682``)."""
    import os

    for name in ["clip_to_cluster", "clusters"]:
        path = os.path.join(out_dir, name)
        os.makedirs(path, exist_ok=True)
        results[name].write_parquet(path)
