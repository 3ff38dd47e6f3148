"""MinHash + LSH near-duplicate blocking over transcript shingles.

Replaces the reference's all-pairs TF-IDF char-3-gram cosine matrix
(``quanteda textstat_simil(min_simil=thresh)``,
``/root/reference/R/deduplicaters.R:313-378``) — the reference's only
quadratic stage, the reason its full-state run needs address-bounded
blocking — with a linear-in-rows LSH scheme:

  shingle (char-k rolling hashes)  ->  MinHash signature (num_perm)
  ->  band hashes (bands x rows)   ->  explode to (band_hash, clip_id) rows
  ->  coarse-partition groupby     ->  within-bucket candidate pairs (capped)
  ->  verify with EXACT Jaccard    ->  'near' edges

The LSH S-curve with the default config (32 bands x 4 rows) catches a pair
at the verify threshold J=0.55 with p = 1-(1-0.55^4)^32 ≈ 0.95 and at the
planted-dup floor J≈0.69 with p ≈ 0.9997; exact-Jaccard verification then
removes all false candidates, so precision is exact and recall is the only
probabilistic quantity (measured >= 0.99 on planted pairs in tests).

The MinHash stage is a callable class: the permutation table is derived
once per actor from the config seed (the analog of the reference building
its TF-IDF model once per dedup call).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from who_owns_mass_processing_ray.config import DedupConfig
from who_owns_mass_processing_ray.functions import hashing as hx
from who_owns_mass_processing_ray.stages import pairs as pr


def _default_concurrency() -> tuple:
    from who_owns_mass_processing_ray.stages import pool_bounds

    return pool_bounds()


class MinHashBands:
    """map_batches actor: (clip_id, transcript_norm) -> exploded band rows
    (bucket_key:uint64, clip_id:string)."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        col = batch["transcript_norm"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals, offs = hx.shingle_hashes(col, cfg.shingle_k, seed=cfg.seed)
        sig = hx.minhash_signatures(vals, offs, cfg.num_perm, cfg.seed)
        bands = hx.band_hashes(sig, cfg.lsh_bands, cfg.lsh_rows, seed=cfg.seed)
        counts = np.diff(offs)
        # null/empty transcripts produce the sentinel signature — exclude
        # them from banding entirely (they'd all collide into one mega-bucket)
        keep_idx = np.flatnonzero(counts > 0)
        ids_arr = batch["clip_id"]
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        rep_idx = pa.array(np.repeat(keep_idx, cfg.lsh_bands))
        keys = bands[keep_idx].reshape(-1)
        return pa.table({
            "bucket_key": pa.array(keys),
            "clip_id": ids_arr.take(rep_idx),
        })


def verify_jaccard(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """Exact char-k Jaccard over candidate pairs; keep >= cfg.jaccard_thresh."""
    left = batch["left_norm"]
    right = batch["right_norm"]
    jac = hx.jaccard_pairs_dict(left, right, cfg.shingle_k, seed=cfg.seed)
    nonempty = pa.compute.and_(
        pa.compute.greater(pa.compute.utf8_length(pa.compute.fill_null(left, "")), 0),
        pa.compute.greater(pa.compute.utf8_length(pa.compute.fill_null(right, "")), 0),
    ).to_numpy(zero_copy_only=False)
    keep = (jac >= cfg.jaccard_thresh) & nonempty
    out = batch.filter(pa.array(keep))
    return pa.table({
        "left_id": out["left_id"],
        "right_id": out["right_id"],
        "dropped": out["dropped"],
    })


def near_edges(features_ds, cfg: DedupConfig, num_parts: int, num_partitions: int):
    """features -> verified 'near' edge Dataset (left_id, right_id, kind,
    dropped)."""
    narrow = features_ds.select_columns(["clip_id", "transcript_norm"])
    band_rows = narrow.map_batches(
        MinHashBands,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.minhash_concurrency or _default_concurrency(),
    )
    cand = pr.pairs_from_bucket_rows(
        band_rows, "bucket_key", "clip_id", cfg.max_bucket, num_parts
    )
    # rebalance the narrow pair stream before the verify map: one partition
    # can hold a salted mega-bucket's pairs (see config.verify_rows_per_block)
    cand = cand.repartition(
        target_num_rows_per_block=cfg.verify_rows_per_block)
    cand = pr.attach_pair_features(cand, features_ds, "transcript_norm",
                                   num_partitions, out_prefix="norm")
    verified = cand.map_batches(verify_jaccard, fn_kwargs={"cfg": cfg},
                                batch_format="pyarrow",
                                batch_size=cfg.verify_batch_size)
    return pr.distinct_edges(verified, "near", num_parts=num_parts)
