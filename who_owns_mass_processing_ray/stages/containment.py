"""Exact-containment matching (clip cuts: one transcript a strict substring
of another).

The reference handles embedded-entity extraction with regex peels
(C/O-in-name address extraction, ``/root/reference/R/standardizers.R:1148-1182``)
— inherently pattern-specific.  The engine's general capability is a
winnowing-fingerprint candidate stage (the MOSS/winnowing idea: sample
char-grams whose hash satisfies ``h % stride == 0``; selection depends only
on gram content, so a substring and its container select the SAME grams) and
an exact substring verification:

  winnowed anchor grams -> (anchor_hash, clip_id, n_chars) rows
  -> coarse-partition groupby -> within-bucket pairs (capped)
  -> join both transcripts    -> exact ``shorter in longer`` check
  -> 'containment' edges (left = container, right = contained)

A SURVEY.md §7 alternative is a per-partition generalized suffix array; the
winnowing design was chosen because its candidate volume is O(n·len/stride)
rows with no length-bucketed repartition, and the verify step is shared
with the LSH stage's join machinery.  Miss probability for a contained
substring with g sampled grams is (1-1/stride)^g — negligible for the
>= 6-word cuts the corpus plants (documented, counted in tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from who_owns_mass_processing_ray.config import DedupConfig
from who_owns_mass_processing_ray.functions import hashing as hx
from who_owns_mass_processing_ray.stages import pairs as pr


def _anchor_rows(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    col = batch["transcript_norm"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals, offs = hx.winnow_anchors(
        col, cfg.containment_gram, cfg.containment_stride,
        cfg.containment_min_len, seed=cfg.seed,
    )
    counts = np.diff(offs)
    ids_arr = batch["clip_id"]
    if isinstance(ids_arr, pa.ChunkedArray):
        ids_arr = ids_arr.combine_chunks()
    rep_idx = pa.array(np.repeat(np.arange(len(batch)), counts))
    lens = pc.fill_null(pc.utf8_length(col), 0).to_numpy().astype(np.int64)
    return pa.table({
        "bucket_key": pa.array(vals),
        "clip_id": ids_arr.take(rep_idx),
        "n_chars": pa.array(np.repeat(lens, counts)),
    })


def containment_edges(features_ds, cfg: DedupConfig, num_parts: int,
                      num_partitions: int):
    """features -> verified 'containment' edges (left=container, right=contained)."""
    narrow = features_ds.select_columns(["clip_id", "transcript_norm"])
    anchor_rows = narrow.map_batches(_anchor_rows, fn_kwargs={"cfg": cfg},
                                     batch_format="pyarrow", batch_size=cfg.batch_size)
    cand = pr.pairs_from_bucket_rows(
        anchor_rows, "bucket_key", "clip_id", cfg.max_bucket, num_parts,
        payload_cols=["n_chars"],
    )
    # cheap pre-filter before the transcript join: containment needs strictly
    # different lengths
    cand = cand.map_batches(
        lambda t: t.filter(pc.not_equal(t["left_n_chars"], t["right_n_chars"])),
        batch_format="pyarrow",
    )
    cand = pr.attach_pair_features(cand, features_ds, "transcript_norm",
                                   num_partitions, out_prefix="norm")

    def verify(batch: pa.Table) -> pa.Table:
        ln = batch["left_norm"].to_pylist()
        rn = batch["right_norm"].to_pylist()
        li = batch["left_id"].to_pylist()
        ri = batch["right_id"].to_pylist()
        dr = batch["dropped"].to_pylist()
        out_l, out_r, out_d = [], [], []
        for a_id, b_id, a, b, d in zip(li, ri, ln, rn, dr):
            if a is None or b is None:
                continue
            if len(a) > len(b):
                container, contained, c_id, d_id = a, b, a_id, b_id
            else:
                container, contained, c_id, d_id = b, a, b_id, a_id
            if len(contained) < len(container) and contained in container:
                out_l.append(c_id)
                out_r.append(d_id)
                out_d.append(d)
        return pa.table({
            "left_id": pa.array(out_l, pa.string()),
            "right_id": pa.array(out_r, pa.string()),
            "dropped": pa.array(out_d, pa.int64()),
        })

    verified = cand.map_batches(verify, batch_format="pyarrow",
                                batch_size=cfg.batch_size)
    return pr.distinct_edges(verified, "containment")
