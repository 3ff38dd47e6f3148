"""SimHash audio-fingerprint blocking — the second edge dimension.

The reference bounds its cosine grouping by a shared standardized address
(``addr_id`` group-fill bounding, ``/root/reference/R/deduplicaters.R:446-539``)
so that only entities at the same address can merge.  The graft's analog of
that coarse secondary identity is the decoded-PCM spectral SimHash computed
by the feature stage: re-encoded/resampled copies of the same waveform land
within a few bits of each other.

Blocking: multi-index hashing — the 64-bit fingerprint is sliced into
``hamming_thresh + 1`` near-equal-width parts (7 parts of 9-10 bits at the
default radius 6), so by pigeonhole EVERY pair within the verify radius
shares at least one clean part: candidate generation is COMPLETE, recall
loss can only come from the visible hot-bucket salting cap (round 1 used 4
fixed 16-bit bands, which silently missed pairs at distance 4-6 — caught
by the brute-force oracle in tests/test_independent_oracles.py).
Verification is exact hamming distance on the full fingerprint (carried
through the pair rows — 8 bytes, never the PCM).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from who_owns_mass_processing_ray import audio
from who_owns_mass_processing_ray.config import DedupConfig
from who_owns_mass_processing_ray.functions import hashing as hx
from who_owns_mass_processing_ray.stages import pairs as pr


def _band_rows(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    fp = batch["fp"].to_numpy()
    ok = batch["decode_ok"].to_numpy(zero_copy_only=False)
    ids_arr = batch["clip_id"]
    if isinstance(ids_arr, pa.ChunkedArray):
        ids_arr = ids_arr.combine_chunks()
    ok_idx = np.flatnonzero(ok)
    fp = fp[ok_idx]
    # multi-index parts: radius + 1 slices, widths as equal as possible
    # (completeness: d <= hamming_thresh flipped bits leave >= 1 part clean)
    bands = cfg.hamming_thresh + 1
    base = cfg.simhash_bits // bands
    widths = [base + (1 if i < cfg.simhash_bits % bands else 0)
              for i in range(bands)]
    keys = []
    shift = 0
    for b, w in enumerate(widths):
        mask = np.uint64((1 << w) - 1)
        slice_b = (fp >> np.uint64(shift)) & mask
        shift += w
        # mix in the band index so identical slices in different bands
        # don't collide into one bucket
        keys.append(hx.splitmix64(slice_b ^ np.uint64(0xAD10F00D + b * 0x9E37)))
    keys = np.stack(keys, axis=1).reshape(-1) if len(fp) else np.empty(0, np.uint64)
    rep_idx = pa.array(np.repeat(ok_idx, bands))
    # fp is carried bit-cast to int64: Ray's aggregate path converts uint64
    # above 2^63 to pickled Python objects; int64 stays a native Arrow column
    return pa.table({
        "bucket_key": pa.array(keys),
        "clip_id": ids_arr.take(rep_idx),
        "fp": pa.array(np.repeat(fp, bands).view(np.int64)),
    })


def audio_edges(features_ds, cfg: DedupConfig, num_parts: int):
    """features -> verified 'audio' edge Dataset (left_id, right_id, kind)."""
    narrow = features_ds.select_columns(["clip_id", "fp", "decode_ok"])
    band_rows = narrow.map_batches(_band_rows, fn_kwargs={"cfg": cfg},
                                   batch_format="pyarrow", batch_size=cfg.batch_size)
    cand = pr.pairs_from_bucket_rows(
        band_rows, "bucket_key", "clip_id", cfg.max_bucket, num_parts,
        payload_cols=["fp"],
    )

    def verify(batch: pa.Table) -> pa.Table:
        lf = batch["left_fp"].to_numpy().astype(np.int64).view(np.uint64)
        rf = batch["right_fp"].to_numpy().astype(np.int64).view(np.uint64)
        keep = audio.hamming64(lf, rf) <= cfg.hamming_thresh if len(lf) else np.zeros(0, bool)
        out = batch.filter(pa.array(keep))
        return pa.table({
            "left_id": out["left_id"],
            "right_id": out["right_id"],
            "dropped": out["dropped"],
        })

    verified = cand.map_batches(verify, batch_format="pyarrow",
                                batch_size=cfg.batch_size)
    return pr.distinct_edges(verified, "audio", num_parts=num_parts)
