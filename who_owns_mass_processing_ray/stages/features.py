"""Feature extraction — the single pass that touches the wide ``bytes`` rows.

Design for 100 TB: the encoded audio is read ONCE; everything downstream
(blocking, candidate generation, verification, clustering) operates on the
narrow feature table this stage emits (a few dozen bytes per row).  Binary
payloads never flow through a shuffle — only derived hashes/fingerprints do
(SURVEY.md §7.3 "keep PCM out of shuffles").

This is an actor-pool stage (callable class): the SimHash projection matrix
and codec dispatch table are built once per actor in ``__init__`` — the
engine analog of the reference building its quanteda TF-IDF model / ZIP
reference tables once and reusing them across rows
(``/root/reference/R/deduplicaters.R:327-345``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from who_owns_mass_processing_ray import audio
from who_owns_mass_processing_ray.config import DedupConfig
from who_owns_mass_processing_ray.functions import hashing as hx
from who_owns_mass_processing_ray.functions import text as tx

FEATURE_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("transcript_norm", pa.string()),
        ("t_hash", pa.uint64()),       # content hash of normalized transcript
        ("b_hash", pa.uint64()),       # content hash of raw encoded bytes
        ("exact_key", pa.uint64()),    # mix(t_hash, b_hash) — dedupe_naive key
        ("fp", pa.uint64()),           # audio SimHash fingerprint
        ("dur_ms", pa.int32()),
        ("n_bytes", pa.int64()),
        ("decode_ok", pa.bool_()),
    ]
)


class ExtractFeatures:
    """map_batches actor: (clip_id, bytes, sr_hz, dur_ms, codec, transcript)
    -> narrow feature rows.  Per-batch work is vectorized except the audio
    decode+FFT, which is inherently per-row (variable-length binary)."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        # warm the projection cache once per actor
        audio._simhash_projection(cfg.fp_num_bands - 1, cfg.simhash_bits, cfg.seed)

    def _fingerprint(self, buf, codec: str) -> tuple[int, bool]:
        cfg = self.cfg
        try:
            pcm, sr = audio.decode(buf, codec)
        except Exception:
            return 0, False
        fp = audio.audio_fingerprint(
            pcm, sr, cfg.fp_num_bands, cfg.simhash_bits,
            cfg.fp_fmin_hz, cfg.fp_fmax_hz, cfg.seed)
        return fp, True

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        norm = tx.normalize_transcripts(batch["transcript"])
        t_hash = hx.hash_strings(norm)
        b_col = batch["bytes"]
        if isinstance(b_col, pa.ChunkedArray):
            b_col = b_col.combine_chunks()
        b_hash = hx.hash_binary_rows(b_col)
        with np.errstate(over="ignore"):
            exact_key = hx.splitmix64(t_hash * np.uint64(0xC2B2AE3D27D4EB4F) ^ b_hash)
        codecs = batch["codec"].to_pylist()
        bufs = b_col.to_pylist()
        fps = np.zeros(len(bufs), dtype=np.uint64)
        ok = np.zeros(len(bufs), dtype=bool)
        for i, (buf, codec) in enumerate(zip(bufs, codecs)):
            fp, good = self._fingerprint(buf, codec)
            fps[i] = fp
            ok[i] = good
        n_bytes = pa.compute.binary_length(b_col).cast(pa.int64())
        return pa.table(
            {
                "clip_id": batch["clip_id"],
                "transcript_norm": norm,
                "t_hash": pa.array(t_hash),
                "b_hash": pa.array(b_hash),
                "exact_key": pa.array(exact_key),
                "fp": pa.array(fps),
                "dur_ms": batch["dur_ms"].cast(pa.int32()),
                "n_bytes": n_bytes,
                "decode_ok": pa.array(ok),
            },
            schema=FEATURE_SCHEMA,
        )


def extract_features(clips_ds, cfg: DedupConfig):
    """clips Dataset -> narrow feature Dataset (the one wide-row pass).

    Pool bounds from ``stages.pool_bounds``: start at half the cluster
    (autoscaling up from a tiny pool queued early tasks — profiled
    effective parallelism ~10 of 32), cap below the cluster size so
    downstream tasks of the same streaming pipeline never starve."""
    from who_owns_mass_processing_ray.stages import pool_bounds

    lo, hi = pool_bounds(hi_cap=cfg.audio_concurrency[1])
    return clips_ds.map_batches(
        ExtractFeatures,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.audio_batch_size,
        concurrency=(lo, hi),
        num_cpus=1,
    )
