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
    """Per-batch extractor: (clip_id, bytes, sr_hz, dur_ms, codec, transcript)
    -> narrow feature rows.  Per-batch work is vectorized except the audio
    decode+FFT, which is inherently per-row (variable-length binary).

    Deployed as a TASK-based ``map_batches`` (one cached instance per worker
    process, ``_worker_extractor``), not an actor pool: the only per-worker
    state is the tiny deterministic SimHash projection (cached at module
    level in ``audio``), and task-based maps let Ray Data FUSE the stage
    with ``ReadParquet`` — the 100 TB of encoded audio then goes straight
    from the parquet reader into the decoder inside ONE task, never taking
    an object-store hop between operators.  Measured at 80k clips / 32
    CPUs: the unfused read→actor-pool layout left a third of the cluster
    idle (read tasks and the pool's reserved slots fight for cores; 545
    CPU-seconds of work took 29.4 s of wall); the fused task form runs the
    same work at full width."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        # warm the projection cache once per process
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
        # zero-copy per-row views into the Arrow data buffer (to_pylist would
        # memcpy the entire audio payload into Python bytes objects — a full
        # extra pass over the corpus)
        views = audio.binary_views(b_col)
        n_rows = len(b_col)
        fps = np.zeros(n_rows, dtype=np.uint64)
        ok = np.zeros(n_rows, dtype=bool)
        for i in range(n_rows):
            fp, good = self._fingerprint(views[i], codecs[i])
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


_extractor_cache: dict = {}


def _worker_extractor(cfg: DedupConfig) -> ExtractFeatures:
    """One ExtractFeatures per worker process (Ray Data reuses workers, so
    the projection warm-up runs once per process, not once per batch)."""
    key = (cfg.fp_num_bands, cfg.simhash_bits, cfg.seed)
    ex = _extractor_cache.get(key)
    if ex is None:
        ex = _extractor_cache[key] = ExtractFeatures(cfg)
    return ex


def _extract_batch(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    return _worker_extractor(cfg)(batch)


def extract_features(clips_ds, cfg: DedupConfig):
    """clips Dataset -> narrow feature Dataset (the one wide-row pass).

    Task-based on purpose (see ExtractFeatures docstring): tasks fuse with
    the upstream ReadParquet, so the wide ``bytes`` column never crosses the
    object store between read and decode, and read+decode share the whole
    cluster instead of partitioning it between read tasks and a reserved
    actor pool."""
    return clips_ds.map_batches(
        _extract_batch,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.audio_batch_size,
        num_cpus=1,
    )
