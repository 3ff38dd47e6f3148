"""Multimodal (audio) plumbing over the test tables + the flagship dedup
pipeline exposed as driver queries.

The driver's test tables carry no audio, so ``clips_from_documents``
deterministically synthesizes the clip contract
(clip_id, bytes, sr_hz, dur_ms, codec, transcript) from the ``documents``
table — waveform parameters are a pure function of doc_id (same recipe as
synth.py), texts become transcripts.  Near-dup structure in the documents
(planted ~5% near-identical texts) flows straight into the dedup pipeline.

The decode / feature-extract / frame-sample stages are actor pools
(state in ``__init__``, work per batch) — the real Ray-side plumbing for
binary media columns; the codec layer is real for WAV and a marked stub for
FLAC (audio.py docstring).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from who_owns_mass_processing_ray import audio, synth
from who_owns_mass_processing_ray.config import DedupConfig
from who_owns_mass_processing_ray.functions import hashing as hx

MM_CFG = DedupConfig()  # num_parts auto = 4x CPUs


def clips_from_documents(sf_dir: str):
    """documents -> Dataset matching the clip input contract.  Pure function
    of (doc_id, text): safe on any worker, any order, any batch size."""
    from who_owns_mass_processing_ray.io_utils import read_parquet_clean

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])

    def synthesize(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        texts = t["text"].to_pylist()
        blobs, srs, durs, codecs, cids = [], [], [], [], []
        for i, txt in zip(ids, texts):
            params = synth._base_params(1234, int(i) % 997)
            sr, codec = params["sr_hz"], params["codec"]
            dur = 400 + (int(i) % 7) * 150
            pcm = synth._waveform(params, sr, dur)
            blobs.append(audio.encode(pcm, sr, codec))
            srs.append(sr)
            durs.append(dur)
            codecs.append(codec)
            cids.append(f"clip-{int(i):012d}")
        return pa.table({
            "clip_id": pa.array(cids, pa.string()),
            "bytes": pa.array(blobs, pa.large_binary()),
            "sr_hz": pa.array(srs, pa.int32()),
            "dur_ms": pa.array(durs, pa.int32()),
            "codec": pa.array(codecs, pa.string()),
            "transcript": pa.array(texts, pa.string()),
        }, schema=synth.CLIP_SCHEMA)

    return docs.map_batches(synthesize, batch_format="pyarrow", batch_size=128)


def q_dedup_clusters(sf_dir: str):
    """The flagship end-to-end dedup DAG (pipelines/dedup.py) over clips
    synthesized from documents — clusters table sorted by cluster_id."""
    from who_owns_mass_processing_ray.pipelines import dedup

    clips = clips_from_documents(sf_dir)
    res = dedup.dedup_pipeline_from_dataset(clips, MM_CFG)
    return res["clusters"].sort("cluster_id")


def q_dedup_assignment(sf_dir: str):
    """clip -> cluster assignment + incident edge kinds (edge_kinds as a
    comma-joined string for stable driver hashing)."""
    from who_owns_mass_processing_ray.pipelines import dedup

    clips = clips_from_documents(sf_dir)
    res = dedup.dedup_pipeline_from_dataset(clips, MM_CFG)

    def flat(t: pa.Table) -> pa.Table:
        kinds = t["edge_kinds"].to_pylist()
        return pa.table({
            "clip_id": t["clip_id"],
            "cluster_id": t["cluster_id"],
            "edge_kinds": pa.array([",".join(k) for k in kinds], pa.string()),
        })

    return res["clip_to_cluster"].map_batches(flat, batch_format="pyarrow") \
        .sort("clip_id")


class DecodeStats:
    """Actor-pool decode stage: codec dispatch table in __init__, per-batch
    decode + invariant check (decode must reproduce ≥30 dB SNR vs a fresh
    reference encode — the BASELINE per-row invariant)."""

    def __init__(self):
        self.codecs = audio.CODECS

    def __call__(self, t: pa.Table) -> pa.Table:
        bufs = audio.binary_views(t["bytes"])
        codecs = t["codec"].to_pylist()
        srs = t["sr_hz"].to_numpy()
        n = len(t)
        ok = np.zeros(n, dtype=bool)
        n_samples = np.zeros(n, dtype=np.int64)
        rms = np.zeros(n, dtype=np.float64)
        for i in range(n):
            try:
                pcm, sr = audio.decode(bufs[i], codecs[i])
            except Exception:
                continue
            ok[i] = sr == srs[i]
            n_samples[i] = len(pcm)
            rms[i] = float(np.sqrt(np.mean(pcm ** 2))) if len(pcm) else 0.0
        return pa.table({
            "clip_id": t["clip_id"],
            "decode_ok": pa.array(ok),
            "n_samples": pa.array(n_samples),
            "rms": pa.array(np.round(rms, 4)),
        })


def q_audio_decode_stats(sf_dir: str):
    """Decode every clip in an actor pool; per-clip sample count + RMS."""
    clips = clips_from_documents(sf_dir)
    from who_owns_mass_processing_ray.stages import pool_bounds

    return clips.map_batches(DecodeStats, batch_format="pyarrow",
                             batch_size=64, concurrency=pool_bounds(8),
                             num_cpus=1).sort("clip_id")


class FrameSampler:
    """Actor-pool frame-sample stage (the video-frame-sampling analog for
    audio): fixed 25 ms hop, per-frame energy, emits per-clip frame count +
    mean/max frame energy.  Image/video decode itself would slot in here —
    those libs are absent, so audio stands in as the real, tested media
    path (see module docstring)."""

    FRAME_MS = 25

    def __call__(self, t: pa.Table) -> pa.Table:
        bufs = audio.binary_views(t["bytes"])
        codecs = t["codec"].to_pylist()
        n = len(t)
        n_frames = np.zeros(n, dtype=np.int64)
        mean_e = np.zeros(n, dtype=np.float64)
        max_e = np.zeros(n, dtype=np.float64)
        for i in range(n):
            try:
                pcm, sr = audio.decode(bufs[i], codecs[i])
            except Exception:
                continue
            hop = max(1, int(sr * self.FRAME_MS / 1000))
            k = len(pcm) // hop
            if k == 0:
                continue
            frames = pcm[: k * hop].reshape(k, hop)
            e = (frames.astype(np.float64) ** 2).mean(axis=1)
            n_frames[i] = k
            mean_e[i] = e.mean()
            max_e[i] = e.max()
        return pa.table({
            "clip_id": t["clip_id"],
            "n_frames": pa.array(n_frames),
            "mean_energy": pa.array(np.round(mean_e, 6)),
            "max_energy": pa.array(np.round(max_e, 6)),
        })


def q_audio_frames(sf_dir: str):
    clips = clips_from_documents(sf_dir)
    from who_owns_mass_processing_ray.stages import pool_bounds

    return clips.map_batches(FrameSampler, batch_format="pyarrow",
                             batch_size=64, concurrency=pool_bounds(8),
                             num_cpus=1).sort("clip_id")


def q_image_decode_stub(sf_dir: str):
    """Marked STUB for image decode (no PIL/opencv in this container): the
    Ray-side plumbing — schema, actor signature, batch sizing — is real;
    the decode emits deterministic fake dimensions derived from the binary
    payload instead of real pixels.  Swap ``_fake_decode`` for PIL on a
    cluster with the libs installed."""
    clips = clips_from_documents(sf_dir)

    class ImageDecodeStub:
        def __init__(self):
            self.ready = True  # model/codec load would happen here

        @staticmethod
        def _fake_decode(buf) -> tuple[int, int]:
            h = int.from_bytes(bytes(buf[:8]).ljust(8, b"\0"), "little")
            return 64 + h % 1024, 64 + (h >> 32) % 1024

        def __call__(self, t: pa.Table) -> pa.Table:
            bufs = audio.binary_views(t["bytes"])
            dims = [self._fake_decode(b) for b in bufs]
            return pa.table({
                "clip_id": t["clip_id"],
                "width": pa.array([d[0] for d in dims], pa.int32()),
                "height": pa.array([d[1] for d in dims], pa.int32()),
                "decoded": pa.array([False] * len(bufs)),  # stub marker
            })

    from who_owns_mass_processing_ray.stages import pool_bounds

    return clips.map_batches(ImageDecodeStub, batch_format="pyarrow",
                             batch_size=128,
                             concurrency=pool_bounds(4)).sort("clip_id")


def q_video_frame_sample_stub(sf_dir: str, stride_ms: int = 200,
                              max_frames: int = 8):
    """Marked STUB for video frame sampling (no ffmpeg/opencv in this
    container) — completes the image/audio/video multimodal triad.

    The Ray-side plumbing is real and is the part that matters at 100 TB:
    an actor-pool ``map_batches`` stage with a VARIABLE per-row fan-out
    (each clip explodes into one row per sampled frame — the layout a real
    frame sampler feeds to a vision encoder), frame timestamps derived
    from the REAL ``dur_ms`` metadata at a fixed ``stride_ms`` hop capped
    at ``max_frames`` per clip, and a deterministic fake container parse
    (fps chosen from the payload prefix hash standing in for the codec
    header).  Swap ``_fake_probe`` / the ``decoded=False`` marker for an
    ffmpeg probe + frame decode on a cluster with the libs installed;
    batch_size stays small because real decoded frames are wide.

    Output: (clip_id, frame_idx, ts_ms, fps, decoded) one row per sampled
    frame, sorted by (clip_id, frame_idx)."""
    clips = clips_from_documents(sf_dir)

    class VideoFrameSampleStub:
        FPS_TABLE = (24, 25, 30)  # fake codec-header parse picks one

        @classmethod
        def _fake_probe(cls, buf) -> int:
            h = int.from_bytes(bytes(buf[:8]).ljust(8, b"\0"), "little")
            return cls.FPS_TABLE[h % len(cls.FPS_TABLE)]

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({
                    "clip_id": pa.array([], pa.string()),
                    "frame_idx": pa.array([], pa.int64()),
                    "ts_ms": pa.array([], pa.int64()),
                    "fps": pa.array([], pa.int32()),
                    "decoded": pa.array([], pa.bool_()),
                })
            bufs = audio.binary_views(t["bytes"])
            fps = np.array([self._fake_probe(b) for b in bufs],
                           dtype=np.int32)
            dur = t["dur_ms"].to_numpy().astype(np.int64)
            # sampled frame count per clip: one frame every stride_ms,
            # capped; ceil(dur/stride) keeps every sample ts strictly
            # inside the clip (ts == dur would be one frame past the end
            # for clips whose duration is a stride multiple)
            k = np.minimum((dur - 1) // stride_ms + 1,
                           max_frames).astype(np.int64)
            total = int(k.sum())
            row_of = np.repeat(np.arange(len(k)), k)
            # within-clip sample index 0..k_i-1
            starts = np.concatenate(([0], np.cumsum(k)[:-1]))
            local = np.arange(total) - np.repeat(starts, k)
            ts_ms = local * stride_ms
            frame_idx = (ts_ms * fps[row_of]) // 1000
            ids = t["clip_id"].to_numpy(zero_copy_only=False)[row_of]
            return pa.table({
                "clip_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(frame_idx.astype(np.int64)),
                "ts_ms": pa.array(ts_ms.astype(np.int64)),
                "fps": pa.array(fps[row_of]),
                "decoded": pa.array(np.zeros(total, bool)),  # stub marker
            })

    from who_owns_mass_processing_ray.stages import pool_bounds

    return clips.map_batches(VideoFrameSampleStub, batch_format="pyarrow",
                             batch_size=64,
                             concurrency=pool_bounds(4)) \
        .sort(["clip_id", "frame_idx"])


def images_from_documents(sf_dir: str):
    """documents -> Dataset of REAL encoded images (doc_id, bytes, codec):
    deterministic BMP payloads synthesized per doc_id (image.synth_image),
    the image analog of ``clips_from_documents``.  Pure function of
    doc_id — safe on any worker, any order, any batch size."""
    from who_owns_mass_processing_ray import image as img
    from who_owns_mass_processing_ray.io_utils import read_parquet_clean

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id"])

    def synthesize(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        blobs = [img.encode_bmp(img.synth_image(int(i))) for i in ids]
        return pa.table({
            "clip_id": pa.array([f"img-{int(i):012d}" for i in ids],
                                pa.string()),
            "bytes": pa.array(blobs, pa.large_binary()),
            "codec": pa.array(["bmp"] * len(ids), pa.string()),
        })

    return docs.map_batches(synthesize, batch_format="pyarrow")


def q_image_decode(sf_dir: str):
    """REAL image decode (no stub): 24-bit BMP payloads decoded to pixels
    in an actor-pool stage — complete pure-numpy reader/writer in
    ``image.py``, the image analog of the RIFF/WAV audio path.  Zero-copy
    payload views (audio.binary_views); per-image stats are recomputable
    from the deterministic synth, so the query is independently
    pytest-oracled (tests/test_media_codecs.py).  JPEG/PNG dispatch via
    ``image.decode_any`` activates when PIL is installed (skip-marked
    cross-check tests are already in place).

    Output: (clip_id, width, height, mean_luma, decoded) sorted by
    clip_id; ≙ the reference's typed format-specific loaders
    (/root/reference/R/loaders.R) applied to an image wire format."""
    from who_owns_mass_processing_ray import image as img

    class ImageDecode:
        def __init__(self):
            self.decode = img.decode_any   # codec dispatch held per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            views = audio.binary_views(t["bytes"])
            codecs = t["codec"].to_pylist()
            n = len(t)
            wcol = np.zeros(n, np.int32)
            hcol = np.zeros(n, np.int32)
            luma = np.zeros(n, np.float64)
            ok = np.zeros(n, bool)
            for i in range(n):
                try:
                    rgb = self.decode(views[i], codecs[i])
                except Exception:
                    continue
                ok[i] = True
                hcol[i], wcol[i] = rgb.shape[0], rgb.shape[1]
                f = rgb.astype(np.float64)
                luma[i] = (0.299 * f[..., 0] + 0.587 * f[..., 1]
                           + 0.114 * f[..., 2]).mean()
            return pa.table({
                "clip_id": t["clip_id"],
                "width": pa.array(wcol),
                "height": pa.array(hcol),
                "mean_luma": pa.array(np.round(luma, 4)),
                "decoded": pa.array(ok),
            })

    from who_owns_mass_processing_ray.stages import pool_bounds

    return images_from_documents(sf_dir).map_batches(
        ImageDecode, batch_format="pyarrow", batch_size=128,
        concurrency=pool_bounds(8), num_cpus=1).sort("clip_id")


def videos_from_documents(sf_dir: str):
    """documents -> Dataset of REAL encoded videos (doc_id, bytes, codec):
    deterministic YUV4MPEG2 clips per doc_id (video.synth_video)."""
    from who_owns_mass_processing_ray import video as vid
    from who_owns_mass_processing_ray.io_utils import read_parquet_clean

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id"])

    def synthesize(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        blobs = []
        for i in ids:
            frames, fps = vid.synth_video(int(i))
            blobs.append(vid.encode_y4m(frames, fps))
        return pa.table({
            "clip_id": pa.array([f"vid-{int(i):012d}" for i in ids],
                                pa.string()),
            "bytes": pa.array(blobs, pa.large_binary()),
            "codec": pa.array(["y4m"] * len(ids), pa.string()),
        })

    return docs.map_batches(synthesize, batch_format="pyarrow")


def q_video_frame_sample(sf_dir: str, stride: int = 2):
    """REAL video frame sampling (no stub): parse the YUV4MPEG2 container
    header (geometry + fps), then decode ONLY every ``stride``-th frame —
    the seek-don't-materialize access pattern a frame sampler feeds to a
    vision encoder.  Complete pure-numpy y4m reader/writer in
    ``video.py``; compressed codecs (h264) route to pyav/ffmpeg when
    installed (skip-marked hooks in tests/test_media_codecs.py).

    Output: (clip_id, frame_idx, ts_ms, fps, mean_luma, decoded) one row
    per SAMPLED frame, sorted by (clip_id, frame_idx); batch_size stays
    small because decoded frames are wide."""
    from who_owns_mass_processing_ray import video as vid

    class FrameSample:
        def __call__(self, t: pa.Table) -> pa.Table:
            views = audio.binary_views(t["bytes"])
            ids = t["clip_id"].to_pylist()
            out_id, out_fi, out_ts, out_fps, out_luma = [], [], [], [], []
            for cid, buf in zip(ids, views):
                hdr = vid.parse_y4m_header(buf)
                fsize = 3 * hdr["w"] * hdr["h"]
                total = (len(buf) - hdr["data_off"]) // (6 + fsize)
                want = list(range(0, total, stride))
                frames, hdr = vid.decode_y4m(buf, frame_indices=want)
                fps = hdr["fps_num"] / hdr["fps_den"]
                for j, fi in enumerate(want):
                    out_id.append(cid)
                    out_fi.append(fi)
                    out_ts.append(int(fi * 1000 / fps))
                    out_fps.append(hdr["fps_num"])
                    # C444: plane 0 is luma
                    out_luma.append(
                        round(float(frames[j, :, :, 0].mean()), 4))
            return pa.table({
                "clip_id": pa.array(out_id, pa.string()),
                "frame_idx": pa.array(out_fi, pa.int64()),
                "ts_ms": pa.array(out_ts, pa.int64()),
                "fps": pa.array(out_fps, pa.int32()),
                "mean_luma": pa.array(out_luma, pa.float64()),
                "decoded": pa.array([True] * len(out_id)),
            })

    from who_owns_mass_processing_ray.stages import pool_bounds

    return videos_from_documents(sf_dir).map_batches(
        FrameSample, batch_format="pyarrow", batch_size=64,
        concurrency=pool_bounds(8), num_cpus=1) \
        .sort(["clip_id", "frame_idx"])


class _FeatVecStage:
    """Actor pool: decode once, emit the SimHash fingerprint AND the
    weighted log-delta spectral feature vector it was hashed from — the
    quantity whose pairwise angle the fingerprint's hamming distance
    estimates (audio.audio_fingerprint)."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg

    def __call__(self, t: pa.Table) -> pa.Table:
        cfg = self.cfg
        bufs = audio.binary_views(t["bytes"])
        codecs = t["codec"].to_pylist()
        n = len(t)
        dim = cfg.fp_num_bands - 1
        feats = np.zeros((n, dim), dtype=np.float64)
        fps = np.zeros(n, dtype=np.uint64)
        ok = np.zeros(n, dtype=bool)
        from who_owns_mass_processing_ray import audio as au

        for i in range(n):
            try:
                pcm, sr = au.decode(bufs[i], codecs[i])
            except Exception:
                continue
            e = au.band_energies(pcm, sr, cfg.fp_num_bands,
                                 cfg.fp_fmin_hz, cfg.fp_fmax_hz)
            v = np.diff(np.log(e + 1e-12)) * np.sqrt(
                np.maximum(e[1:], e[:-1]))
            feats[i] = v
            fps[i] = au.simhash_from_features(v, cfg.simhash_bits, cfg.seed)
            ok[i] = True
        return pa.table({
            "clip_id": t["clip_id"],
            "fp": pa.array(fps),
            "decode_ok": pa.array(ok),
            "feat": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1)), dim),
        })


def q_simhash_calibration(sf_dir: str):
    """Audio SimHash estimator calibration — the audio analog of
    ``minhash_calibration``: over the distinct multi-index candidate set,
    per fingerprint hamming distance d, compare the SimHash angle estimate
    ``cos(pi*d/bits)`` (random-hyperplane LSH: P(bit differs) = angle/pi)
    against the TRUE cosine of the underlying weighted spectral log-delta
    feature vectors.  The evidence that ``hamming_thresh`` = 6 actually
    corresponds to the near-identical-audio cosine regime on THIS corpus's
    signal statistics.

    Scale shape: candidates from the same pigeonhole-complete band
    machinery as the flagship's audio edge stage; feature vectors ride the
    take-based pair expansion (never an Acero join — list columns), are
    reduced to one narrow numeric (d, true_cos) row per pair, made
    globally distinct by the coarse-partition edge dedup, and binned by d
    (≤ bits+1 groups) — the final shuffle is constant-size.

    Output: (hamming, n_pairs, est_cos, mean_true_cos, mae) sorted by
    hamming.  Rows-only (SimHash not SQL-expressible); brute recompute in
    tests/test_independent_oracles.py."""
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray import audio as au
    from who_owns_mass_processing_ray.stages import audio_fp
    from who_owns_mass_processing_ray.stages import pairs as pr
    from who_owns_mass_processing_ray.stages import pool_bounds

    cfg = MM_CFG
    bits = cfg.simhash_bits
    clips = clips_from_documents(sf_dir)
    feats = clips.map_batches(_FeatVecStage, fn_constructor_args=(cfg,),
                              batch_format="pyarrow", batch_size=64,
                              concurrency=pool_bounds(8), num_cpus=1)

    bands = cfg.hamming_thresh + 1

    def band_rows(t: pa.Table) -> pa.Table:
        base = audio_fp._band_rows(t, cfg)   # bucket_key, clip_id, fp
        ok_idx = np.flatnonzero(t["decode_ok"].to_numpy(zero_copy_only=False))
        feat = t["feat"]
        if isinstance(feat, pa.ChunkedArray):
            feat = feat.combine_chunks()
        rep = pa.array(np.repeat(ok_idx, bands))
        return base.append_column("feat", feat.take(rep))

    rows = feats.map_batches(band_rows, batch_format="pyarrow")
    cand = pr.pairs_from_bucket_rows(rows, "bucket_key", "clip_id",
                                     cfg.max_bucket, cfg.num_parts or 16,
                                     payload_cols=["fp", "feat"])

    def compute(t: pa.Table) -> pa.Table:
        lf = t["left_fp"].to_numpy().astype(np.int64).view(np.uint64)
        rf = t["right_fp"].to_numpy().astype(np.int64).view(np.uint64)
        d = (au.hamming64(lf, rf) if len(lf)
             else np.zeros(0, np.int64)).astype(np.int64)

        def mat(col) -> np.ndarray:
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if len(col) == 0:          # reshape(0, -1) is a ValueError
                return np.zeros((0, cfg.fp_num_bands - 1))
            return col.flatten().to_numpy().reshape(len(col), -1)

        la, ra = mat(t["left_feat"]), mat(t["right_feat"])
        den = np.linalg.norm(la, axis=1) * np.linalg.norm(ra, axis=1)
        cos = (la * ra).sum(axis=1) / np.maximum(den, 1e-30)
        return pa.table({
            "left_id": t["left_id"],
            "right_id": t["right_id"],
            "d": pa.array(d),
            "true_cos": pa.array(cos),
            "dropped": t["dropped"],
        })

    narrow = cand.map_batches(compute, batch_format="pyarrow",
                              batch_size=cfg.batch_size)
    distinct = pr.distinct_edges(narrow, "cal",
                                 extra_num_cols=["d", "true_cos"])

    def partial(t: pa.Table) -> pa.Table:
        d = t["d"].to_numpy()
        tc = t["true_cos"].to_numpy()
        est = np.cos(np.pi * d / bits)
        n = np.bincount(d, minlength=bits + 1)
        sc = np.bincount(d, weights=tc, minlength=bits + 1)
        sa = np.bincount(d, weights=np.abs(est - tc), minlength=bits + 1)
        nz = np.flatnonzero(n)
        return pa.table({
            "hamming": pa.array(nz.astype(np.int64)),
            "n": pa.array(n[nz].astype(np.int64)),
            "sc": pa.array(sc[nz]),
            "sa": pa.array(sa[nz]),
        })

    agg = distinct.map_batches(partial, batch_format="pyarrow") \
        .groupby("hamming").aggregate(
            Sum("n", alias_name="n_pairs"), Sum("sc", alias_name="sc"),
            Sum("sa", alias_name="sa"))

    def finish(t: pa.Table) -> pa.Table:
        d = t["hamming"].to_numpy()
        n = t["n_pairs"].to_numpy().astype(np.float64)
        return pa.table({
            "hamming": t["hamming"],
            "n_pairs": t["n_pairs"],
            "est_cos": pa.array(np.round(np.cos(np.pi * d / bits), 4)),
            "mean_true_cos": pa.array(
                np.round(t["sc"].to_numpy() / n, 4)),
            "mae": pa.array(np.round(t["sa"].to_numpy() / n, 4)),
        })

    return agg.map_batches(finish, batch_format="pyarrow").sort("hamming")


class LoudnessStats:
    """Actor-pool loudness stage (the audio-normalization preprocessing a
    training corpus runs before feature extraction): per clip RMS dBFS,
    peak, the gain (dB) that would bring it to the -20 dBFS target, and
    the clipped-sample fraction.  Codec dispatch table is actor state;
    per-clip work is numpy over the decoded PCM (the decode itself is
    per-row because rows are variable-length binary — the loop body is
    all C/numpy)."""

    TARGET_DBFS = -20.0
    CLIP_LEVEL = 0.999

    def __init__(self):
        self.codecs = audio.CODECS

    def __call__(self, t: pa.Table) -> pa.Table:
        bufs = audio.binary_views(t["bytes"])
        codecs = t["codec"].to_pylist()
        n = len(t)
        dbfs = np.full(n, -120.0)
        peak = np.zeros(n, dtype=np.float64)
        gain_db = np.zeros(n, dtype=np.float64)
        clip_frac = np.zeros(n, dtype=np.float64)
        for i in range(n):
            try:
                pcm, _sr = audio.decode(bufs[i], codecs[i])
            except Exception:
                continue
            if not len(pcm):
                continue
            r = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2)))
            dbfs[i] = 20.0 * np.log10(r) if r > 0 else -120.0
            peak[i] = float(np.abs(pcm).max())
            gain_db[i] = self.TARGET_DBFS - dbfs[i]
            clip_frac[i] = float(np.mean(np.abs(pcm) >= self.CLIP_LEVEL))
        return pa.table({
            "clip_id": t["clip_id"],
            "rms_dbfs": pa.array(np.round(dbfs, 4)),
            "peak": pa.array(np.round(peak, 4)),
            "gain_to_target_db": pa.array(np.round(gain_db, 4)),
            "clip_frac": pa.array(np.round(clip_frac, 6)),
        })


def q_audio_loudness(sf_dir: str):
    clips = clips_from_documents(sf_dir)
    from who_owns_mass_processing_ray.stages import pool_bounds

    return clips.map_batches(LoudnessStats, batch_format="pyarrow",
                             batch_size=64, concurrency=pool_bounds(8),
                             num_cpus=1).sort("clip_id")


class SilenceTrim:
    """Actor-pool silence-trim stage: per clip, the leading / trailing
    span below ``REL_THRESH`` x peak (sample-exact, via the first/last
    index where |x| exceeds the threshold) and the remaining active
    duration — the corpus-hygiene trim that runs before fingerprinting so
    padded silence can't dominate SimHash features."""

    REL_THRESH = 0.05

    def __init__(self):
        self.codecs = audio.CODECS

    def __call__(self, t: pa.Table) -> pa.Table:
        bufs = audio.binary_views(t["bytes"])
        codecs = t["codec"].to_pylist()
        n = len(t)
        lead_ms = np.zeros(n, dtype=np.int64)
        trail_ms = np.zeros(n, dtype=np.int64)
        active_ms = np.zeros(n, dtype=np.int64)
        for i in range(n):
            try:
                pcm, sr = audio.decode(bufs[i], codecs[i])
            except Exception:
                continue
            if not len(pcm) or sr <= 0:
                continue
            thresh = self.REL_THRESH * float(np.abs(pcm).max())
            act = np.flatnonzero(np.abs(pcm) > thresh)
            if len(act) == 0:
                lead_ms[i] = int(len(pcm) * 1000 / sr)
                continue
            lead_ms[i] = int(act[0] * 1000 / sr)
            trail_ms[i] = int((len(pcm) - 1 - act[-1]) * 1000 / sr)
            active_ms[i] = int((act[-1] - act[0] + 1) * 1000 / sr)
        return pa.table({
            "clip_id": t["clip_id"],
            "lead_silence_ms": pa.array(lead_ms),
            "trail_silence_ms": pa.array(trail_ms),
            "active_ms": pa.array(active_ms),
        })


def q_audio_silence(sf_dir: str):
    clips = clips_from_documents(sf_dir)
    from who_owns_mass_processing_ray.stages import pool_bounds

    return clips.map_batches(SilenceTrim, batch_format="pyarrow",
                             batch_size=64, concurrency=pool_bounds(8),
                             num_cpus=1).sort("clip_id")


class Resampler:
    """Actor-pool resample stage (the sample-rate normalization a training
    corpus runs so every clip hits the model at one rate): decoded PCM →
    linear-interpolation resample to ``TARGET_SR``.  Codec table is actor
    state; the per-clip body is ``np.interp`` over vectorized sample grids
    (rows are variable-length binary, so the loop is per-row but its body
    is all C)."""

    TARGET_SR = 8000

    def __init__(self):
        self.codecs = audio.CODECS

    def __call__(self, t: pa.Table) -> pa.Table:
        bufs = audio.binary_views(t["bytes"])
        codecs = t["codec"].to_pylist()
        n = len(t)
        n_out = np.zeros(n, dtype=np.int64)
        rms_out = np.zeros(n, dtype=np.float64)
        dur_out_ms = np.zeros(n, dtype=np.int64)
        for i in range(n):
            try:
                pcm, sr = audio.decode(bufs[i], codecs[i])
            except Exception:
                continue
            if not len(pcm) or sr <= 0:
                continue
            m = int(round(len(pcm) * self.TARGET_SR / sr))
            if m <= 0:
                continue
            src_t = np.arange(len(pcm), dtype=np.float64) / sr
            dst_t = np.arange(m, dtype=np.float64) / self.TARGET_SR
            y = np.interp(dst_t, src_t, pcm.astype(np.float64))
            n_out[i] = m
            rms_out[i] = float(np.sqrt(np.mean(y ** 2)))
            dur_out_ms[i] = int(m * 1000 / self.TARGET_SR)
        return pa.table({
            "clip_id": t["clip_id"],
            "sr_out": pa.array(np.full(n, self.TARGET_SR, np.int32)),
            "n_out": pa.array(n_out),
            "dur_out_ms": pa.array(dur_out_ms),
            "rms_out": pa.array(np.round(rms_out, 4)),
        })


def q_audio_resample(sf_dir: str):
    clips = clips_from_documents(sf_dir)
    from who_owns_mass_processing_ray.stages import pool_bounds

    return clips.map_batches(Resampler, batch_format="pyarrow",
                             batch_size=64, concurrency=pool_bounds(8),
                             num_cpus=1).sort("clip_id")


class SpectralStats:
    """Actor-pool spectral-feature stage: per clip zero-crossing rate and
    spectral centroid (rfft magnitude-weighted mean frequency) — the cheap
    audio features a corpus pipeline extracts for quality filtering and
    bucketing before any model runs."""

    def __init__(self):
        self.codecs = audio.CODECS

    def __call__(self, t: pa.Table) -> pa.Table:
        bufs = audio.binary_views(t["bytes"])
        codecs = t["codec"].to_pylist()
        n = len(t)
        zcr = np.zeros(n, dtype=np.float64)
        centroid_hz = np.zeros(n, dtype=np.float64)
        for i in range(n):
            try:
                pcm, sr = audio.decode(bufs[i], codecs[i])
            except Exception:
                continue
            if len(pcm) < 2 or sr <= 0:
                continue
            x = pcm.astype(np.float64)
            zcr[i] = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
            mag = np.abs(np.fft.rfft(x))
            tot = mag.sum()
            if tot > 0:
                freqs = np.fft.rfftfreq(len(x), 1.0 / sr)
                centroid_hz[i] = float((freqs * mag).sum() / tot)
        return pa.table({
            "clip_id": t["clip_id"],
            "zcr": pa.array(np.round(zcr, 6)),
            "centroid_hz": pa.array(np.round(centroid_hz, 2)),
        })


def q_audio_spectral(sf_dir: str):
    clips = clips_from_documents(sf_dir)
    from who_owns_mass_processing_ray.stages import pool_bounds

    return clips.map_batches(SpectralStats, batch_format="pyarrow",
                             batch_size=64, concurrency=pool_bounds(8),
                             num_cpus=1).sort("clip_id")


# ---------------------------------------------------------------------------
# Shift-invariant audio near-dup: MinHash+LSH over FRAME-TOKEN shingles.
#
# The whole-clip SimHash fingerprint (stages/audio_fp.py) is a global
# spectral summary — robust to re-encoding/resampling but NOT to trims or
# prepended silence (the audio analog of a document edit).  This operator is
# the audio analog of transcript MinHash: decode -> resample to a fixed
# 8 kHz grid -> 32 ms hop frames -> per-frame tokens (sign of the log-energy
# derivative with a deadband: exactly invariant to constant gain, local to
# each frame pair so a k-hop trim only SHIFTS the token sequence) ->
# k-token shingles -> MinHash signatures -> LSH band buckets -> candidate
# pairs -> signature-agreement verify.  Candidate generation reuses the
# flagship's salted bucket-pair machinery (stages/pairs.py) unchanged —
# bucketed, capped, never all-pairs — so the 100 TB shape is identical to
# the text path.  (Capability beyond the reference: its dedup is text-only;
# ≙ dedupe_cosine re-expressed in the audio domain, SURVEY §2.7.)
# ---------------------------------------------------------------------------

AMH_SR = 8000          # resample grid (Hz)
AMH_FRAME = 512        # 64 ms frame
AMH_HOP = 256          # 32 ms hop -> trims in hop multiples shift tokens
AMH_K = 8              # shingle width in tokens
AMH_PERM = 64
AMH_BANDS = 16
AMH_ROWS = 4
AMH_SEED = 2024
AMH_DEADBAND = 0.1     # |dlog energy| below this -> 'flat' token
AMH_PEAK_GUARD = 2     # bins masked around peak 1 before peak-2 argmax
AMH_THRESH = 0.5       # signature-agreement keep threshold
AMH_MAX_BUCKET = 64


def _frame_tokens(pcm: np.ndarray, sr: int) -> np.ndarray:
    """Ternary energy-contour tokens of one clip (uint64).  Gain-invariant
    (log-energy differences), hop-aligned (trims by multiples of AMH_HOP
    shift the sequence without rewriting it)."""
    if len(pcm) == 0:
        return np.empty(0, np.uint64)
    if sr != AMH_SR:
        n_out = max(int(round(len(pcm) * AMH_SR / sr)), 1)
        t_in = np.arange(len(pcm)) / sr
        t_out = np.arange(n_out) / AMH_SR
        pcm = np.interp(t_out, t_in, pcm)
    if len(pcm) < AMH_FRAME:
        return np.empty(0, np.uint64)
    x = pcm.astype(np.float64)
    starts = np.arange(0, len(pcm) - AMH_FRAME + 1, AMH_HOP)
    # energy contour: sign of the log-energy derivative (gain-invariant;
    # near-constant on stationary signals, hence paired with ZCR below)
    csum = np.concatenate(([0.0], np.cumsum(x ** 2)))
    energy = csum[starts + AMH_FRAME] - csum[starts]
    d = np.diff(np.log(energy + 1e-12))
    e_tok = np.where(d > AMH_DEADBAND, 2,
                     np.where(d < -AMH_DEADBAND, 0, 1))
    # per-frame TOP-2 spectral peaks (one batched rfft over the frame
    # matrix, two argmax passes with the first peak's neighborhood masked)
    # — gain-invariant, stable under hop-aligned trims, and discriminative
    # even for stationary clips (whose token sequence is near-constant, so
    # the token itself must carry the spectral identity; a single dominant
    # bin measured ~1.9k birthday collisions on 500 synthetic tone clips,
    # the ordered bin pair measured 0)
    frames = np.lib.stride_tricks.as_strided(
        x, shape=(len(starts), AMH_FRAME),
        strides=(x.strides[0] * AMH_HOP, x.strides[0]))
    spec = np.abs(np.fft.rfft(frames, axis=1))
    n_bins = spec.shape[1]
    b1 = spec.argmax(axis=1)
    cols = np.arange(n_bins)[None, :]
    masked = np.where(np.abs(cols - b1[:, None]) <= AMH_PEAK_GUARD,
                      0.0, spec)
    b2 = masked.argmax(axis=1)
    tok = (b1.astype(np.uint64) * np.uint64(n_bins) + b2.astype(np.uint64))
    return (tok[:-1] * np.uint64(3) + e_tok.astype(np.uint64))


class AudioShingleSig:
    """Actor-pool stage: clip -> MinHash signature (binary blob) + LSH band
    hashes (fixed-size list, bit-cast int64).  Codec dispatch table held per
    actor; per-clip decode is the unavoidable Python loop over opaque codec
    blobs (same shape as DecodeStats), everything after it is numpy."""

    def __init__(self):
        self.codecs = audio.CODECS

    def __call__(self, t: pa.Table) -> pa.Table:
        from who_owns_mass_processing_ray.functions import hashing as hx

        bufs = audio.binary_views(t["bytes"])
        codecs = t["codec"].to_pylist()
        toks = []
        for i in range(len(t)):
            try:
                pcm, sr = audio.decode(bufs[i], codecs[i])
                toks.append(_frame_tokens(pcm, sr))
            except Exception:
                toks.append(np.empty(0, np.uint64))
        offsets = np.zeros(len(t) + 1, np.int64)
        np.cumsum([len(x) for x in toks], out=offsets[1:])
        flat = (np.concatenate(toks) if offsets[-1]
                else np.empty(0, np.uint64))
        vals, offs = hx.token_shingle_hashes(flat, offsets, AMH_K,
                                             seed=AMH_SEED)
        sig = hx.minhash_signatures(vals, offs, AMH_PERM, AMH_SEED)
        bands = hx.band_hashes(sig, AMH_BANDS, AMH_ROWS, seed=AMH_SEED)
        n_tok = np.diff(offs)
        # binary column built straight from the signature matrix's buffer —
        # no per-row Python slicing
        nb = AMH_PERM * 8
        sig_arr = pa.Array.from_buffers(
            pa.binary(), len(t),
            [None,
             pa.py_buffer((np.arange(len(t) + 1, dtype=np.int32) * nb)
                          .tobytes()),
             pa.py_buffer(sig.tobytes(order="C"))])
        return pa.table({
            "clip_id": t["clip_id"],
            "sig": sig_arr,
            "bands": pa.FixedSizeListArray.from_arrays(
                pa.array(bands.reshape(-1).view(np.int64)), AMH_BANDS),
            "n_shingles": pa.array(n_tok.astype(np.int64)),
        })


def _sig_matrix(col) -> np.ndarray:
    """(n, AMH_PERM) uint64 view of a binary signature column — one
    frombuffer + gather, no per-row Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty((0, AMH_PERM), np.uint64)
    off_t = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    vo = np.frombuffer(col.buffers()[1], off_t)[
        col.offset: col.offset + len(col) + 1]
    va = np.frombuffer(col.buffers()[2], np.uint64)
    idx = (vo[:-1].astype(np.int64) // 8)[:, None] + np.arange(AMH_PERM)
    return va[idx]


def q_audio_shingle_near_dup(sf_dir: str):
    """Verified shift/gain-invariant audio near-dup pairs
    (left_id, right_id, est_jacc)."""
    return audio_shingle_pairs_ds(clips_from_documents(sf_dir))


def audio_shingle_pairs_ds(clips):
    """The q_audio_shingle_near_dup body over ANY clip-contract Dataset —
    reusable on filtered/derived corpora (the audio curation funnel)."""
    from who_owns_mass_processing_ray.stages import pairs as pr
    from who_owns_mass_processing_ray.stages import pool_bounds

    feats = clips.map_batches(
        AudioShingleSig, batch_format="pyarrow", batch_size=64,
        concurrency=pool_bounds(8), num_cpus=1,
    ).materialize()          # narrow (id + 512 B sig + 128 B bands) per clip

    def explode(t: pa.Table) -> pa.Table:
        keep = np.flatnonzero(t["n_shingles"].to_numpy() > 0)
        bands_col = t["bands"]
        if isinstance(bands_col, pa.ChunkedArray):
            bands_col = bands_col.combine_chunks()
        keys = bands_col.flatten().to_numpy().view(np.uint64) \
            .reshape(-1, AMH_BANDS)[keep].reshape(-1)
        ids_arr = t["clip_id"]
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        return pa.table({
            "bucket_key": pa.array(keys),
            "clip_id": ids_arr.take(pa.array(np.repeat(keep, AMH_BANDS))),
        })

    from who_owns_mass_processing_ray.pipelines.dedup import _auto_parts

    band_rows = feats.map_batches(explode, batch_format="pyarrow")
    cand = pr.pairs_from_bucket_rows(band_rows, "bucket_key", "clip_id",
                                     AMH_MAX_BUCKET,
                                     MM_CFG.num_parts or _auto_parts())
    cand = pr.attach_pair_features(cand, feats, "sig")

    def verify(batch: pa.Table) -> pa.Table:
        ls = _sig_matrix(batch["left_sig"])
        rs = _sig_matrix(batch["right_sig"])
        est = (ls == rs).mean(axis=1) if len(ls) else np.empty(0)
        keep = est >= AMH_THRESH
        out = batch.filter(pa.array(keep))
        return pa.table({
            "left_id": out["left_id"],
            "right_id": out["right_id"],
            "dropped": out["dropped"],
            "est_jacc": pa.array(np.round(est[keep], 4)),
        })

    verified = cand.map_batches(verify, batch_format="pyarrow",
                                batch_size=4096)
    edges = pr.distinct_edges(verified, "audio_shingle",
                              extra_num_cols=["est_jacc"])
    # dropped (hot-bucket cap losses) stays visible in the output
    return edges.map_batches(
        lambda t: t.select(["left_id", "right_id", "est_jacc", "dropped"]),
        batch_format="pyarrow").sort(["left_id", "right_id"])


class GainNormalize:
    """Actor-pool loudness normalization: scale each clip so its peak hits
    ``target_peak`` (never amplifying silence past the gain cap) — the
    level-normalization pass an audio corpus runs before feature extraction.
    Reports the applied gain and post-normalization stats."""

    TARGET_PEAK = 0.9
    GAIN_CAP = 100.0

    def __init__(self):
        self.codecs = audio.CODECS

    def __call__(self, t: pa.Table) -> pa.Table:
        bufs = audio.binary_views(t["bytes"])
        codecs = t["codec"].to_pylist()
        n = len(t)
        peak_before = np.zeros(n)
        gain = np.ones(n)
        rms_after = np.zeros(n)
        for i in range(n):
            try:
                pcm, _sr = audio.decode(bufs[i], codecs[i])
            except Exception:
                continue
            if len(pcm) == 0:
                continue
            p = float(np.max(np.abs(pcm)))
            peak_before[i] = p
            g = min(self.TARGET_PEAK / p, self.GAIN_CAP) if p > 0 else 1.0
            gain[i] = g
            rms_after[i] = float(np.sqrt(np.mean((pcm * g) ** 2)))
        return pa.table({
            "clip_id": t["clip_id"],
            "peak_before": pa.array(np.round(peak_before, 4)),
            "gain_db": pa.array(np.round(20.0 * np.log10(gain), 2)),
            "rms_after": pa.array(np.round(rms_after, 4)),
        })


def q_audio_gain_normalize(sf_dir: str):
    clips = clips_from_documents(sf_dir)
    from who_owns_mass_processing_ray.stages import pool_bounds

    return clips.map_batches(GainNormalize, batch_format="pyarrow",
                             batch_size=64, concurrency=pool_bounds(8),
                             num_cpus=1).sort("clip_id")


# ---------------------------------------------------------------------------
# Storage-tier dedup: content-defined chunking over the raw audio bytes.
# Identical byte runs chunk identically regardless of offset (gear-hash CDC,
# functions/cdc.py), so clips sharing payload segments dedup at chunk
# granularity — the tier BELOW record-level dedup in a lakehouse ingest.
# Scale shape = para_dedup's: chunk rows hash-partitioned by CHUNK CONTENT
# (keep-first winner per chunk hash), then re-partitioned by CLIP for the
# per-clip rollup; only (hash, ids, lengths) cross the shuffles — the chunk
# BYTES never leave the chunking stage.
# ---------------------------------------------------------------------------

CDC_PARTS = 32


class CdcChunker:
    """Actor-pool chunking stage: one vectorized gear pass over the batch's
    concatenated byte buffer (functions/cdc.py) — no per-clip Python."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from who_owns_mass_processing_ray.functions import cdc

        col = t["bytes"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        off_t = np.int64 if pa.types.is_large_binary(col.type) else np.int32
        vo = np.frombuffer(col.buffers()[1], off_t)[
            col.offset: col.offset + len(col) + 1].astype(np.int64)
        va = np.frombuffer(col.buffers()[2], np.uint8)
        data = va[vo[0]: vo[-1]]
        blob_idx, starts, lens, hashes = cdc.cdc_chunks(data, vo - vo[0])
        # chunk_idx within clip
        n_chunks = np.bincount(blob_idx, minlength=len(t))
        first = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
        chunk_idx = np.arange(len(blob_idx)) - first[blob_idx]
        ids_arr = t["clip_id"]
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        return pa.table({
            "clip_id": ids_arr.take(pa.array(blob_idx)),
            "chunk_idx": pa.array(chunk_idx.astype(np.int64)),
            "chunk_hash": pa.array(hashes.view(np.int64)),  # bit-cast
            "n_bytes": pa.array(lens.astype(np.int64)),
            "part": pa.array((hashes % np.uint64(CDC_PARTS))
                             .astype(np.int32)),
        })


def q_cdc_chunk_dedup(sf_dir: str):
    """Per-clip CDC dedup stats: clip_id, n_chunks, n_unique (chunks whose
    globally-FIRST occurrence is in this clip), bytes_total, bytes_unique.
    Winner order = lexicographic (clip_id, chunk_idx) — deterministic
    across parallelism."""
    from who_owns_mass_processing_ray.stages import pool_bounds

    clips = clips_from_documents(sf_dir)
    chunks = clips.map_batches(CdcChunker, batch_format="pyarrow",
                               batch_size=64, concurrency=pool_bounds(8),
                               num_cpus=1)

    def flag(g: pa.Table) -> pa.Table:
        h = g["chunk_hash"].to_numpy()
        ids_arr = g["clip_id"]
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        # string ids: dictionary-encode for a sortable integer key whose
        # order matches the string order (clip ids are zero-padded)
        enc = pc.dictionary_encode(ids_arr)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        rank = np.argsort(np.argsort(
            np.asarray(enc.dictionary.to_pylist(), dtype=object)))
        id_key = rank[enc.indices.to_numpy()]
        idx = g["chunk_idx"].to_numpy()
        order = np.lexsort((idx, id_key, h))
        first = np.concatenate(([True], h[order][1:] != h[order][:-1]))
        keep = np.zeros(len(g), dtype=bool)
        keep[order] = first
        return pa.table({
            "clip_id": ids_arr,
            "n_bytes": g["n_bytes"],
            "keep": pa.array(keep),
        })

    def rollup(g: pa.Table) -> pa.Table:
        g = g.sort_by([("clip_id", "ascending")])
        ids_arr = g["clip_id"]
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        enc = pc.dictionary_encode(ids_arr)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy()
        nb = g["n_bytes"].to_numpy()
        keep = g["keep"].to_numpy(zero_copy_only=False)
        k = len(enc.dictionary)
        return pa.table({
            "clip_id": enc.dictionary,
            "n_chunks": pa.array(np.bincount(codes, minlength=k)
                                 .astype(np.int64)),
            "n_unique": pa.array(np.bincount(codes, weights=keep,
                                             minlength=k).astype(np.int64)),
            "bytes_total": pa.array(np.bincount(codes, weights=nb,
                                                minlength=k)
                                    .astype(np.int64)),
            "bytes_unique": pa.array(np.bincount(codes, weights=nb * keep,
                                                 minlength=k)
                                     .astype(np.int64)),
        })

    flagged = chunks.groupby("part").map_groups(
        lambda g: flag(g.drop_columns(["part"])), batch_format="pyarrow")
    withpart = flagged.map_batches(
        lambda t: t.append_column(
            "cpart",
            pa.array((hx.hash_strings(t["clip_id"]) % CDC_PARTS)
                     .astype(np.int32))),
        batch_format="pyarrow")
    out = withpart.groupby("cpart").map_groups(
        lambda g: rollup(g.drop_columns(["cpart"])), batch_format="pyarrow")
    return out.sort("clip_id")


# ---------------------------------------------------------------------------
# 1→N audio segmentation: fixed overlapping windows per clip (the audio
# analog of q_chunk_text — what turns filtered clips into training windows).
# Row-splitter capability ≙ std_separate_and_label's 1→N explode
# (/root/reference/R/standardizers.R:2054-2101) on the media axis.
# ---------------------------------------------------------------------------

SEG_MS = 200
SEG_HOP_MS = 100


class SegmentRows:
    """Actor-pool segmenting stage: decode once, emit one row per window
    with per-window RMS/peak (cumulative-sum window math — no per-window
    Python; the clip loop is the codec boundary, as in DecodeStats)."""

    def __init__(self):
        self.codecs = audio.CODECS

    def __call__(self, t: pa.Table) -> pa.Table:
        bufs = audio.binary_views(t["bytes"])
        codecs = t["codec"].to_pylist()
        ids, segi, st_ms, dur_ms, rms, peak = [], [], [], [], [], []
        cid_col = t["clip_id"].to_pylist()
        for i in range(len(t)):
            try:
                pcm, sr = audio.decode(bufs[i], codecs[i])
            except Exception:
                continue
            w = int(sr * SEG_MS / 1000)
            hop = int(sr * SEG_HOP_MS / 1000)
            if len(pcm) < w or w == 0:
                continue
            x = pcm.astype(np.float64)
            starts = np.arange(0, len(x) - w + 1, hop)
            c2 = np.concatenate(([0.0], np.cumsum(x ** 2)))
            seg_rms = np.sqrt((c2[starts + w] - c2[starts]) / w)
            # per-window peak via a strided |x| view and one max reduction
            frames = np.lib.stride_tricks.as_strided(
                x, shape=(len(starts), w),
                strides=(x.strides[0] * hop, x.strides[0]))
            seg_peak = np.abs(frames).max(axis=1)
            k = len(starts)
            ids.append(np.repeat(np.array([cid_col[i]], object), k))
            segi.append(np.arange(k, dtype=np.int64))
            st_ms.append((starts * 1000 // sr).astype(np.int64))
            dur_ms.append(np.full(k, SEG_MS, np.int64))
            rms.append(np.round(seg_rms, 4))
            peak.append(np.round(seg_peak, 4))
        if not ids:
            return pa.table({
                "clip_id": pa.array([], pa.string()),
                "seg_idx": pa.array([], pa.int64()),
                "start_ms": pa.array([], pa.int64()),
                "dur_ms": pa.array([], pa.int64()),
                "rms": pa.array([], pa.float64()),
                "peak": pa.array([], pa.float64()),
            })
        return pa.table({
            "clip_id": pa.array(np.concatenate(ids), pa.string()),
            "seg_idx": pa.array(np.concatenate(segi)),
            "start_ms": pa.array(np.concatenate(st_ms)),
            "dur_ms": pa.array(np.concatenate(dur_ms)),
            "rms": pa.array(np.concatenate(rms)),
            "peak": pa.array(np.concatenate(peak)),
        })


def q_audio_segment_rows(sf_dir: str):
    clips = clips_from_documents(sf_dir)
    from who_owns_mass_processing_ray.stages import pool_bounds

    return clips.map_batches(SegmentRows, batch_format="pyarrow",
                             batch_size=64, concurrency=pool_bounds(8),
                             num_cpus=1).sort(["clip_id", "seg_idx"])


# ---------------------------------------------------------------------------
# Speech-rate (chars-per-second) curation filter — the standard ASR-corpus
# hygiene op (clips whose transcript length is implausible for their audio
# duration are mis-aligned or mis-transcribed and get dropped before
# training).  Pure metadata math over the clip contract (dur_ms +
# transcript), so it runs BEFORE any decode — the cheap-first ordering a
# 100 TB pipeline needs.  Integer arithmetic throughout (chars/sec x 1000
# as int64) so the result is bit-stable across engines.
# ---------------------------------------------------------------------------

CPS_MILLI_SLOW = 100_000     # < 100 chars/sec  -> "slow" (likely truncated audio)
CPS_MILLI_FAST = 1_000_000   # > 1000 chars/sec -> "fast" (likely wrong clip)


def q_speech_rate(sf_dir: str):
    """clip_id, transcript length, chars-per-second x1000, and the
    slow/ok/fast curation flag — vectorized Arrow kernels, no decode."""
    clips = clips_from_documents(sf_dir)

    def rate(t: pa.Table) -> pa.Table:
        n_chars = pc.cast(
            pc.fill_null(pc.utf8_length(t["transcript"]), 0), pa.int64())
        dur = pc.cast(t["dur_ms"], pa.int64())
        cps_milli = pc.divide(pc.multiply(n_chars, 1_000_000), dur)
        flag = pc.if_else(
            pc.less(cps_milli, CPS_MILLI_SLOW), "slow",
            pc.if_else(pc.greater(cps_milli, CPS_MILLI_FAST), "fast", "ok"))
        return pa.table({
            "clip_id": t["clip_id"],
            "n_chars": n_chars,
            "cps_milli": cps_milli,
            "rate_flag": flag,
        })

    return clips.map_batches(rate, batch_format="pyarrow").sort("clip_id")


def speech_rate_sql() -> str:
    # clips are a pure function of documents (clips_from_documents):
    # dur_ms = 400 + (doc_id % 7) * 150, transcript = text.
    return f"""
        SELECT 'clip-' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS clip_id,
               COALESCE(length(text), 0) AS n_chars,
               (COALESCE(length(text), 0) * 1000000)
                   // (400 + (doc_id % 7) * 150) AS cps_milli,
               CASE WHEN (COALESCE(length(text), 0) * 1000000)
                         // (400 + (doc_id % 7) * 150) < {CPS_MILLI_SLOW}
                    THEN 'slow'
                    WHEN (COALESCE(length(text), 0) * 1000000)
                         // (400 + (doc_id % 7) * 150) > {CPS_MILLI_FAST}
                    THEN 'fast'
                    ELSE 'ok' END AS rate_flag
        FROM documents
        ORDER BY clip_id
    """


# ---------------------------------------------------------------------------
# Flagship run report — the one-row operational summary every dedup run
# ships with (≙ the reference's end-of-run summary tables,
# /root/reference/R/deduplicaters.R:663-682, reduced to corpus metrics):
# cluster/dup counts, removable-duplicate volume, and per-kind edge totals.
# Pure partial aggregation over the clusters table — one tiny reduce.
# ---------------------------------------------------------------------------


def q_dedup_report(sf_dir: str):
    """One-row corpus dedup summary from the flagship clusters table."""
    from who_owns_mass_processing_ray.pipelines import dedup

    clips = clips_from_documents(sf_dir)
    res = dedup.dedup_pipeline_from_dataset(clips, MM_CFG)

    def partial(t: pa.Table) -> pa.Table:
        size = t["size"].to_numpy()
        dup = size > 1
        return pa.table({
            "n_clusters": pa.array([len(t)], pa.int64()),
            "n_clips": pa.array([int(size.sum())], pa.int64()),
            "n_dup_clusters": pa.array([int(dup.sum())], pa.int64()),
            "n_removable_clips": pa.array([int((size[dup] - 1).sum())],
                                          pa.int64()),
            "dur_ms_total": pa.array([int(t["total_dur_ms"].to_numpy().sum())],
                                     pa.int64()),
            "exact_edges": pa.array([int(t["exact_ct"].to_numpy().sum())],
                                    pa.int64()),
            "near_edges": pa.array([int(t["near_ct"].to_numpy().sum())],
                                   pa.int64()),
            "containment_edges": pa.array(
                [int(t["containment_ct"].to_numpy().sum())], pa.int64()),
            "audio_edges": pa.array([int(t["audio_ct"].to_numpy().sum())],
                                    pa.int64()),
        })

    parts = res["clusters"].map_batches(partial, batch_format="pyarrow")
    import pandas as pd

    df = parts.to_pandas().sum(axis=0).to_frame().T
    df["dup_ratio_pct"] = round(
        100.0 * df["n_removable_clips"].iloc[0]
        / max(int(df["n_clips"].iloc[0]), 1), 2)
    return df


# ---------------------------------------------------------------------------
# Incremental (delta) AUDIO dedup vs a corpus snapshot — the audio-axis
# analog of textops.q_delta_dedup (and of the reference's route-reunite
# idiom that matches new entities only against the already-standardized
# side, /root/reference/R/deduplicaters.R:56-64): incoming clips are
# screened against an existing fingerprint snapshot without ever
# broadcasting the snapshot.  Blocking is COMPLETE at the verify radius
# (multi-index parts, pigeonhole — same scheme as stages/audio_fp.py), and
# the probe/anchor asymmetry means hot fingerprint buckets carry many
# snapshot anchors but only the bucket's incoming probes expand.
# ---------------------------------------------------------------------------

AUDIO_DELTA_MOD = 5     # clip i is snapshot iff i % MOD == 0 (same split
                        # convention as textops.DELTA_SNAPSHOT_MOD)


def q_audio_delta_dedup(sf_dir: str, mod: int = AUDIO_DELTA_MOD):
    """Per INCOMING clip: how many snapshot clips its spectral fingerprint
    matches within the verify radius, the lexicographic-min matching
    snapshot id, and the ``survives`` ingestion flag (no snapshot match).

    -> (clip_id, n_snapshot_matches, min_snapshot_match, survives), sorted.
    """
    from who_owns_mass_processing_ray.pipelines.dedup import _auto_parts
    from who_owns_mass_processing_ray.stages import features as fm
    from who_owns_mass_processing_ray.stages import joins, pairs as pr

    cfg = MM_CFG
    num_parts = cfg.num_parts or _auto_parts()
    clips = clips_from_documents(sf_dir)
    feats = fm.extract_features(clips, cfg).materialize()   # narrow

    # multi-index part widths — identical scheme to stages/audio_fp.py
    n_bands = cfg.hamming_thresh + 1
    base = cfg.simhash_bits // n_bands
    widths = [base + (1 if i < cfg.simhash_bits % n_bands else 0)
              for i in range(n_bands)]

    def _clip_num(ids: pa.Array) -> np.ndarray:
        return pc.cast(pc.struct_field(
            pc.extract_regex(ids, r"-(?P<n>\d+)$"), "n"),
            pa.int64()).to_numpy(zero_copy_only=False)

    def band_rows(t: pa.Table) -> pa.Table:
        fp = t["fp"].to_numpy()
        ok = t["decode_ok"].to_numpy(zero_copy_only=False)
        ids_arr = t["clip_id"]
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        ok_idx = np.flatnonzero(ok)
        fp = fp[ok_idx]
        snap = _clip_num(ids_arr)[ok_idx] % mod == 0
        keys = []
        shift = 0
        for b, w in enumerate(widths):
            mask = np.uint64((1 << w) - 1)
            sl = (fp >> np.uint64(shift)) & mask
            shift += w
            keys.append(hx.splitmix64(sl ^ np.uint64(0xDE17A + b * 0x9E37)))
        keys = (np.stack(keys, axis=1).reshape(-1) if len(fp)
                else np.empty(0, np.uint64))
        rep = pa.array(np.repeat(ok_idx, n_bands))
        part = (keys % np.uint64(num_parts)).astype(np.int32)
        return pa.table({
            "bucket_key": pa.array(keys),
            "clip_id": ids_arr.take(rep),
            "fp": pa.array(np.repeat(fp, n_bands).view(np.int64)),
            "is_snap": pa.array(np.repeat(snap, n_bands)),
            "part": pa.array(part),
        })

    _MATCH_SCHEMA = pa.schema([("left_id", pa.string()),
                               ("right_id", pa.string()),
                               ("dropped", pa.int64())])

    def expand_verify(g: pa.Table) -> pa.Table:
        """probe(incoming) x anchor(snapshot) within each bucket, verified
        with exact hamming — the containment probe/anchor expansion shape,
        vectorized across the whole partition."""
        if g.num_rows == 0:
            return _MATCH_SCHEMA.empty_table()
        tbl = g.sort_by([("bucket_key", "ascending"),
                         ("is_snap", "ascending"),      # probes first
                         ("clip_id", "ascending")])
        keys = tbl["bucket_key"].to_numpy()
        snapm = tbl["is_snap"].to_numpy(zero_copy_only=False)
        change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(keys)]))
        sizes = ends - starts
        n_anchor = np.add.reduceat(snapm.astype(np.int64), starts)
        n_probe = sizes - n_anchor
        a_keep = np.minimum(n_anchor, cfg.max_bucket)
        dropped = int((n_anchor - a_keep).sum())
        P = n_probe * a_keep
        tot = int(P.sum())
        if tot == 0:
            return _MATCH_SCHEMA.empty_table()
        cum = np.zeros(len(P) + 1, dtype=np.int64)
        np.cumsum(P, out=cum[1:])
        seg = np.repeat(np.arange(len(P)), P)
        r = np.arange(tot, dtype=np.int64) - cum[seg]
        probe_idx = starts[seg] + r // a_keep[seg]
        anchor_idx = starts[seg] + n_probe[seg] + r % a_keep[seg]
        fps = tbl["fp"].to_numpy().astype(np.int64).view(np.uint64)
        okm = audio.hamming64(fps[probe_idx],
                              fps[anchor_idx]) <= cfg.hamming_thresh
        probe_idx, anchor_idx = probe_idx[okm], anchor_idx[okm]
        ids_arr = tbl["clip_id"]
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        # in-partition dedup on (probe, anchor)
        codes = pc.dictionary_encode(ids_arr).indices.to_numpy() \
            .astype(np.int64)
        pcode, acode = codes[probe_idx], codes[anchor_idx]
        order = np.lexsort((acode, pcode))
        ps, as_ = pcode[order], acode[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (ps[1:] != ps[:-1]) | (as_[1:] != as_[:-1])
        keep = order[first]
        return pa.table({
            "left_id": ids_arr.take(pa.array(probe_idx[keep])),
            "right_id": ids_arr.take(pa.array(anchor_idx[keep])),
            "dropped": pa.array(np.full(len(keep), dropped, np.int64)),
        }, schema=_MATCH_SCHEMA)

    matches = feats.map_batches(band_rows, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: expand_verify(g.drop_columns(["part"])),
            batch_format="pyarrow")
    # global pair distinct (a pair can meet in several band parts)
    matches = pr.distinct_edges(matches, "audio_delta", num_parts=num_parts)

    _AGG_SCHEMA = pa.schema([("clip_id", pa.string()),
                             ("n_snapshot_matches", pa.int64()),
                             ("min_snapshot_match", pa.string())])

    def per_probe(g: pa.Table) -> pa.Table:
        """count + min(right) per left — sorted segments, no per-key agg."""
        if g.num_rows == 0:
            return _AGG_SCHEMA.empty_table()
        t = g.sort_by([("left_id", "ascending"), ("right_id", "ascending")])
        l = t["left_id"]
        if isinstance(l, pa.ChunkedArray):
            l = l.combine_chunks()
        lc = pc.dictionary_encode(l).indices.to_numpy().astype(np.int64)
        starts = np.flatnonzero(np.r_[True, lc[1:] != lc[:-1]])
        sizes = np.diff(np.concatenate((starts, [len(lc)])))
        take = pa.array(starts)
        return pa.table({
            "clip_id": l.take(take),
            "n_snapshot_matches": pa.array(sizes.astype(np.int64)),
            "min_snapshot_match": t["right_id"].take(take),
        }, schema=_AGG_SCHEMA)

    def probe_part(t: pa.Table) -> pa.Table:
        part = (hx.hash_strings(t["left_id"])
                % np.uint64(num_parts)).astype(np.int32)
        return t.append_column("part2", pa.array(part))

    per_incoming = matches.map_batches(probe_part, batch_format="pyarrow") \
        .groupby("part2").map_groups(
            lambda g: per_probe(g.drop_columns(["part2"])),
            batch_format="pyarrow")

    def incoming_only(t: pa.Table) -> pa.Table:
        ids_arr = t["clip_id"]
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        inc = _clip_num(ids_arr) % mod != 0
        return pa.table({"clip_id": ids_arr.filter(pa.array(inc))})

    incoming = feats.map_batches(incoming_only, batch_format="pyarrow")
    out = joins.attach_columns(
        incoming, per_incoming, "clip_id", "clip_id",
        {"n_snapshot_matches": "n_snapshot_matches",
         "min_snapshot_match": "min_snapshot_match"},
        max(8, num_parts // 4), how="left")

    def finish(t: pa.Table) -> pa.Table:
        n = pc.fill_null(t["n_snapshot_matches"].cast(pa.int64()), 0)
        return pa.table({
            "clip_id": t["clip_id"],
            "n_snapshot_matches": n,
            "min_snapshot_match": t["min_snapshot_match"],
            "survives": pc.equal(n, 0),
        })

    return out.map_batches(finish, batch_format="pyarrow").sort("clip_id")


# ---------------------------------------------------------------------------
# Audio snippet search — "which corpus clip contains this short excerpt?",
# the retrieval form of containment dedup in the AUDIO domain (the text
# side is stages/containment.py; ≙ dedupe C/O containment re-expressed over
# waveforms).  Clips become hop-aligned frame-token sequences
# (_frame_tokens — gain-invariant, trim-by-hop-multiples shifts tokens
# without rewriting them), every clip publishes its R-token run hashes as
# ANCHORS, each query snippet publishes its own runs as PROBES, and one
# hash-partition shuffle of the narrow (run_hash, id) stream joins them —
# PCM never shuffles.  A snippet cut on hop boundaries is an exact token
# subsequence of its parent, so the parent matches EVERY distinct probe
# run; unrelated clips share runs only by noise-token coincidence.
# ---------------------------------------------------------------------------

SNIP_RUN = 4          # run width in frame tokens
SNIP_PARENT_MOD = 4   # doc_id % 4 == 0 and longest-duration class -> parent
SNIP_MAX_ANCHORS = 128  # per-run-hash anchor cap (counted, not silent)
SNIP_PARTS = 64       # run-hash shuffle partitions


def _snippet_slice(n_tok: int) -> tuple[int, int]:
    """Deterministic middle-half token window of a parent clip."""
    m = n_tok // 2
    lo = n_tok // 4
    return lo, lo + m


def q_audio_snippet_search(sf_dir: str, min_runs: int = 1):
    """-> (query_id, clip_id, n_matching_runs): corpus clips ranked per
    query snippet by the number of DISTINCT shared R-token run hashes
    (pairs sharing < ``min_runs`` suppressed; default 1 because a heavily
    periodic clip can collapse to a single distinct run hash).  Parents are the longest
    duration class with doc_id % SNIP_PARENT_MOD == 0; each contributes one
    middle-half snippet.  Rows-only for the driver (codec decode is not
    SQL-expressible); exact recompute + parent-is-max gates live in
    tests/test_independent_oracles.py."""
    import ray

    from ray.data.aggregate import Sum

    clips = clips_from_documents(sf_dir)

    class RunHashes:
        """Actor pool: decode -> frame tokens -> run hashes; parent clips
        additionally emit their snippet's runs under a query id."""

        def __init__(self):
            self.codecs = audio.CODECS

        def __call__(self, t: pa.Table) -> pa.Table:
            bufs = audio.binary_views(t["bytes"])
            codecs = t["codec"].to_pylist()
            cids = t["clip_id"].to_pylist()
            durs = t["dur_ms"].to_numpy()
            out_h, out_id, out_q = [], [], []
            for i in range(len(t)):
                try:
                    pcm, sr = audio.decode(bufs[i], codecs[i])
                    toks = _frame_tokens(pcm, sr)
                except Exception:
                    continue
                if not len(toks):
                    continue
                offs = np.array([0, len(toks)], np.int64)
                vals, _ = hx.token_shingle_hashes(toks, offs, SNIP_RUN,
                                                  seed=4242)
                hu = np.unique(vals)
                out_h.append(hu)
                out_id.append(np.full(len(hu), i, np.int64))
                out_q.append(np.zeros(len(hu), bool))
                doc_i = int(cids[i].split("-")[1])
                if doc_i % SNIP_PARENT_MOD == 0 and int(durs[i]) >= 1300:
                    lo, hi = _snippet_slice(len(toks))
                    st = toks[lo:hi]
                    if len(st) >= SNIP_RUN:
                        offs = np.array([0, len(st)], np.int64)
                        qv, _ = hx.token_shingle_hashes(st, offs, SNIP_RUN,
                                                        seed=4242)
                        qh = np.unique(qv)
                        out_h.append(qh)
                        out_id.append(np.full(len(qh), i, np.int64))
                        out_q.append(np.ones(len(qh), bool))
            if not out_h:
                return pa.table({"h": pa.array([], pa.int64()),
                                 "rid": pa.array([], pa.string()),
                                 "is_q": pa.array([], pa.bool_()),
                                 "part": pa.array([], pa.int32())})
            h = np.concatenate(out_h)
            row = np.concatenate(out_id)
            isq = np.concatenate(out_q)
            ids_arr = t["clip_id"]
            if isinstance(ids_arr, pa.ChunkedArray):
                ids_arr = ids_arr.combine_chunks()
            base = ids_arr.take(pa.array(row)).cast(pa.string())
            rid = pc.if_else(
                pa.array(isq),
                pc.binary_join_element_wise(pa.array(["snip"] * len(row)),
                                            pc.utf8_slice_codeunits(
                                                base, 4, 9999), ""),
                base)
            return pa.table({
                "h": pa.array(h.view(np.int64)),
                "rid": rid,
                "is_q": pa.array(isq),
                "part": pa.array((h % np.uint64(SNIP_PARTS))
                                 .astype(np.int32)),
            })

    def match(g: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.string()),
                          "clip_id": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "dropped": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        isq = g["is_q"].to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy()
        rid = g["rid"]
        if isinstance(rid, pa.ChunkedArray):
            rid = rid.combine_chunks()
        a_idx = np.flatnonzero(~isq)
        q_idx = np.flatnonzero(isq)
        if not len(a_idx) or not len(q_idx):
            return empty
        ah = h[a_idx]
        order = np.argsort(ah, kind="stable")
        ah = ah[order]
        a_idx = a_idx[order]
        lo = np.searchsorted(ah, h[q_idx], side="left")
        hi = np.searchsorted(ah, h[q_idx], side="right")
        cnt = hi - lo
        dropped = int(np.maximum(cnt - SNIP_MAX_ANCHORS, 0).sum())
        cnt = np.minimum(cnt, SNIP_MAX_ANCHORS)
        total = int(cnt.sum())
        if total == 0:
            return empty
        rep_q = np.repeat(np.arange(len(q_idx)), cnt)
        offs = np.concatenate(([0], np.cumsum(cnt)))[:-1]
        pos = np.arange(total) - np.repeat(offs, cnt) + np.repeat(lo, cnt)
        qi = q_idx[rep_q]
        ai = a_idx[pos]
        return pa.table({
            "query_id": rid.take(pa.array(qi)),
            "clip_id": rid.take(pa.array(ai)),
            "n": pa.array(np.ones(total, np.int64)),
            "dropped": pa.array(np.full(total, dropped, np.int64)),
        })

    from who_owns_mass_processing_ray.stages import pool_bounds

    rows = clips.map_batches(RunHashes, batch_format="pyarrow",
                             concurrency=pool_bounds(4))
    matched = rows.groupby("part").map_groups(
        lambda g: match(g.drop_columns(["part"])), batch_format="pyarrow")
    from ray.data.aggregate import Max, Sum

    out = matched.groupby(["query_id", "clip_id"]).aggregate(
        Sum("n", alias_name="n_matching_runs"),
        Max("dropped", alias_name="dropped"))
    return out.filter(expr=f"n_matching_runs >= {min_runs}") \
        .sort(["query_id", "clip_id"])


# ---------------------------------------------------------------------------
# Transcode — the bytes->bytes media normalization pass (every training
# corpus re-encodes its audio to one rate/codec before feature extraction).
# Unlike the stats-only Resampler, this stage PRODUCES the new binary
# column: decode -> linear resample to 8 kHz -> pcm_s16le re-encode, with a
# 64-bit content hash + size accounting in the manifest.  The per-row SNR
# invariant (>= 30 dB vs a direct resample of the source) is gated in
# tests/test_independent_oracles.py.
# ---------------------------------------------------------------------------

TRANSCODE_SR = 8000


class Transcoder:
    """Actor-pool bytes->bytes stage.  Emits the transcoded blob plus a
    manifest row (sizes, content hash); callers selecting only the manifest
    columns never ship the blobs further."""

    def __init__(self):
        self.codecs = audio.CODECS

    @staticmethod
    def transcode_one(buf: bytes, codec: str) -> bytes | None:
        try:
            pcm, sr = audio.decode(buf, codec)
        except Exception:
            return None
        if not len(pcm) or sr <= 0:
            return None
        if sr != TRANSCODE_SR:
            m = max(int(round(len(pcm) * TRANSCODE_SR / sr)), 1)
            src_t = np.arange(len(pcm), dtype=np.float64) / sr
            dst_t = np.arange(m, dtype=np.float64) / TRANSCODE_SR
            pcm = np.interp(dst_t, src_t, pcm.astype(np.float64))
        return audio.encode(pcm.astype(np.float32), TRANSCODE_SR, "pcm_s16le")

    def __call__(self, t: pa.Table) -> pa.Table:
        import hashlib

        bufs = audio.binary_views(t["bytes"])
        codecs = t["codec"].to_pylist()
        n = len(t)
        out_bytes: list[bytes] = []
        n_in = np.zeros(n, np.int64)
        n_out = np.zeros(n, np.int64)
        h = np.zeros(n, np.int64)
        ok = np.zeros(n, bool)
        for i in range(n):
            n_in[i] = len(bufs[i])
            blob = self.transcode_one(bufs[i], codecs[i])
            if blob is None:
                out_bytes.append(b"")
                continue
            ok[i] = True
            out_bytes.append(blob)
            n_out[i] = len(blob)
            h[i] = int.from_bytes(
                hashlib.blake2b(blob, digest_size=8).digest(),
                "little", signed=True)
        return pa.table({
            "clip_id": t["clip_id"],
            "bytes_out": pa.array(out_bytes, pa.large_binary()),
            "transcode_ok": pa.array(ok),
            "n_bytes_in": pa.array(n_in),
            "n_bytes_out": pa.array(n_out),
            "content_hash": pa.array(h),
            "sr_out": pa.array(np.full(n, TRANSCODE_SR, np.int32)),
        })


def q_audio_transcode(sf_dir: str):
    """-> per-clip transcode manifest (blob stays internal: the driver
    result carries sizes + the 64-bit content hash, which pins the binary
    output byte-for-byte without shipping it)."""
    clips = clips_from_documents(sf_dir)
    from who_owns_mass_processing_ray.stages import pool_bounds

    out = clips.map_batches(Transcoder, batch_format="pyarrow",
                            batch_size=64, concurrency=pool_bounds(8),
                            num_cpus=1)
    return out.select_columns(["clip_id", "transcode_ok", "n_bytes_in",
                               "n_bytes_out", "content_hash", "sr_out"]) \
        .sort("clip_id")


# ---------------------------------------------------------------------------
# Pitch (f0) estimation — normalized-autocorrelation peak per clip: the
# speech/music separator and voice-clone-dup blocking key a speech-corpus
# pipeline extracts alongside loudness/spectral stats.  Same actor-pool
# shape as SpectralStats: decode state per actor, per-clip DSP inside the
# pool, only the narrow (clip_id, f0, voiced) rows leave the stage.
# ---------------------------------------------------------------------------

class PitchStats:
    """Per clip: f0_hz from the max of the normalized autocorrelation over
    the 50-400 Hz lag band, plus the peak's correlation as a voicing score
    (0 when the clip is too short for a full period at 50 Hz)."""

    F_LO = 50.0
    F_HI = 400.0

    def __init__(self):
        self.codecs = audio.CODECS

    def __call__(self, t: pa.Table) -> pa.Table:
        bufs = audio.binary_views(t["bytes"])
        codecs = t["codec"].to_pylist()
        n = len(t)
        f0 = np.zeros(n, dtype=np.float64)
        voiced = np.zeros(n, dtype=np.float64)
        for i in range(n):
            try:
                pcm, sr = audio.decode(bufs[i], codecs[i])
            except Exception:
                continue
            lag_max = int(sr / self.F_LO)
            lag_min = max(int(sr / self.F_HI), 1)
            if sr <= 0 or len(pcm) <= lag_max or lag_min >= lag_max:
                continue
            x = pcm.astype(np.float64)
            x = x - x.mean()
            e = float(np.dot(x, x))
            if e <= 0:
                continue
            # one FFT-sized autocorrelation instead of a lag loop
            nfft = 1 << int(np.ceil(np.log2(len(x) + lag_max)))
            spec = np.fft.rfft(x, nfft)
            ac = np.fft.irfft(spec * np.conj(spec), nfft)[:lag_max + 1]
            band = ac[lag_min:lag_max + 1] / e
            k = int(np.argmax(band))
            f0[i] = sr / float(lag_min + k)
            voiced[i] = float(band[k])
        return pa.table({
            "clip_id": t["clip_id"],
            "f0_hz": pa.array(np.round(f0, 2)),
            "voicing": pa.array(np.round(voiced, 4)),
        })


def q_audio_pitch(sf_dir: str):
    """-> (clip_id, f0_hz, voicing) per clip; rows-only (DSP over binary
    payloads — the pytest oracle recomputes per row from a direct decode)."""
    clips = clips_from_documents(sf_dir)
    from who_owns_mass_processing_ray.stages import pool_bounds

    return clips.map_batches(PitchStats, batch_format="pyarrow",
                             batch_size=64, concurrency=pool_bounds(8),
                             num_cpus=1).sort("clip_id")


# ---------------------------------------------------------------------------
# Audio QC gates — clipping fraction and frame-energy SNR estimate: the two
# intake filters a speech-corpus pipeline runs before spending decode/ASR
# compute on damaged clips.  Same actor-pool shape as SpectralStats.
# ---------------------------------------------------------------------------

class AudioQC:
    """Per clip: fraction of samples at >= 99.9% full scale (clipping), DC
    offset, and an SNR estimate from frame energies (10th-percentile frame
    = noise floor vs 90th-percentile frame = signal, in dB, 32 ms frames)."""

    CLIP_LEVEL = 0.999
    FRAME_MS = 32

    def __init__(self):
        self.codecs = audio.CODECS

    def __call__(self, t: pa.Table) -> pa.Table:
        bufs = audio.binary_views(t["bytes"])
        codecs = t["codec"].to_pylist()
        n = len(t)
        clip_frac = np.zeros(n, dtype=np.float64)
        dc_offset = np.zeros(n, dtype=np.float64)
        snr_db = np.zeros(n, dtype=np.float64)
        for i in range(n):
            try:
                pcm, sr = audio.decode(bufs[i], codecs[i])
            except Exception:
                continue
            if len(pcm) == 0 or sr <= 0:
                continue
            x = pcm.astype(np.float64)
            peak = np.abs(x).max()
            if peak > 0:
                clip_frac[i] = float(
                    np.mean(np.abs(x) >= self.CLIP_LEVEL * peak))
            dc_offset[i] = float(x.mean())
            flen = max(int(sr * self.FRAME_MS / 1000), 1)
            nf = len(x) // flen
            if nf >= 2:
                e = (x[:nf * flen].reshape(nf, flen) ** 2).mean(axis=1)
                e = np.sort(e)
                lo = e[int(0.1 * (nf - 1))]
                hi = e[int(0.9 * (nf - 1))]
                snr_db[i] = float(10.0 * np.log10(
                    max(hi, 1e-12) / max(lo, 1e-12)))
        return pa.table({
            "clip_id": t["clip_id"],
            "clip_frac": pa.array(np.round(clip_frac, 6)),
            "dc_offset": pa.array(np.round(dc_offset, 6)),
            "snr_db": pa.array(np.round(snr_db, 2)),
        })


def q_audio_qc(sf_dir: str):
    """-> (clip_id, clip_frac, dc_offset, snr_db) per clip; rows-only (DSP
    over binary payloads — pytest recomputes per row from a direct decode)."""
    clips = clips_from_documents(sf_dir)
    from who_owns_mass_processing_ray.stages import pool_bounds

    return clips.map_batches(AudioQC, batch_format="pyarrow",
                             batch_size=64, concurrency=pool_bounds(8),
                             num_cpus=1).sort("clip_id")


# ---------------------------------------------------------------------------
# Energy-based VAD segmentation — 1→N speech-segment rows per clip (frame
# energy above an adaptive threshold, short gaps bridged): the ASR-prep
# segmenter (q_audio_silence trims EDGES; this finds every internal
# utterance).  Actor-pool decode; only narrow segment rows leave the stage.
# ---------------------------------------------------------------------------

class VadSegments:
    """Per clip: contiguous frames with energy >= ``rel_thresh`` × the
    clip's 90th-percentile frame energy become speech segments; gaps of
    <= ``bridge`` frames are bridged; segments shorter than ``min_frames``
    are dropped.  32 ms frames."""

    FRAME_MS = 32
    REL_THRESH = 0.1
    BRIDGE = 1
    MIN_FRAMES = 2

    def __init__(self):
        self.codecs = audio.CODECS

    def __call__(self, t: pa.Table) -> pa.Table:
        out_id, out_seq, out_s, out_e, out_rms = [], [], [], [], []
        bufs = audio.binary_views(t["bytes"])
        codecs = t["codec"].to_pylist()
        cids = t["clip_id"].to_pylist()
        for cid, buf, codec in zip(cids, bufs, codecs):
            try:
                pcm, sr = audio.decode(buf, codec)
            except Exception:
                continue
            flen = max(int(sr * self.FRAME_MS / 1000), 1)
            nf = len(pcm) // flen
            if nf < 1:
                continue
            x = pcm[:nf * flen].astype(np.float64).reshape(nf, flen)
            e = (x ** 2).mean(axis=1)
            ref = np.sort(e)[int(0.9 * (nf - 1))]
            act = e >= self.REL_THRESH * ref
            # bridge short gaps: a False run of <= BRIDGE flanked by True
            idx = np.flatnonzero(act)
            if len(idx) == 0:
                continue
            gaps = np.flatnonzero(np.diff(idx) > self.BRIDGE + 1)
            starts = np.r_[idx[0], idx[gaps + 1]]
            ends = np.r_[idx[gaps], idx[-1]] + 1        # frame-exclusive
            for seq, (s, en) in enumerate(zip(starts, ends)):
                if en - s < self.MIN_FRAMES:
                    continue
                seg = pcm[s * flen:en * flen].astype(np.float64)
                out_id.append(cid)
                out_seq.append(seq)
                out_s.append(int(s * flen * 1000 / sr))
                out_e.append(int(en * flen * 1000 / sr))
                out_rms.append(round(float(np.sqrt((seg ** 2).mean())), 4))
        return pa.table({
            "clip_id": pa.array(out_id, pa.string()),
            "seg_seq": pa.array(out_seq, pa.int64()),
            "start_ms": pa.array(out_s, pa.int64()),
            "end_ms": pa.array(out_e, pa.int64()),
            "rms": pa.array(out_rms, pa.float64()),
        })


def q_audio_vad_segments(sf_dir: str):
    """-> (clip_id, seg_seq, start_ms, end_ms, rms) speech segments per
    clip; rows-only (DSP over binary payloads — per-row recompute oracle in
    tests/test_independent_oracles.py)."""
    clips = clips_from_documents(sf_dir)
    from who_owns_mass_processing_ray.stages import pool_bounds

    return clips.map_batches(VadSegments, batch_format="pyarrow",
                             batch_size=64, concurrency=pool_bounds(8),
                             num_cpus=1).sort(["clip_id", "seg_seq"])


# ---------------------------------------------------------------------------
# Log-mel band energies — the standard acoustic feature front (mel
# filterbank over the power spectrum): per-clip mean log-mel energy per
# band, the input table a downstream acoustic model consumes.  Filterbank is
# built once per actor in __init__ (keyed by sample rate), DSP per clip
# inside the pool.
# ---------------------------------------------------------------------------

class MelStats:
    """Per clip: mean log10 mel-band energy over 64 ms frames for
    ``n_bands`` triangular mel filters spanning 0..sr/2."""

    N_BANDS = 8
    FRAME_MS = 64

    def __init__(self):
        self.codecs = audio.CODECS
        self._banks: dict = {}

    @staticmethod
    def _mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64)
                                 / 700.0)

    @staticmethod
    def _mel_inv(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64)
                                 / 2595.0) - 1.0)

    def _bank(self, sr: int, nfft: int) -> np.ndarray:
        key = (sr, nfft)
        if key not in self._banks:
            edges = self._mel_inv(np.linspace(
                0.0, float(self._mel(sr / 2.0)), self.N_BANDS + 2))
            freqs = np.fft.rfftfreq(nfft, 1.0 / sr)
            bank = np.zeros((self.N_BANDS, len(freqs)))
            for b in range(self.N_BANDS):
                lo, mid, hi = edges[b], edges[b + 1], edges[b + 2]
                up = (freqs - lo) / max(mid - lo, 1e-9)
                dn = (hi - freqs) / max(hi - mid, 1e-9)
                bank[b] = np.clip(np.minimum(up, dn), 0.0, None)
            self._banks[key] = bank
        return self._banks[key]

    def __call__(self, t: pa.Table) -> pa.Table:
        bufs = audio.binary_views(t["bytes"])
        codecs = t["codec"].to_pylist()
        n = len(t)
        out = np.zeros((n, self.N_BANDS), dtype=np.float64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                pcm, sr = audio.decode(bufs[i], codecs[i])
            except Exception:
                continue
            flen = max(int(sr * self.FRAME_MS / 1000), 16)
            nf = len(pcm) // flen
            if nf < 1 or sr <= 0:
                continue
            x = pcm[:nf * flen].astype(np.float64).reshape(nf, flen)
            spec = np.abs(np.fft.rfft(x, axis=1)) ** 2
            bank = self._bank(sr, flen)
            mel = spec @ bank.T                  # (frames, bands)
            out[i] = np.log10(np.maximum(mel.mean(axis=0), 1e-12))
            ok[i] = True
        cols = {"clip_id": t["clip_id"]}
        for b in range(self.N_BANDS):
            cols[f"mel{b}"] = pa.array(np.round(out[:, b], 4))
        cols["mel_ok"] = pa.array(ok)
        return pa.table(cols)


def q_audio_mel_stats(sf_dir: str):
    """-> (clip_id, mel0..mel7, mel_ok) per clip; rows-only (DSP over
    binary payloads — per-row recompute oracle in
    tests/test_independent_oracles.py)."""
    clips = clips_from_documents(sf_dir)
    from who_owns_mass_processing_ray.stages import pool_bounds

    return clips.map_batches(MelStats, batch_format="pyarrow",
                             batch_size=64, concurrency=pool_bounds(8),
                             num_cpus=1).sort("clip_id")


# ---------------------------------------------------------------------------
# Modality disagreement — text near-dup pairs vs audio near-dup pairs over
# the SAME clips: the transcript-QC diagnostic unique to a clip+transcript
# corpus.  A pair similar in one modality but not the other flags either a
# transcription error (audio dup, text differs) or a re-voiced script
# (text dup, audio differs) — exactly the rows a labeling team reviews.
# Both pair streams are the engine's own bucketed near-dup queries; the
# comparison is one set operation over the (small) union of pairs.
# ---------------------------------------------------------------------------

def q_modality_disagreement(sf_dir: str):
    """-> (doc_a, doc_b, in_text, in_audio, agreement): the union of text
    near-dup pairs (transcript MinHash) and audio near-dup pairs
    (shift/gain-invariant frame shingles), tagged per modality, sorted
    (doc_a, doc_b).  Rows-only; set-consistency recompute in
    tests/test_independent_oracles.py."""
    import pandas as pd

    from who_owns_mass_processing_ray.pipelines import textops

    text = textops.q_minhash_near_dup(sf_dir).to_pandas()
    aud = q_audio_shingle_near_dup(sf_dir).to_pandas()

    tset = {(int(a), int(b)) for a, b in zip(text.left_id, text.right_id)}

    def clip_to_doc(c: str) -> int:
        return int(c.rsplit("-", 1)[1])

    aset = set()
    for a, b in zip(aud.left_id, aud.right_id):
        x, y = clip_to_doc(a), clip_to_doc(b)
        aset.add((min(x, y), max(x, y)))

    rows = []
    for a, b in sorted(tset | aset):
        it, ia = (a, b) in tset, (a, b) in aset
        rows.append((a, b, it, ia,
                     "both" if it and ia
                     else ("text_only" if it else "audio_only")))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "in_text",
                                       "in_audio", "agreement"])


# ---------------------------------------------------------------------------
# Duration-bucketed batch packing audit — the ASR/audio analog of
# textops.q_pack_sequences: training loaders pad every clip in a batch to
# the batch's longest clip, so batch composition decides how much compute
# is wasted on padding.  Standard practice (Kaldi/ESPnet/fairseq bucketing)
# sorts by duration before batching; this query forms fixed-size batches
# under BOTH policies — 'arrival' (clip_id order, the naive loader) and
# 'sorted' (duration-bucketed) — and reports each padded batch's overhead,
# making the bucketing win measurable per corpus.  Metadata-only: dur_ms
# is a pure function of doc_id under the clip contract, so audio bytes are
# never synthesized or decoded.  Same scale plan as pack_sequences:
# hash-partitioned, batches form within a partition (one groupby shuffle
# of narrow rows, no global rank, no driver sort).
# ---------------------------------------------------------------------------

BATCH_CLIPS = 16        # clips per padded training batch
_BUCKET_PARTS = 8       # fixed partition count -> deterministic plan
_BUCKET_KNUTH = 2654435761


def q_duration_buckets(sf_dir: str):
    """-> (part, policy, batch_id, n_clips, max_dur_ms, sum_dur_ms, pad_ms,
    pad_frac) for every padded batch under each policy."""
    from who_owns_mass_processing_ray.functions.numeric import round_half_away
    from who_owns_mass_processing_ray.io_utils import read_parquet_clean

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id"])

    def prep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        part = (ids * _BUCKET_KNUTH) % 4294967296 % _BUCKET_PARTS
        return pa.table({"part": pa.array(part.astype(np.int64)),
                         "doc_id": t["doc_id"]})

    def pack(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy().astype(np.int64)
        dur = (400 + (ids % 7) * 150).astype(np.int64)
        part = np.int64(g["part"][0].as_py())
        out = []
        for policy, order in (
            ("arrival", np.argsort(ids, kind="stable")),
            ("sorted", np.lexsort((ids, dur))),
        ):
            d = dur[order]
            n = len(d)
            batch = np.arange(n, dtype=np.int64) // BATCH_CLIPS
            nb = int(batch[-1]) + 1 if n else 0
            cnt = np.bincount(batch, minlength=nb).astype(np.int64)
            mx = np.zeros(nb, np.int64)
            np.maximum.at(mx, batch, d)
            sm = np.bincount(batch, weights=d, minlength=nb) \
                .astype(np.int64)
            pad = cnt * mx - sm
            out.append(pa.table({
                "part": pa.array(np.full(nb, part)),
                "policy": pa.array([policy] * nb, pa.string()),
                "batch_id": pa.array(np.arange(nb, dtype=np.int64)),
                "n_clips": pa.array(cnt),
                "max_dur_ms": pa.array(mx),
                "sum_dur_ms": pa.array(sm),
                "pad_ms": pa.array(pad),
                "pad_frac": round_half_away(
                    pa.array(pad / np.maximum(cnt * mx, 1)), 4),
            }))
        return pa.concat_tables(out)

    return docs.map_batches(prep, batch_format="pyarrow") \
        .groupby("part").map_groups(pack, batch_format="pyarrow") \
        .sort(["part", "policy", "batch_id"])


def duration_buckets_sql() -> str:
    return f"""
        WITH t AS (
          SELECT CAST((doc_id * {_BUCKET_KNUTH}) % 4294967296
                      % {_BUCKET_PARTS} AS BIGINT) AS part,
                 doc_id,
                 CAST(400 + (doc_id % 7) * 150 AS BIGINT) AS dur_ms
          FROM documents
        ),
        r AS (
          SELECT part, dur_ms,
                 row_number() OVER (PARTITION BY part ORDER BY doc_id) - 1
                   AS ra,
                 row_number() OVER (PARTITION BY part
                                    ORDER BY dur_ms, doc_id) - 1 AS rs
          FROM t
        ),
        u AS (
          SELECT part, 'arrival' AS policy, ra // {BATCH_CLIPS} AS batch_id,
                 dur_ms FROM r
          UNION ALL
          SELECT part, 'sorted', rs // {BATCH_CLIPS}, dur_ms FROM r
        )
        SELECT part, policy, batch_id,
               CAST(count(*) AS BIGINT) AS n_clips,
               max(dur_ms) AS max_dur_ms,
               CAST(sum(dur_ms) AS BIGINT) AS sum_dur_ms,
               CAST(count(*) * max(dur_ms) - sum(dur_ms) AS BIGINT)
                 AS pad_ms,
               round((count(*) * max(dur_ms) - sum(dur_ms)) * 1.0
                     / greatest(count(*) * max(dur_ms), 1), 4) AS pad_frac
        FROM u GROUP BY 1, 2, 3
        ORDER BY part, policy, batch_id
    """


# ---------------------------------------------------------------------------
# DTW time-stretch-tolerant audio near-dup
# ---------------------------------------------------------------------------
# ASR corpora carry speed-perturbed copies (sox ``speed`` / resampling-style
# augmentation: tempo AND pitch scaled by the same factor r).  None of the
# engine's other audio passes tolerate that: exact hashes, SimHash band
# energies and hop-aligned shingle MinHash all assume an unstretched time
# base.  This operator adds the alignment-based capability class:
#
#   blocking  — quantized spectral-peak LOG-RATIO keys.  Resampling scales
#               every frequency by r, so ratios between spectral peaks are
#               EXACTLY invariant; quantize log(f_b/f_a) with multi-probe
#               (floor+ceil cells) to absorb PSD estimation error.  Same
#               bucket-groupby shuffle shape as every other blocking stage
#               (narrow int keys only — audio bytes never shuffle).
#   verify    — banded-free anti-diagonal DTW over per-frame log-band
#               energy sequences (32 log-spaced bands).  A global pitch
#               scale is a CONSTANT shift in log-frequency, so the verify
#               takes the min DTW cost over global band shifts of
#               ±DTW_SHIFT (≈ ±9% pitch); DTW itself absorbs the tempo
#               change.  Cost = mean per-step cosine distance along the
#               optimal path, thresholded at DTW_THRESH (calibrated on the
#               synth corpus: planted ±8% pairs max≈0.037, random-pair
#               p05≈0.054).
#
# Reference parity note: the reference's dedup has no audio at all (R
# owner-name cosine blocking, deduplicaters.R) — this is part of the
# engine's training-data surface, grounded in Mueen/Keogh-style DTW
# matching and Shazam-style ratio landmarks, not a port.

DTW_SR = 8000
DTW_FRAME = 512          # 64 ms analysis frame at 8 kHz
DTW_HOP = 256            # 32 ms hop
DTW_NB = 32              # log-spaced bands over [DTW_FMIN, DTW_FMAX]
DTW_FMIN, DTW_FMAX = 100.0, 3600.0
DTW_SHIFT = 2            # verify: min cost over band shifts -2..+2
DTW_RQ = 0.02            # peak log-ratio quantum (multi-probe +-1 cell)
DTW_PEAKS = 3            # top spectral peaks per clip
DTW_THRESH = 0.045       # normalized DTW cost acceptance
DTW_PREFILTER = 0.07     # mean-profile shift-min cosine gate before DTW
                         # (planted-pair max 0.067, random-pair p05 0.079
                         # on the synth corpus — keeps all true pairs,
                         # rejects ~96% of colliding pairs WITHOUT touching
                         # the 5 KB frame blobs)
DTW_MAX_BUCKET = 64      # hot ratio-cell cap (salted via pairs stage)
DTW_STRETCH_MOD = 12     # doc_id % 12 == 0 -> planted speed-perturbed copy
_DTW_WINDOW = np.hanning(DTW_FRAME)
_DTW_EDGES = np.geomspace(DTW_FMIN, DTW_FMAX, DTW_NB + 1)


def _dtw_band_frames(pcm: np.ndarray, sr: int) -> np.ndarray:
    """(n_frames, DTW_NB) float32: per-frame log band energies, L2-normed
    per frame (gain-invariant).  One strided frame matrix + one batched
    rfft + one reduceat — no per-frame Python."""
    if sr != DTW_SR and len(pcm):
        n_out = max(int(round(len(pcm) * DTW_SR / sr)), 1)
        pcm = np.interp(np.arange(n_out) / DTW_SR,
                        np.arange(len(pcm)) / sr, pcm)
    x = pcm.astype(np.float64)
    if len(x) < DTW_FRAME:
        return np.zeros((0, DTW_NB), np.float32)
    starts = np.arange(0, len(x) - DTW_FRAME + 1, DTW_HOP)
    frames = np.lib.stride_tricks.as_strided(
        x, shape=(len(starts), DTW_FRAME),
        strides=(x.strides[0] * DTW_HOP, x.strides[0]))
    spec = np.abs(np.fft.rfft(frames * _DTW_WINDOW, axis=1)) ** 2
    freqs = np.fft.rfftfreq(DTW_FRAME, d=1.0 / DTW_SR)
    idx = np.searchsorted(freqs, _DTW_EDGES)
    F = np.add.reduceat(spec, idx[:-1], axis=1)[:, :DTW_NB]
    F = np.log1p(F * 1e3)
    nrm = np.linalg.norm(F, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    return (F / nrm).astype(np.float32)


def _dtw_ratio_keys(pcm: np.ndarray, sr: int) -> np.ndarray:
    """Speed-invariant blocking keys: quantized log-ratios between the
    clip's top-DTW_PEAKS Welch-PSD peaks, multi-probed to floor+ceil cells
    (uint64)."""
    x = pcm.astype(np.float64)
    if len(x) == 0:
        return np.empty(0, np.uint64)
    L = min(len(x), 4096)
    k = max(len(x) // L, 1)
    spec = (np.abs(np.fft.rfft(x[:k * L].reshape(k, L), axis=1)) ** 2) \
        .mean(axis=0)
    freqs = np.fft.rfftfreq(L, d=1.0 / sr)
    s = spec.copy()
    peaks = []
    for _ in range(DTW_PEAKS):
        b = int(s.argmax())
        if s[b] <= 0:
            break
        if freqs[b] > 0:
            peaks.append(freqs[b])
        s[max(0, b - 6): b + 7] = 0.0
    peaks.sort()
    keys = set()
    for a in range(len(peaks)):
        for b in range(a + 1, len(peaks)):
            q = np.log(peaks[b] / peaks[a]) / DTW_RQ
            keys.add(int(np.floor(q)))
            keys.add(int(np.ceil(q)))
    return np.fromiter(keys, np.uint64, len(keys))


def _dtw_cost_at_shift(A: np.ndarray, B: np.ndarray, sft: int) -> float:
    """Normalized DTW cost at ONE global band shift.  Anti-diagonal DP:
    every cell on diagonal k depends only on diagonals k-1/k-2, so each
    sweep step is one vectorized minimum — no per-cell Python.  Cost
    normalized by (na+nb) (path-length proxy)."""
    if sft >= 0:
        As, Bs = A[:, :DTW_NB - sft], B[:, sft:]
    else:
        As, Bs = A[:, -sft:], B[:, :DTW_NB + sft]
    an = np.linalg.norm(As, axis=1, keepdims=True)
    bn = np.linalg.norm(Bs, axis=1, keepdims=True)
    an[an == 0] = 1.0
    bn[bn == 0] = 1.0
    D = 1.0 - (As / an) @ (Bs / bn).T
    na, nb = D.shape
    C = np.full((na + 1, nb + 1), np.inf)
    C[0, 0] = 0.0
    for k in range(2, na + nb + 1):
        i0, i1 = max(1, k - nb), min(na, k - 1)
        i = np.arange(i0, i1 + 1)
        j = k - i
        C[i, j] = np.minimum(
            np.minimum(C[i - 1, j - 1], C[i - 1, j]), C[i, j - 1]) \
            + D[i - 1, j - 1]
    return float(C[na, nb] / (na + nb))


def _dtw_cost_batch(A3: np.ndarray, B3: np.ndarray, sft: int) -> np.ndarray:
    """``_dtw_cost_at_shift`` vectorized ACROSS PAIRS: A3 (P, na, DTW_NB),
    B3 (P, nb, DTW_NB) -> (P,) normalized costs.  Same anti-diagonal sweep
    with identical per-cell operation order — each of the na+nb-1 steps
    now processes all P pairs at once, so the Python loop overhead (which
    dominated the per-pair kernel at ~185k verify calls on the sf0.1
    corpus) amortizes over the group.  Parity with the scalar kernel is
    gated in tests (batched GEMM rounding differs only at ~1e-15)."""
    if sft >= 0:
        As, Bs = A3[:, :, :DTW_NB - sft], B3[:, :, sft:]
    else:
        As, Bs = A3[:, :, -sft:], B3[:, :, :DTW_NB + sft]
    an = np.linalg.norm(As, axis=2, keepdims=True)
    bn = np.linalg.norm(Bs, axis=2, keepdims=True)
    an[an == 0] = 1.0
    bn[bn == 0] = 1.0
    # float32 GEMM exactly like the scalar kernel (D then upcasts in the
    # float64 DP); batched-vs-single GEMM rounding differs ~1e-7, far
    # below the 4-decimal output rounding
    D = 1.0 - np.matmul(As / an, np.swapaxes(Bs / bn, 1, 2))
    n_p, na, nb = D.shape
    C = np.full((n_p, na + 1, nb + 1), np.inf)
    C[:, 0, 0] = 0.0
    for k in range(2, na + nb + 1):
        i0, i1 = max(1, k - nb), min(na, k - 1)
        i = np.arange(i0, i1 + 1)
        j = k - i
        C[:, i, j] = np.minimum(
            np.minimum(C[:, i - 1, j - 1], C[:, i - 1, j]), C[:, i, j - 1]) \
            + D[:, i - 1, j - 1]
    return C[:, na, nb] / (na + nb)


def _dtw_cost(A: np.ndarray, B: np.ndarray) -> float:
    """Min normalized DTW cost over global band shifts of +-DTW_SHIFT
    (the brute-force / test-oracle form; the pipeline itself runs the DP
    only at the profile-argmin shift — see ``q_audio_dtw_near_dup``)."""
    if len(A) == 0 or len(B) == 0:
        return float("inf")
    return min(_dtw_cost_at_shift(A, B, s)
               for s in range(-DTW_SHIFT, DTW_SHIFT + 1))


def stretched_clips(clips_ds, mod: int = DTW_STRETCH_MOD):
    """Deterministic speed-perturbed copies of every clip whose doc index
    is divisible by ``mod``: factor 0.92 or 1.08 by parity of (idx//mod),
    clip_id suffixed ``-sp`` (the planted truth for the DTW recall gate).
    Pure function of the row — safe at any batch size / order."""
    def perturb(t: pa.Table) -> pa.Table:
        ids = t["clip_id"].to_pylist()
        keep = [i for i, cid in enumerate(ids)
                if int(cid.rsplit("-", 1)[-1]) % mod == 0]
        cids, blobs, srs, durs, codecs, texts = [], [], [], [], [], []
        for i in keep:
            cid = ids[i]
            idx = int(cid.rsplit("-", 1)[-1])
            r = 1.08 if (idx // mod) % 2 else 0.92
            pcm, sr = audio.decode(t["bytes"][i].as_py(),
                                   t["codec"][i].as_py())
            n_out = max(int(round(len(pcm) / r)), 1)
            sp = np.interp(np.arange(n_out) * r / sr,
                           np.arange(len(pcm)) / sr, pcm).astype(np.float32)
            cids.append(cid + "-sp")
            blobs.append(audio.encode(sp, sr, t["codec"][i].as_py()))
            srs.append(sr)
            durs.append(int(round(len(sp) * 1000 / sr)))
            codecs.append(t["codec"][i].as_py())
            texts.append(t["transcript"][i].as_py())
        return pa.table({
            "clip_id": pa.array(cids, pa.string()),
            "bytes": pa.array(blobs, pa.large_binary()),
            "sr_hz": pa.array(srs, pa.int32()),
            "dur_ms": pa.array(durs, pa.int32()),
            "codec": pa.array(codecs, pa.string()),
            "transcript": pa.array(texts, pa.string()),
        }, schema=synth.CLIP_SCHEMA)

    return clips_ds.map_batches(perturb, batch_format="pyarrow",
                                batch_size=128)


class DtwFeatures:
    """Actor-pool stage: clip -> (band-frame blob, mean profile, ratio
    keys).  ``env`` is the (n_frames, DTW_NB) float32 matrix C-order
    (~5 KB); ``prof`` is its L2-normed frame-mean (DTW_NB float32 =
    128 B) — the cheap pair-prefilter payload, so candidate verification
    touches the 5 KB blobs only for prefilter survivors.  Per-clip decode
    is the unavoidable loop over opaque codec blobs; everything per clip
    is numpy."""

    def __init__(self):
        self.codecs = audio.CODECS

    def __call__(self, t: pa.Table) -> pa.Table:
        bufs = audio.binary_views(t["bytes"])
        codecs = t["codec"].to_pylist()
        blobs, profs, keys = [], [], []
        for i in range(len(t)):
            try:
                pcm, sr = audio.decode(bufs[i], codecs[i])
                F = _dtw_band_frames(pcm, sr)
                blobs.append(F.tobytes(order="C"))
                m = F.mean(axis=0) if len(F) else np.zeros(DTW_NB)
                n = np.linalg.norm(m)
                profs.append((m / n if n else m).astype(np.float32)
                             .tobytes(order="C"))
                keys.append(_dtw_ratio_keys(pcm, sr))
            except Exception:
                blobs.append(b"")
                profs.append(np.zeros(DTW_NB, np.float32).tobytes())
                keys.append(np.empty(0, np.uint64))
        return pa.table({
            "clip_id": t["clip_id"],
            "env": pa.array(blobs, pa.binary()),
            "prof": pa.array(profs, pa.binary()),
            "keys": pa.array([k.tolist() for k in keys],
                             pa.list_(pa.uint64())),
        })


def _env_matrices(col) -> list[np.ndarray]:
    """binary column -> list of (n_frames, DTW_NB) float32 views."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = []
    for v in col:
        buf = v.as_py()
        out.append(np.frombuffer(buf, np.float32).reshape(-1, DTW_NB))
    return out


def q_audio_dtw_near_dup(sf_dir: str, stretch_mod: int = DTW_STRETCH_MOD):
    """Time-stretch-tolerant audio near-dup pairs (left_id, right_id,
    dtw_cost) over the synth clips PLUS planted +-8% speed-perturbed
    copies (the planted truth for the recall gate).  Non-SQL-expressible
    (iterative DP): the pytest gate is a from-scratch full-DP brute-force
    parity + recall 1.0 on the planted pairs (tests/test_audio.py)."""
    clips = clips_from_documents(sf_dir)
    corpus = clips.union(stretched_clips(clips, stretch_mod))
    return dtw_near_dup_pairs(corpus)


def dtw_near_dup_pairs(corpus):
    """The reusable operator over ANY Dataset matching the clip contract:
    speed-invariant ratio-cell blocking -> profile prefilter -> single-shift
    DTW verify -> distinct edges, sorted."""
    from who_owns_mass_processing_ray.pipelines.dedup import _auto_parts
    from who_owns_mass_processing_ray.stages import pairs as pr
    from who_owns_mass_processing_ray.stages import pool_bounds

    feats = corpus.map_batches(
        DtwFeatures, batch_format="pyarrow", batch_size=64,
        concurrency=pool_bounds(8), num_cpus=1,
    ).materialize()          # narrow: id + ~5 KB blob + a few keys per clip

    def explode(t: pa.Table) -> pa.Table:
        keys_col = t["keys"]
        if isinstance(keys_col, pa.ChunkedArray):
            keys_col = keys_col.combine_chunks()
        counts = np.asarray([len(x) for x in keys_col], np.int64)
        ids_arr = t["clip_id"]
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        flat = keys_col.flatten().to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket_key": pa.array(flat.astype(np.uint64)),
            "clip_id": ids_arr.take(
                pa.array(np.repeat(np.arange(len(t)), counts))),
        })

    num_parts = MM_CFG.num_parts or _auto_parts()
    bucket_rows = feats.map_batches(explode, batch_format="pyarrow")
    cand = pr.pairs_from_bucket_rows(bucket_rows, "bucket_key", "clip_id",
                                     DTW_MAX_BUCKET, num_parts)

    # Two-tier verify.  Tier 1 attaches only the 128-B mean profiles and
    # runs a fully vectorized shift-min cosine gate over the whole pair
    # batch (5 slice-dot passes, no DP): keeps every true pair at
    # DTW_PREFILTER while rejecting ~96% of ratio-cell collisions, and its
    # argmin shift is the pitch-scale estimate.  Tier 2 attaches the 5-KB
    # frame blobs ONLY to survivors and runs the DP at that single shift —
    # so per-candidate cost is a 128-B dot, not a 5-KB O(na*nb) DP.
    cand = pr.attach_pair_features(cand, feats, "prof")

    def prefilter(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "left_id": pa.array([], pa.string()),
                "right_id": pa.array([], pa.string()),
                "dropped": pa.array([], pa.int64()),
                "shift": pa.array([], pa.int32()),
            })
        L = np.stack([np.frombuffer(v.as_py(), np.float32)
                      for v in batch["left_prof"]])
        R = np.stack([np.frombuffer(v.as_py(), np.float32)
                      for v in batch["right_prof"]])
        shifts = np.arange(-DTW_SHIFT, DTW_SHIFT + 1)
        costs = np.empty((len(L), len(shifts)))
        for si, s in enumerate(shifts):
            if s >= 0:
                Ls, Rs = L[:, :DTW_NB - s], R[:, s:]
            else:
                Ls, Rs = L[:, -s:], R[:, :DTW_NB + s]
            den = (np.linalg.norm(Ls, axis=1)
                   * np.linalg.norm(Rs, axis=1))
            den[den == 0] = 1.0
            costs[:, si] = 1.0 - (Ls * Rs).sum(axis=1) / den
        keep = costs.min(axis=1) <= DTW_PREFILTER
        out = batch.filter(pa.array(keep))
        return pa.table({
            "left_id": out["left_id"],
            "right_id": out["right_id"],
            "dropped": out["dropped"],
            "shift": pa.array(
                shifts[costs.argmin(axis=1)[keep]].astype(np.int32)),
        })

    surv = cand.map_batches(prefilter, batch_format="pyarrow",
                            batch_size=8192)
    surv = pr.attach_pair_features(surv, feats, "env")

    def verify(batch: pa.Table) -> pa.Table:
        ls = _env_matrices(batch["left_env"])
        rs = _env_matrices(batch["right_env"])
        sfts = batch["shift"].to_numpy() if batch.num_rows else []
        # group pairs by (na, nb, shift) and run the batched DP once per
        # group: frame counts come from a handful of duration classes, so
        # a 2048-pair batch collapses to a few dozen kernel calls instead
        # of 2048 Python DPs (measured 33 s -> ~2 s verify at sf0.1)
        costs = np.full(len(ls), np.inf)
        groups: dict[tuple, list[int]] = {}
        for idx, (a, b, s) in enumerate(zip(ls, rs, sfts)):
            if len(a) and len(b):
                groups.setdefault((len(a), len(b), int(s)), []).append(idx)
        for (_na, _nb, sft), idxs in groups.items():
            A3 = np.stack([ls[i] for i in idxs])
            B3 = np.stack([rs[i] for i in idxs])
            costs[idxs] = _dtw_cost_batch(A3, B3, sft)
        keep = costs <= DTW_THRESH
        out = batch.filter(pa.array(keep))
        return pa.table({
            "left_id": out["left_id"],
            "right_id": out["right_id"],
            "dropped": out["dropped"],
            "dtw_cost": pa.array(np.round(costs[keep], 4)),
        })

    # 8192-pair verify batches: the batched DP amortizes per-group kernel
    # calls, so bigger batches mean fewer, fuller groups (C-matrix memory
    # at 8192 pairs ~100 MB/task — fine at num_cpus=1 per task)
    verified = surv.map_batches(verify, batch_format="pyarrow",
                                batch_size=8192)
    edges = pr.distinct_edges(verified, "audio_dtw",
                              extra_num_cols=["dtw_cost"])
    # keep ``dropped`` (pairs lost to the hot-cell cap) in the output —
    # at scale, truncation must be visible in the result, not silent
    return edges.map_batches(
        lambda t: t.select(["left_id", "right_id", "dtw_cost", "dropped"]),
        batch_format="pyarrow").sort(["left_id", "right_id"])


# ---------------------------------------------------------------------------
# Constellation (landmark-pair) audio fingerprint search — Shazam-style
# (Wang, ISMIR 2003): per frame, the top-2 spectral peak bins; landmarks =
# (anchor_bin, target_bin, frame_delta) hashes pairing an anchor frame's
# peaks with the peaks of the next CONST_FANOUT_T frames; matching = an
# inverted landmark index probed by query-snippet landmarks with OFFSET
# VOTING (a true match concentrates its votes at one time offset; noise
# matches scatter).  This is a different capability class from
# q_audio_snippet_search's run-hash tokens: landmark pairs localize in
# TIME, so the vote histogram recovers WHERE the snippet sits in the clip,
# and isolated corrupted frames cost only their own landmarks.
#
# Scale shape: corpus landmark rows are narrow (hash, clip, t1) and stream
# through one map_batches; the QUERY side is small by definition of search
# (like q_audio_snippet_search / knn queries) and is broadcast once via
# ray.put as three sorted arrays; per-batch probing is one searchsorted
# range expansion; votes pre-aggregate in-batch (np.unique) before the
# only shuffle — a tiny (query, clip, offset) groupby.  Bytes never
# shuffle.  Rows-only driver check (codec decode is not SQL-expressible);
# the offset-recovery kernel gate and the corpus recall gate live in
# tests/test_independent_oracles.py.
# ---------------------------------------------------------------------------

CONST_PEAKS = 2          # peaks per frame (top-2, guard-masked like AMH)
CONST_FANOUT_T = 3       # anchor pairs with peaks of the next 1..3 frames
CONST_PARENT_MOD = 17    # clips contributing a query snippet
CONST_MIN_VOTES = 4      # suppress matches below this vote count
CONST_SEED = 31337


def constellation_landmarks(pcm: np.ndarray, sr: int
                            ) -> tuple[np.ndarray, np.ndarray]:
    """-> (lhash:uint64[], t1:int64[]) landmark hashes + anchor frame times
    of one clip on the shared AMH 8 kHz / 512 / 256 grid."""
    if len(pcm) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    if sr != AMH_SR:
        n_out = max(int(round(len(pcm) * AMH_SR / sr)), 1)
        t_in = np.arange(len(pcm)) / sr
        t_out = np.arange(n_out) / AMH_SR
        pcm = np.interp(t_out, t_in, pcm)
    if len(pcm) < AMH_FRAME:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    x = pcm.astype(np.float64)
    starts = np.arange(0, len(x) - AMH_FRAME + 1, AMH_HOP)
    frames = np.lib.stride_tricks.as_strided(
        x, shape=(len(starts), AMH_FRAME),
        strides=(x.strides[0] * AMH_HOP, x.strides[0]))
    spec = np.abs(np.fft.rfft(frames * np.hanning(AMH_FRAME), axis=1))
    spec[:, :3] = 0.0                      # kill DC / sub-audio bins
    n_bins = spec.shape[1]
    b1 = spec.argmax(axis=1)
    cols = np.arange(n_bins)[None, :]
    masked = np.where(np.abs(cols - b1[:, None]) <= AMH_PEAK_GUARD,
                      0.0, spec)
    b2 = masked.argmax(axis=1)
    peaks = np.stack([b1, b2], axis=1).astype(np.uint64)  # (nf, 2)
    nf = len(starts)
    if nf <= CONST_FANOUT_T:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    hashes, times = [], []
    for dt in range(1, CONST_FANOUT_T + 1):
        f1 = peaks[:-dt]                   # (nf-dt, 2) anchor peaks
        f2 = peaks[dt:]                    # (nf-dt, 2) target peaks
        # all 2x2 anchor-target combos per frame pair
        a = np.repeat(f1, CONST_PEAKS, axis=1).reshape(-1)
        b = np.tile(f2, (1, CONST_PEAKS)).reshape(-1)
        packed = (a << np.uint64(18)) | (b << np.uint64(4)) | np.uint64(dt)
        hashes.append(hx.splitmix64(packed ^ np.uint64(CONST_SEED)))
        times.append(np.repeat(np.arange(nf - dt, dtype=np.int64),
                               CONST_PEAKS * CONST_PEAKS))
    return np.concatenate(hashes), np.concatenate(times)


class _ConstellationRows:
    """Actor pool: decode -> landmark rows.  ``snippet`` mode emits the
    middle-half excerpt's landmarks (the planted query)."""

    def __init__(self, snippet: bool = False):
        self.codecs = audio.CODECS
        self.snippet = snippet

    def __call__(self, t: pa.Table) -> pa.Table:
        bufs = audio.binary_views(t["bytes"])
        codecs = t["codec"].to_pylist()
        cids = t["clip_id"].to_pylist()
        out_h, out_t, out_id = [], [], []
        for i in range(len(t)):
            try:
                pcm, sr = audio.decode(bufs[i], codecs[i])
            except Exception:
                continue
            if self.snippet:
                n = len(pcm)
                pcm = pcm[n // 4: 3 * n // 4]
            h, t1 = constellation_landmarks(pcm, sr)
            if not len(h):
                continue
            out_h.append(h)
            out_t.append(t1)
            out_id.extend([cids[i]] * len(h))
        if not out_h:
            return pa.table({"lhash": pa.array([], pa.int64()),
                             "t1": pa.array([], pa.int64()),
                             "clip_id": pa.array([], pa.string())})
        return pa.table({
            "lhash": pa.array(np.concatenate(out_h).view(np.int64)),
            "t1": pa.array(np.concatenate(out_t)),
            "clip_id": pa.array(out_id, pa.string()),
        })


def q_audio_constellation_match(sf_dir: str):
    """-> (query_id, clip_id, votes, offset_frames): for each query snippet
    (middle half of clips with doc_id % CONST_PARENT_MOD == 0), the best-
    matching corpus clip by landmark OFFSET VOTING — votes = the largest
    single-offset count for that (query, clip), the Shazam decision
    statistic; ties break to min clip_id / min offset (deterministic)."""
    import ray
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.stages import pool_bounds

    clips = clips_from_documents(sf_dir)

    def is_parent(t: pa.Table) -> pa.Table:
        ids = pc.cast(pc.utf8_slice_codeunits(t["clip_id"], 5, 17),
                      pa.int64()).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % CONST_PARENT_MOD == 0))

    parents = clips.map_batches(is_parent, batch_format="pyarrow")
    q_rows = parents.map_batches(_ConstellationRows,
                                 fn_constructor_kwargs={"snippet": True},
                                 batch_format="pyarrow", batch_size=32,
                                 concurrency=pool_bounds(8), num_cpus=1)
    # query side: small by construction (1/MOD of clips, middle halves) —
    # broadcast once as sorted arrays
    q_parts = [x for x in ray.get(q_rows.to_arrow_refs()) if x.num_rows]
    if not q_parts:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "query_id": pa.array([], pa.string()),
            "clip_id": pa.array([], pa.string()),
            "votes": pa.array([], pa.int64()),
            "offset_frames": pa.array([], pa.int64())}))
    qt = pa.concat_tables(q_parts).combine_chunks()
    qh = qt["lhash"].to_numpy().view(np.uint64)
    qtime = qt["t1"].to_numpy()
    enc = pc.dictionary_encode(qt["clip_id"])
    q_codes = enc.combine_chunks().indices.to_numpy().astype(np.int64) \
        if isinstance(enc, pa.ChunkedArray) else \
        enc.indices.to_numpy().astype(np.int64)
    q_names = (enc.combine_chunks().dictionary if
               isinstance(enc, pa.ChunkedArray) else enc.dictionary)
    order = np.argsort(qh, kind="stable")
    q_ref = ray.put((qh[order], qtime[order], q_codes[order],
                     q_names.to_pylist()))

    corpus_rows = clips.map_batches(_ConstellationRows,
                                    batch_format="pyarrow", batch_size=32,
                                    concurrency=pool_bounds(8), num_cpus=1)

    def probe(t: pa.Table) -> pa.Table:
        sqh, sqt, sqc, names = ray.get(q_ref)
        h = t["lhash"].to_numpy().view(np.uint64)
        t1 = t["t1"].to_numpy()
        cenc = pc.dictionary_encode(t["clip_id"].combine_chunks()
                                    if isinstance(t["clip_id"],
                                                  pa.ChunkedArray)
                                    else t["clip_id"])
        c_codes = cenc.indices.to_numpy().astype(np.int64)
        c_names = cenc.dictionary.to_pylist()
        lo = np.searchsorted(sqh, h, side="left")
        hi = np.searchsorted(sqh, h, side="right")
        cnt = hi - lo
        has = cnt > 0
        if not has.any():
            return pa.table({"query_id": pa.array([], pa.string()),
                             "clip_id": pa.array([], pa.string()),
                             "offset_frames": pa.array([], pa.int64()),
                             "votes": pa.array([], pa.int64())})
        lo, cnt = lo[has], cnt[has]
        rep_t1 = np.repeat(t1[has], cnt)
        rep_c = np.repeat(c_codes[has], cnt)
        total = int(cnt.sum())
        qpos = lo.repeat(cnt) + (np.arange(total)
                                 - np.repeat(np.cumsum(cnt) - cnt, cnt))
        offs = rep_t1 - sqt[qpos]
        qcode = sqc[qpos]
        # in-batch pre-aggregation: votes per (query, clip, offset)
        trip = np.stack([qcode, rep_c, offs], axis=1)
        uniq, votes = np.unique(trip, axis=0, return_counts=True)
        return pa.table({
            "query_id": pa.array([names[int(q)] for q in uniq[:, 0]],
                                 pa.string()),
            "clip_id": pa.array([c_names[int(c)] for c in uniq[:, 1]],
                                pa.string()),
            "offset_frames": pa.array(uniq[:, 2], pa.int64()),
            "votes": pa.array(votes.astype(np.int64)),
        })

    votes = corpus_rows.map_batches(probe, batch_format="pyarrow")
    agg = votes.groupby(["query_id", "clip_id", "offset_frames"]) \
        .aggregate(Sum("votes", alias_name="votes"))

    def pick_best(g: pa.Table) -> pa.Table:
        v = g["votes"].to_numpy()
        cid = g["clip_id"].to_pylist()
        off = g["offset_frames"].to_numpy()
        order = np.lexsort((off, cid, -v))   # max votes, then min id/offset
        i = order[0]
        if v[i] < CONST_MIN_VOTES:
            return pa.table({"query_id": pa.array([], pa.string()),
                             "clip_id": pa.array([], pa.string()),
                             "votes": pa.array([], pa.int64()),
                             "offset_frames": pa.array([], pa.int64())})
        return pa.table({
            "query_id": pa.array([g["query_id"][0].as_py()], pa.string()),
            "clip_id": pa.array([cid[i]], pa.string()),
            "votes": pa.array([int(v[i])], pa.int64()),
            "offset_frames": pa.array([int(off[i])], pa.int64()),
        })

    return agg.groupby("query_id").map_groups(pick_best,
                                              batch_format="pyarrow") \
        .sort("query_id")


# ---------------------------------------------------------------------------
# Audio curation funnel — the audio analog of textops.q_curation_funnel
# (the Dolma/RedPajama-style staged composition, on the clip table):
# duration QC gate -> exact content dedup (bytes hash, keep min clip_id)
# -> shingle near-dup keep-best (longest survivor per component, tie min
# id) with per-stage clip + duration attrition.  Every stage reuses
# machinery that carries its own gates (audio_shingle_pairs_ds, the
# flagship's star-contraction components past the edge limit); bytes never
# shuffle — only hashes, band keys, and narrow id rows.
# ---------------------------------------------------------------------------

FUNNEL_MIN_DUR_MS = 500     # ASR-style duration floor


def q_audio_curation_funnel(sf_dir: str):
    """-> (stage, n_clips, total_dur_ms, n_removed) for stages
    input -> qc -> exact -> near, rows-only for the driver (codec decode);
    per-stage brute recompute in tests/test_independent_oracles.py."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Min, Sum

    from who_owns_mass_processing_ray.functions import hashing as hx
    from who_owns_mass_processing_ray.stages import joins
    from who_owns_mass_processing_ray.stages.components import (
        components_labelprop,
    )

    clips = clips_from_documents(sf_dir)

    def meta(t: pa.Table) -> pa.Table:
        return t.select(["clip_id", "dur_ms"])

    def stage_stats(ds) -> tuple[int, int]:
        agg = ds.map_batches(meta, batch_format="pyarrow") \
            .map_batches(lambda t: pa.table({
                "n": pa.array([len(t)], pa.int64()),
                "d": pa.array([int(t["dur_ms"].to_numpy()
                               .astype(np.int64).sum())], pa.int64())}),
                batch_format="pyarrow").sum(["n", "d"])
        return int(agg["sum(n)"]), int(agg["sum(d)"])

    n0, d0 = stage_stats(clips)

    qc = clips.filter(expr=f"dur_ms >= {FUNNEL_MIN_DUR_MS}")
    n1, d1 = stage_stats(qc)

    # exact content dedup: 64-bit bytes hash, keep min clip_id per hash
    def keyed(t: pa.Table) -> pa.Table:
        h = hx.hash_strings(t["bytes"]).view(np.int64)
        return pa.table({"clip_id": t["clip_id"], "key": pa.array(h)})

    keys = qc.map_batches(keyed, batch_format="pyarrow").materialize()
    keep_min = keys.groupby("key").aggregate(Min("clip_id",
                                                 alias_name="keep_id"))
    kept_ids = joins.attach_columns(keys, keep_min, "key", "key",
                                    {"keep_id": "keep_id"}, None, how="inner")
    kept_ids = kept_ids.filter(expr="clip_id == keep_id") \
        .select_columns(["clip_id"]).materialize()
    exact = joins.attach_columns(qc, kept_ids, "clip_id", "clip_id",
                                 {"clip_id": "keep"}, None,
                                 how="inner").materialize()
    n2, d2 = stage_stats(exact)

    # near-dup keep-best on the exact survivors (pairs over the SURVIVOR
    # subset — the funnel property, not a global pair reuse)
    pairs = audio_shingle_pairs_ds(exact).materialize()
    n_edges = pairs.count()
    if n_edges == 0:
        near = exact
    elif n_edges > MM_CFG.dsu_edge_limit:
        labeled = components_labelprop(
            pairs.map_batches(lambda t: t.select(["left_id", "right_id"]),
                              batch_format="pyarrow"),
            MM_CFG, MM_CFG.num_parts or 16)
        grp = labeled                                # (clip_id, root_id)
        grp_src = "labelprop"
    else:
        tabs = [t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows]
        e = pa.concat_tables(tabs).combine_chunks()
        l = e["left_id"].to_pylist()
        r = e["right_id"].to_pylist()
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(l, r):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        rows = sorted(parent)
        grp = rd.from_arrow(pa.table({
            "clip_id": pa.array(rows, pa.string()),
            "root_id": pa.array([find(x) for x in rows], pa.string())}))
        grp_src = "dsu"
    if n_edges:
        # keep the LONGEST member per component (tie: min clip_id); clips
        # outside any component always survive
        withg = joins.attach_columns(exact.map_batches(meta,
                                                       batch_format="pyarrow"),
                                     grp, "clip_id", "clip_id",
                                     {"root_id": "root_id"}, None, how="left")

        def pick(g: pa.Table) -> pa.Table:
            d = g["dur_ms"].to_numpy()
            cid = g["clip_id"].to_pylist()
            i = np.lexsort((cid, -d.astype(np.int64)))[0]
            return pa.table({"clip_id": pa.array([cid[i]], pa.string())})

        withg = withg.materialize()
        grouped = withg.map_batches(
            lambda t: t.filter(pc.is_valid(t["root_id"])),
            batch_format="pyarrow") \
            .groupby("root_id").map_groups(pick, batch_format="pyarrow")
        single = withg.map_batches(
            lambda t: t.filter(pc.is_null(t["root_id"]))
            .select(["clip_id"]), batch_format="pyarrow")
        survivors = single.union(grouped).materialize()
        near = joins.attach_columns(exact, survivors, "clip_id", "clip_id",
                                    {"clip_id": "keep"}, None, how="inner")
    n3, d3 = stage_stats(near)

    rep = pa.table({
        "stage": pa.array(["input", "qc", "exact", "near"], pa.string()),
        "n_clips": pa.array([n0, n1, n2, n3], pa.int64()),
        "total_dur_ms": pa.array([d0, d1, d2, d3], pa.int64()),
        "n_removed": pa.array([0, n0 - n1, n1 - n2, n2 - n3], pa.int64()),
    })
    return rd.from_arrow(rep)


# ---------------------------------------------------------------------------
# Per-pair decoded-PCM SNR verification — the north-rule row invariant as a
# first-class pipeline stage
# ---------------------------------------------------------------------------

class PairSNR:
    """Actor-pool pair verifier: decode BOTH sides of a candidate dup pair,
    align the PCM (sample-rate resample via linear interp + truncate to the
    overlap), and score signal-to-noise in dB — the per-row invariant from
    the engine contract (decoded-PCM allclose, SNR >= 30 dB) applied to
    PAIRS, so a dup edge carries measured waveform evidence, not just a
    fingerprint collision.  ``passes`` is the STRICT invariant: SNR >= the
    threshold AND equal sample rates (``sr_match``) — a resampled near-copy
    never passes.  Codec dispatch table in ``__init__``; per-batch
    decode memoizes within the batch (a hot clip recurs across its pairs)."""

    def __init__(self, snr_thresh_db: float = 30.0):
        self.codecs = audio.CODECS
        self.thresh = snr_thresh_db

    def __call__(self, t: pa.Table) -> pa.Table:
        lb = audio.binary_views(t["left_bytes"])
        rb = audio.binary_views(t["right_bytes"])
        lc = t["left_codec"].to_pylist()
        rc = t["right_codec"].to_pylist()
        n = len(t)
        snr = np.full(n, -np.inf)
        sr_match = np.zeros(n, dtype=bool)
        n_over = np.zeros(n, dtype=np.int64)
        lid = t["left_id"].to_pylist()
        rid = t["right_id"].to_pylist()
        # memoize by clip id (payload views are unhashable and hashing the
        # bytes would re-read them); a hot clip recurs across its pairs
        cache: dict[str, tuple[np.ndarray, int]] = {}

        def dec(cid, buf, codec):
            hit = cache.get(cid)
            if hit is None:
                hit = audio.decode(buf, codec)
                cache[cid] = hit
            return hit

        for i in range(n):
            try:
                lp, lsr = dec(lid[i], lb[i], lc[i])
                rp, rsr = dec(rid[i], rb[i], rc[i])
            except Exception:
                continue
            sr_match[i] = lsr == rsr
            if rsr != lsr:
                if len(rp) <= 1 or len(lp) == 0:
                    # nothing to align at mismatched rates: no overlap,
                    # SNR stays -inf (fails) rather than comparing
                    # misaligned timelines sample-by-sample
                    continue
                # resample test onto the reference timeline
                x = np.arange(len(lp), dtype=np.float64) / lsr
                xp = np.arange(len(rp), dtype=np.float64) / rsr
                rp = np.interp(x[x <= xp[-1]], xp, rp)
            m = min(len(lp), len(rp))
            n_over[i] = m
            if m:
                snr[i] = audio.snr_db(lp[:m], rp[:m])
        # decide `passes` on the REPORTED (rounded, capped) value so the
        # two output columns can never disagree at the threshold boundary;
        # the STRICT north-rule invariant also requires equal sample rates
        # (a different-sr clip that linear-resamples into >= 30 dB is a
        # near-copy, not an exact one), so sr_match is ANDed in
        reported = np.round(np.minimum(snr, 999.0), 2)
        return pa.table({
            "left_id": t["left_id"],
            "right_id": t["right_id"],
            "sr_match": pa.array(sr_match),
            "n_overlap": pa.array(n_over),
            "snr_db": pa.array(reported),
            "passes": pa.array((reported >= self.thresh) & sr_match),
        })


def pair_snr_ds(clips, edges, snr_thresh_db: float = 30.0,
                broadcast_limit: int | None = None):
    """SNR-verify a (left_id, right_id) dup-edge Dataset against the clip
    payloads: decode both sides and score PCM SNR over the aligned overlap.
    Reusable over any edge source (flagship audio stage, exact stage, an
    external manifest) — see ``q_audio_pair_snr`` for the composed query.
    Every input edge yields exactly one output row: an edge whose endpoint
    is absent from ``clips`` reports passes=False / snr_db=-inf (left-outer
    attach on both paths) rather than silently dropping.

    Scale shape: edges are narrow (clip_id, clip_id); the corpus is
    semi-filtered to clips appearing in >= 1 edge BEFORE any audio moves
    (dup-subset-sized); the dup-subset payload table broadcasts once under
    the row gate (else two partitioned shuffle joins with schema-normalized
    intermediates); decode+SNR runs in an actor pool with in-batch decode
    memoization.  ``broadcast_limit`` overrides the broadcast gate (tests
    force the shuffle fallback with 0 — both paths are parity-tested)."""
    from who_owns_mass_processing_ray.stages import joins, pool_bounds

    if broadcast_limit is None:
        broadcast_limit = joins.BROADCAST_ROW_LIMIT

    def flat_ids(t: pa.Table) -> pa.Table:
        ids = pa.concat_arrays([
            t["left_id"].combine_chunks() if isinstance(t["left_id"], pa.ChunkedArray) else t["left_id"],
            t["right_id"].combine_chunks() if isinstance(t["right_id"], pa.ChunkedArray) else t["right_id"],
        ])
        return pa.table({"clip_id": ids})

    in_pairs = edges.map_batches(flat_ids, batch_format="pyarrow")
    sub = joins.semi_anti_filter(
        clips.select_columns(["clip_id", "bytes", "codec"]),
        "clip_id", in_pairs, "clip_id").materialize()

    if sub.count() <= broadcast_limit:
        # broadcast the DUP-SUBSET payloads once (bounded by the duplicate
        # set, not the corpus) and probe per pair block — the
        # attach_pair_features broadcast pattern, two columns per side
        import ray as _ray

        tables = [t for t in _ray.get(sub.to_arrow_refs()) if t.num_rows]
        side_tbl = pa.concat_tables(tables).combine_chunks() if tables else \
            pa.table({"clip_id": pa.array([], pa.string()),
                      "bytes": pa.array([], pa.large_binary()),
                      "codec": pa.array([], pa.string())})
        side_ref = _ray.put(side_tbl)

        def probe(batch: pa.Table) -> pa.Table:
            s = _ray.get(side_ref)
            ls = s.rename_columns(["left_id", "left_bytes", "left_codec"])
            rs = s.rename_columns(["right_id", "right_bytes", "right_codec"])
            # left outer: an edge endpoint absent from the clips dataset
            # (external-manifest edge sources) keeps its row — decode of the
            # null payload fails and the pair reports passes=False /
            # snr_db=-inf, so every input edge is accounted for
            out = batch.join(ls, keys=["left_id"], join_type="left outer")
            return out.join(rs, keys=["right_id"], join_type="left outer")

        withLR = edges.map_batches(probe, batch_format="pyarrow")
    else:
        # payloads exceed the broadcast gate: two partitioned shuffle
        # joins, normalizing zero-row bundles to the full schema between
        # them (chained Dataset.joins choke on empty-schema bundles) and
        # materializing each join output — the joins' aggregator actors,
        # the verify actor pool minimum, and the upstream maps otherwise
        # oversubscribe a small session and starve each other (the same
        # sequential-stage trade the flagship makes above
        # cfg.sequential_stage_rows); both materializations are bounded by
        # the pair subset, never the corpus
        schema_l = pa.schema([
            ("left_id", pa.string()), ("right_id", pa.string()),
            ("left_bytes", pa.large_binary()), ("left_codec", pa.string()),
        ])
        # the repartition rewrites the join output into uniformly-schemaed
        # blocks — Ray's hash-shuffle join emits zero-row empty-schema
        # bundles that flakily poison a DOWNSTREAM join's per-partition
        # schema (measured: the chained join fails ~1-in-2 without this)
        withL = joins.attach_columns(
            edges, sub, "left_id", "clip_id",
            {"bytes": "left_bytes", "codec": "left_codec"}, None,
            how="left", broadcast_limit=0).map_batches(
                lambda t: t.select(schema_l.names) if t.num_rows
                else schema_l.empty_table(),
                batch_format="pyarrow") \
            .materialize().repartition(8).materialize()
        withLR = joins.attach_columns(
            withL, sub, "right_id", "clip_id",
            {"bytes": "right_bytes", "codec": "right_codec"}, None,
            how="left", broadcast_limit=0).materialize()

    return withLR.map_batches(
        PairSNR, fn_constructor_args=(snr_thresh_db,),
        batch_format="pyarrow", batch_size=64,
        concurrency=pool_bounds(4), num_cpus=1) \
        .sort(["left_id", "right_id"])


def q_audio_pair_snr(sf_dir: str, snr_thresh_db: float = 30.0):
    """SNR-verify every audio-fingerprint dup edge: features -> SimHash
    blocking -> hamming verify (the flagship's audio stage) -> decode both
    sides and measure PCM SNR over the aligned overlap (``pair_snr_ds``).
    This promotes the north-rule per-row invariant (decoded-PCM allclose,
    SNR >= 30 dB + transcript equality — the graft contract's analog of the
    reference's exact match gates) from a test-only assertion to a
    queryable verification stage: downstream keep/merge policies can
    require ``passes`` instead of trusting the fingerprint radius — on the
    synthetic corpora this measurably separates true waveform copies
    (capped snr_db 999) from spectral-fingerprint false positives
    (snr_db < 0).

    Output: (left_id, right_id, sr_match, n_overlap, snr_db, passes)
    sorted by (left_id, right_id).  Rows-only (decode is not
    SQL-expressible); planted-pair invariant + determinism gates in
    tests/test_audio.py."""
    from who_owns_mass_processing_ray.stages import (
        audio_fp,
        features as features_mod,
    )

    clips = clips_from_documents(sf_dir).materialize()
    feats = features_mod.extract_features(clips, MM_CFG)
    edges = audio_fp.audio_edges(feats, MM_CFG, 16) \
        .select_columns(["left_id", "right_id"]).materialize()
    return pair_snr_ds(clips, edges, snr_thresh_db)
