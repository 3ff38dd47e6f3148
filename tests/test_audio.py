"""Unit tests for the audio codec layer + spectral SimHash (audio.py)."""

from __future__ import annotations

import numpy as np
import pytest

from who_owns_mass_processing_ray import audio


def _tone(sr: int, dur_s: float, freqs=(440.0, 880.0), seed=0) -> np.ndarray:
    n = int(sr * dur_s)
    t = np.arange(n) / sr
    x = sum(0.2 * np.sin(2 * np.pi * f * t) for f in freqs)
    rng = np.random.default_rng(seed)
    x = x + 0.01 * rng.normal(size=n)
    return x.astype(np.float32)


class TestWav:
    def test_roundtrip_snr(self):
        pcm = _tone(16000, 0.5)
        buf = audio.encode_wav(pcm, 16000)
        out, sr = audio.decode_wav(buf)
        assert sr == 16000
        assert len(out) == len(pcm)
        assert audio.snr_db(pcm, out) >= 30.0  # the BASELINE per-row invariant

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            audio.decode_wav(b"not a wav at all, sorry")

    def test_chunk_walking(self):
        # a LIST chunk inserted before fmt must be skipped, not crash
        pcm = _tone(8000, 0.1)
        buf = audio.encode_wav(pcm, 8000)
        import struct
        extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
        patched = buf[:12] + extra + buf[12:]
        patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
        out, sr = audio.decode_wav(patched)
        assert sr == 8000 and len(out) == len(pcm)


class TestFlacStub:
    def test_roundtrip_lossless(self):
        pcm = _tone(22050, 0.3)
        buf = audio.encode(pcm, 22050, "flac")
        out, sr = audio.decode(buf, "flac")
        assert sr == 22050
        # stub is lossless over the s16 quantization
        assert audio.snr_db(pcm, out) >= 30.0

    def test_stub_is_marked(self):
        buf = audio.encode(_tone(8000, 0.05), 8000, "flac")
        assert buf[:8] == b"STUBFLC0"
        with pytest.raises(ValueError):
            audio.decode(b"fLaC" + b"\x00" * 64, "flac")  # real FLAC -> explicit error


class TestFingerprint:
    CFG = dict(num_bands=129, bits=64, fmin_hz=100.0, fmax_hz=3500.0, seed=42)

    def _fp(self, pcm, sr):
        c = self.CFG
        return audio.audio_fingerprint(pcm, sr, c["num_bands"], c["bits"],
                                       c["fmin_hz"], c["fmax_hz"], c["seed"])

    def test_resample_invariance(self):
        """Same waveform at different sample rates -> hamming <= 6."""
        for seed in range(5):
            rng = np.random.default_rng(seed)
            freqs = np.exp(rng.uniform(np.log(150), np.log(3300), size=3))
            a = self._fp(_tone(16000, 1.0, freqs, seed), 16000)
            b = self._fp(_tone(44100, 1.0, freqs, seed), 44100)
            d = audio.hamming64(np.array([a], np.uint64), np.array([b], np.uint64))[0]
            assert d <= 6, f"seed {seed}: hamming {d}"

    def test_different_content_far(self):
        fps = []
        for seed in range(12):
            rng = np.random.default_rng(seed ^ 0xBEEF)
            freqs = np.exp(rng.uniform(np.log(150), np.log(3300), size=3))
            fps.append(self._fp(_tone(16000, 0.5, freqs, seed), 16000))
        fps = np.array(fps, dtype=np.uint64)
        n = len(fps)
        ii, jj = np.triu_indices(n, 1)
        d = audio.hamming64(fps[ii], fps[jj])
        # unrelated pairs must stay above the verify threshold
        assert d.min() > 6, f"min unrelated hamming {d.min()}"

    def test_empty_pcm(self):
        assert self._fp(np.zeros(0, np.float32), 16000) == self._fp(np.zeros(0, np.float32), 16000)


class TestHamming:
    def test_matches_popcount(self):
        rng = np.random.default_rng(1)
        a = rng.integers(0, 1 << 63, size=50, dtype=np.uint64)
        b = rng.integers(0, 1 << 63, size=50, dtype=np.uint64)
        got = audio.hamming64(a, b)
        want = [bin(int(x) ^ int(y)).count("1") for x, y in zip(a, b)]
        np.testing.assert_array_equal(got, want)


def _sig_of(pcm: np.ndarray, sr: int) -> np.ndarray:
    from who_owns_mass_processing_ray.functions import hashing as hx
    from who_owns_mass_processing_ray.pipelines import multimodal as mm

    toks = mm._frame_tokens(pcm, sr)
    offs = np.array([0, len(toks)], np.int64)
    vals, o = hx.token_shingle_hashes(toks, offs, mm.AMH_K, seed=mm.AMH_SEED)
    return hx.minhash_signatures(vals, o, mm.AMH_PERM, mm.AMH_SEED)[0]


class TestAudioShingleMinHash:
    """Shift/gain-invariant audio near-dup tokens (pipelines/multimodal.py)."""

    def test_gain_invariant(self):
        from who_owns_mass_processing_ray.pipelines import multimodal as mm

        pcm = _tone(8000, 3.0, freqs=(440.0, 1333.0), seed=3)
        a = mm._frame_tokens(pcm, 8000)
        b = mm._frame_tokens(pcm * 0.43, 8000)
        np.testing.assert_array_equal(a, b)

    def test_hop_shift_high_agreement(self):
        from who_owns_mass_processing_ray.pipelines import multimodal as mm

        pcm = _tone(8000, 4.0, freqs=(523.0, 1888.0), seed=7)
        sa = _sig_of(pcm, 8000)
        sb = _sig_of(pcm[4 * mm.AMH_HOP:] * 0.7, 8000)   # trim + gain
        est = float((sa == sb).mean())
        assert est >= mm.AMH_THRESH, f"shifted dup est {est}"

    def test_unrelated_low_agreement(self):
        from who_owns_mass_processing_ray.pipelines import multimodal as mm

        sa = _sig_of(_tone(8000, 3.0, freqs=(440.0, 1333.0), seed=3), 8000)
        sc = _sig_of(_tone(8000, 3.0, freqs=(612.0, 2471.0), seed=9), 8000)
        est = float((sa == sc).mean())
        assert est < mm.AMH_THRESH, f"unrelated est {est}"

    def test_resample_tolerant(self):
        from who_owns_mass_processing_ray.pipelines import multimodal as mm

        freqs = (700.0, 2100.0)
        sa = _sig_of(_tone(8000, 3.0, freqs=freqs, seed=5), 8000)
        sb = _sig_of(_tone(16000, 3.0, freqs=freqs, seed=5), 16000)
        est = float((sa == sb).mean())
        assert est >= mm.AMH_THRESH, f"resampled dup est {est}"

    def test_sig_stage_deterministic(self):
        import pyarrow as pa

        from who_owns_mass_processing_ray import audio as au
        from who_owns_mass_processing_ray.pipelines import multimodal as mm

        pcm = _tone(8000, 2.0, freqs=(800.0,), seed=1)
        t = pa.table({
            "clip_id": pa.array(["a", "b"]),
            "bytes": pa.array([au.encode(pcm, 8000, "pcm_s16le")] * 2,
                              pa.large_binary()),
            "sr_hz": pa.array([8000, 8000], pa.int32()),
            "dur_ms": pa.array([2000, 2000], pa.int32()),
            "codec": pa.array(["pcm_s16le", "pcm_s16le"]),
            "transcript": pa.array(["x", "x"]),
        })
        stage = mm.AudioShingleSig()
        r1, r2 = stage(t), stage(t)
        assert r1.equals(r2)
        assert r1["sig"][0].as_py() == r1["sig"][1].as_py()
        m = mm._sig_matrix(r1["sig"])
        assert m.shape == (2, mm.AMH_PERM)
        np.testing.assert_array_equal(m[0], m[1])


class TestGainNormalize:
    def test_matches_direct_recompute(self):
        import pyarrow as pa

        from who_owns_mass_processing_ray import audio as au
        from who_owns_mass_processing_ray.pipelines import multimodal as mm

        pcm = _tone(8000, 1.0, freqs=(440.0,), seed=2) * 0.31
        t = pa.table({
            "clip_id": pa.array(["a"]),
            "bytes": pa.array([au.encode(pcm, 8000, "pcm_s16le")],
                              pa.large_binary()),
            "sr_hz": pa.array([8000], pa.int32()),
            "dur_ms": pa.array([1000], pa.int32()),
            "codec": pa.array(["pcm_s16le"]),
            "transcript": pa.array(["x"]),
        })
        out = mm.GainNormalize()(t)
        dec, _ = au.decode(au.encode(pcm, 8000, "pcm_s16le"), "pcm_s16le")
        peak = float(np.max(np.abs(dec)))
        g = min(0.9 / peak, 100.0)
        assert out["peak_before"][0].as_py() == pytest.approx(peak, abs=1e-4)
        assert out["gain_db"][0].as_py() == pytest.approx(
            20 * np.log10(g), abs=0.01)
        assert out["rms_after"][0].as_py() == pytest.approx(
            float(np.sqrt(np.mean((dec * g) ** 2))), abs=1e-4)


class TestSegmentRows:
    def test_matches_direct_recompute(self):
        import pyarrow as pa

        from who_owns_mass_processing_ray import audio as au
        from who_owns_mass_processing_ray.pipelines import multimodal as mm

        pcm = _tone(8000, 1.05, freqs=(440.0, 950.0), seed=4)
        buf = au.encode(pcm, 8000, "pcm_s16le")
        t = pa.table({
            "clip_id": pa.array(["a"]),
            "bytes": pa.array([buf], pa.large_binary()),
            "sr_hz": pa.array([8000], pa.int32()),
            "dur_ms": pa.array([1050], pa.int32()),
            "codec": pa.array(["pcm_s16le"]),
            "transcript": pa.array(["x"]),
        })
        out = mm.SegmentRows()(t)
        dec, sr = au.decode(buf, "pcm_s16le")
        w, hop = int(sr * mm.SEG_MS / 1000), int(sr * mm.SEG_HOP_MS / 1000)
        n_expect = (len(dec) - w) // hop + 1
        assert len(out) == n_expect
        for j in range(n_expect):
            seg = dec[j * hop: j * hop + w].astype("float64")
            assert out["rms"][j].as_py() == pytest.approx(
                float((seg ** 2).mean() ** 0.5), abs=1e-4)
            assert out["peak"][j].as_py() == pytest.approx(
                float(abs(seg).max()), abs=1e-4)
            assert out["start_ms"][j].as_py() == j * hop * 1000 // sr


class TestDtw:
    """Anti-diagonal DTW DP vs an independent naive full-DP recompute,
    plus invariance properties of the stretch-tolerant feature chain
    (pipelines/multimodal.py DTW section)."""

    @staticmethod
    def _naive_dtw(A, B, sft):
        import numpy as np
        from who_owns_mass_processing_ray.pipelines.multimodal import DTW_NB
        if sft >= 0:
            As, Bs = A[:, :DTW_NB - sft], B[:, sft:]
        else:
            As, Bs = A[:, -sft:], B[:, :DTW_NB + sft]
        def cd(a, b):
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            if na == 0: na = 1.0
            if nb == 0: nb = 1.0
            return 1.0 - float(a @ b) / (na * nb)
        n, m = len(As), len(Bs)
        C = np.full((n + 1, m + 1), np.inf)
        C[0, 0] = 0.0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                C[i, j] = min(C[i-1, j-1], C[i-1, j], C[i, j-1]) \
                    + cd(As[i-1], Bs[j-1])
        return C[n, m] / (n + m)

    def test_antidiagonal_matches_naive(self):
        from who_owns_mass_processing_ray.pipelines import multimodal as mm
        rng = np.random.default_rng(7)
        for trial in range(4):
            A = np.abs(rng.normal(size=(rng.integers(3, 18), mm.DTW_NB))) \
                .astype(np.float32)
            B = np.abs(rng.normal(size=(rng.integers(3, 18), mm.DTW_NB))) \
                .astype(np.float32)
            for sft in (-2, 0, 1):
                assert mm._dtw_cost_at_shift(A, B, sft) == pytest.approx(
                    self._naive_dtw(A, B, sft), rel=1e-6)
        # min-over-shifts form agrees with explicit enumeration
        assert mm._dtw_cost(A, B) == pytest.approx(
            min(self._naive_dtw(A, B, s) for s in range(-2, 3)), rel=1e-6)

    def test_batch_kernel_matches_scalar(self):
        # the grouped verify runs _dtw_cost_batch; it must reproduce the
        # scalar anti-diagonal kernel pair-for-pair (same op order; only
        # batched-GEMM rounding may differ, far below output rounding)
        from who_owns_mass_processing_ray.pipelines import multimodal as mm
        rng = np.random.default_rng(11)
        for _ in range(6):
            na, nb = int(rng.integers(3, 18)), int(rng.integers(3, 18))
            P = int(rng.integers(1, 7))
            A3 = np.abs(rng.normal(size=(P, na, mm.DTW_NB))) \
                .astype(np.float32)
            B3 = np.abs(rng.normal(size=(P, nb, mm.DTW_NB))) \
                .astype(np.float32)
            for sft in (-2, 0, 2):
                got = mm._dtw_cost_batch(A3, B3, sft)
                want = [mm._dtw_cost_at_shift(A3[p], B3[p], sft)
                        for p in range(P)]
                assert got == pytest.approx(want, rel=1e-6)

    def test_ratio_keys_speed_invariant(self):
        # resampling by r scales every frequency by r, so quantized peak
        # log-ratios must intersect between a clip and its stretched copy
        from who_owns_mass_processing_ray.pipelines import multimodal as mm
        sr = 16000
        pcm = _tone(sr, 0.6, freqs=(380.0, 760.0, 1340.0), seed=3)
        for r in (0.92, 1.08):
            n_out = max(int(round(len(pcm) / r)), 1)
            sp = np.interp(np.arange(n_out) * r / sr,
                           np.arange(len(pcm)) / sr, pcm).astype(np.float32)
            k1 = set(mm._dtw_ratio_keys(pcm, sr).tolist())
            k2 = set(mm._dtw_ratio_keys(sp, sr).tolist())
            assert k1 & k2, f"no shared blocking cell at r={r}"

    def test_stretched_pair_cost_below_threshold(self):
        from who_owns_mass_processing_ray.pipelines import multimodal as mm
        sr = 16000
        pcm = _tone(sr, 0.6, freqs=(380.0, 760.0, 1340.0), seed=3)
        A = mm._dtw_band_frames(pcm, sr)
        for r in (0.92, 1.08):
            n_out = max(int(round(len(pcm) / r)), 1)
            sp = np.interp(np.arange(n_out) * r / sr,
                           np.arange(len(pcm)) / sr, pcm).astype(np.float32)
            B = mm._dtw_band_frames(sp, sr)
            assert mm._dtw_cost(A, B) <= mm.DTW_THRESH
        # unrelated content stays far
        other = _tone(sr, 0.6, freqs=(523.0, 1569.0, 2217.0), seed=11)
        C = mm._dtw_band_frames(other, sr)
        assert mm._dtw_cost(A, C) > mm.DTW_THRESH


class TestPairSNR:
    """q_audio_pair_snr / pair_snr_ds — the north-rule per-pair PCM
    invariant as a pipeline stage."""

    def _planted(self, ray_session):
        import pyarrow as pa
        import ray
        import ray.data as rd
        from who_owns_mass_processing_ray.pipelines import multimodal as mm

        clips = mm.clips_from_documents(
            "/root/testdata/sf0.001").limit(20).materialize()
        t = pa.concat_tables(
            [x for x in ray.get(clips.to_arrow_refs()) if x.num_rows])
        dup = t.set_column(
            0, "clip_id",
            pa.array([c + "-copy" for c in t["clip_id"].to_pylist()]))
        both = rd.from_arrow(pa.concat_tables([t, dup])).materialize()
        edges = rd.from_arrow(pa.table({
            "left_id": t["clip_id"], "right_id": dup["clip_id"],
        })).materialize()
        return mm.pair_snr_ds(both, edges).to_pandas()

    def test_exact_copies_pass(self, ray_session):
        out = self._planted(ray_session)
        assert len(out) == 20
        assert bool(out["passes"].all())
        # decode of an identical payload reproduces the PCM exactly:
        # SNR is infinite, reported capped
        assert (out["snr_db"] == 999.0).all()
        assert bool(out["sr_match"].all())

    def test_broadcast_and_shuffle_paths_agree(self, ray_session):
        import pyarrow as pa
        import ray
        import ray.data as rd
        from who_owns_mass_processing_ray.pipelines import multimodal as mm

        clips = mm.clips_from_documents(
            "/root/testdata/sf0.001").limit(12).materialize()
        t = pa.concat_tables(
            [x for x in ray.get(clips.to_arrow_refs()) if x.num_rows])
        dup = t.set_column(
            0, "clip_id",
            pa.array([c + "-copy" for c in t["clip_id"].to_pylist()]))
        both = rd.from_arrow(pa.concat_tables([t, dup])).materialize()
        edges = rd.from_arrow(pa.table({
            "left_id": t["clip_id"], "right_id": dup["clip_id"],
        })).materialize()
        bcast = mm.pair_snr_ds(both, edges).to_pandas()
        shuf = mm.pair_snr_ds(both, edges, broadcast_limit=0).to_pandas()
        assert bcast.equals(shuf)

    def test_unmatched_edges_accounted(self, ray_session):
        """An edge whose endpoint is absent from the clips dataset must
        still emit a row (passes=False, snr_db=-inf) — edges from external
        manifests never silently vanish (left-outer attach, both paths)."""
        import pyarrow as pa
        import ray
        import ray.data as rd
        from who_owns_mass_processing_ray.pipelines import multimodal as mm

        clips = mm.clips_from_documents(
            "/root/testdata/sf0.001").limit(6).materialize()
        t = pa.concat_tables(
            [x for x in ray.get(clips.to_arrow_refs()) if x.num_rows])
        ids = t["clip_id"].to_pylist()
        edges = rd.from_arrow(pa.table({
            "left_id": pa.array([ids[0], ids[1], "clip-missing-a"]),
            "right_id": pa.array([ids[0], "clip-missing-b", ids[2]]),
        })).materialize()
        for limit in (None, 0):      # broadcast AND shuffle paths
            out = mm.pair_snr_ds(clips, edges,
                                 broadcast_limit=limit).to_pandas()
            assert len(out) == 3, out
            bad = out[(out.left_id == "clip-missing-a")
                      | (out.right_id == "clip-missing-b")]
            assert len(bad) == 2
            assert not bad["passes"].any()
            assert (bad["snr_db"] == float("-inf")).all()

    def test_resampled_copy_never_passes_strict(self, ray_session):
        """The strict invariant: a clip and its different-sample-rate
        resample can score SNR >= 30 dB through alignment, but passes must
        stay False because sr_match is False (passes = SNR AND sr_match)."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from who_owns_mass_processing_ray import audio
        from who_owns_mass_processing_ray.pipelines import multimodal as mm

        sr_a, sr_b = 16000, 8000
        tt = np.arange(int(sr_a * 0.5)) / sr_a
        pcm = (0.5 * np.sin(2 * np.pi * 440.0 * tt)).astype(np.float32)
        # exact same waveform re-sampled onto the slower clock
        tb = np.arange(int(sr_b * 0.5)) / sr_b
        pcm_b = np.interp(tb, tt, pcm).astype(np.float32)
        clips = rd.from_arrow(pa.table({
            "clip_id": pa.array(["a", "b"]),
            "bytes": pa.array([audio.encode_wav(pcm, sr_a),
                               audio.encode_wav(pcm_b, sr_b)],
                              pa.large_binary()),
            "codec": pa.array(["pcm_s16le", "pcm_s16le"]),
        })).materialize()
        edges = rd.from_arrow(pa.table({
            "left_id": pa.array(["a"]), "right_id": pa.array(["b"]),
        })).materialize()
        out = mm.pair_snr_ds(clips, edges).to_pandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert not bool(row["sr_match"])
        assert row["snr_db"] >= 30.0          # aligned PCM is a near-copy
        assert not bool(row["passes"])        # ...but NOT an exact one

    def test_fingerprint_fps_rejected_and_deterministic(self, ray_session):
        from who_owns_mass_processing_ray.pipelines import multimodal as mm

        a = mm.q_audio_pair_snr("/root/testdata/sf0.001").to_pandas()
        b = mm.q_audio_pair_snr("/root/testdata/sf0.001").to_pandas()
        # deterministic across runs
        assert a.equals(b)
        # the sf0.001 corpus has no true waveform copies (500 distinct
        # param residues), so every SimHash edge is a spectral false
        # positive — pair-SNR verification must reject ALL of them
        if len(a):
            assert not a["passes"].any()
            assert (a["snr_db"] < 30.0).all()
