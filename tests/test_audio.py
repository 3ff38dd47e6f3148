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
