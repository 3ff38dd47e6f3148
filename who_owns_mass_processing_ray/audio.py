"""Audio codec layer + spectral fingerprinting (pure numpy).

The engine's input rows carry encoded audio (``bytes`` + ``codec`` + ``sr_hz``
columns, per the input contract).  This container has no audio libraries
(no soundfile / pyav / libflac), so:

- ``pcm_s16le`` (WAV/RIFF) is implemented for real: a complete RIFF writer
  and chunk-walking reader in numpy (the format is trivial and public).
- ``flac`` is a clearly-marked STUB: a deterministic lossless stand-in
  container (magic ``b"STUBFLC0"`` + zlib-compressed s16le PCM).  It is NOT
  real FLAC; it exists so the Ray-side plumbing (codec dispatch inside the
  decode actor pool, schema, batch sizing, SNR invariants) is real and
  tested.  Swap ``_decode_flac_stub``/``_encode_flac_stub`` for
  soundfile/libsndfile calls on a cluster with the codec libs installed.

Fingerprint: an energy-weighted SimHash over log-spaced spectral band
energies.  This is the graft's analog of the reference's address-bounded
secondary blocking key (``addr_id`` group-fill bounding,
``/root/reference/R/deduplicaters.R:446-539``): a coarse identity bucket a
candidate pair must share, computed from the audio payload instead of a
standardized address.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_STUB_FLAC_MAGIC = b"STUBFLC0"


# --------------------------------------------------------------------------
# WAV (RIFF / pcm_s16le) — real implementation
# --------------------------------------------------------------------------

def encode_wav(pcm: np.ndarray, sr_hz: int) -> bytes:
    """float32 [-1,1] mono -> RIFF WAVE pcm_s16le bytes."""
    x = np.clip(pcm, -1.0, 1.0)
    s16 = (x * 32767.0).round().astype("<i2")
    data = s16.tobytes()
    byte_rate = sr_hz * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr_hz, byte_rate, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF WAVE pcm_s16le -> (float32 pcm in [-1,1], sr_hz). Walks chunks."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE buffer")
    pos = 12
    sr_hz = None
    bits = None
    channels = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, sr_hz, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt_tag != 1 or bits != 16:
                raise ValueError(f"unsupported WAV format tag={fmt_tag} bits={bits}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sr_hz is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    s16 = np.frombuffer(data, dtype="<i2")
    if channels and channels > 1:
        s16 = s16.reshape(-1, channels).mean(axis=1).astype("<i2")
    return s16.astype(np.float32) / 32767.0, int(sr_hz)


# --------------------------------------------------------------------------
# "flac" — STUB (no FLAC encoder in this environment; see module docstring)
# --------------------------------------------------------------------------

def _encode_flac_stub(pcm: np.ndarray, sr_hz: int) -> bytes:
    s16 = (np.clip(pcm, -1.0, 1.0) * 32767.0).round().astype("<i2")
    payload = zlib.compress(s16.tobytes(), level=6)
    return _STUB_FLAC_MAGIC + struct.pack("<IQ", sr_hz, len(s16)) + payload


def _decode_flac_stub(buf: bytes) -> tuple[np.ndarray, int]:
    if buf[:8] != _STUB_FLAC_MAGIC:
        raise ValueError("not a stub-flac buffer (real FLAC is not supported "
                         "in this environment — see audio.py docstring)")
    sr_hz, n = struct.unpack_from("<IQ", buf, 8)
    s16 = np.frombuffer(zlib.decompress(buf[20:]), dtype="<i2")
    assert len(s16) == n
    return s16.astype(np.float32) / 32767.0, int(sr_hz)


CODECS = {
    "pcm_s16le": (encode_wav, decode_wav),
    "flac": (_encode_flac_stub, _decode_flac_stub),
}


def encode(pcm: np.ndarray, sr_hz: int, codec: str) -> bytes:
    enc, _ = CODECS[codec]
    return enc(pcm, sr_hz)


def decode(buf: bytes, codec: str) -> tuple[np.ndarray, int]:
    _, dec = CODECS[codec]
    return dec(buf)


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of ``test`` against ``ref`` in dB."""
    n = min(len(ref), len(test))
    if n == 0:
        return float("inf")
    ref = ref[:n].astype(np.float64)
    err = ref - test[:n].astype(np.float64)
    p_sig = float(np.sum(ref * ref))
    p_err = float(np.sum(err * err))
    if p_err == 0.0:
        return float("inf")
    return 10.0 * np.log10(p_sig / max(p_err, 1e-30))


# --------------------------------------------------------------------------
# Zero-copy Arrow binary access
# --------------------------------------------------------------------------

def binary_views(col) -> list[memoryview]:
    """Per-row zero-copy ``memoryview`` slices into an Arrow binary column.

    ``col.to_pylist()`` memcpys the ENTIRE payload into Python ``bytes``
    objects — at 100 TB that is a full extra pass over the corpus bytes per
    decode stage.  This instead slices the column's shared Arrow data buffer
    through the offsets buffer; every codec in this module (struct.unpack,
    np.frombuffer, zlib, slice compares) accepts buffer objects, so decode
    stages consume the views directly.  Null rows yield empty views (Arrow
    offsets stay monotonic across nulls).  Same pattern as the flagship's
    read-fused feature extraction (stages/features.py).
    """
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_binary(col.type) or pa.types.is_large_string(col.type):
        off_dt = np.int64
    else:
        off_dt = np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=off_dt)[
        col.offset: col.offset + len(col) + 1]
    data_mv = memoryview(col.buffers()[2]) if col.buffers()[2] is not None \
        else memoryview(b"")
    return [data_mv[offs[i]:offs[i + 1]] for i in range(len(col))]


# --------------------------------------------------------------------------
# Spectral band energies + energy-weighted SimHash
# --------------------------------------------------------------------------

_FRAME_SECONDS = 0.5


def band_energies(
    pcm: np.ndarray, sr_hz: int, num_bands: int, fmin_hz: float, fmax_hz: float
) -> np.ndarray:
    """Mean power per log-spaced frequency band (length ``num_bands``).

    Band edges are fixed in Hz (independent of sample rate), and per-band
    power is averaged per Hz and normalized to sum 1 — so the vector is
    invariant to resampling (below ``fmax_hz``) and to truncation of a
    stationary signal.

    Spectra are estimated Welch-style: the clip is cut into frames of
    ``_FRAME_SECONDS`` (length in SECONDS, not samples — a tone's measured
    per-bin density scales with bin width, so bin width in Hz must match
    across sample rates for resample invariance), one batched 2-D rfft
    computes all frame spectra at once, and powers average across frames.
    ~10-20x faster than a single whole-clip rfft (arbitrary clip lengths
    hit pocketfft's Bluestein path for large prime factors) and a
    lower-variance PSD estimate; 0.5 s frames give 2 Hz resolution, finer
    than the narrowest log band (~2.8 Hz at the 100 Hz edge).
    """
    n = len(pcm)
    if n == 0:
        return np.zeros(num_bands, dtype=np.float64)
    x = pcm.astype(np.float64)
    L = int(round(sr_hz * _FRAME_SECONDS))
    if n >= 2 * L:
        k = n // L
        frames = x[: k * L].reshape(k, L)
        spec = (np.abs(np.fft.rfft(frames, axis=1)) ** 2).mean(axis=0)
        n_fft = L
    else:
        spec = np.abs(np.fft.rfft(x)) ** 2
        n_fft = n
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / sr_hz)
    edges = np.geomspace(fmin_hz, fmax_hz, num_bands + 1)
    idx = np.searchsorted(freqs, edges)
    out = np.zeros(num_bands, dtype=np.float64)
    for b in range(num_bands):
        lo, hi = idx[b], idx[b + 1]
        if hi > lo:
            out[b] = spec[lo:hi].mean()
    s = out.sum()
    return out / s if s > 0 else out


_simhash_proj_cache: dict[tuple[int, int, int], np.ndarray] = {}


def _simhash_projection(num_features: int, bits: int, seed: int) -> np.ndarray:
    key = (num_features, bits, seed)
    if key not in _simhash_proj_cache:
        rng = np.random.default_rng(seed ^ 0xA5D1)
        _simhash_proj_cache[key] = rng.choice([-1.0, 1.0], size=(num_features, bits))
    return _simhash_proj_cache[key]


def simhash_from_features(features: np.ndarray, bits: int, seed: int) -> int:
    """SimHash: bit_j = sign(sum_i w_i * r_ij) over a signed feature vector."""
    proj = _simhash_projection(len(features), bits, seed)
    v = features @ proj
    bitvals = (v > 0).astype(np.uint64)
    return int(np.bitwise_or.reduce(bitvals << np.arange(bits, dtype=np.uint64)))


def audio_fingerprint(pcm: np.ndarray, sr_hz: int, num_bands: int, bits: int,
                      fmin_hz: float, fmax_hz: float, seed: int) -> int:
    """64-bit spectral fingerprint: SimHash over energy-weighted
    adjacent-band log-energy deltas.

    Why deltas of log energies (not raw energies): raw energies are dominated
    by a handful of spectral peaks, so unrelated clips whose peaks share
    bands collide (measured ~800 false matches on a 300-clip corpus); the
    log-delta vector spreads information across the whole spectrum while the
    differencing cancels smooth systematic effects of resampling
    (interpolation droop).  Each delta is further weighted by
    sqrt(max adjacent band energy) so that deltas between noise-floor bands
    (whose log-energies fluctuate with the noise realization and with the
    per-Hz noise density, which depends on sample rate) contribute little.
    Measured on a 20-pair resample corpus + 40-clip unrelated corpus:
    same-content hamming <= 2, unrelated min 14, mean ~32 (unweighted the
    same numbers were <= 11 / 13 — no margin).
    """
    e = band_energies(pcm, sr_hz, num_bands, fmin_hz, fmax_hz)
    d = np.diff(np.log(e + 1e-12))
    w = np.sqrt(np.maximum(e[1:], e[:-1]))
    return simhash_from_features(d * w, bits, seed)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
