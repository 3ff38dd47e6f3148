"""Content-defined chunking (gear rolling hash) — the storage-tier dedup
primitive: identical byte runs chunk identically regardless of where they
sit inside a blob, so shared content between blobs dedups at chunk
granularity (re-encodes that share an audio payload, copied file segments).

Public-knowledge algorithm (gear-hash CDC as in FastCDC, Xia et al., USENIX
ATC'16): a 64-byte rolling window hash ``h_i = sum_{j<64} G[b_{i-j}] << j``
cuts wherever the top ``mask_bits`` of ``h`` are zero (FastCDC masks high
bits: the sum's low bits depend only on the newest few window bytes, while
its high bits mix all 64 — the mask position sets the expected chunk size).
Everything below is vectorized over the CONCATENATED byte buffer of a whole
Arrow batch — the window recurrence unrolls into 64 shifted adds, cut
eligibility is masked per blob so chunking is a pure function of each
blob's own bytes (deterministic across batch sizes and partitionings).
"""

from __future__ import annotations

import numpy as np

from who_owns_mass_processing_ray.functions.hashing import (
    _pow_u64_vec,
    splitmix64,
)

_U64 = np.uint64
_WIN = 64                    # rolling window, bytes
# Deterministic gear table: splitmix64 over 0..255 with a fixed seed, NOT a
# numpy Generator — persisted chunk boundaries/hashes must survive NumPy
# upgrades (Generator bit-streams are only stable within a NumPy version).
_GEAR = splitmix64(np.arange(256, dtype=_U64) ^ _U64(0xCDC0DE))
_P = _U64(0x9E3779B97F4A7C15 | 1)
DEFAULT_MASK_BITS = 11       # expected chunk ~2 KiB


def cdc_chunks(
    data: np.ndarray, offsets: np.ndarray, mask_bits: int = DEFAULT_MASK_BITS,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Chunk every blob in a concatenated uint8 buffer.

    ``data`` is the concatenation of all blobs; ``offsets[i]:offsets[i+1]``
    delimits blob i.  Returns ``(blob_idx, chunk_start, chunk_len,
    chunk_hash)`` — one entry per chunk, chunks tile each blob exactly.
    ``chunk_hash`` is a 64-bit polynomial content hash (splitmix-finalized),
    identical for identical chunk bytes.
    """
    data = np.ascontiguousarray(data, dtype=np.uint8)
    offsets = offsets.astype(np.int64)
    N = len(data)
    n = len(offsets) - 1
    lengths = np.diff(offsets)

    # --- rolling gear hash over the whole buffer (64 shifted adds) --------
    gb = _GEAR[data]
    h = np.zeros(N, dtype=_U64)
    with np.errstate(over="ignore"):
        for j in range(_WIN):
            h[j:] += gb[: N - j] << _U64(j)

    # --- cut positions: top ``mask_bits`` of h all zero (FastCDC masks the
    #     HIGH bits — the gear sum's low bits depend only on the newest few
    #     bytes, its high bits mix the whole 64-byte window), window fully
    #     inside the blob, never on a blob's final byte (the blob end is
    #     already a boundary)
    cut = (h >> _U64(64 - mask_bits)) == 0
    if N:
        pos = np.arange(N, dtype=np.int64)
        rel = pos - np.repeat(offsets[:-1], lengths)
        cut &= rel >= _WIN - 1
        last_byte = offsets[1:][lengths > 0] - 1
        cut[last_byte] = False
    cutpos = np.flatnonzero(cut)

    # --- chunk table: starts = blob starts U (cut+1); ends = next start
    #     within the same blob, else the blob end ---------------------------
    starts = np.sort(np.concatenate(
        (offsets[:-1][lengths > 0], cutpos + 1)))
    blob_idx = np.searchsorted(offsets, starts, side="right") - 1
    nxt = np.append(starts[1:], N)
    ends = np.minimum(nxt, offsets[blob_idx + 1])
    lens = ends - starts

    # --- content hash per chunk: sum((b+1) * P^(L-1-i)) via one reduceat ---
    if len(starts):
        rev = np.repeat(ends, lens) - 1 - np.arange(N, dtype=np.int64)
        with np.errstate(over="ignore"):
            terms = (data.astype(_U64) + _U64(1)) * _pow_u64_vec(_P, rev)
        sums = np.add.reduceat(terms, starts)
        hashes = splitmix64(sums.astype(_U64) ^ _U64(seed))
    else:
        hashes = np.empty(0, dtype=_U64)
    return blob_idx, starts - offsets[blob_idx], lens, hashes


def cdc_chunks_reference(blob: bytes, mask_bits: int = DEFAULT_MASK_BITS,
                         seed: int = 0) -> list[tuple[int, int, int]]:
    """Slow, obviously-correct per-blob recompute (tests only): explicit
    byte loop of the same recurrence.  Returns [(start, len, hash)]."""
    n = len(blob)
    if n == 0:
        return []
    cuts = []
    h = 0
    window: list[int] = []
    for i, b in enumerate(blob):
        window.append(int(_GEAR[b]))
        if len(window) > _WIN:
            window.pop(0)
        h = 0
        for j, g in enumerate(reversed(window)):
            h = (h + (g << j)) % (1 << 64)
        if i >= _WIN - 1 and i != n - 1 and (h >> (64 - mask_bits)) == 0:
            cuts.append(i)
    starts = [0] + [c + 1 for c in cuts]
    ends = [c + 1 for c in cuts] + [n]
    out = []
    for s, e in zip(starts, ends):
        acc = 0
        for b in blob[s:e]:
            acc = (acc * int(_P) + b + 1) % (1 << 64)
        hv = int(splitmix64(np.array([acc], dtype=_U64) ^ _U64(seed))[0])
        out.append((s, e - s, hv))
    return out
