"""Vectorized hashing kernels: stable 64-bit content hashes, char-k-gram
rolling hashes, MinHash signatures, winnowed anchor grams.

Everything here is pure numpy over the raw byte buffers of Arrow string
arrays — zero row-level Python in the hot path.  These kernels are the
engine's replacement for the reference's quanteda char-3-gram DFM + TF-IDF
cosine machinery (``/root/reference/R/deduplicaters.R:327-345``): instead of
an all-pairs similarity matrix we compute per-row MinHash signatures whose
band hashes drive an LSH shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# splitmix64 constants — public-domain mixer (Steele et al., "Fast Splittable
# Pseudorandom Number Generators", OOPSLA 2014).
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)

_U64 = np.uint64
_MASK63 = np.uint64((1 << 63) - 1)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Avalanche-mix an array of uint64 (vectorized splitmix64 finalizer)."""
    with np.errstate(over="ignore"):
        x = (x + _SM_GAMMA).astype(_U64, copy=False)
        x = (x ^ (x >> _U64(30))) * _SM_M1
        x = (x ^ (x >> _U64(27))) * _SM_M2
        x = x ^ (x >> _U64(31))
    return x


def _string_buffers(col: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Return (byte_data:uint8[], offsets:int64[n+1]) for a utf8/binary column.

    Zero-copy view onto the Arrow buffers (after a cast to the large_*
    type, which copies only the 4->8 byte offset buffer).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        col = col.cast(pa.large_utf8())
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        col = col.cast(pa.large_binary())
    else:
        raise TypeError(f"expected string/binary column, got {t}")
    # nulls: treat as empty strings (offsets still well-formed in Arrow)
    bufs = col.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64, count=len(col) + 1 + col.offset)
    offsets = offsets[col.offset : col.offset + len(col) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return data, offsets


def hash_strings(col: pa.Array | pa.ChunkedArray, seed: int = 0) -> np.ndarray:
    """Stable vectorized 64-bit content hash of each string/binary value.

    FNV-1a over the bytes computed segment-wise with numpy (one pass over the
    concatenated buffer using a per-byte position weight trick is not exact
    FNV; instead we use a polynomial rolling scheme reduced per segment),
    then splitmix-finalized.  Deterministic across processes and runs — this
    is the engine's ``dedupe_naive`` key (``/root/reference/R/deduplicaters.R:208-223``).
    """
    data, offsets = _string_buffers(col)
    n = len(offsets) - 1
    lengths = np.diff(offsets)
    out = np.full(n, _U64(seed) ^ _SM_GAMMA, dtype=_U64)
    if len(data) == 0 or n == 0:
        return splitmix64(out ^ lengths.astype(_U64))
    # polynomial hash: H_i = sum_j data[s_i + j] * P^(L_i - 1 - j)  (mod 2^64)
    # computed with prefix products:   H_i = (S[e_i] - S[s_i]) * Pinv^{...}
    # To stay integer-exact mod 2^64 we use the standard prefix trick:
    #   pre[j] = sum_{t<j} data[t] * P^(j-1-t)   via recurrence pre = pre*P + d
    # which is inherently sequential; instead compute with weights
    #   W[j] = P^(N-1-j);  S = cumsum(data * W);  H_i = (S[e_i]-S[s_i]) * P^(e_i-N)
    # P is odd -> invertible mod 2^64, so P^(e_i - N) = Pinv^(N - e_i).
    P = np.uint64(0x100000001B3)  # odd multiplier (FNV prime)
    N = len(data)
    # powers P^k for k in [0, N) — computed by cumulative product (vectorized)
    with np.errstate(over="ignore"):
        powers = np.empty(N + 1, dtype=_U64)
        powers[0] = _U64(1)
        np.multiply.accumulate(np.full(N, P, dtype=_U64), out=powers[1:])
        w = powers[::-1][1:]  # P^(N-1-j)
        s = np.zeros(N + 1, dtype=_U64)
        np.cumsum(data.astype(_U64) * w, out=s[1:])
        pinv = _modinv_u64(P)
        # Pinv^(N - e_i)
        seg = s[offsets[1:]] - s[offsets[:-1]]
        exp = (N - offsets[1:]).astype(_U64)
        seg = seg * _pow_u64_vec(pinv, exp)
        out = out ^ seg ^ (lengths.astype(_U64) * _SM_M1)
    return splitmix64(out)


def _modinv_u64(a: np.uint64) -> np.uint64:
    """Multiplicative inverse of odd a modulo 2^64 (Newton iteration)."""
    a_ = int(a)
    x = a_  # 3 bits correct
    for _ in range(6):
        x = (x * (2 - a_ * x)) % (1 << 64)
    return np.uint64(x % (1 << 64))


def _pow_u64(base: np.uint64, exp: int) -> np.uint64:
    return np.uint64(pow(int(base), exp, 1 << 64))


def _pow_u64_vec(base: np.uint64, exps: np.ndarray) -> np.ndarray:
    """base**exps mod 2^64, vectorized via binary exponentiation over bits."""
    result = np.ones(len(exps), dtype=_U64)
    b = base
    e = exps.astype(_U64).copy()
    with np.errstate(over="ignore"):
        for _ in range(64):
            if not e.any():
                break
            odd = (e & _U64(1)).astype(bool)
            result[odd] = result[odd] * b
            e >>= _U64(1)
            b = b * b
    return result


def hash_binary_rows(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """64-bit content hash per binary row via blake2b (C, >1 GB/s).

    The vectorized polynomial scheme in ``hash_strings`` allocates an
    8x-size powers array over the concatenated buffer — fine for short
    strings, pathological for multi-hundred-KB audio payloads (measured
    12 ms/row); blake2b over zero-copy memoryview slices is ~0.2 ms/row.
    """
    import hashlib

    data, offsets = _string_buffers(col)
    mv = memoryview(data)
    n = len(offsets) - 1
    out = np.empty(n, dtype=_U64)
    for i in range(n):
        h = hashlib.blake2b(mv[offsets[i]:offsets[i + 1]], digest_size=8)
        out[i] = int.from_bytes(h.digest(), "little")
    return out


def shingle_hashes(
    col: pa.Array | pa.ChunkedArray, k: int, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """All char-k-gram rolling hashes of every string in ``col``.

    Returns ``(values:uint64[], doc_offsets:int64[n+1])`` where
    ``values[doc_offsets[i]:doc_offsets[i+1]]`` are the (multiset of)
    shingle hashes of document i.  Documents shorter than ``k`` get a single
    whole-string hash so they still participate.

    Fully vectorized: one rolling-hash pass over the concatenated byte
    buffer, boundary-crossing windows masked out via offset arithmetic.
    """
    data, offsets = _string_buffers(col)
    n = len(offsets) - 1
    N = len(data)
    lengths = np.diff(offsets)
    P = np.uint64(0x9E3779B97F4A7C15 | 1)
    if N >= k and n > 0:
        with np.errstate(over="ignore"):
            H = np.zeros(N - k + 1, dtype=_U64)
            for j in range(k):
                H = H * P + data[j : N - k + 1 + j].astype(_U64)
            H = splitmix64(H ^ _U64(seed))
    else:
        H = np.empty(0, dtype=_U64)

    counts = np.maximum(lengths - k + 1, 0).astype(np.int64)
    short = lengths < k  # docs shorter than k -> 1 whole-string shingle
    counts[short & (lengths > 0)] = 1
    counts[lengths == 0] = 0
    out_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offsets[1:])
    total = int(out_offsets[-1])
    values = np.empty(total, dtype=_U64)
    if total:
        # start position in `data` of each emitted shingle
        starts = (
            np.repeat(offsets[:-1], counts)
            + np.arange(total, dtype=np.int64)
            - np.repeat(out_offsets[:-1], counts)
        )
        normal = np.repeat(~short, counts)
        idx = starts[normal]
        if len(idx):
            values[normal] = H[idx]
        if (~normal).any():
            # short docs: whole-string hash
            short_ids = np.flatnonzero(short & (lengths > 0))
            sub = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            short_hashes = hash_strings(sub.take(pa.array(short_ids)), seed=seed ^ 0x5BD1)
            values[~normal] = short_hashes
    return values, out_offsets


def minhash_signatures(
    values: np.ndarray, doc_offsets: np.ndarray, num_perm: int, seed: int
) -> np.ndarray:
    """MinHash signatures, shape (n_docs, num_perm) uint64.

    ``sig[i, p] = min over doc i's shingles of (a_p * h + b_p  mod 2^64)``.
    Each permutation is one vectorized multiply-add + ``minimum.reduceat``
    over the document segments — no per-row Python.  Empty documents get the
    all-ones sentinel signature (never matches anything).

    This table of (a_p, b_p) coefficients is the stateful analog of the
    reference's TF-IDF model built per dedup call
    (``/root/reference/R/deduplicaters.R:327-345``); stages hold it once per
    actor (see stages/lsh.py).
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) * _U64(2) + _U64(1)
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    n = len(doc_offsets) - 1
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=_U64)
    counts = np.diff(doc_offsets)
    nonempty = counts > 0
    if not nonempty.any():
        return sig
    starts = doc_offsets[:-1][nonempty]
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            hv = values * a[p] + b[p]
            sig[nonempty, p] = np.minimum.reduceat(hv, starts)
    return sig


def band_hashes(sig: np.ndarray, bands: int, rows: int, seed: int = 0) -> np.ndarray:
    """Collapse signatures (n, bands*rows) -> LSH band hashes (n, bands) uint64."""
    n = sig.shape[0]
    grouped = sig.reshape(n, bands, rows)
    with np.errstate(over="ignore"):
        h = np.full((n, bands), _U64(seed) ^ _SM_GAMMA, dtype=_U64)
        for r in range(rows):
            h = splitmix64(h ^ grouped[:, :, r])
        # mix in the band index so identical row-slices in different bands
        # don't collide into one bucket
        h = splitmix64(h ^ np.arange(bands, dtype=_U64)[None, :])
    return h


def _unique_per_segment(vals: np.ndarray, offs: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deduplicate hash values within each segment.  Returns
    (unique_vals, seg_of_val, uniq_count_per_segment) — one vectorized
    lexsort, no per-segment Python."""
    n = len(offs) - 1
    seg = np.repeat(np.arange(n), np.diff(offs))
    order = np.lexsort((vals, seg))
    v, s = vals[order], seg[order]
    first = np.ones(len(v), dtype=bool)
    first[1:] = (v[1:] != v[:-1]) | (s[1:] != s[:-1])
    v, s = v[first], s[first]
    counts = np.bincount(s, minlength=n)
    return v, s, counts


def pairwise_jaccard(
    lv: np.ndarray, lo: np.ndarray, rv: np.ndarray, ro: np.ndarray
) -> np.ndarray:
    """Exact Jaccard for n (left, right) shingle-multiset pairs, fully
    vectorized: per-side segment dedup, then one sort of the tagged union —
    a value appearing on both sides of pair i contributes 1 to inter[i]."""
    n = len(lo) - 1
    la, ls, lc = _unique_per_segment(lv, lo)
    ra, rs, rc = _unique_per_segment(rv, ro)
    allv = np.concatenate((la, ra))
    alls = np.concatenate((ls, rs))
    order = np.lexsort((allv, alls))
    v, s = allv[order], alls[order]
    dup = np.zeros(len(v), dtype=bool)
    if len(v) > 1:
        dup[1:] = (v[1:] == v[:-1]) & (s[1:] == s[:-1])
    inter = np.bincount(s[dup], minlength=n).astype(np.float64)
    union = lc + rc - inter
    both_empty = (lc == 0) & (rc == 0)
    out = np.zeros(n, dtype=np.float64)
    nz = union > 0
    out[nz] = inter[nz] / union[nz]
    out[both_empty] = 1.0
    return out


def jaccard_pairs_dict(left_col, right_col, k: int, seed: int = 0) -> np.ndarray:
    """Exact char-k Jaccard for n (left_text, right_text) pairs.

    Each DISTINCT text in the batch is shingled/deduped/sorted ONCE
    (dictionary encoding) — candidate pairs repeat the same hot documents
    ~100x, so this memoization plus a searchsorted merge-intersection per
    pair is ~20x faster than re-shingling per pair (measured 145ms → 7ms
    per 1024-pair batch).
    """
    import pyarrow as pa

    if isinstance(left_col, pa.ChunkedArray):
        left_col = left_col.combine_chunks()
    if isinstance(right_col, pa.ChunkedArray):
        right_col = right_col.combine_chunks()
    n = len(left_col)
    if n == 0:
        return np.empty(0, np.float64)
    import pyarrow.compute as _pc

    both = pa.concat_arrays([left_col.cast(pa.large_utf8()),
                             right_col.cast(pa.large_utf8())])
    both = _pc.fill_null(both, "")  # null text == empty text (jaccard 0)
    enc = both.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vals, offs = shingle_hashes(enc.dictionary, k, seed=seed)
    v, _, cnt = _unique_per_segment(vals, offs)
    doc_offs = np.zeros(len(cnt) + 1, dtype=np.int64)
    np.cumsum(cnt, out=doc_offs[1:])
    lc, rc = codes[:n], codes[n:]
    jac = np.zeros(n, dtype=np.float64)
    # identical texts (same dictionary code) need no merge — hot buckets are
    # full of equal-transcript pairs and this skips their searchsorted pass
    eq = lc == rc
    jac[eq] = 1.0   # same set; empty==empty is 1.0 by the convention below
    for i in np.flatnonzero(~eq):
        a = v[doc_offs[lc[i]]:doc_offs[lc[i] + 1]]
        b = v[doc_offs[rc[i]]:doc_offs[rc[i] + 1]]
        na, nb = len(a), len(b)
        if na == 0 and nb == 0:
            jac[i] = 1.0
            continue
        if na == 0 or nb == 0:
            continue
        if na > nb:
            a, b, na, nb = b, a, nb, na
        idx = np.searchsorted(b, a)
        idx[idx == nb] = nb - 1
        inter = int((b[idx] == a).sum())
        jac[i] = inter / (na + nb - inter)
    return jac


def jaccard_from_hashsets(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two shingle-hash multisets (as sets)."""
    sa = np.unique(a)
    sb = np.unique(b)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    return inter / (len(sa) + len(sb) - inter)


def winnow_anchors(
    col: pa.Array | pa.ChunkedArray,
    gram: int,
    stride: int,
    min_len: int,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Content-defined sampled gram hashes for containment candidate gen.

    Returns ``(values:uint64[], doc_offsets:int64[n+1])`` where the values
    are the subset of char-``gram`` rolling hashes with ``h % stride == 0``
    (selection depends only on gram content, so a substring and its container
    select the SAME grams — the winnowing/MOSS fingerprint idea).  Documents
    shorter than ``min_len`` keep every gram so short clips still anchor.

    This stage class replaces the reference's exact-containment extraction
    (C/O-in-name peeling, ``/root/reference/R/standardizers.R:1148-1182``)
    with a scalable candidate-generation + verify design.
    """
    values, doc_offsets = shingle_hashes(col, gram, seed=seed)
    counts = np.diff(doc_offsets)
    keep = (values % _U64(stride)) == 0
    # short docs keep everything
    doc_len_per_val = np.repeat(counts, counts)  # gram-count of owning doc
    keep |= doc_len_per_val < min_len
    # also always keep the first gram of each doc (guaranteed probe anchor)
    first_idx = doc_offsets[:-1][counts > 0]
    keep[first_idx] = True
    keep_cum = np.zeros(len(values) + 1, dtype=np.int64)
    np.cumsum(keep, out=keep_cum[1:])
    new_offsets = keep_cum[doc_offsets]
    return values[keep], new_offsets


def token_shingle_hashes(
    tokens: np.ndarray, offsets: np.ndarray, k: int, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """All k-gram rolling hashes over integer TOKEN sequences — the
    token-domain analog of ``shingle_hashes`` (audio frame tokens, word ids)
    instead of characters.

    ``tokens`` is the concatenation of every sequence's tokens;
    ``offsets[i]:offsets[i+1]`` delimits sequence i.  Returns
    ``(values:uint64[], out_offsets:int64[n+1])``.  Sequences shorter than
    ``k`` (but non-empty) emit one whole-sequence hash.  Fully vectorized:
    one k-pass rolling hash over the concatenated buffer with
    boundary-crossing windows masked by offset arithmetic; short sequences
    are hashed with a weighted segment sum (``_pow_u64_vec`` position
    weights + ``np.add.reduceat``) — no per-sequence Python anywhere.
    """
    tokens = tokens.astype(_U64)
    offsets = offsets.astype(np.int64)
    n = len(offsets) - 1
    N = len(tokens)
    lengths = np.diff(offsets)
    P = _U64(0x9E3779B97F4A7C15 | 1)
    if N >= k and n > 0:
        with np.errstate(over="ignore"):
            H = np.zeros(N - k + 1, dtype=_U64)
            for j in range(k):
                H = H * P + (tokens[j: N - k + 1 + j] + _U64(1))
            H = splitmix64(H ^ _U64(seed))
    else:
        H = np.empty(0, dtype=_U64)

    counts = np.maximum(lengths - k + 1, 0).astype(np.int64)
    short = (lengths < k) & (lengths > 0)
    counts[short] = 1
    out_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offsets[1:])
    total = int(out_offsets[-1])
    values = np.empty(total, dtype=_U64)
    if not total:
        return values, out_offsets
    starts = (
        np.repeat(offsets[:-1], counts)
        + np.arange(total, dtype=np.int64)
        - np.repeat(out_offsets[:-1], counts)
    )
    normal = np.repeat(~short, counts)
    idx = starts[normal]
    if len(idx):
        values[normal] = H[idx]
    if short.any():
        # whole-sequence polynomial hash, same form as the rolling pass:
        # sum((t_i + 1) * P^(L-1-i)), computed as a weighted segment sum
        sid = np.flatnonzero(short)
        seg_len = lengths[sid]
        tok_idx = (np.repeat(offsets[:-1][sid], seg_len)
                   + np.arange(int(seg_len.sum()), dtype=np.int64)
                   - np.repeat(np.concatenate(([0], np.cumsum(seg_len)[:-1])),
                               seg_len))
        pos_in_seg = (np.arange(int(seg_len.sum()), dtype=np.int64)
                      - np.repeat(np.concatenate(([0],
                                                  np.cumsum(seg_len)[:-1])),
                                  seg_len))
        rev = np.repeat(seg_len, seg_len) - 1 - pos_in_seg
        with np.errstate(over="ignore"):
            terms = (tokens[tok_idx] + _U64(1)) * _pow_u64_vec(P, rev)
        seg_starts = np.concatenate(([0], np.cumsum(seg_len)[:-1]))
        sums = np.add.reduceat(terms, seg_starts)
        values[~normal] = splitmix64(sums.astype(_U64) ^ _U64(seed))
    return values, out_offsets
