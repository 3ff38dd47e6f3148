"""Suffix-array substring search (the containment stage's second verify
backend).

The reference's only exact-substring machinery is pattern-specific regex
peels (``/root/reference/R/standardizers.R:1148-1182``); the engine
generalizes containment verification to arbitrary contained/container
pairs.  Backend ``scan`` (stages/containment.py) runs one C
``pc.match_substring`` kernel per unique contained string; this module is
the ``suffix_array`` backend: build ONE generalized suffix array over the
batch's unique container texts, then answer every unique pattern with two
binary searches (O(|p| log N) byte compares) instead of a linear scan of
its candidate containers.  The two backends are tested equal
(tests/test_suffix.py) and selected per-config
(``DedupConfig.containment_backend``).

Algorithm notes:
- ``build_suffix_array`` is Manber–Myers prefix doubling, fully
  vectorized: each doubling round is one ``np.lexsort`` over (rank,
  rank-shifted-by-k) plus a cumulative-sum re-rank, terminating as soon as
  all ranks are distinct (natural text exits after ~log(max-LCP) rounds,
  not log(N)).
- Container texts are concatenated with a ``\\x00`` separator, which no
  UTF-8 text contains, so a pattern match can never straddle a document
  boundary; mapping a match position back to its document is one
  ``np.searchsorted`` against the document start offsets.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "build_suffix_array",
    "sa_range",
    "concat_docs",
    "docs_containing",
]


def build_suffix_array(data: np.ndarray) -> np.ndarray:
    """Suffix array of ``data`` (uint8 array) by vectorized prefix doubling.

    Returns int64 positions such that the suffixes
    ``data[sa[0]:] < data[sa[1]:] < ...`` in bytewise order.
    """
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = data.astype(np.int64)
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        if k < n:
            key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1 = rank[order]
        r2 = key2[order]
        diff = np.empty(n, dtype=np.int64)
        diff[0] = 0
        if n > 1:
            diff[1:] = ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(
                np.int64)
        ranks_sorted = np.cumsum(diff)
        if n == 1 or ranks_sorted[-1] == n - 1:
            return order.astype(np.int64)
        rank = np.empty(n, dtype=np.int64)
        rank[order] = ranks_sorted
        k *= 2


def sa_range(data: bytes, sa: np.ndarray, pattern: bytes) -> tuple[int, int]:
    """``[lo, hi)`` range of suffixes in ``sa`` that start with ``pattern``.

    Two binary searches; each step is one C-level bytes compare of at most
    ``len(pattern)`` bytes.  An empty pattern matches every suffix.
    """
    n = len(sa)
    m = len(pattern)
    if m == 0:
        return 0, n
    # lo: first suffix with prefix >= pattern
    lo, hi = 0, n
    while lo < hi:
        mid = (lo + hi) // 2
        p = sa[mid]
        if data[p:p + m] < pattern:
            lo = mid + 1
        else:
            hi = mid
    first = lo
    # hi: first suffix with prefix > pattern
    lo, hi = first, n
    while lo < hi:
        mid = (lo + hi) // 2
        p = sa[mid]
        if data[p:p + m] <= pattern:
            lo = mid + 1
        else:
            hi = mid
    return first, lo


def concat_docs(docs: list[bytes]) -> tuple[bytes, np.ndarray]:
    """Concatenate documents with ``\\x00`` separators.

    Returns ``(blob, starts)`` where ``starts[i]`` is the byte offset of
    document ``i`` in ``blob``.  The separator guarantees a pattern that
    contains no NUL cannot match across a document boundary.
    """
    starts = np.zeros(len(docs), dtype=np.int64)
    off = 0
    for i, d in enumerate(docs):
        starts[i] = off
        off += len(d) + 1
    return b"\x00".join(docs), starts


def docs_containing(blob: bytes, sa: np.ndarray, starts: np.ndarray,
                    pattern: bytes) -> np.ndarray:
    """Sorted unique indices of documents (per ``concat_docs`` order) that
    contain ``pattern`` as a substring."""
    lo, hi = sa_range(blob, sa, pattern)
    if lo >= hi:
        return np.empty(0, dtype=np.int64)
    pos = sa[lo:hi]
    doc = np.searchsorted(starts, pos, side="right") - 1
    return np.unique(doc)


def max_adjacent_lcp(data: np.ndarray) -> int:
    """Length of the longest REPEATED substring of ``data`` (uint8): the
    classic SA identity — it equals the maximum LCP of suffix-array-adjacent
    suffixes.  Computed by vectorized survival: at step k the pairs whose
    first k bytes agree survive; the answer is the step at which the last
    pair dies.  O(n · answer) single-array work, no per-suffix Python."""
    n = len(data)
    if n < 2:
        return 0
    sa = build_suffix_array(data)
    a, b = sa[:-1], sa[1:]
    cur = np.arange(n - 1)
    k = 0
    while True:
        ai = a[cur] + k
        bi = b[cur] + k
        m = (ai < n) & (bi < n)
        sel = cur[m]
        if not len(sel):
            return k
        eq = data[a[sel] + k] == data[b[sel] + k]
        cur = sel[eq]
        if not len(cur):
            return k
        k += 1
