"""Suffix-array module unit tests + scan/suffix_array backend equality.

The SA build is checked against the naive sorted-suffixes oracle on random
and adversarially repetitive inputs; range queries against naive substring
counting; and the two containment verify backends against each other on
the synth clip corpus (same edges, bit-for-bit).
"""

import numpy as np
import pyarrow as pa
import pytest

from who_owns_mass_processing_ray.functions import suffix as sx


def _naive_sa(b: bytes) -> list[int]:
    return sorted(range(len(b)), key=lambda i: b[i:])


@pytest.mark.parametrize("seed,n,alpha", [
    (0, 1, 4), (1, 2, 2), (2, 50, 3), (3, 500, 2), (4, 500, 26),
    (5, 1000, 1),          # aaaa... worst case for prefix doubling
    (6, 733, 2),
])
def test_sa_matches_naive(seed, n, alpha):
    rng = np.random.default_rng(seed)
    data = rng.integers(97, 97 + alpha, size=n).astype(np.uint8)
    got = sx.build_suffix_array(data)
    assert got.tolist() == _naive_sa(data.tobytes())


def test_sa_empty():
    assert len(sx.build_suffix_array(np.empty(0, np.uint8))) == 0


def test_sa_fibonacci_string():
    # fibonacci strings maximize LCP structure
    a, b = b"a", b"ab"
    for _ in range(10):
        a, b = b, b + a
    data = np.frombuffer(b, dtype=np.uint8)
    assert sx.build_suffix_array(data).tolist() == _naive_sa(b)


@pytest.mark.parametrize("seed", range(5))
def test_sa_range_counts_occurrences(seed):
    rng = np.random.default_rng(100 + seed)
    b = bytes(rng.integers(97, 100, size=400).astype(np.uint8))
    sa = sx.build_suffix_array(np.frombuffer(b, dtype=np.uint8))
    for m in (1, 2, 3, 5, 9):
        for _ in range(20):
            i = int(rng.integers(0, len(b) - m))
            pat = b[i:i + m]
            lo, hi = sx.sa_range(b, sa, pat)
            naive = sum(1 for j in range(len(b) - m + 1)
                        if b[j:j + m] == pat)
            assert hi - lo == naive
    # absent pattern
    lo, hi = sx.sa_range(b, sa, b"zzzz")
    assert lo == hi
    # empty pattern matches every suffix
    assert sx.sa_range(b, sa, b"") == (0, len(b))


@pytest.mark.parametrize("seed", range(3))
def test_docs_containing_matches_python_in(seed):
    rng = np.random.default_rng(200 + seed)
    docs = [bytes(rng.integers(97, 101, size=int(rng.integers(3, 60)))
                  .astype(np.uint8)) for _ in range(40)]
    blob, starts = sx.concat_docs(docs)
    sa = sx.build_suffix_array(np.frombuffer(blob, dtype=np.uint8))
    pats = [d[:4] for d in docs[:10]] + [b"qq", docs[5], docs[7][2:9]]
    for p in pats:
        got = sx.docs_containing(blob, sa, starts, p).tolist()
        want = [i for i, d in enumerate(docs) if p in d]
        assert got == want, p


def test_docs_containing_no_cross_boundary_match():
    docs = [b"abcde", b"fghij"]
    blob, starts = sx.concat_docs(docs)
    sa = sx.build_suffix_array(np.frombuffer(blob, dtype=np.uint8))
    # 'ef' spans the boundary of doc0|doc1 and must NOT match
    assert sx.docs_containing(blob, sa, starts, b"ef").tolist() == []
    assert sx.docs_containing(blob, sa, starts, b"de").tolist() == [0]
    # pattern running off the end of the last doc must not match
    assert sx.docs_containing(blob, sa, starts, b"ijk").tolist() == []


def test_containment_backends_equal(ray_session, small_corpus):
    """scan and suffix_array verify backends emit identical edge sets on
    the synth clip corpus (which plants exact containment cuts)."""
    import ray
    from who_owns_mass_processing_ray.config import DedupConfig
    from who_owns_mass_processing_ray.stages import containment as ct

    feats = ray.data.read_parquet(small_corpus + "/clips") \
        .map_batches(lambda t: pa.table({
            "clip_id": t["clip_id"],
            "transcript_norm": t["transcript"],
        }), batch_format="pyarrow")

    def edges(backend):
        cfg = DedupConfig(num_parts=8, containment_backend=backend)
        out = ct.containment_edges(feats, cfg, num_parts=8,
                                   num_partitions=8).take_all()
        return sorted((r["left_id"], r["right_id"]) for r in out)

    scan = edges("scan")
    sarr = edges("suffix_array")
    assert scan == sarr
    assert len(scan) > 0
