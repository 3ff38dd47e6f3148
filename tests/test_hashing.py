"""Unit tests for the vectorized hashing kernels (functions/hashing.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from who_owns_mass_processing_ray.functions import hashing as hx


def _brute_shingles(s: str, k: int) -> set[str]:
    if len(s) < k:
        return {s} if s else set()
    return {s[i : i + k] for i in range(len(s) - k + 1)}


class TestHashStrings:
    def test_deterministic_and_distinct(self):
        col = pa.array(["abc", "abd", "abc", "", "xyzzy"])
        h1 = hx.hash_strings(col)
        h2 = hx.hash_strings(col)
        np.testing.assert_array_equal(h1, h2)
        assert h1[0] == h1[2]
        assert h1[0] != h1[1]
        assert len({int(x) for x in h1}) == 4

    def test_independent_of_chunking_and_neighbors(self):
        # hash of a value must not depend on what else is in the column
        a = hx.hash_strings(pa.array(["hello world"]))
        b = hx.hash_strings(pa.array(["prefix", "hello world", "suffix"]))
        assert int(a[0]) == int(b[1])
        chunked = pa.chunked_array([["hello world"], ["other"]])
        c = hx.hash_strings(chunked)
        assert int(c[0]) == int(a[0])

    def test_seed_changes_hash(self):
        col = pa.array(["same"])
        assert int(hx.hash_strings(col, seed=0)[0]) != int(hx.hash_strings(col, seed=1)[0])

    def test_binary_column(self):
        col = pa.array([b"\x00\x01\x02", b"\x00\x01\x03"], type=pa.large_binary())
        h = hx.hash_strings(col)
        assert int(h[0]) != int(h[1])

    def test_no_length_extension_confusion(self):
        # "ab"+"c" vs "a"+"bc" as adjacent values must differ from each other's
        # concatenation hashes
        h = hx.hash_strings(pa.array(["ab", "c", "a", "bc", "abc"]))
        vals = [int(x) for x in h]
        assert vals[0] != vals[2]
        assert vals[1] != vals[3]
        assert len(set(vals)) == 5


class TestShingleHashes:
    @pytest.mark.parametrize("k", [2, 3, 5])
    def test_matches_brute_force_sets(self, k):
        docs = ["hello world", "abcde", "aa", "", "the quick brown fox", "aaaa"]
        col = pa.array(docs)
        vals, offs = hx.shingle_hashes(col, k)
        for i, d in enumerate(docs):
            got = vals[offs[i] : offs[i + 1]]
            expect = _brute_shingles(d, k)
            # distinct hash count equals distinct shingle count (no collisions
            # at this scale), and multiset size equals window count
            assert len(np.unique(got)) == len(expect)
            if len(d) >= k:
                assert len(got) == len(d) - k + 1

    def test_same_shingle_same_hash_across_docs(self):
        col = pa.array(["abcdef", "xxabcdexx"])
        vals, offs = hx.shingle_hashes(col, 5)
        d0 = set(vals[offs[0] : offs[1]].tolist())
        d1 = set(vals[offs[1] : offs[2]].tolist())
        # shared shingle "abcde" must hash identically in both docs
        assert d0 & d1

    def test_nulls_and_empty(self):
        col = pa.array(["abc", None, ""])
        vals, offs = hx.shingle_hashes(col, 2)
        assert offs[-1] == len(vals)
        assert offs[2] - offs[1] == 0  # null -> no shingles
        assert offs[3] - offs[2] == 0  # empty -> no shingles


class TestMinHash:
    def test_estimates_jaccard(self):
        rng = np.random.default_rng(0)
        docs = []
        base = "the quick brown fox jumps over the lazy dog " * 4
        docs.append(base)
        docs.append(base[:-10] + " extra tail")  # high jaccard
        docs.append("completely different content here entirely")  # low
        col = pa.array(docs)
        vals, offs = hx.shingle_hashes(col, 4)
        sig = hx.minhash_signatures(vals, offs, 256, seed=7)
        est01 = (sig[0] == sig[1]).mean()
        est02 = (sig[0] == sig[2]).mean()
        j01 = hx.jaccard_from_hashsets(vals[offs[0]:offs[1]], vals[offs[1]:offs[2]])
        assert abs(est01 - j01) < 0.12
        assert est02 < 0.05

    def test_empty_doc_sentinel(self):
        vals, offs = hx.shingle_hashes(pa.array(["", "abcd"]), 3)
        sig = hx.minhash_signatures(vals, offs, 16, seed=1)
        assert (sig[0] == np.iinfo(np.uint64).max).all()
        assert not (sig[1] == np.iinfo(np.uint64).max).all()

    def test_band_hashes_identical_iff_band_equal(self):
        vals, offs = hx.shingle_hashes(pa.array(["abcdefgh", "abcdefgh", "zzzzzzzz"]), 3)
        sig = hx.minhash_signatures(vals, offs, 16, seed=3)
        bands = hx.band_hashes(sig, 4, 4, seed=3)
        np.testing.assert_array_equal(bands[0], bands[1])
        assert not (bands[0] == bands[2]).any()


class TestWinnowAnchors:
    def test_substring_shares_anchors(self):
        container = "the quick brown fox jumps over the lazy dog again and again"
        contained = "jumps over the lazy dog"
        col = pa.array([container, contained])
        vals, offs = hx.winnow_anchors(col, gram=8, stride=4, min_len=12)
        a0 = set(vals[offs[0] : offs[1]].tolist())
        a1 = set(vals[offs[1] : offs[2]].tolist())
        # winnowing selection is content-defined: every anchor of the
        # contained string interior must appear in the container's set
        assert a1 & a0, "contained substring must share >=1 anchor"

    def test_short_docs_keep_all_grams(self):
        col = pa.array(["abcdefghij"])  # 3 grams of size 8 -> < min_len 12
        vals, offs = hx.winnow_anchors(col, gram=8, stride=4, min_len=12)
        assert offs[1] - offs[0] == 3


class TestU64Helpers:
    def test_modinv(self):
        p = np.uint64(0x100000001B3)
        inv = hx._modinv_u64(p)
        assert (int(p) * int(inv)) % (1 << 64) == 1

    def test_pow_vec(self):
        base = np.uint64(3)
        exps = np.array([0, 1, 5, 63], dtype=np.uint64)
        out = hx._pow_u64_vec(base, exps)
        for e, o in zip(exps, out):
            assert int(o) == pow(3, int(e), 1 << 64)


class TestTokenShingleHashes:
    def test_rolling_matches_across_segmentation(self):
        import numpy as np

        from who_owns_mass_processing_ray.functions import hashing as hx

        rng = np.random.default_rng(0)
        a = rng.integers(0, 100, size=50).astype(np.uint64)
        b = rng.integers(0, 100, size=30).astype(np.uint64)
        # hashed together vs separately -> identical per-segment values
        v1, o1 = hx.token_shingle_hashes(
            np.concatenate([a, b]), np.array([0, 50, 80]), 5)
        va, _ = hx.token_shingle_hashes(a, np.array([0, 50]), 5)
        vb, _ = hx.token_shingle_hashes(b, np.array([0, 30]), 5)
        np.testing.assert_array_equal(v1[o1[0]:o1[1]], va)
        np.testing.assert_array_equal(v1[o1[1]:o1[2]], vb)

    def test_shifted_sequence_shares_shingles(self):
        import numpy as np

        from who_owns_mass_processing_ray.functions import hashing as hx

        rng = np.random.default_rng(1)
        a = rng.integers(0, 9, size=40).astype(np.uint64)
        v, o = hx.token_shingle_hashes(
            np.concatenate([a, a[3:]]), np.array([0, 40, 77]), 4)
        sa, sb = set(v[o[0]:o[1]].tolist()), set(v[o[1]:o[2]].tolist())
        assert sb <= sa and len(sb) >= len(sa) - 4

    def test_short_and_empty_segments(self):
        import numpy as np

        from who_owns_mass_processing_ray.functions import hashing as hx

        toks = np.array([5, 6, 5, 6, 1, 2, 3, 4, 5], np.uint64)
        offs = np.array([0, 2, 4, 4, 9])   # short, short, empty, normal
        v, o = hx.token_shingle_hashes(toks, offs, 3)
        assert list(np.diff(o)) == [1, 1, 0, 3]
        assert v[o[0]] == v[o[1]]          # identical short segments


class TestCdcChunks:
    """Content-defined chunking (functions/cdc.py)."""

    def test_vectorized_matches_reference_loop(self):
        import numpy as np

        from who_owns_mass_processing_ray.functions import cdc

        rng = np.random.default_rng(7)
        blobs = [rng.integers(0, 256, size=s).astype(np.uint8).tobytes()
                 for s in (9000, 300, 0, 5000, 64, 63)]
        data = np.frombuffer(b"".join(blobs), np.uint8)
        offsets = np.array(np.cumsum([0] + [len(b) for b in blobs]))
        bi, st, ln, hv = cdc.cdc_chunks(data, offsets)
        for k, blob in enumerate(blobs):
            ref = cdc.cdc_chunks_reference(blob)
            sel = bi == k
            got = list(zip(st[sel].tolist(), ln[sel].tolist(),
                           [int(x) for x in hv[sel]]))
            assert got == ref, f"blob {k}"

    def test_batch_independence(self):
        import numpy as np

        from who_owns_mass_processing_ray.functions import cdc

        rng = np.random.default_rng(3)
        a = rng.integers(0, 256, size=7000).astype(np.uint8)
        b = rng.integers(0, 256, size=4000).astype(np.uint8)
        _, _, _, h_joint = cdc.cdc_chunks(
            np.concatenate([a, b]), np.array([0, 7000, 11000]))
        _, _, _, h_a = cdc.cdc_chunks(a, np.array([0, 7000]))
        _, _, _, h_b = cdc.cdc_chunks(b, np.array([0, 4000]))
        np.testing.assert_array_equal(h_joint,
                                      np.concatenate([h_a, h_b]))

    def test_shifted_content_shares_chunks(self):
        import numpy as np

        from who_owns_mass_processing_ray.functions import cdc

        rng = np.random.default_rng(5)
        core = rng.integers(0, 256, size=20000).astype(np.uint8)
        prefix = rng.integers(0, 256, size=137).astype(np.uint8)
        _, _, _, h1 = cdc.cdc_chunks(core, np.array([0, len(core)]))
        shifted = np.concatenate([prefix, core])
        _, _, _, h2 = cdc.cdc_chunks(shifted, np.array([0, len(shifted)]))
        shared = len(set(int(x) for x in h1) & set(int(x) for x in h2))
        assert shared >= len(h1) - 2, f"{shared} of {len(h1)} shared"


class TestCdcChunkerStage:
    def test_identical_blobs_dedup(self):
        import numpy as np
        import pyarrow as pa

        from who_owns_mass_processing_ray.pipelines import multimodal as mm

        rng = np.random.default_rng(11)
        core = rng.integers(0, 256, size=15000).astype(np.uint8).tobytes()
        other = rng.integers(0, 256, size=9000).astype(np.uint8).tobytes()
        t = pa.table({
            "clip_id": pa.array(["clip-a", "clip-b", "clip-c"]),
            "bytes": pa.array([core, core, other], pa.large_binary()),
        })
        out = mm.CdcChunker()(t)
        hashes = {}
        for cid, h in zip(out["clip_id"].to_pylist(),
                          out["chunk_hash"].to_pylist()):
            hashes.setdefault(cid, []).append(h)
        assert hashes["clip-a"] == hashes["clip-b"]
        assert not set(hashes["clip-a"]) & set(hashes["clip-c"])
        # chunk_idx sequential per clip
        idx = out.filter(pa.compute.equal(out["clip_id"], "clip-a"))
        assert idx["chunk_idx"].to_pylist() == list(range(len(hashes["clip-a"])))


class TestBloomKernels:
    """Property tests for the delta-dedup Bloom kernels: an inserted key can
    NEVER probe false (no false negatives — the invariant the exact-parity
    of q_delta_dedup_bloom rests on), at any bitmap size / probe count."""

    def test_inserted_keys_always_probe_true(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from who_owns_mass_processing_ray.pipelines.textops import (
            _bloom_positions,
            _bloom_probe,
            _bloom_words,
        )

        @settings(max_examples=200, deadline=None)
        @given(
            keys=st.lists(st.tuples(
                st.integers(0, (1 << 64) - 1),
                st.integers(0, (1 << 64) - 1)), min_size=1, max_size=64),
            m_log2=st.integers(8, 22),
            k=st.integers(1, 12),
        )
        def check(keys, m_log2, k):
            h1 = np.array([a for a, _ in keys], np.uint64)
            h2 = np.array([b for _, b in keys], np.uint64)
            pos = _bloom_positions(h1, h2, m_log2, k)
            assert pos.shape == (len(keys), k)
            assert int(pos.max()) < (1 << m_log2)
            words = _bloom_words(pos, m_log2)
            assert _bloom_probe(words, pos).all()

        check()

    def test_empty_bitmap_probes_false(self):
        from who_owns_mass_processing_ray.pipelines.textops import (
            _bloom_positions,
            _bloom_probe,
        )

        rng = np.random.default_rng(7)
        h1 = rng.integers(0, 1 << 63, 100, dtype=np.int64).view(np.uint64)
        h2 = rng.integers(1, 1 << 63, 100, dtype=np.int64).view(np.uint64)
        pos = _bloom_positions(h1, h2, 20, 7)
        words = np.zeros(1 << 14, dtype=np.uint64)
        assert not _bloom_probe(words, pos).any()
