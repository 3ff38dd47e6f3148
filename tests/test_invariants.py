"""Per-row invariants from the BASELINE contract: decoded PCM must match
the reference waveform at SNR >= 30 dB, and transcripts must round-trip
exactly (input_hint: 'per-row invariant vs the reference: decoded-PCM
allclose (SNR>=30dB) + transcript equality')."""

from __future__ import annotations

import numpy as np
import pytest
import pyarrow.parquet as pq

from who_owns_mass_processing_ray import audio, synth


class TestPerRowInvariants:
    def test_decoded_pcm_snr_and_transcript_equality(self, small_corpus):
        clips = pq.read_table(f"{small_corpus}/clips")
        vocab = synth._make_vocab(42)
        n = clips.num_rows
        n_dups = int(n * synth._DUP_FRACTION)
        n_base = n - n_dups
        checked = 0
        for row in range(0, n, 7):  # stride sample across the corpus
            cid = clips["clip_id"][row].as_py()
            i = synth.clip_id_to_int(cid)
            if i >= n_base:
                continue  # dup rows derive from base params; base rows suffice
            buf = clips["bytes"][row].as_py()
            codec = clips["codec"][row].as_py()
            sr = clips["sr_hz"][row].as_py()
            dur = clips["dur_ms"][row].as_py()
            pcm, got_sr = audio.decode(buf, codec)
            assert got_sr == sr
            # reference waveform regenerated pure-functionally
            params = synth._base_params(42, i)
            ref = synth._waveform(params, sr, dur)
            assert len(pcm) == len(ref)
            snr = audio.snr_db(ref, pcm)
            assert snr >= 30.0, f"{cid}: SNR {snr:.1f} dB"
            # transcript equality
            words = synth._transcript(42, i, vocab)
            assert clips["transcript"][row].as_py() == " ".join(words)
            checked += 1
        assert checked >= 40  # the sample actually covered the corpus

    def test_flagship_preserves_rows(self, small_corpus, ray_session):
        """The pipeline must neither drop nor duplicate input rows, and the
        assignment must cover exactly the input clip_ids."""
        from who_owns_mass_processing_ray.config import DedupConfig
        from who_owns_mass_processing_ray.pipelines import dedup

        res = dedup.dedup_pipeline(f"{small_corpus}/clips",
                                   DedupConfig(num_parts=8))
        c2c = res["clip_to_cluster"].to_pandas()
        src_ids = set(pq.read_table(f"{small_corpus}/clips",
                                    columns=["clip_id"])
                      .column("clip_id").to_pylist())
        assert set(c2c["clip_id"]) == src_ids
        assert len(c2c) == len(src_ids)


class TestVectorizedKernelProperties:
    """Property tests for the pure-numpy kernels inside the round-4
    analytics operators (hypothesis-driven, no Ray)."""

    def test_triangular_decode_enumerates_all_pairs(self):
        """The wedge decode in q_dup_graph_triangles (r -> (i, j), i < j)
        must enumerate exactly the i<j pairs of each segment."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.integers(min_value=2, max_value=40))
        def check(m):
            P = m * (m - 1) // 2
            rr = np.arange(P, dtype=np.int64)
            jj = np.ceil((np.sqrt(8.0 * (rr + 1) + 1) - 1) / 2) \
                .astype(np.int64)
            ii = rr - jj * (jj - 1) // 2
            got = set(zip(ii.tolist(), jj.tolist()))
            want = {(i, j) for j in range(1, m) for i in range(j)}
            assert got == want

        check()

    def test_span_mask_cover_equals_interval_union(self):
        """The diff-array/cumsum cover in q_span_dedup_mask must equal the
        brute union of [p, p+span) intervals, for random positions."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.integers(min_value=5, max_value=120),
               st.lists(st.integers(min_value=0, max_value=119),
                        max_size=20),
               st.integers(min_value=1, max_value=30))
        def check(ln, raw_pos, span):
            p = np.unique([x for x in raw_pos if x < ln]).astype(np.int64)
            diff = np.zeros(ln + 1, dtype=np.int64)
            np.add.at(diff, p, 1)
            np.add.at(diff, np.minimum(p + span, ln), -1)
            cover = np.cumsum(diff[:-1]) > 0
            want = np.zeros(ln, dtype=bool)
            for x in p:
                want[x:x + span] = True
            assert (cover == want).all()

        check()

    def test_collect_dup_members_matches_pandas(self):
        """The group-collect kernel (_collect_dup_members) must agree with a
        pandas groupby string_agg recompute for random (doc_id, h1, h2)
        rows with forced key collisions — including duplicate doc_ids
        within a group and all-singleton inputs."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=100, deadline=None)
        @given(st.lists(st.tuples(st.integers(0, 10**6),
                                  st.integers(0, 6),
                                  st.integers(0, 3)),
                        max_size=120))
        def check(rows):
            import pandas as pd
            import pyarrow as pa

            from who_owns_mass_processing_ray.pipelines.textops import (
                _collect_dup_members,
            )

            g = pa.table({
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "h1": pa.array([r[1] for r in rows], pa.int64()),
                "h2": pa.array([r[2] for r in rows], pa.int64()),
            })
            got = _collect_dup_members(g).to_pandas() \
                .sort_values("group_id").reset_index(drop=True)
            df = pd.DataFrame({"doc_id": [r[0] for r in rows],
                               "h1": [r[1] for r in rows],
                               "h2": [r[2] for r in rows]})
            want = df.sort_values("doc_id").groupby(["h1", "h2"]).agg(
                group_id=("doc_id", "min"),
                n_members=("doc_id", "size"),
                members=("doc_id",
                         lambda s: ",".join(str(x) for x in s)))
            want = want[want["n_members"] > 1] \
                .sort_values("group_id").reset_index(drop=True)
            assert len(got) == len(want)
            if len(want):
                assert got["group_id"].tolist() == want["group_id"].tolist()
                assert got["n_members"].tolist() == \
                    want["n_members"].tolist()
                assert got["members"].tolist() == want["members"].tolist()

        check()

    def test_segment_rank_topk_matches_pandas(self):
        """The lexsort/segment-rank per-group top-k (group_cap /
        distinctive_terms / latest_by_key shape) must agree with a pandas
        groupby-rank for random data."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=100, deadline=None)
        @given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 50),
                                  st.integers(0, 10**6)),
                        min_size=1, max_size=200),
               st.integers(min_value=1, max_value=5))
        def check(rows, k):
            import pandas as pd

            g = np.array([r[0] for r in rows])
            v = np.array([r[1] for r in rows])
            tie = np.array([r[2] for r in rows])
            order = np.lexsort((tie, -v, g))
            gs = g[order]
            starts = np.concatenate(
                ([0], np.flatnonzero(gs[1:] != gs[:-1]) + 1))
            rank = np.arange(len(gs)) - np.repeat(
                starts, np.diff(np.concatenate((starts, [len(gs)]))))
            keep = np.sort(order[rank < k])
            df = pd.DataFrame({"g": g, "v": v, "t": tie})
            want = df.sort_values(["g", "v", "t"],
                                  ascending=[True, False, True]) \
                .groupby("g").head(k).index.to_numpy()
            assert set(keep.tolist()) == set(want.tolist())

        check()


def test_analytics_rerun_deterministic(ray_session):
    """The round-4 analytics queries must be pure functions of the corpus:
    two executions in one session (different block schedules) produce
    identical tables."""
    import pandas as pd

    from who_owns_mass_processing_ray.pipelines import relational, textops

    sf = "/root/testdata/sf0.001"
    for fn in (textops.q_pmi_bigrams, textops.q_span_dedup_mask,
               textops.q_distinctive_terms, relational.q_quantile_sketch,
               relational.q_latest_by_key):
        a = fn(sf)
        b = fn(sf)
        a = a if isinstance(a, pd.DataFrame) else a.to_pandas()
        b = b if isinstance(b, pd.DataFrame) else b.to_pandas()
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True))


class TestDtwProperties:
    """Hypothesis properties for the DTW kernel family (no Ray)."""

    def test_dtw_shift_symmetry(self):
        """cost(A, B, s) == cost(B, A, -s): the cosine step matrix
        transposes and the DP is direction-symmetric."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from who_owns_mass_processing_ray.pipelines import multimodal as mm

        @settings(max_examples=50, deadline=None)
        @given(st.integers(min_value=1, max_value=12),
               st.integers(min_value=1, max_value=12),
               st.integers(min_value=-2, max_value=2),
               st.integers(min_value=0, max_value=2 ** 31 - 1))
        def check(na, nb, s, seed):
            rng = np.random.default_rng(seed)
            A = np.abs(rng.normal(size=(na, mm.DTW_NB))).astype(np.float32)
            B = np.abs(rng.normal(size=(nb, mm.DTW_NB))).astype(np.float32)
            assert mm._dtw_cost_at_shift(A, B, s) == pytest.approx(
                mm._dtw_cost_at_shift(B, A, -s), rel=1e-6)

        check()

    def test_dtw_identity_is_zero(self):
        """cost(A, A, 0) == 0 for any non-degenerate frame sequence."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from who_owns_mass_processing_ray.pipelines import multimodal as mm

        @settings(max_examples=50, deadline=None)
        @given(st.integers(min_value=1, max_value=16),
               st.integers(min_value=0, max_value=2 ** 31 - 1))
        def check(n, seed):
            rng = np.random.default_rng(seed)
            A = (np.abs(rng.normal(size=(n, mm.DTW_NB))) + 1e-3) \
                .astype(np.float32)
            assert mm._dtw_cost_at_shift(A, A, 0) == pytest.approx(
                0.0, abs=1e-6)

        check()

    def test_split_hash_group_consistency(self):
        """leakage_safe_split's bucket hash: same group_id -> same bucket,
        and the 20 buckets are all reachable (no degenerate collapse)."""
        from who_owns_mass_processing_ray.pipelines import textops as tx

        g = np.arange(0, 200_000, dtype=np.int64)
        b = (g.astype(np.uint64) * np.uint64(tx.SPLIT_KNUTH)
             % np.uint64(2 ** 32)) % np.uint64(tx.SPLIT_BUCKETS)
        counts = np.bincount(b.astype(np.int64),
                             minlength=tx.SPLIT_BUCKETS)
        assert (counts > 0).all()
        # roughly uniform: every bucket within 3x of the mean
        assert counts.max() < 3 * counts.mean()
