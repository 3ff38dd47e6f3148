"""Edge-semantics contracts for the text operators: non-ASCII slicing,
empty-text extraction, and the banded edit-distance guard."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest


def test_exact_dedup_key_non_ascii():
    """Arrow's utf8_slice_codeunits slices by CODEPOINTS (despite the name),
    matching DuckDB's character-based substr — the exact-dedup key therefore
    agrees on non-ASCII text too (ADVICE r1 flagged this as unverified)."""
    texts = ["héllo wörld étude", "naïve café ensemble", "日本語のテキストです",
             "mixed ascii ünd ümlauts", "plain ascii only here"]
    arr = pa.array(texts)
    got = pc.utf8_slice_codeunits(arr, 0, 7).to_pylist()
    con = duckdb.connect()
    want = [con.sql("SELECT substr(?, 1, 7)", params=[t]).fetchone()[0]
            for t in texts]
    assert got == want


def test_extract_tokens_empty_text_matches_duckdb():
    """No-match extraction yields '' (DuckDB regexp_extract semantics)."""
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["", "   ", "word tail"])})
    first = pc.fill_null(pc.struct_field(
        pc.extract_regex(t["text"], r"^(?P<tok>\S+)"), "tok"), "")
    con = duckdb.connect()
    want = [con.sql(r"SELECT regexp_extract(?, '^(\S+)', 1)",
                    params=[x]).fetchone()[0]
            for x in ["", "   ", "word tail"]]
    assert first.to_pylist() == want


def test_edit_distance_banded_guard():
    from who_owns_mass_processing_ray.pipelines.textops import (
        _edit_distance_matrix,
    )

    d = _edit_distance_matrix(["tabel", "xy"], ["table", "query"],
                              match_thresh=2)
    assert d[0, 0] == 2          # tabel -> table (transposition = 2 edits)
    with pytest.raises(AssertionError):
        _edit_distance_matrix(["a"], ["b"], match_thresh=7)


def test_salted_hot_bucket_dual_rounds_connect_without_star():
    """Two independent saltings must connect a hot bucket's salt groups via
    verified member-member edges even if every star-center edge is removed
    (ADVICE r1: recall must not hinge on the star center being a true dup)."""
    from who_owns_mass_processing_ray.stages.pairs import _triangular_pairs

    n = 500
    sizes = np.array([n], dtype=np.int64)
    seg, li, rj, salted = _triangular_pairs(sizes, cap=64)
    assert salted == n
    # drop every edge incident to member 0 (the star center)
    keep = (li != 0) & (rj != 0)
    li, rj = li[keep], rj[keep]
    # connected components over the remaining members via label propagation
    lab = np.arange(n)
    for _ in range(64):
        new = lab.copy()
        np.minimum.at(new, li, lab[rj])
        np.minimum.at(new, rj, lab[li])
        new = new[new]
        if np.array_equal(new, lab):
            break
        lab = new
    # members 1..n-1 must form ONE component without the star center
    assert len(set(lab[1:])) == 1


def test_ngram_jaccard_shuffle_path_equals_broadcast(ray_session):
    """The adaptive DF handling's two paths (driver-broadcast vs
    partitioned shuffle join + coarse-partition prefix pass) must produce
    identical pairs; forcing df_broadcast_limit=0 exercises the shuffle
    path on the same sf0.001 input."""
    from who_owns_mass_processing_ray.pipelines import textops

    sf = "/root/testdata/sf0.001"
    a = textops.q_ngram_jaccard_pairs(sf).to_pandas()
    b = textops.q_ngram_jaccard_pairs(sf, df_broadcast_limit=0).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True),
        check_dtype=False)


def test_delta_dedup_bloom_forced_fp_path(ray_session):
    """An undersized bitmap (2^10 bits, k=2) floods the Bloom with false
    positives — the exact-verify sliver must still reproduce the exact
    two-sided result bit for bit (no row wrongly dropped or kept)."""
    import pandas as pd

    from who_owns_mass_processing_ray.pipelines import textops

    sf = "/root/testdata/sf0.001"
    exact = textops.q_delta_dedup(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    bloom = textops.q_delta_dedup_bloom(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    tiny = textops.q_delta_dedup_bloom(sf, m_log2=10, k=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    cols = sorted(exact.columns)
    pd.testing.assert_frame_equal(bloom[cols], exact[cols], check_dtype=False)
    pd.testing.assert_frame_equal(tiny[cols], exact[cols], check_dtype=False)


def test_token_set_keys_property():
    """_token_set_keys (dictionary-rank lexsort + run-length dedup +
    ListArray rebuild) == the obvious pure-Python recompute, over random
    whitespace-heavy strings including empties and repeats."""
    import re

    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from who_owns_mass_processing_ray.pipelines.textops import _token_set_keys

    word = st.text(alphabet="abcxyz0189#", min_size=0, max_size=5)
    doc = st.lists(word, min_size=0, max_size=12).map(
        lambda ws: "  ".join(ws))
    pad = st.sampled_from(["", " ", "\t", "\n  "])

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(pad, doc, pad), min_size=1, max_size=40))
    def run(rows):
        texts = [a + d + b for a, d, b in rows]
        got = _token_set_keys(pa.array(texts, pa.string())).to_pylist()
        want = [" ".join(sorted(set(re.split(r"\s+", t.strip().lower()))))
                for t in texts]
        assert got == want

    run()
