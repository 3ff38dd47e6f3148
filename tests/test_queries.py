"""Driver-contract queries vs their DuckDB oracles at sf0.001 (fast subset;
the driver itself runs the full set at sf0.01) + ANN recall gates."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# fast, shuffle-light subset — one per operator family
SUBSET = ["lineitem_agg", "counts_in_group", "mode_per_group", "join_agg",
          "semi_join", "topk", "distinct", "union_entities", "exact_dedup",
          "token_stats", "quality_score", "minhash_near_dup", "knn_brute",
          "embed_near_dup", "cascade_norm", "inst_norm", "co_split",
          "multiname_split", "quantile_filter", "luc_crosswalk",
          "group_fill_downup", "near_dup_groups", "concat_ranges_fix",
          "muni_norm", "po_pmb_split", "entity_flags", "unit_estimate",
          "addr_match_cascade", "bounded_near_dup", "addr_to_range",
          "luc_flags", "containment_pairs", "containment_pairs_sa",
          "decontaminate", "word_repetition", "sessionize", "rolling_agg",
          "json_extract", "ngram_topk", "tfidf_terms", "sample_stratified",
          "chunk_text", "para_dedup", "pack_sequences", "regex_redact",
          "near_dup_keep_best", "near_dup_survivors", "anti_join",
          "event_type_pivot", "shared_span_pairs", "delta_dedup",
          "speech_rate", "group_quantile_trim", "network_communities", "near_dup_delta", "leakage_safe_split", "curation_funnel",
          "metacorp_rollup", "asof_join", "ngram_logprob", "heavy_hitters",
          "distinct_tokens", "group_cap", "delta_dedup_bloom", "bm25_score",
          "weighted_sample", "table_profile", "rollup_agg",
          "event_burst_dedup", "dup_graph_degree", "source_divergence",
          "funnel", "group_regression", "hybrid_search", "doc_novelty",
          "pmi_bigrams", "distinctive_terms", "dup_graph_triangles", "char_entropy", "latest_by_key",
          "group_zscore", "key_skew", "quantile_sketch", "span_dedup_mask", "corpus_mix", "dedup_token_report", "knn_join", "value_histogram", "event_transitions", "bigram_logprob", "hourly_profile", "zipf_fit", "source_dup_matrix", "cohort_retention", "dup_size_histogram",
          "partitioned_write_manifest", "group_mad_outliers",
          "dup_threshold_curve", "domain_coverage",
          "incremental_components", "vocab_growth", "sliding_window_agg", "star_join", "scd2_intervals",
          "boilerplate_strip", "ngram_repetition", "duration_buckets",
          "snapshot_diff", "tfidf_cosine_pairs", "cosine_clusters",
          "cosine_cross_link", "cosine_bounded", "cascade_match",
          "cosine_metacorps", "dup_members", "late_data_audit",
          "jsonl_ingest", "embed_rplsh_near_dup", "token_budget_mix",
          "constraint_audit", "token_set_dedup", "near_dup_topk",
          "schema_adapt", "dup_soft_weight", "vintage_select"]


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as m

    return m.queries(), m.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64").round(4)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, contract, con):
    qs, oracles = contract
    got = qs[name](SF_DIR)
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    want = con.sql(oracles[name]).df()
    got, want = _canon(got), _canon(want)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, atol=1e-9)


def test_entry_smoke(ray_session):
    import __ray_entry__ as m

    res = m.entry()
    n = res.count() if hasattr(res, "count") else len(res)
    assert n >= 0
    cols = set(res.schema().names if hasattr(res, "schema") else res.columns)
    assert {"cluster_id", "canonical_clip_id", "size"} <= cols


def test_ivf_recall_vs_brute(ray_session):
    """IVF ANN must keep recall >= 0.8 vs the exact baseline at nprobe=4."""
    from who_owns_mass_processing_ray.pipelines import vectors

    brute = vectors.q_knn_brute(SF_DIR).to_pandas()
    ivf = vectors.q_knn_ivf(SF_DIR).to_pandas()
    b = set(zip(brute.query_id, brute.vec_id))
    i = set(zip(ivf.query_id, ivf.vec_id))
    recall = len(b & i) / len(b)
    assert recall >= 0.8, f"IVF recall {recall}"


def test_embed_ivf_recall_vs_exact(ray_session):
    """Bucketed near-dup must keep recall >= 0.8 vs the exact path, with
    precision 1.0 (every emitted pair's cosine is exact)."""
    from who_owns_mass_processing_ray.pipelines import vectors

    exact = vectors.q_embed_near_dup(SF_DIR).to_pandas()
    ivf = vectors.q_embed_near_dup_ivf(SF_DIR).to_pandas()
    e = set(zip(exact.left_id, exact.right_id))
    i = set(zip(ivf.left_id, ivf.right_id))
    assert i <= e, "IVF emitted a pair the exact path did not (precision<1)"
    if e:
        recall = len(e & i) / len(e)
        assert recall >= 0.8, f"IVF near-dup recall {recall}"


def test_lang_id_deterministic(ray_session):
    from who_owns_mass_processing_ray.pipelines import textops

    a = textops.q_lang_id(SF_DIR).to_pandas()
    b = textops.q_lang_id(SF_DIR).to_pandas()
    assert a.equals(b)
    assert set(a["lang_pred"]) <= {"en", "es", "de", "fr", "zh"}


def test_semi_anti_shuffle_fallback_matches_broadcast(ray_session):
    """semi_anti_filter with broadcast_limit=0 (forced partitioned-join
    path) must produce the same rows as the broadcast path — the 100 TB
    shape where the key set exceeds the driver-safe limit."""
    import ray.data as rd

    from who_owns_mass_processing_ray.stages import joins

    big = rd.read_parquet(f"{SF_DIR}/customer.parquet",
                          columns=["c_custkey", "c_nationkey"])
    keys = rd.read_parquet(f"{SF_DIR}/orders.parquet",
                           columns=["o_custkey", "o_orderstatus"]) \
        .filter(expr="o_orderstatus == 'F'")

    def run(anti, limit):
        out = joins.semi_anti_filter(big, "c_custkey", keys, "o_custkey",
                                     anti=anti, broadcast_limit=limit)
        df = out.to_pandas().sort_values("c_custkey").reset_index(drop=True)
        return df[["c_custkey", "c_nationkey"]]

    for anti in (False, True):
        bc = run(anti, 10_000_000)
        sh = run(anti, 0)
        pd.testing.assert_frame_equal(bc, sh)
        assert len(bc) > 0


def test_hll_within_5pct_of_exact(ray_session):
    """HyperLogLog distinct-token estimate vs the exact oracle-backed path:
    within ±5% per source (theoretical RSE at p=12 is ~1.6%)."""
    from who_owns_mass_processing_ray.pipelines import textops

    exact = textops.q_distinct_tokens(SF_DIR).to_pandas() \
        .set_index("source")["n_distinct_tokens"]
    est = textops.q_distinct_tokens_hll(SF_DIR).to_pandas() \
        .set_index("source")["n_distinct_est"]
    assert set(exact.index) == set(est.index)
    for s in exact.index:
        rel = abs(est[s] / max(exact[s], 1) - 1.0)
        assert rel <= 0.05, f"source {s}: est {est[s]} vs exact {exact[s]}"


def test_hll_high_cardinality_regime():
    """The HLL raw-estimator regime (beyond linear counting): 200k distinct
    hashes must estimate within ±5% (theoretical RSE ~1.6% at p=12)."""
    import numpy as np
    import pyarrow as pa

    from who_owns_mass_processing_ray.functions import hashing as hx
    from who_owns_mass_processing_ray.pipelines import textops

    n = 200_000
    toks = pa.array([f"tok-{i}" for i in range(n)])
    idx, rank = textops._hll_ranks(hx.hash_strings(toks))
    regs = np.zeros((1, textops._HLL_M), dtype=np.int8)
    np.maximum.at(regs[0], idx, rank)
    est = float(textops._hll_estimate(regs)[0])
    assert abs(est / n - 1.0) <= 0.05, est
    # merge associativity: two half-sketches max-merged == one full sketch
    half = np.zeros((2, textops._HLL_M), dtype=np.int8)
    np.maximum.at(half[0], idx[: n // 2], rank[: n // 2])
    np.maximum.at(half[1], idx[n // 2:], rank[n // 2:])
    assert np.array_equal(np.maximum(half[0], half[1]), regs[0])


def test_cascade_match_shuffle_fallback(ray_session):
    """q_cascade_match with broadcast_limit=0 (forced co-partitioned path,
    the 100 TB shape) must equal the broadcast path row for row."""
    from who_owns_mass_processing_ray.pipelines import relational

    bc = relational.q_cascade_match(SF_DIR).to_pandas()
    sh = relational.q_cascade_match(SF_DIR, broadcast_limit=0).to_pandas()
    bc = bc.sort_values("event_id").reset_index(drop=True)
    sh = sh.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, sh)
    assert len(bc) > 0
