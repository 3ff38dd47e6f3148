"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship dedup DAG at sf0.001; ``queries()`` exposes
every implemented operator/pipeline (SURVEY.md §2 + the training-data ops)
as ``name -> callable(sf_dir)``; ``oracle_sql()`` gives the DuckDB oracle
for each SQL-expressible query with IDENTICAL column names.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship dedup pipeline over clips synthesized from sf0.001 documents:
    features → 4 blocking stages → union-find → clusters table."""
    from who_owns_mass_processing_ray.pipelines import multimodal

    return multimodal.q_dedup_clusters("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from who_owns_mass_processing_ray.pipelines import (
        multimodal,
        normalize,
        relational,
        textops,
        vectors,
    )

    # WINDOW ROTATION (ledger in COVERAGE.md): the driver hash-checks the
    # FIRST 50 entries at sf0.01.  Round 5 completes the rotation ledger:
    # slot 1 is the flagship (rows-only by nature, checked every round);
    # slots 2-50 are the 49 oracle-backed queries that had never had a
    # driver hash check (slot 2 is pack_sequences, whose r4 hash-fail was
    # an oracle CAST artifact, fixed this round).  After this round every
    # oracle-backed query except dup_members and distinct_tokens (deferred
    # -- their key/aggregate machinery is driver-green via exact_dedup,
    # token_stats and heavy_hitters; both sweep- and pytest-checked) has
    # >= 1 driver-green round on record.  Rows 51+ stay pytest-checked at
    # sf0.001 every run and sweep-checked at sf0.01 via
    # tools/check_oracle.py.
    return {
        # --- slots 1-50: flagship + never-driver-checked rotation ----------
        "dedup_clusters": multimodal.q_dedup_clusters,
        "pack_sequences": textops.q_pack_sequences,
        "embed_rplsh_near_dup": vectors.q_embed_rplsh_near_dup,
        "rollup_agg": relational.q_rollup_agg,
        "table_profile": relational.q_table_profile,
        "constraint_audit": relational.q_constraint_audit,
        "bm25_score": textops.q_bm25_score,
        "doc_novelty": textops.q_doc_novelty,
        "dup_graph_degree": textops.q_dup_graph_degree,
        "source_divergence": textops.q_source_divergence,
        "event_burst_dedup": relational.q_event_burst_dedup,
        "funnel": relational.q_funnel,
        "asof_join": relational.q_asof_join,
        "ngram_logprob": textops.q_ngram_logprob,
        "heavy_hitters": textops.q_heavy_hitters,
        "pmi_bigrams": textops.q_pmi_bigrams,
        "bigram_logprob": textops.q_bigram_logprob,
        "zipf_fit": textops.q_zipf_fit,
        "source_dup_matrix": textops.q_source_dup_matrix,
        "dup_size_histogram": textops.q_dup_size_histogram,
        "dup_threshold_curve": textops.q_dup_threshold_curve,
        "domain_coverage": textops.q_domain_coverage,
        "vocab_growth": textops.q_vocab_growth,
        "incremental_components": textops.q_incremental_components,
        "distinctive_terms": textops.q_distinctive_terms,
        "dup_graph_triangles": textops.q_dup_graph_triangles,
        "char_entropy": textops.q_char_entropy,
        "corpus_mix": textops.q_corpus_mix,
        "token_budget_mix": textops.q_token_budget_mix,
        "delta_dedup_bloom": textops.q_delta_dedup_bloom,
        "latest_by_key": relational.q_latest_by_key,
        "group_zscore": relational.q_group_zscore,
        "key_skew": relational.q_key_skew,
        "quantile_sketch": relational.q_quantile_sketch,
        "value_histogram": relational.q_value_histogram,
        "event_transitions": relational.q_event_transitions,
        "hourly_profile": relational.q_hourly_profile,
        "cohort_retention": relational.q_cohort_retention,
        "partitioned_write_manifest": relational.q_partitioned_write_manifest,
        "group_mad_outliers": relational.q_group_mad_outliers,
        "sliding_window_agg": relational.q_sliding_window_agg,
        "star_join": relational.q_star_join,
        "scd2_intervals": relational.q_scd2_intervals,
        "snapshot_diff": relational.q_snapshot_diff,
        "boilerplate_strip": textops.q_boilerplate_strip,
        "weighted_sample": textops.q_weighted_sample,
        "group_cap": textops.q_group_cap,
        "knn_join": vectors.q_knn_join,
        "duration_buckets": multimodal.q_duration_buckets,
        "late_data_audit": relational.q_late_data_audit,
        # --- rows 51+: driver-green in a prior round (r1-r4 ledger) --------
        "network_communities": relational.q_network_communities,
        "metacorp_rollup": relational.q_metacorp_rollup,
        "anti_join": relational.q_anti_join,
        "sessionize": relational.q_sessionize,
        "tfidf_terms": textops.q_tfidf_terms,
        "para_dedup": textops.q_para_dedup,
        "near_dup_keep_best": textops.q_near_dup_keep_best,
        "near_dup_survivors": textops.q_near_dup_survivors,
        "regex_redact": relational.q_regex_redact,
        "event_type_pivot": relational.q_event_type_pivot,
        "json_extract": relational.q_json_extract,
        "rolling_agg": relational.q_rolling_agg,
        "decontaminate": textops.q_decontaminate,
        "word_repetition": textops.q_word_repetition,
        "ngram_repetition": textops.q_ngram_repetition,
        "ngram_topk": textops.q_ngram_topk,
        "chunk_text": textops.q_chunk_text,
        "sample_stratified": textops.q_sample_stratified,
        "token_stats": textops.q_token_stats,
        "quality_score": textops.q_quality_score,
        "knn_brute": vectors.q_knn_brute,
        "embed_near_dup": vectors.q_embed_near_dup,
        "speech_rate": multimodal.q_speech_rate,
        "semi_join": relational.q_semi_join,
        "exact_dedup": textops.q_exact_dedup,
        "minhash_near_dup": textops.q_minhash_near_dup,
        "bounded_near_dup": textops.q_bounded_near_dup,
        "near_dup_groups": textops.q_near_dup_groups,
        "token_set_dedup": textops.q_token_set_dedup,
        "near_dup_topk": textops.q_near_dup_topk,
        "schema_adapt": relational.q_schema_adapt,
        "dup_soft_weight": textops.q_dup_soft_weight,
        "tfidf_cosine_pairs": textops.q_tfidf_cosine_pairs,
        "cosine_clusters": textops.q_cosine_clusters,
        "cosine_cross_link": textops.q_cosine_cross_link,
        "cosine_bounded": textops.q_cosine_bounded,
        "cosine_metacorps": textops.q_cosine_metacorps,
        "span_dedup_mask": textops.q_span_dedup_mask,
        "shared_span_pairs": textops.q_shared_span_pairs,
        "delta_dedup": textops.q_delta_dedup,
        "near_dup_delta": textops.q_near_dup_delta,
        "leakage_safe_split": textops.q_leakage_safe_split,
        "curation_funnel": textops.q_curation_funnel,
        "dedup_token_report": textops.q_dedup_token_report,
        "group_regression": relational.q_group_regression,
        "fuzzy_join": textops.q_fuzzy_join,
        "hybrid_search": vectors.q_hybrid_search,
        "jsonl_ingest": relational.q_jsonl_ingest,
        "containment_pairs": textops.q_containment_pairs,
        "cross_table_link": textops.q_cross_table_link,
        "distinct_tokens": textops.q_distinct_tokens,
        "containment_pairs_sa": textops.q_containment_pairs_sa,
        "ngram_jaccard_pairs": textops.q_ngram_jaccard_pairs,
        "group_quantile_trim": textops.q_group_quantile_trim,
        "cascade_match": relational.q_cascade_match,
        "addr_match_cascade": relational.q_addr_match_cascade,
        "join_agg": relational.q_join_agg,
        "unit_estimate": relational.q_unit_estimate,
        "interval_join": relational.q_interval_join,
        "window_agg": relational.q_window_agg,
        "lineitem_agg": relational.q_lineitem_agg,
        "luc_flags": relational.q_luc_flags,
        "cascade_norm": normalize.q_cascade_norm,
        "muni_norm": normalize.q_muni_norm,
        "po_pmb_split": normalize.q_po_pmb_split,
        "addr_to_range": normalize.q_addr_to_range,
        "entity_flags": textops.q_entity_flags,
        "inst_norm": normalize.q_inst_norm,
        "addr2_split": normalize.q_addr2_split,
        "text_norm": normalize.q_text_norm,
        "zip_format": normalize.q_zip_format,
        "concat_ranges_fix": normalize.q_concat_ranges_fix,
        "co_split": normalize.q_co_split,
        "multiname_split": normalize.q_multiname_split,
        "select_address": normalize.q_select_address,
        "address_preprocess": normalize.q_address_preprocess,
        "counts_in_group": relational.q_counts_in_group,
        "mode_per_group": relational.q_mode_per_group,
        "group_fill": relational.q_group_fill,
        "topk": relational.q_topk,
        "distinct": relational.q_distinct,
        "union_entities": relational.q_union_entities,
        "split_rows": relational.q_split_rows,
        "quantile_filter": relational.q_quantile_filter,
        "group_fill_downup": relational.q_group_fill_downup,
        "luc_crosswalk": relational.q_luc_crosswalk,
        "uniqueness_flags": relational.q_uniqueness_flags,
        "csv_topk": relational.q_csv_topk,
        "flag_features": textops.q_flag_features,
        "extract_tokens": textops.q_extract_first_token,
        "token_sort": textops.q_token_sort,
        "simhash_near_dup": textops.q_simhash_near_dup,
        "lang_id": textops.q_lang_id,
        "doc_fingerprint": textops.q_doc_fingerprint,
        "feature_hash": textops.q_feature_hash,
        "quality_lr_filter": textops.q_quality_lr_filter,
        "dup_graph_pagerank": textops.q_dup_graph_pagerank,
        "dup_graph_kcore": textops.q_dup_graph_kcore,
        "dup_graph_modularity": textops.q_dup_graph_modularity,
        "dup_graph_bridges": textops.q_dup_graph_bridges,
        "dup_graph_articulation": textops.q_dup_graph_articulation,
        "bpe_train": textops.q_bpe_train,
        "bpe_encode": textops.q_bpe_encode,
        "lang_agreement": textops.q_lang_agreement,
        "embed_near_dup_ivf": vectors.q_embed_near_dup_ivf,
        "knn_ivf": vectors.q_knn_ivf,
        "semantic_dedup": vectors.q_semantic_dedup,
        "kmeans_fit": vectors.q_kmeans_fit,
        "knn_pq": vectors.q_knn_pq,
        "knn_join_ivf": vectors.q_knn_join_ivf,
        "embedding_pca": vectors.q_embedding_pca,
        "cluster_purity": vectors.q_cluster_purity,
        "ann_recall_eval": vectors.q_ann_recall_eval,
        "dedup_assignment": multimodal.q_dedup_assignment,
        "audio_decode_stats": multimodal.q_audio_decode_stats,
        "audio_frames": multimodal.q_audio_frames,
        "audio_loudness": multimodal.q_audio_loudness,
        "audio_silence": multimodal.q_audio_silence,
        "audio_resample": multimodal.q_audio_resample,
        "audio_spectral": multimodal.q_audio_spectral,
        "audio_pitch": multimodal.q_audio_pitch,
        "audio_qc": multimodal.q_audio_qc,
        "audio_vad_segments": multimodal.q_audio_vad_segments,
        "audio_mel_stats": multimodal.q_audio_mel_stats,
        "modality_disagreement": multimodal.q_modality_disagreement,
        "audio_shingle_near_dup": multimodal.q_audio_shingle_near_dup,
        "audio_dtw_near_dup": multimodal.q_audio_dtw_near_dup,
        "audio_gain_normalize": multimodal.q_audio_gain_normalize,
        "cdc_chunk_dedup": multimodal.q_cdc_chunk_dedup,
        "audio_segment_rows": multimodal.q_audio_segment_rows,
        "audio_delta_dedup": multimodal.q_audio_delta_dedup,
        "audio_snippet_search": multimodal.q_audio_snippet_search,
        "audio_constellation_match": multimodal.q_audio_constellation_match,
        "audio_pair_snr": multimodal.q_audio_pair_snr,
        "audio_curation_funnel": multimodal.q_audio_curation_funnel,
        "audio_transcode": multimodal.q_audio_transcode,
        "compression_ratio": textops.q_compression_ratio,
        "longest_repeat": textops.q_longest_repeat,
        "distinct_tokens_hll": textops.q_distinct_tokens_hll,
        "dedup_report": multimodal.q_dedup_report,
        "image_decode_stub": multimodal.q_image_decode_stub,
        "video_frame_sample_stub": multimodal.q_video_frame_sample_stub,
        # real media decode paths (round 5): native BMP + YUV4MPEG2 codecs
        "image_decode": multimodal.q_image_decode,
        "video_frame_sample": multimodal.q_video_frame_sample,
        # modal-vintage file election (round 5 — closes the last missing
        # reference row, load_vintage_select)
        "vintage_select": relational.q_vintage_select,
        "dup_members": textops.q_dup_members,
        "minhash_calibration": textops.q_minhash_calibration,
        "simhash_calibration": multimodal.q_simhash_calibration,
        "lsh_recall_curve": textops.q_lsh_recall_curve,
    }


# Body WITHOUT a trailing ORDER BY, so composing oracles can embed it in a
# CTE directly; _JACCARD_ORACLE appends the ORDER BY for standalone use
# (ADVICE r4: textual .replace() surgery on the ordered literal was brittle).
_JACCARD_BODY = """
WITH g AS (
  SELECT DISTINCT doc_id, substr(text, CAST(u AS INTEGER), 5) AS gram
  FROM (SELECT doc_id, text,
        unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS u
        FROM documents)
),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS left_id, b.doc_id AS right_id, count(*) AS c
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.left_id, i.right_id,
       round(i.c * 1.0 / (sa.n + sb.n - i.c), 4) AS jaccard
FROM inter i
JOIN sz sa ON sa.doc_id = i.left_id
JOIN sz sb ON sb.doc_id = i.right_id
WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= 0.7
"""

_JACCARD_ORACLE = _JACCARD_BODY + "ORDER BY 1, 2"


# cross-table variant of the exact Jaccard oracle: pairs spanning the even
# (table A) / odd (table B) doc_id split, oriented (a_id, b_id)
_CROSS_LINK_ORACLE = """
WITH g AS (
  SELECT DISTINCT doc_id, substr(text, CAST(u AS INTEGER), 5) AS gram
  FROM (SELECT doc_id, text,
        unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS u
        FROM documents)
),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
  FROM g a JOIN g b ON a.gram = b.gram
  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
  GROUP BY 1, 2
)
SELECT i.a_id, i.b_id,
       round(i.c * 1.0 / (sa.n + sb.n - i.c), 4) AS jaccard
FROM inter i
JOIN sz sa ON sa.doc_id = i.a_id
JOIN sz sb ON sb.doc_id = i.b_id
WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= 0.7
ORDER BY 1, 2
"""


def _luc_oracle() -> str:
    """VALUES lists generated from the SAME crosswalk dicts the Ray query
    probes — no hand-kept copy."""
    from who_owns_mass_processing_ray.pipelines.relational import (
        LUC_EXACT,
        LUC_PREFIX,
    )

    ex = ", ".join(f"('{k}', '{v}')" for k, v in sorted(LUC_EXACT.items()))
    px = ", ".join(f"('{k}', '{v}')" for k, v in sorted(LUC_PREFIX.items()))
    return f"""
        WITH codes AS (
            SELECT p_partkey,
                   lpad(CAST(p_partkey % 500 AS VARCHAR), 3, '0') AS code
            FROM part),
        ex(code, cat) AS (VALUES {ex}),
        px(pfx, cat) AS (VALUES {px})
        SELECT c.p_partkey, c.code,
               coalesce(ex.cat, px.cat, 'UNKNOWN') AS category
        FROM codes c
        LEFT JOIN ex ON c.code = ex.code
        LEFT JOIN px ON substr(c.code, 1, 2) = px.pfx
        ORDER BY c.p_partkey
    """


def oracle_sql() -> dict[str, str]:
    from who_owns_mass_processing_ray.pipelines import (
        multimodal,
        normalize,
        relational,
        textops,
        vectors,
    )

    return {
        # generated from the SAME rule objects the Ray queries run
        # (functions/cascade.py) — structural equivalence, not a hand copy
        "cascade_norm": normalize.cascade_norm_sql(),
        "inst_norm": normalize.inst_norm_sql(),
        "addr2_split": normalize.addr2_split_sql(),
        "text_norm": normalize.text_norm_sql(),
        "zip_format": normalize.zip_format_sql(),
        "concat_ranges_fix": normalize.concat_ranges_fix_sql(),
        "co_split": normalize.co_split_sql(),
        "multiname_split": normalize.multiname_split_sql(),
        "select_address": normalize.select_address_sql(),
        "address_preprocess": normalize.address_preprocess_sql(),
        "muni_norm": normalize.muni_norm_sql(),
        "po_pmb_split": normalize.po_pmb_split_sql(),
        "addr_to_range": normalize.addr_to_range_sql(),
        "lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "counts_in_group": """
            SELECT user_id, count(*) AS n_events,
                   count(DISTINCT event_type) AS n_types
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "mode_per_group": """
            SELECT lang, source AS mode_source FROM (
                SELECT lang, source, count(*) AS ct
                FROM documents GROUP BY 1, 2
            ) QUALIFY row_number() OVER (
                PARTITION BY lang ORDER BY ct DESC, source ASC) = 1
            ORDER BY lang
        """,
        "group_fill": """
            SELECT l_orderkey, l_linenumber, l_shipdate,
                   CAST(min(l_shipdate) OVER (PARTITION BY l_orderkey)
                        AS TIMESTAMP_S) AS first_ship
            FROM lineitem ORDER BY l_orderkey, l_linenumber
        """,
        "join_agg": """
            SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1 ORDER BY 1
        """,
        "semi_join": """
            SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
                   count(*) AS n_customers
            FROM customer
            WHERE c_custkey IN (
                SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
            GROUP BY 1 ORDER BY 1
        """,
        "interval_join": """
            SELECT l_orderkey, count(*) AS n_in_window
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= o_orderdate
              AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
            GROUP BY 1 ORDER BY 1
        """,
        "topk": """
            SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend
            FROM orders GROUP BY 1
            ORDER BY total_spend DESC, o_custkey LIMIT 10
        """,
        "distinct": """
            SELECT DISTINCT l_returnflag, l_linestatus
            FROM lineitem ORDER BY 1, 2
        """,
        "union_entities": """
            SELECT CAST(nationkey AS BIGINT) AS nationkey, entity,
                   count(*) AS n FROM (
                SELECT c_nationkey AS nationkey, 'customer' AS entity
                FROM customer
                UNION ALL
                SELECT s_nationkey AS nationkey, 'supplier' AS entity
                FROM supplier
            ) GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "split_rows": """
            SELECT doc_id, word, count(*) AS n FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS word
                FROM documents
            ) GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "exact_dedup": """
            WITH k AS (
                SELECT doc_id, substr(text, 1, 40) AS key FROM documents),
            g AS (
                SELECT key, min(doc_id) AS group_id, count(*) AS group_size
                FROM k GROUP BY key HAVING count(*) > 1)
            SELECT k.doc_id, g.group_id, g.group_size
            FROM k JOIN g USING (key) ORDER BY doc_id
        """,
        "dup_members": textops.DUP_MEMBERS_SQL,
        "cascade_match": """
            WITH cand AS (
                SELECT e.event_id, o.o_orderkey, o.o_orderdate,
                       (o.o_totalprice >= 100 * e.value) AS strict
                FROM events e JOIN orders o ON o.o_custkey = e.user_id),
            ranked AS (
                SELECT *, row_number() OVER (
                    PARTITION BY event_id
                    ORDER BY strict DESC, o_orderdate DESC, o_orderkey ASC
                ) AS rn FROM cand)
            SELECT event_id, o_orderkey AS matched_order,
                   strict AS matched_strict
            FROM ranked WHERE rn = 1 ORDER BY event_id
        """,
        "window_agg": """
            SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP_S) AS hour,
                   round(sum(value), 2) AS value_sum,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "fuzzy_join": r"""
            WITH t AS (
                SELECT doc_id, regexp_extract(text, '^(\S+)', 1) AS first_token
                FROM documents),
            v(w) AS (VALUES ('batch'),('column'),('filter'),('group'),
                            ('hash'),('join'),('key'),('line'),('merge'),
                            ('order'),('query'),('row'),('scan'),('sort'),
                            ('spark'),('stream'),('table'),('value'),
                            ('vector'),('window')),
            ranked AS (
                SELECT doc_id, first_token, w,
                       levenshtein(first_token, w) AS d,
                       row_number() OVER (
                           PARTITION BY doc_id
                           ORDER BY levenshtein(first_token, w), w) AS rn
                FROM t CROSS JOIN v),
            -- anagram (fuzzified-key) pass == std_fuzzify_string: first and
            -- last chars anchored, middle chars sorted
            fz AS (
                SELECT doc_id, min(w) AS aw
                FROM t CROSS JOIN v
                WHERE (CASE WHEN length(first_token) >= 3 THEN
                         substr(first_token, 1, 1)
                         || array_to_string(list_sort(regexp_extract_all(
                              substr(first_token, 2, length(first_token) - 2),
                              '.')), '')
                         || substr(first_token, length(first_token), 1)
                       ELSE first_token END)
                    = (CASE WHEN length(w) >= 3 THEN
                         substr(w, 1, 1)
                         || array_to_string(list_sort(regexp_extract_all(
                              substr(w, 2, length(w) - 2), '.')), '')
                         || substr(w, length(w), 1)
                       ELSE w END)
                GROUP BY 1)
            SELECT r.doc_id, r.first_token,
                   CASE WHEN fz.aw IS NOT NULL THEN fz.aw
                        WHEN r.d <= 2 THEN r.w END AS matched_word,
                   CASE WHEN fz.aw IS NOT NULL THEN NULL
                        WHEN r.d <= 2 THEN r.d ELSE -1 END AS edit_dist,
                   CASE WHEN fz.aw IS NOT NULL THEN 'anagram'
                        WHEN r.d <= 2 THEN 'edit' END AS match_pass
            FROM ranked r LEFT JOIN fz ON fz.doc_id = r.doc_id
            WHERE r.rn = 1 ORDER BY r.doc_id
        """,
        "flag_features": r"""
            SELECT doc_id,
                   regexp_matches(lower(text), '\b(query|scan|filter)\b')
                       AS is_query,
                   regexp_matches(lower(text), '\b(table|row|column)\b')
                       AS is_storage,
                   regexp_matches(lower(text), '\b(spark|hash|merge|sort)\b')
                       AS is_exec
            FROM documents ORDER BY doc_id
        """,
        "extract_tokens": r"""
            SELECT doc_id,
                   regexp_extract(text, '^(\S+)', 1) AS first_token,
                   regexp_extract(text, '(\S+)$', 1) AS last_token
            FROM documents ORDER BY doc_id
        """,
        "token_sort": """
            SELECT doc_id,
                   array_to_string(list_sort(string_split(text, ' ')), ' ')
                       AS text_sorted
            FROM documents ORDER BY doc_id
        """,
        "entity_flags": textops.entity_flags_sql(),
        "bounded_near_dup": textops.bounded_near_dup_sql(),
        "containment_pairs": textops.containment_pairs_sql(),
        "containment_pairs_sa": textops.containment_pairs_sql(),
        "shared_span_pairs": textops.shared_span_pairs_sql(),
        "delta_dedup": textops.delta_dedup_sql(),
        "near_dup_delta": textops.near_dup_delta_sql(),
        "leakage_safe_split": textops.leakage_safe_split_sql(_JACCARD_BODY),
        "curation_funnel": textops.curation_funnel_sql(),
        "group_quantile_trim": textops.group_quantile_trim_sql(),
        "decontaminate": textops.decontaminate_sql(),
        "word_repetition": textops.word_repetition_sql(),
        "ngram_repetition": textops.ngram_repetition_sql(),
        "ngram_topk": textops.ngram_topk_sql(),
        "tfidf_terms": textops.tfidf_terms_sql(),
        "sample_stratified": textops.sample_stratified_sql(),
        "chunk_text": textops.chunk_text_sql(),
        "para_dedup": textops.para_dedup_sql(),
        "boilerplate_strip": textops.boilerplate_strip_sql(),
        "pack_sequences": textops.pack_sequences_sql(),
        "regex_redact": relational.regex_redact_sql(),
        "anti_join": relational.anti_join_sql(),
        "network_communities": relational.network_communities_sql(),
        "metacorp_rollup": relational.metacorp_rollup_sql(),
        "speech_rate": multimodal.speech_rate_sql(),
        "duration_buckets": multimodal.duration_buckets_sql(),
        "event_type_pivot": relational.event_type_pivot_sql(),
        "sessionize": relational.sessionize_sql(),
        "rolling_agg": relational.rolling_agg_sql(),
        "json_extract": relational.json_extract_sql(),
        "asof_join": relational.asof_join_sql(),
        "jsonl_ingest": relational.jsonl_ingest_sql(),
        "ngram_logprob": textops.ngram_logprob_sql(),
        "heavy_hitters": textops.heavy_hitters_sql(),
        "distinct_tokens": textops.distinct_tokens_sql(),
        "group_cap": textops.group_cap_sql(),
        # identical contract to delta_dedup by construction (Bloom is a
        # prefilter; every positive is exactly verified)
        "delta_dedup_bloom": textops.delta_dedup_sql(),
        "bm25_score": textops.bm25_score_sql(),
        "weighted_sample": textops.weighted_sample_sql(),
        "table_profile": relational.table_profile_sql(),
        "constraint_audit": relational.constraint_audit_sql(),
        "rollup_agg": relational.rollup_agg_sql(),
        "event_burst_dedup": relational.event_burst_dedup_sql(),
        "dup_graph_degree": textops.dup_graph_degree_sql(),
        "source_divergence": textops.source_divergence_sql(),
        "funnel": relational.funnel_sql(),
        "group_regression": relational.group_regression_sql(),
        "hybrid_search": vectors.hybrid_search_sql(),
        "knn_join": vectors.knn_join_sql(),
        "doc_novelty": textops.doc_novelty_sql(),
        "pmi_bigrams": textops.pmi_bigrams_sql(),
        "bigram_logprob": textops.bigram_logprob_sql(),
        "zipf_fit": textops.zipf_fit_sql(),
        "source_dup_matrix": textops.source_dup_matrix_sql(),
        "dup_threshold_curve": textops.dup_threshold_curve_sql(),
        "domain_coverage": textops.domain_coverage_sql(),
        "vocab_growth": textops.vocab_growth_sql(),
        "distinctive_terms": textops.distinctive_terms_sql(),
        "dup_graph_triangles": textops.dup_graph_triangles_sql(),
        "char_entropy": textops.char_entropy_sql(),
        "span_dedup_mask": textops.span_dedup_mask_sql(),
        "corpus_mix": textops.corpus_mix_sql(),
        "token_budget_mix": textops.token_budget_mix_sql(),
        "latest_by_key": relational.latest_by_key_sql(),
        "group_zscore": relational.group_zscore_sql(),
        "key_skew": relational.key_skew_sql(),
        "quantile_sketch": relational.quantile_sketch_sql(),
        "value_histogram": relational.value_histogram_sql(),
        "event_transitions": relational.event_transitions_sql(),
        "hourly_profile": relational.hourly_profile_sql(),
        "late_data_audit": relational.late_data_audit_sql(),
        "cohort_retention": relational.cohort_retention_sql(),
        "partitioned_write_manifest": relational.partitioned_write_manifest_sql(),
        "group_mad_outliers": relational.group_mad_outliers_sql(),
        "sliding_window_agg": relational.sliding_window_agg_sql(),
        "star_join": relational.star_join_sql(),
        "scd2_intervals": relational.scd2_intervals_sql(),
        "snapshot_diff": relational.snapshot_diff_sql(),
        # distinct_tokens_hll: approximate by design — gated in pytest at
        # ±5% of the exact q_distinct_tokens instead of a SQL hash match
        "tfidf_cosine_pairs": textops.tfidf_cosine_pairs_sql(),
        "cosine_clusters": textops.cosine_clusters_sql(),
        "cosine_cross_link": textops.cosine_cross_link_sql(),
        "cosine_bounded": textops.cosine_bounded_sql(),
        "cosine_metacorps": textops.cosine_metacorps_sql(),
        "minhash_near_dup": _JACCARD_ORACLE,
        "ngram_jaccard_pairs": _JACCARD_ORACLE,
        "token_set_dedup": textops.token_set_dedup_sql(),
        "near_dup_topk": textops.near_dup_topk_sql(
            _JACCARD_BODY),
        "dup_soft_weight": textops.dup_soft_weight_sql(
            _JACCARD_BODY),
        "schema_adapt": relational.schema_adapt_sql(),
        "vintage_select": relational.vintage_select_sql(),
        "cross_table_link": _CROSS_LINK_ORACLE,
        # connected components over the exact Jaccard pair graph: min
        # reachable doc_id via a recursive CTE == the engine's union-find
        # root (the clustering reduce itself is oracle-checked)
        "near_dup_groups": f"""
            WITH RECURSIVE base AS ({_JACCARD_BODY}),
            sym(a, b) AS (
                SELECT left_id, right_id FROM base
                UNION ALL
                SELECT right_id, left_id FROM base
            ),
            reach(id, r) AS (
                SELECT a, a FROM sym
                UNION
                SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id
            )
            SELECT id AS doc_id, min(r) AS group_id
            FROM reach GROUP BY id ORDER BY doc_id
        """,
        # retention policy on top of the same component reduce: keep the
        # longest member (tiebreak min doc_id) of every near-dup group
        "near_dup_keep_best": f"""
            WITH RECURSIVE base AS ({_JACCARD_BODY}),
            sym(a, b) AS (
                SELECT left_id, right_id FROM base
                UNION ALL
                SELECT right_id, left_id FROM base
            ),
            reach(id, r) AS (
                SELECT a, a FROM sym
                UNION
                SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id
            ),
            grp AS (
                SELECT id AS doc_id, min(r) AS group_id
                FROM reach GROUP BY id
            ),
            sel AS (
                SELECT g.group_id, g.doc_id, d.n_chars,
                       row_number() OVER (PARTITION BY g.group_id
                           ORDER BY d.n_chars DESC, g.doc_id) AS rn,
                       count(*) OVER (PARTITION BY g.group_id) AS n_members
                FROM grp g JOIN documents d USING (doc_id)
            )
            SELECT group_id, doc_id AS kept_doc_id,
                   CAST(n_members AS BIGINT) AS n_members,
                   n_chars AS n_chars_kept
            FROM sel WHERE rn = 1 ORDER BY group_id
        """,
        # the corpus AFTER dedup: singletons + per-group best member
        "near_dup_survivors": f"""
            WITH RECURSIVE base AS ({_JACCARD_BODY}),
            sym(a, b) AS (
                SELECT left_id, right_id FROM base
                UNION ALL
                SELECT right_id, left_id FROM base
            ),
            reach(id, r) AS (
                SELECT a, a FROM sym
                UNION
                SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id
            ),
            grp AS (
                SELECT id AS doc_id, min(r) AS group_id
                FROM reach GROUP BY id
            ),
            sel AS (
                SELECT g.group_id, g.doc_id,
                       row_number() OVER (PARTITION BY g.group_id
                           ORDER BY d.n_chars DESC, g.doc_id) AS rn
                FROM grp g JOIN documents d USING (doc_id)
            )
            SELECT d.doc_id,
                   CAST(CASE WHEN s.rn = 1 THEN s.group_id
                             ELSE -1 END AS BIGINT) AS group_id,
                   CASE WHEN s.rn = 1 THEN 'group_best'
                        ELSE 'singleton' END AS kept_reason
            FROM documents d LEFT JOIN sel s USING (doc_id)
            WHERE s.doc_id IS NULL OR s.rn = 1
            ORDER BY d.doc_id
        """,
        # incremental fold == full re-cluster at the lower threshold
        "incremental_components": f"""
            WITH RECURSIVE base AS ({_JACCARD_BODY}),
            sym(a, b) AS (
                SELECT left_id, right_id FROM base
                UNION ALL
                SELECT right_id, left_id FROM base
            ),
            reach(id, r) AS (
                SELECT a, a FROM sym
                UNION
                SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id
            )
            SELECT id AS doc_id, min(r) AS group_id
            FROM reach GROUP BY id ORDER BY doc_id
        """,
        # group-size histogram over the same components reduce
        "dup_size_histogram": f"""
            WITH RECURSIVE base AS ({_JACCARD_BODY}),
            sym(a, b) AS (
                SELECT left_id, right_id FROM base
                UNION ALL
                SELECT right_id, left_id FROM base
            ),
            reach(id, r) AS (
                SELECT a, a FROM sym
                UNION
                SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id
            ),
            grp AS (
                SELECT id AS doc_id, min(r) AS group_id
                FROM reach GROUP BY id
            ),
            gs AS (SELECT group_id, count(*) AS size FROM grp GROUP BY 1)
            SELECT size AS group_size,
                   CAST(count(*) AS BIGINT) AS n_groups,
                   CAST(sum(size) AS BIGINT) AS n_docs,
                   CAST(sum(size - 1) AS BIGINT) AS n_removable
            FROM gs GROUP BY size ORDER BY group_size
        """,
        # per-source dedup accounting on top of the same survivors reduce
        "dedup_token_report": f"""
            WITH RECURSIVE base AS ({_JACCARD_BODY}),
            sym(a, b) AS (
                SELECT left_id, right_id FROM base
                UNION ALL
                SELECT right_id, left_id FROM base
            ),
            reach(id, r) AS (
                SELECT a, a FROM sym
                UNION
                SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id
            ),
            grp AS (
                SELECT id AS doc_id, min(r) AS group_id
                FROM reach GROUP BY id
            ),
            sel AS (
                SELECT g.group_id, g.doc_id,
                       row_number() OVER (PARTITION BY g.group_id
                           ORDER BY d.n_chars DESC, g.doc_id) AS rn
                FROM grp g JOIN documents d USING (doc_id)
            ),
            keep AS (
                SELECT d.doc_id FROM documents d
                LEFT JOIN sel s USING (doc_id)
                WHERE s.doc_id IS NULL OR s.rn = 1
            ),
            tok AS (
                SELECT doc_id, source,
                       len(string_split(text, ' ')) AS n_tok
                FROM documents WHERE text IS NOT NULL
            ),
            b AS (
                SELECT source, count(*) AS n_docs, sum(n_tok) AS n_tokens
                FROM tok GROUP BY 1
            ),
            a AS (
                SELECT t.source, count(*) AS n_kept,
                       sum(t.n_tok) AS n_tokens_kept
                FROM tok t JOIN keep k ON k.doc_id = t.doc_id GROUP BY 1
            )
            SELECT b.source,
                   CAST(b.n_docs AS BIGINT) AS n_docs,
                   CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
                   CAST(b.n_tokens AS BIGINT) AS n_tokens,
                   CAST(coalesce(a.n_tokens_kept, 0) AS BIGINT)
                       AS n_tokens_kept,
                   round(coalesce(a.n_kept, 0) * 1.0
                         / greatest(b.n_docs, 1), 4) AS doc_retention,
                   round(coalesce(a.n_tokens_kept, 0) * 1.0
                         / greatest(b.n_tokens, 1), 4) AS token_retention
            FROM b LEFT JOIN a USING (source)
            ORDER BY b.source
        """,
        "quantile_filter": """
            WITH qv AS (
                SELECT quantile_cont(o_totalprice, 0.9) AS q FROM orders)
            SELECT o_orderstatus, count(*) AS n_above,
                   round(q, 2) AS q_value
            FROM orders, qv WHERE o_totalprice >= q
            GROUP BY 1, 3 ORDER BY 1
        """,
        "group_fill_downup": """
            WITH base AS (
                SELECT user_id, event_id,
                       CASE WHEN event_id % 3 = 0 THEN NULL
                            ELSE value END AS val
                FROM events),
            f AS (
                SELECT *,
                       last_value(val IGNORE NULLS) OVER (
                           PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS ff,
                       first_value(val IGNORE NULLS) OVER (
                           PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                       ) AS bf
                FROM base)
            SELECT user_id, event_id, coalesce(ff, bf) AS val_filled
            FROM f ORDER BY 1, 2
        """,
        "luc_crosswalk": _luc_oracle(),
        "unit_estimate": relational.unit_estimate_sql(),
        "luc_flags": relational.luc_flags_sql(),
        "addr_match_cascade": relational.addr_match_cascade_sql(),
        "uniqueness_flags": """
            SELECT o_orderkey,
                   (count(*) OVER (PARTITION BY o_custkey)) = 1
                       AS cust_unique,
                   (count(*) OVER (PARTITION BY o_orderdate)) = 1
                       AS date_unique
            FROM orders ORDER BY o_orderkey
        """,
        "csv_topk": """
            SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal
            FROM customer WHERE c_mktsegment = 'BUILDING'
            ORDER BY round(c_acctbal, 2) DESC, c_custkey LIMIT 10
        """,
        "token_stats": r"""
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
                   len(regexp_extract_all(lower(text),
                       '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens
            FROM documents ORDER BY doc_id
        """,
        "quality_score": r"""
            WITH s AS (
                SELECT doc_id,
                       CAST(length(text) AS DOUBLE) AS n_chars,
                       CAST(len(string_split_regex(trim(text), '\s+'))
                            AS DOUBLE) AS n_tokens,
                       CAST(len(regexp_extract_all(text, '[^\w\s]'))
                            AS DOUBLE) AS n_punct,
                       CAST(len(regexp_extract_all(lower(text),
                           '\b(the|a|of|and|in|to|is|on|for|with)\b'))
                            AS DOUBLE) AS n_stop
                FROM documents)
            SELECT doc_id,
                   CAST(n_chars AS BIGINT) AS n_chars,
                   round((n_chars - (n_tokens - 1)) / greatest(n_tokens, 1), 4)
                       AS mean_word_len,
                   round(n_punct / greatest(n_chars, 1), 4) AS punct_ratio,
                   round(n_stop / greatest(n_tokens, 1), 4) AS stopword_ratio
            FROM s ORDER BY doc_id
        """,
        "knn_brute": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qe
                FROM embeddings ORDER BY vec_id LIMIT 10)
            SELECT query_id, vec_id, round(cos, 4) AS cosine FROM (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(
                           CAST(q.qe AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) AS cos,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY list_cosine_similarity(
                               CAST(q.qe AS DOUBLE[]),
                               CAST(e.embedding AS DOUBLE[])) DESC,
                               e.vec_id ASC) AS rn
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id != q.query_id
            ) WHERE rn <= 5 ORDER BY query_id, cosine DESC, vec_id
        """,
        "embed_near_dup": """
            SELECT a.vec_id AS left_id, b.vec_id AS right_id,
                   round(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 4) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(
                CAST(a.embedding AS DOUBLE[]),
                CAST(b.embedding AS DOUBLE[])) >= 0.45
            ORDER BY 1, 2
        """,
        # the RP-LSH path verifies candidates with the EXACT cosine and its
        # banding misses a qualifying pair with p <= 3e-6 at test scale, so
        # the exact all-pairs SQL doubles as its oracle (recall additionally
        # gated vs q_embed_near_dup in tests/test_queries.py)
        "embed_rplsh_near_dup": """
            SELECT a.vec_id AS left_id, b.vec_id AS right_id,
                   round(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 4) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(
                CAST(a.embedding AS DOUBLE[]),
                CAST(b.embedding AS DOUBLE[])) >= 0.45
            ORDER BY 1, 2
        """,
        # simhash_near_dup, lang_id, doc_fingerprint, knn_ivf, dedup_*,
        # audio_*, image_decode_stub: not SQL-expressible (random
        # projections / MinHash / actor-held state / binary codecs) →
        # rows-only checks, by design.
    }
