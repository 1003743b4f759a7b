"""Pin the driver-window composition of the query registry.

The external correctness harness evaluates the FIRST ~50 registered
queries; everything later rides on the local mirror only.  These tests
make the window composition an explicit, reviewed artifact: a reorder
or an added query that silently pushes a unique operator past position
50 fails here, not in the next round's CORRECTNESS report.
"""

from __future__ import annotations

from curw_wrf_data_pusher_spark.queries import ORACLES, QUERIES

DRIVER_BUDGET = 50

#: The exact head list (driver-checked order).  Update DELIBERATELY —
#: every entry either demonstrates a unique SURVEY §2 / LLM operator or
#: is a compound row folding several.
EXPECTED_HEAD = [
    "p2_bbox_filter",
    "p4_sql_string_filter",
    "p6_station_names",
    "p7_timestamp_shift",
    "p9_key_parse",
    "w1_lag_diff",
    "a6_latest_fgt_join",
    "w2_latest_topk",
    "w3_nearest_neighbor",
    "a1_pricing_summary",
    "a3_obs_window_start",
    "j1_pivot_sources",
    "j2_left_join",
    "j3_broadcast_lookup",
    "j5_get_or_create",
    "u2_j1_outer_dropna",
    "u1_u5_union_forms",
    "r1_unpivot",
    "q3_shipping_priority",
    "a7_a8_distinct_rollup",
    "u3_u4_intersect_except",
    "s10_window_resample",
    "p10_file_metadata",
    "a9_o1_percentiles_ranked",
    "w4_sessionize",
    "a10_approx_aggs",
    "j6_j7_asof_range",
    "a11_a12_cube_gsets",
    "p11_null_safe_eq",
    "p8_p12_hash_strings",
    "p14_p15_json_datetime",
    "p16_conditional_exprs",
    "a13_salted_agg",
    "wrf_e1_push_rows",
    "wrf_e3_hybrid_frame",
    "e2_rfield_contract",
    "llm_exact_dedup_fingerprint",
    "llm_minhash_signatures",
    "llm_minhash_lsh_pairs",
    "llm_ivf_topk",
    "llm_text_features",
    "llm_binary_metadata",
    "llm_cosine_topk_neardup",
    "llm_dedup_clusters",
    "llm_simhash_neighbors",
    "llm_jaccard_verify",
    "llm_survivor_corpus_stats",
    "llm_contamination",
    "llm_seq_packing",
    "llm_curate_corpus",
]


def test_head_fits_driver_budget_and_is_pinned():
    head = list(QUERIES)[:DRIVER_BUDGET]
    assert head == EXPECTED_HEAD, (
        "driver-window head changed — if deliberate, update EXPECTED_HEAD "
        f"(diff: {set(head) ^ set(EXPECTED_HEAD)})"
    )


def test_every_head_query_is_oracle_gated_except_p10():
    head = list(QUERIES)[:DRIVER_BUDGET]
    missing = [q for q in head if q not in ORACLES]
    assert missing == ["p10_file_metadata"], missing


def test_tail_holds_only_redundant_demos():
    tail = list(QUERIES)[DRIVER_BUDGET:]
    assert tail == [
        "q5_local_supplier_volume",
        "q18_large_orders",
        # upsampling stays oracle-gated here AND hash-pinned in the
        # head via llm_curate_corpus's mixed-stage membership
        "llm_stratified_sample",
        # round-6 retrieval/quantization rows: oracle-gated locally by
        # tests/test_oracle_parity, past the driver's 50-row budget
        "llm_bm25_tfidf",
        "llm_quantized_topk",
        # substring-granular dedup (winnowing + repeated-window
        # removal): oracle-gated locally, same as above
        "llm_winnow_pairs",
        "llm_substring_dedup",
        "llm_semantic_dedup",
        "llm_ngram_logfreq",
        "a14_profile_table",
        "llm_vocab_topk",
        "w5_rolling_stats",
        "j8_fuzzy_pairs",
        "k10_scd2_history",
        # model-based quality filter (hashed-ngram Naive Bayes)
        "llm_quality_classifier",
        # dense-grid gap filling with linear interpolation
        "w6_gap_fill",
        # Morton/Z-order spatial layout keys
        "p13_morton_zorder",
        # temperature-alpha source rebalancing
        "llm_temperature_mix",
        # text canonicalization (control strip / WS collapse / NFC)
        "llm_normalize_text",
        # exact threshold heavy hitters (Misra-Gries twin in pytest)
        "a15_heavy_hitters",
        # bloom-prefiltered exact semi-join (catalyst-built bitset)
        "j9_bloom_semi_join",
        # leakage-safe grouped train/valid/test split + leak audit
        "llm_train_test_split",
        # exact prefix-filtered set-similarity join (AllPairs/PPJoin)
        "llm_setsim_pairs",
        # deterministic per-source document cap (hash-order rank)
        "llm_source_cap",
        # count-min sketch frequency estimation (cells oracle-rebuilt)
        "a16_countmin_freq",
        # median/MAD robust outlier detection (Iglewicz–Hoaglin)
        "a17_mad_outliers",
        # keyed snapshot diff: added/removed/changed classification
        "k11_snapshot_diff",
        # incremental-rollup mergeable-partial algebra (store lifecycle
        # in tests/test_rollup.py)
        "a18_mergeable_rollup",
        # cross-corpus (R×S) prefix-filtered set-similarity join
        "llm_setsim_cross",
        # equi-width + equi-depth histograms (one row, union-tagged)
        "a19_histograms",
        # per-group feature scaling on exact order statistics
        "a20_feature_scaling",
        # vocabulary token-id encoding (broadcast lookup, OOV, order)
        "llm_token_encode",
        # ranking/distribution window-function suite
        "w8_window_suite",
        # ordered funnel: one-shuffle Catalyst array walk ≡ min-CTEs
        "w9_funnel",
        # weekly cohort retention (first-activity cohorts)
        "a21_cohort_retention",
        # last-touch attribution: tolerance as-of vs DuckDB ASOF JOIN
        "w10_attribution",
        # HLL registers: float-free mergeable distinct-count state
        "a22_hll_registers",
    ], tail
