"""Pin the driver-window composition of the query registry.

The external correctness harness evaluates the FIRST ~50 registered
queries; everything later rides on the local mirror only.  These tests
make the window composition an explicit, reviewed artifact: a reorder
or an added query that silently pushes a unique operator past position
50 fails here, not in the next round's CORRECTNESS report.

Round-7 rotation (judge task 4) promoted the round-6 operator
families; round-9 rotation (judge r8 task 1) promoted the round-7
families — PQ ANN ADC top-k + shortlist re-rank, KMV distinct +
overlap sketches, mergeable quantile sketch, SCD2 as-of lookup,
sweep-line concurrency, distribution-drift monitor, budget-filling
sampling, Gopher repetition signals — evicting ten compound-redundant
rows.  A second round-9 rotation promoted the five NEW round-9
families (seasonal anomaly, CUSUM change point, decorrelated scalar
subquery, forecast skill scores, exact wide-decimal Pearson
correlation), evicting five more compound-redundant rows.  The
eviction→coverage mapping is documented per entry in
``curw_wrf_data_pusher_spark/queries/__init__._TAIL``.

Round-10 rotation (judge r9 task 1) promoted the round-9 tail
families — incremental cross-batch near-dedup, filtered ANN serving,
RANGE-frame and sliding-distinct windows, the spark.sql ANSI entry
point, EXISTS/NOT-EXISTS decorrelation (Q4/Q21 shapes),
Horvitz-Thompson hash-sample estimates, and the re-promoted PQ
shortlist re-rank + KMV overlap — evicting ten compound-redundant
rows (incl. the no-hash-signal p10).  A second round-10 rotation
promoted the two NEW round-10 families (KMV sliding distinct, BPE
pair counting), evicting two compound-redundant rows.  All
promotions were re-verified hash-green vs DuckDB at sf0.01 (and the
full registry at sf0.1) before each swap.

Round-11 rotation (judge r10 task 6) promoted six never-driver-gated
families — pinned-index OPQ serving (llm_opq_serve, new round 11),
exact sliding-distinct windows (w16), MOSS winnowing pairs, banded
SimHash neighbours (after the round-11 popcount-kernel rewrite), HLL
register state (a22), and int8-quantized ANN — evicting six
compound-covered rows (a25 KMV overlap, PQ shortlist re-rank,
mergeable quantile sketch, q4 EXISTS-semi, j8 fuzzy pairs, w12
concurrency), each with named head covers in ``_TAIL``.

Round-12 rotation (judge r11 task 1) promoted eight never-driver-gated
families — WMO obs QC (w18), GloVe co-occurrence, k-anonymity/
l-diversity audit, post-fix gap fill (w6), BM25/TF-IDF retrieval,
one-scan table profiling (a14), bounded rolling stats (w5), and the
NB quality classifier — evicting eight rows that all earned
driver-green CORRECTNESS_r11 rows (w16 sliding distinct, a22 HLL
registers, int8-quantized top-k, winnowing pairs, SimHash neighbors,
Horvitz-Thompson sample aggs, repetition signals, filtered ANN), each
with named head covers in ``_TAIL``.

Round-13 rotation (judge r12 task 1, the FOURTH rotation): FIFTEEN
never-driver-gated families promoted — the five round-12 additions
(real media decode, stupid-backoff LM scoring, DSIR importance
weights, n-gram count-store lifecycle, corpus entropy) plus the
legacy analytics tail (exact heavy hitters a15, MAD outliers a17,
mergeable rollup a18, histograms a19, feature scaling a20, cohort
retention a21, bloom semi-join j9, Morton Z-order p13, window suite
w8, multi-touch attribution w11).  Fifteen evictions, every one
driver-green in CORRECTNESS_r12.json, each with named head covers in
``_TAIL`` (a14 profiling, w5 rolling stats, w6 gap fill,
co-occurrence, privacy audit, BM25/TF-IDF, NB classifier, SemDeDup,
seq packing, w18 obs QC, binary metadata, contamination, w13
seasonal anomaly, j10 SCD2 lookup, wrf_e4 skill scores).

Round-14 rotation (judge r13 task 2, the FIFTH rotation): the NINE
remaining never-driver-gated oracle rows promoted — llm_ngram_logfreq,
llm_vocab_topk, llm_temperature_mix, llm_normalize_text,
llm_train_test_split, llm_source_cap, llm_setsim_cross,
llm_token_encode, llm_mix_schedule — retiring the never-gated ledger
to ZERO (p17_file_stats rows-only excepted).  Nine evictions, every
one driver-green in CORRECTNESS_r13.json (a15 heavy hitters, a18
mergeable rollup, a20 feature scaling, a21 cohort retention, p13
Morton Z-order, w11 multi-touch, q21 NOT-EXISTS decorrelation, sql1
CTE entry point, llm_corpus_entropy), each with named head covers in
``_TAIL``.
"""

from __future__ import annotations

from curw_wrf_data_pusher_spark.queries import ORACLES, QUERIES

DRIVER_BUDGET = 50

#: The exact head list (driver-checked order).  Update DELIBERATELY —
#: every entry either demonstrates a unique SURVEY §2 / LLM operator or
#: is a compound row folding several.
EXPECTED_HEAD = [
    "p2_bbox_filter",
    "p9_key_parse",
    "a6_latest_fgt_join",
    "w3_nearest_neighbor",
    "a1_pricing_summary",
    "j1_pivot_sources",
    "j3_broadcast_lookup",
    "j5_get_or_create",
    "s10_window_resample",
    "a9_o1_percentiles_ranked",
    "j6_j7_asof_range",
    "a11_a12_cube_gsets",
    "p14_p15_json_datetime",
    "j9_bloom_semi_join",
    "a17_mad_outliers",
    "a19_histograms",
    "w8_window_suite",
    "w9_funnel",
    "a23_kmv_distinct",
    "k12_distribution_drift",
    "w15_range_frame",
    "w17_sliding_distinct_kmv",
    "wrf_e1_push_rows",
    "wrf_e3_hybrid_frame",
    "e2_rfield_contract",
    "llm_ivf_topk",
    "llm_text_features",
    "llm_dedup_clusters",
    "llm_jaccard_verify",
    "llm_curate_corpus",
    "llm_substring_dedup",
    "llm_ngram_logfreq",
    "llm_vocab_topk",
    "llm_temperature_mix",
    "llm_normalize_text",
    "llm_train_test_split",
    "llm_setsim_pairs",
    "llm_source_cap",
    "llm_setsim_cross",
    "llm_token_encode",
    "llm_pq_topk",
    "llm_mix_schedule",
    "llm_budget_sample",
    "llm_incremental_neardup",
    "llm_bpe_pair_counts",
    "llm_opq_serve",
    "llm_media_decode",
    "llm_stupid_backoff",
    "llm_dsir_weights",
    "llm_ngram_store_topk",
]

#: The exact tail (local-mirror-only order).  Each entry's operator is
#: covered by a head row (mapping documented in queries/__init__).
EXPECTED_TAIL = [
    "q5_local_supplier_volume",
    "q18_large_orders",
    "p6_station_names",
    "w2_latest_topk",
    "u1_u5_union_forms",
    "a7_a8_distinct_rollup",
    "a10_approx_aggs",
    "p11_null_safe_eq",
    "q3_shipping_priority",
    "llm_exact_dedup_fingerprint",
    "llm_minhash_signatures",
    "p16_conditional_exprs",
    "llm_stratified_sample",
    "p4_sql_string_filter",
    "p7_timestamp_shift",
    "r1_unpivot",
    "u3_u4_intersect_except",
    "w4_sessionize",
    "a13_salted_agg",
    "llm_minhash_lsh_pairs",
    "llm_cosine_topk_neardup",
    "k11_snapshot_diff",
    "p17_file_stats",
    "k10_scd2_history",
    "llm_survivor_corpus_stats",
    "p10_file_metadata",
    "w1_lag_diff",
    "j2_left_join",
    "a3_obs_window_start",
    "q17_small_quantity_revenue",
    "w14_cusum_changepoint",
    "wrf_e5_skill_correlation",
    "w10_attribution",
    "a16_countmin_freq",
    "p8_p12_hash_strings",
    "u2_j1_outer_dropna",
    "a25_kmv_overlap",
    "llm_pq_rerank",
    "a24_quantile_sketch",
    "q4_order_priority_check",
    "j8_fuzzy_pairs",
    "w12_concurrency",
    "w16_sliding_distinct",
    "a22_hll_registers",
    "llm_quantized_topk",
    "llm_winnow_pairs",
    "llm_simhash_neighbors",
    "a26_approx_sample_aggs",
    "llm_repetition_signals",
    "llm_filtered_ann",
    "a14_profile_table",
    "w5_rolling_stats",
    "w6_gap_fill",
    "llm_cooccurrence",
    "llm_privacy_audit",
    "llm_bm25_tfidf",
    "llm_quality_classifier",
    "llm_semantic_dedup",
    "llm_seq_packing",
    "w18_obs_qc",
    "llm_binary_metadata",
    "llm_contamination",
    "w13_seasonal_anomaly",
    "j10_scd2_lookup",
    "wrf_e4_skill_scores",
    "a15_heavy_hitters",
    "a18_mergeable_rollup",
    "a20_feature_scaling",
    "a21_cohort_retention",
    "p13_morton_zorder",
    "w11_multi_touch",
    "q21_fully_late_orders",
    "sql1_cte_window_join",
    "llm_corpus_entropy",
]


def test_head_fits_driver_budget_and_is_pinned():
    head = list(QUERIES)[:DRIVER_BUDGET]
    assert head == EXPECTED_HEAD, (
        "driver-window head changed — if deliberate, update EXPECTED_HEAD "
        f"(diff: {set(head) ^ set(EXPECTED_HEAD)})"
    )


def test_every_head_query_is_oracle_gated():
    """Round-10 rotation moved the rows-only p10 to the tail: every
    driver-window slot now carries full rows+schema+hash signal."""
    head = list(QUERIES)[:DRIVER_BUDGET]
    missing = [q for q in head if q not in ORACLES]
    assert missing == [], missing


def test_tail_holds_only_redundant_demos():
    tail = list(QUERIES)[DRIVER_BUDGET:]
    assert tail == EXPECTED_TAIL, (
        "tail changed — if deliberate, update EXPECTED_TAIL "
        f"(diff: {set(tail) ^ set(EXPECTED_TAIL)})"
    )
