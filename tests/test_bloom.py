"""Bloom-filter semi-join: exactness, no-false-negative guarantee,
fpp sanity, and the scan-pruning plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.operators.bloom import (
    bloom_might_contain,
    bloom_semi_join,
    build_bloom,
    optimal_parameters,
)


def test_optimal_parameters_textbook_sizing():
    m, k = optimal_parameters(1000, 0.01)
    # ~9.59 bits/key at 1% fpp, k ≈ 7
    assert 9000 <= m <= 10240 and m % 64 == 0
    assert k in (6, 7, 8)
    assert optimal_parameters(0) == (64, 1)


def test_semi_join_exact_vs_plain(spark):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 700).alias("k"), F.col("id").alias("payload")
    )
    keys = spark.range(0, 200).select((F.col("id") * 3).alias("k"))
    got = bloom_semi_join(fact, keys, "k").orderBy("payload").collect()
    want = (
        fact.join(keys, "k", "left_semi").orderBy("payload").collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0


def test_no_false_negatives_every_true_key_survives_probe(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    n_bits, n_hashes = optimal_parameters(500, 0.01)
    bloom = build_bloom(keys, "k", n_bits, n_hashes)
    probed = bloom_might_contain(keys, bloom, "k", n_bits, n_hashes)
    assert probed.filter(~F.col("might_match")).count() == 0


def test_fpp_on_disjoint_keys_is_bounded(spark):
    keys = spark.range(0, 1000).select(F.col("k")) if False else (
        spark.range(0, 1000).select(F.col("id").alias("k"))
    )
    n_bits, n_hashes = optimal_parameters(1000, 0.01)
    bloom = build_bloom(keys, "k", n_bits, n_hashes)
    # probe a disjoint range: every hit is a false positive
    probe = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("k"))
    fp = (
        bloom_might_contain(probe, bloom, "k", n_bits, n_hashes)
        .filter("might_match")
        .count()
    )
    # 1% nominal; allow generous slack for hash-probe correlation
    assert fp / 10_000 < 0.05


def test_string_keys_work(spark):
    fact = spark.createDataFrame(
        [(f"u{i % 50}", i) for i in range(400)], "k string, v long"
    )
    keys = spark.createDataFrame([(f"u{i}",) for i in range(0, 50, 7)], "k string")
    got = {tuple(r) for r in bloom_semi_join(fact, keys, "k").collect()}
    want = {tuple(r) for r in fact.join(keys, "k", "left_semi").collect()}
    assert got == want


def test_probe_plan_is_map_side_no_fact_shuffle_before_filter(spark):
    fact = spark.range(0, 1000).select(F.col("id").alias("k"))
    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    n_bits, n_hashes = optimal_parameters(100, 0.01)
    bloom = build_bloom(keys, "k", n_bits, n_hashes)
    probed = bloom_might_contain(fact, bloom, "k", n_bits, n_hashes)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the one-row bitset rides a broadcast; the fact side never
    # exchanges — only the bitset build aggregates
    assert "BroadcastNestedLoopJoin" in plan
    head = plan.split("BroadcastNestedLoopJoin")[0]
    assert "Exchange hashpartitioning(k" not in head
    # probe is codegen expressions, not a python UDF
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
