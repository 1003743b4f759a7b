"""Temperature-based source rebalancing semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.llmops.curation import (
    temperature_mix,
    temperature_weights,
)


def _docs(spark):
    rows = (
        [(i, "big") for i in range(900)]
        + [(1000 + i, "small") for i in range(100)]
    )
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_alpha_one_is_identity_weights(spark):
    w = temperature_weights(_docs(spark), alpha=1.0)
    assert w["big"] == pytest.approx(1.0)
    assert w["small"] == pytest.approx(1.0)


def test_alpha_zero_equalizes_group_totals(spark):
    # α=0: every group gets the same share → expected realized size
    # n_g * w_g is N/G for all groups
    w = temperature_weights(_docs(spark), alpha=0.0)
    assert 900 * w["big"] == pytest.approx(500.0)
    assert 100 * w["small"] == pytest.approx(500.0)


def test_alpha_half_flattens_toward_small_sources(spark):
    w = temperature_weights(_docs(spark), alpha=0.5)
    assert w["small"] > 1.0 > w["big"]
    # expected realized total stays the corpus size
    assert 900 * w["big"] + 100 * w["small"] == pytest.approx(1000.0)
    # closed form: q_g = sqrt(n_g)/Σsqrt, w_g = q_g*N/n_g
    z = math.sqrt(900.0) + math.sqrt(100.0)
    assert w["small"] == pytest.approx((10.0 / z) * 1000.0 / 100.0)


def test_mix_realized_counts_near_expectation_and_deterministic(spark):
    docs = _docs(spark)
    out = temperature_mix(docs, alpha=0.5)
    got = dict(
        (r["source"], r["n"])
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    )
    w = temperature_weights(docs, alpha=0.5)
    for g, n_g in (("big", 900), ("small", 100)):
        exp = n_g * w[g]
        assert abs(got[g] - exp) < 4 * math.sqrt(exp)  # md5-binomial noise
    # deterministic under repartition
    out2 = temperature_mix(docs.repartition(11), alpha=0.5)
    a = sorted((r.doc_id, r.copy_id) for r in out.collect())
    b = sorted((r.doc_id, r.copy_id) for r in out2.collect())
    assert a == b


def test_target_total_scales_expected_size(spark):
    w = temperature_weights(_docs(spark), alpha=0.5, target_total=2000)
    assert 900 * w["big"] + 100 * w["small"] == pytest.approx(2000.0)


# ---------------------------------------------------------------------------
# budget_sample (apply form of mix_schedule)


def test_budget_sample_respects_allocations_and_determinism(spark):
    from curw_wrf_data_pusher_spark.llmops.curation import budget_sample

    rows = []
    for i in range(300):
        src = f"s{i % 3}"
        rows.append((i, src, " ".join(["w"] * (5 + i % 7))))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    weights = {"s0": 2.0, "s1": 1.0, "s2": 1.0}
    budget = 1200

    out = budget_sample(docs, weights, budget).collect()
    # per-source totals stay within their allocation (Σw = 4)
    alloc = {"s0": budget * 2.0 / 4.0, "s1": budget / 4.0,
             "s2": budget / 4.0}
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        assert sum(r.n_tokens for r in rs) <= alloc[src]
        # running totals are consistent with the kept set
        assert max(r.cum_tokens for r in rs) == sum(
            r.n_tokens for r in rs
        )
    # the double-weight source gets roughly double the tokens
    t0 = sum(r.n_tokens for r in by_src["s0"])
    t1 = sum(r.n_tokens for r in by_src["s1"])
    assert t0 > 1.5 * t1
    # deterministic + repartition-proof
    again = budget_sample(docs.repartition(7), weights, budget).collect()
    assert {r.doc_id for r in again} == {r.doc_id for r in out}
    # monotone: a bigger budget keeps a superset
    bigger = budget_sample(docs, weights, budget * 2).collect()
    assert {r.doc_id for r in out} <= {r.doc_id for r in bigger}
    # allocation beyond availability keeps everything
    everything = budget_sample(docs, weights, 10_000_000).collect()
    assert len(everything) == 300
