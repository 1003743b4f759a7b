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
