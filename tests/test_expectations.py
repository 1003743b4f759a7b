"""Expectations: one-scan rule evaluation, NULL-as-violation, key
uniqueness, and the raising gate."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.operators.expectations import (
    check_expectations,
    expect,
    unique_key_violations,
)
from tests.test_plans_quality import plan_of


def _df(spark):
    return spark.createDataFrame(
        [(1, 5.0, "a"), (2, -1.0, "b"), (3, None, "a"), (4, 9.0, None)],
        "id long, v double, s string",
    )


def _rules():
    # built lazily: Column construction needs an active SparkContext
    return [
        ("v_non_negative", F.col("v") >= 0),   # row2 fails, row3 NULL
        ("s_present", F.col("s").isNotNull()),  # row4 fails
        ("id_positive", F.col("id") > 0),       # all pass
    ]


def test_check_expectations_counts_and_null_violation(spark):
    out = {r.rule: r for r in check_expectations(_df(spark), _rules()).collect()}
    assert out["v_non_negative"].n_violations == 2  # -1.0 and NULL
    assert out["s_present"].n_violations == 1
    assert out["id_positive"].n_violations == 0 and out["id_positive"].passed
    assert not out["v_non_negative"].passed
    assert abs(out["s_present"].violation_frac - 0.25) < 1e-12


def test_check_expectations_is_one_scan(spark):
    plan = plan_of(check_expectations(_df(spark), _rules()))
    assert len(re.findall(r"^\(\d+\) Scan", plan, flags=re.M)) == 1


def test_unique_key_violations(spark):
    dups = unique_key_violations(_df(spark), ["s"]).collect()
    assert {(r.s, r.n_rows) for r in dups} == {("a", 2)}


def test_expect_gate(spark):
    df = _df(spark)
    # passing rules return the frame unchanged
    assert expect(df, [("id_positive", F.col("id") > 0)]) is df
    with pytest.raises(ValueError, match="v_non_negative: 2/4"):
        expect(df, _rules())
    # tolerance: 50% allows the 25% s_present failure
    expect(df, [("s_present", F.col("s").isNotNull())],
           max_violation_frac=0.5)
    with pytest.raises(ValueError, match=r"unique_key\('s',\)"):
        expect(df, unique_key=["s"])
    expect(df, unique_key=["id"])  # id is unique — no raise


def test_distribution_drift_zero_for_identical_sample(spark):
    from curw_wrf_data_pusher_spark.operators.profile import (
        distribution_drift,
    )

    df = spark.range(1000).select((F.col("id") % 97).cast("double")
                                  .alias("v"))
    out = distribution_drift(df, df, "v", k=10).collect()
    s = [r for r in out if r.part == "summary"][0]
    assert s.chi_term == 0.0 and s.tvd_term == 0.0
    assert s.ref_n == s.cur_n == 1000
    buckets = [r for r in out if r.part == "bucket"]
    assert sum(r.cur_n for r in buckets) == 1000


def test_distribution_drift_detects_shift(spark):
    from curw_wrf_data_pusher_spark.operators.profile import (
        distribution_drift,
    )

    ref = spark.range(2000).select((F.col("id") % 100).cast("double")
                                   .alias("v"))
    cur = spark.range(2000).select(
        ((F.col("id") % 100) + 50).cast("double").alias("v")
    )
    s = [r for r in distribution_drift(ref, cur, "v", k=10).collect()
         if r.part == "summary"][0]
    # half the current mass sits above the reference's max bucket
    assert s.chi_term > 100
    assert 0.3 < s.tvd_term <= 1.0


def test_distribution_drift_survives_empty_side(spark):
    """Round-8 advisor fix: a side with zero non-null values must
    yield NULL chi²/TVD (unmeasurable), not ANSI DIVIDE_BY_ZERO —
    the all-null bad feed is exactly what the streaming gate
    quarantines, so the operator can't be allowed to crash on it."""
    from curw_wrf_data_pusher_spark.operators.profile import (
        distribution_drift,
    )

    ref = spark.range(500).select((F.col("id") % 50).cast("double")
                                  .alias("v"))
    all_null = spark.range(100).select(
        F.lit(None).cast("double").alias("v")
    )
    s = [r for r in distribution_drift(ref, all_null, "v", k=10).collect()
         if r.part == "summary"][0]
    assert s.tvd_term is None
    # round-9 advisor fix: chi² must be NULL alongside tvd on an
    # unmeasurable run — a 0.0 here read as "no drift" for the worst
    # possible feed (and made quality_monitor's chi2-None guard dead)
    assert s.chi_term is None
    assert s.cur_n == 0 and s.ref_n == 500
