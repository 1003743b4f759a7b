"""Group-aware train/test split: structural no-leakage, stability,
fraction accuracy, and the map-only plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.llmops.splits import (
    grouped_split,
    split_leakage_report,
    split_thresholds,
)


def test_thresholds_hex_bounds():
    th = split_thresholds({"train": 0.8, "valid": 0.1, "test": 0.1})
    assert th == [
        ("train", "cccccccc"),
        ("valid", "e6666666"),
        ("test", "ffffffff"),
    ]
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": 0.4})


def _groups(spark, n_groups=500, per_group=4):
    return spark.range(n_groups * per_group).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % n_groups).cast("string").alias("g"),
    )


def test_no_group_straddles_split(spark):
    a = grouped_split(_groups(spark), "g")
    rep = split_leakage_report(a, "g").collect()[0]
    assert rep.n_groups == 500 and rep.n_leaky_groups == 0


def test_stable_under_repartition_and_salt_sensitive(spark):
    df = _groups(spark)
    a1 = {r.doc_id: r.split for r in grouped_split(df, "g").collect()}
    a2 = {
        r.doc_id: r.split
        for r in grouped_split(df.repartition(13), "g").collect()
    }
    assert a1 == a2
    b = {
        r.doc_id: r.split
        for r in grouped_split(df, "g", salt="other").collect()
    }
    assert b != a1  # an independent redraw moves some groups


def test_fractions_approximately_honored(spark):
    df = spark.range(4000).select(F.col("id").cast("string").alias("g"))
    counts = dict(
        grouped_split(df, "g", {"train": 0.8, "valid": 0.1, "test": 0.1})
        .groupBy("split")
        .count()
        .collect()
    )
    assert abs(counts["train"] / 4000 - 0.8) < 0.03
    assert abs(counts["valid"] / 4000 - 0.1) < 0.02
    assert abs(counts["test"] / 4000 - 0.1) < 0.02


def test_assignment_plan_is_map_only(spark):
    df = _groups(spark)
    plan = (
        grouped_split(df, "g")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_leakage_report_catches_planted_leak(spark):
    bad = spark.createDataFrame(
        [("g1", "train"), ("g1", "test"), ("g2", "train")],
        "g string, split string",
    )
    rep = split_leakage_report(bad, "g").collect()[0]
    assert rep.n_groups == 2 and rep.n_leaky_groups == 1
