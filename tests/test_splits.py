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


# --- deterministic hash sampling / AQP (operators/sampling.py) ----------

from curw_wrf_data_pusher_spark.operators.sampling import (  # noqa: E402
    approx_sum_count,
    hash_sample,
)


def test_hash_sample_nested_and_full(spark, sf_dir):
    from curw_wrf_data_pusher_spark.sources.lake import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select(
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("k"),
        "l_extendedprice",
    )
    s10 = {r.k for r in hash_sample(li, "k", 0.10).collect()}
    s05 = {r.k for r in hash_sample(li, "k", 0.05).collect()}
    assert s05 <= s10                       # nested monotonicity
    # rate is over ROWS (the synthetic lineitem repeats some
    # (orderkey, linenumber) pairs; keyed rows sample atomically)
    n = li.count()
    n10 = hash_sample(li, "k", 0.10).count()
    assert abs(n10 - 0.10 * n) < 0.02 * n   # ~uniform hash
    # fraction=1 keeps everything
    assert hash_sample(li, "k", 1.0).count() == n


def test_approx_aggs_close_to_exact(spark, sf_dir):
    from curw_wrf_data_pusher_spark.sources.lake import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    est = {
        r.l_returnflag: (r.est_count, r.est_sum)
        for r in approx_sum_count(
            li, F.concat_ws("-", "l_orderkey", "l_linenumber"),
            "l_extendedprice", 0.1, ["l_returnflag"],
        ).collect()
    }
    exact = {
        r.l_returnflag: (r.n, r.s)
        for r in li.groupBy("l_returnflag").agg(
            F.count("*").alias("n"), F.sum("l_extendedprice").alias("s")
        ).collect()
    }
    for flag, (n, s) in exact.items():
        ec, es = est[flag]
        assert abs(ec - n) / n < 0.10, flag      # ~1/sqrt(n·p) regime
        assert abs(es - s) / s < 0.10, flag
