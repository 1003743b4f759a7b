"""Incremental aggregate maintenance (operators/rollup.py): the
mergeable-partial store must always agree with a from-scratch
recomputation, under any batch slicing, replay, or compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.operators.rollup import (
    commit_rollup,
    compact_rollup,
    merge_partials,
    read_rollup,
    rollup_partials,
)


@pytest.fixture()
def log(spark):
    rows = [
        ("u1", i, float((i * 37) % 11) - 3.0) for i in range(40)
    ] + [("u2", i, float(i)) for i in range(7)] + [("u3", 0, None)]
    return spark.createDataFrame(rows, "k string, i long, v double")


def _direct(log):
    return {
        r.k: r
        for r in log.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.avg("v").alias("avg_v"),
            F.var_pop("v").alias("var_pop"),
        )
        .collect()
    }


def _check(merged_rows, direct):
    got = {r.k: r for r in merged_rows}
    assert set(got) == set(direct)
    for k, d in direct.items():
        g = got[k]
        assert g.n == d.n and g.min_v == d.min_v and g.max_v == d.max_v
        if d.n:
            assert g.sum_v == pytest.approx(d.sum_v)
            assert g.avg_v == pytest.approx(d.avg_v)
            assert g.var_pop == pytest.approx(d.var_pop, abs=1e-9)


def test_any_slicing_matches_direct(spark, log):
    direct = _direct(log)
    for nb in (1, 3, 5):
        sliced = log.withColumn("b", F.col("i") % nb)
        merged = merge_partials(
            rollup_partials(sliced, ["k", "b"], "v"), ["k"]
        ).collect()
        _check(merged, direct)


def test_store_lifecycle_commit_read_replay_compact(spark, log, tmp_path):
    store = str(tmp_path / "rollup")
    direct = _direct(log)
    for b in range(3):
        commit_rollup(
            log.filter(F.col("i") % 3 == b), store, ["k"], "v", f"b{b}"
        )
    _check(read_rollup(spark, store, ["k"]).collect(), direct)
    # replaying a batch id is a no-op (partition overwritten in place)
    commit_rollup(
        log.filter(F.col("i") % 3 == 1), store, ["k"], "v", "b1"
    )
    _check(read_rollup(spark, store, ["k"]).collect(), direct)
    # compaction to a fresh store reads identically
    compacted = str(tmp_path / "rollup2")
    compact_rollup(spark, store, ["k"], compacted)
    _check(read_rollup(spark, compacted, ["k"]).collect(), direct)
    one_row = spark.read.parquet(compacted)
    assert one_row.count() == 3  # one partial row per key


def test_empty_store_reads_empty(spark, tmp_path):
    out = read_rollup(spark, str(tmp_path / "nope"), ["k"])
    assert out.count() == 0
    assert set(out.columns) == {
        "k", "n", "sum_v", "min_v", "max_v", "avg_v", "var_pop"
    }


def test_read_rollup_aggregates_partials_not_the_log(spark, log, tmp_path):
    """The merge-on-read plan scans the partial store (rows =
    keys×batches), never the event log — the point of the operator."""
    store = str(tmp_path / "rollup")
    commit_rollup(log, store, ["k"], "v", "b0")
    merged = read_rollup(spark, store, ["k"])
    files = merged.inputFiles()
    assert files and all("rollup" in f for f in files)
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one partial-merge shuffle
