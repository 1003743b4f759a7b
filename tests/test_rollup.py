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


# --- incremental distinct-count rollup (HLL register partials) ----------

from curw_wrf_data_pusher_spark.operators.rollup import (  # noqa: E402
    commit_hll_rollup,
    compact_hll_rollup,
    hll_rollup_estimates,
    read_hll_rollup,
)
from curw_wrf_data_pusher_spark.operators.sketch import (  # noqa: E402
    hll_build,
    hll_estimate,
)


def _users(spark, key, lo, hi):
    return spark.createDataFrame(
        [(key, f"u{u}") for u in range(lo, hi)], "site string, user string"
    )


def test_hll_rollup_incremental_matches_single_build(spark, tmp_path):
    store = str(tmp_path / "hll")
    # three batches with overlapping users per site
    b1 = _users(spark, "a", 0, 400).union(_users(spark, "b", 0, 50))
    b2 = _users(spark, "a", 200, 600).union(_users(spark, "b", 25, 75))
    b3 = _users(spark, "b", 50, 100)
    commit_hll_rollup(b1, store, ["site"], "user", "d1")
    commit_hll_rollup(b2, store, ["site"], "user", "d2")
    commit_hll_rollup(b3, store, ["site"], "user", "d3")

    merged = read_hll_rollup(spark, store, ["site"])
    whole = b1.union(b2).union(b3)
    direct = hll_build(whole, "user", group_cols=["site"])
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))

    # grouped estimator ≡ the scalar estimator per key
    ests = {r.site: r.est_distinct for r in
            hll_rollup_estimates(merged, ["site"]).collect()}
    for site in ("a", "b"):
        scalar = hll_estimate(
            hll_build(whole.filter(F.col("site") == site), "user")
        )
        assert abs(ests[site] - scalar) < 1e-9, site
    # accuracy: true distincts are 600 and 100
    assert abs(ests["a"] - 600) / 600 < 0.4
    assert abs(ests["b"] - 100) / 100 < 0.4


def test_hll_rollup_replay_and_compaction(spark, tmp_path):
    store = str(tmp_path / "hll2")
    b1 = _users(spark, "a", 0, 100)
    commit_hll_rollup(b1, store, ["site"], "user", "d1")
    commit_hll_rollup(_users(spark, "a", 50, 150), store,
                      ["site"], "user", "d2")
    before = sorted(map(tuple,
                        read_hll_rollup(spark, store, ["site"]).collect()))
    # replaying d1 is a no-op (idempotent dynamic overwrite)
    commit_hll_rollup(b1, store, ["site"], "user", "d1")
    assert sorted(map(tuple,
                      read_hll_rollup(spark, store, ["site"]).collect())) \
        == before
    # compaction to a fresh store reads identically
    cpath = str(tmp_path / "hll2c")
    compact_hll_rollup(spark, store, ["site"], cpath)
    assert sorted(map(tuple,
                      read_hll_rollup(spark, cpath, ["site"]).collect())) \
        == before


def test_hll_rollup_empty_store(spark, tmp_path):
    empty = read_hll_rollup(spark, str(tmp_path / "none"), ["site"])
    assert empty.count() == 0
    assert hll_rollup_estimates(empty, ["site"]).count() == 0
