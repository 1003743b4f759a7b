"""Bucketed-table co-location (sinks/bucketed.py): the no-Exchange
plan contracts that make bucketing worth its ingest-time shuffle at
100 TB, plus result parity with the unbucketed plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.sinks.bucketed import (
    drop_bucketed,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    """Force SortMergeJoin so the Exchange assertions are about
    bucketing, not about AQE choosing a broadcast."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _mk(spark, n, seed):
    return spark.range(n).select(
        (F.col("id") % 97).alias("custkey"),
        (F.col("id") * seed % 1000).alias("v"),
    )


def test_same_bucket_join_has_no_exchange(spark, tmp_path, no_broadcast):
    a, b = _mk(spark, 5000, 7), _mk(spark, 3000, 11)
    write_bucketed(a, "t_bk_a", ["custkey"], 8,
                   path=str(tmp_path / "a"))
    write_bucketed(b, "t_bk_b", ["custkey"], 8,
                   path=str(tmp_path / "b"))
    try:
        joined = spark.table("t_bk_a").join(
            spark.table("t_bk_b"), "custkey"
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # parity with the unbucketed join
        assert joined.count() == a.join(b, "custkey").count()
    finally:
        drop_bucketed(spark, "t_bk_a")
        drop_bucketed(spark, "t_bk_b")


def test_groupby_on_bucket_key_has_no_exchange(spark, tmp_path):
    a = _mk(spark, 5000, 7)
    write_bucketed(a, "t_bk_g", ["custkey"], 8,
                   path=str(tmp_path / "g"))
    try:
        agg = (
            spark.table("t_bk_g")
            .groupBy("custkey")
            .agg(F.sum("v").alias("s"))
        )
        plan = _plan(agg)
        assert "Exchange" not in plan, plan
        want = {
            (r.custkey, r.s)
            for r in a.groupBy("custkey").agg(F.sum("v").alias("s")).collect()
        }
        assert {(r.custkey, r.s) for r in agg.collect()} == want
    finally:
        drop_bucketed(spark, "t_bk_g")


def test_mismatched_buckets_coalesce_avoids_big_side_shuffle(
    spark, tmp_path, no_broadcast
):
    """8-bucket ⋈ 4-bucket with coalesceBucketsInJoin: the 8-bucket
    side unions pairs of bucket files down to 4 — still no Exchange
    on either side."""
    a, b = _mk(spark, 5000, 7), _mk(spark, 3000, 11)
    write_bucketed(a, "t_bk_8", ["custkey"], 8,
                   path=str(tmp_path / "c8"))
    write_bucketed(b, "t_bk_4", ["custkey"], 4,
                   path=str(tmp_path / "c4"))
    old = spark.conf.get(
        "spark.sql.bucketing.coalesceBucketsInJoin.enabled", "false"
    )
    spark.conf.set(
        "spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true"
    )
    try:
        joined = spark.table("t_bk_8").join(
            spark.table("t_bk_4"), "custkey"
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == a.join(b, "custkey").count()
    finally:
        spark.conf.set(
            "spark.sql.bucketing.coalesceBucketsInJoin.enabled", old
        )
        drop_bucketed(spark, "t_bk_8")
        drop_bucketed(spark, "t_bk_4")


def test_one_file_per_bucket(spark, tmp_path):
    """write_bucketed repartitions first — without it every write task
    emits a file per bucket (small-file explosion) and the sorted-
    bucket join optimization turns off."""
    import glob

    a = _mk(spark, 5000, 7).repartition(16)  # many input tasks
    write_bucketed(a, "t_bk_files", ["custkey"], 8,
                   path=str(tmp_path / "f"))
    try:
        files = glob.glob(str(tmp_path / "f" / "*.parquet"))
        assert len(files) == 8, sorted(files)
    finally:
        drop_bucketed(spark, "t_bk_files")
