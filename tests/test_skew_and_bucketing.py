"""Skew-salting correctness + bucketed co-located join plan test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)
from curw_wrf_data_pusher_spark.sources.lake import load_table

from .test_plans_quality import count_nodes, plan_of


def test_salted_aggregate_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = (
        ev.groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
            F.count("value").alias("count_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    salted = (
        salted_aggregate(
            ev.withColumn("value", F.col("value").cast("decimal(18,2)")),
            keys=["event_type"],
            aggs={"value": "sum"},
            n_salts=8,
        )
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    assert (salted["sum_value"] == plain["sum_value"]).all()
    other = (
        salted_aggregate(
            ev, keys=["event_type"],
            aggs={"event_id": "count", "ts": "max"}, n_salts=8,
        )
        .toPandas().set_index("event_type").sort_index()
    )
    assert (other["count_event_id"] == plain["count_value"]).all()


def test_salted_join_matches_plain(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("key"), "n_name"
    )
    big = o.select((F.col("o_custkey") % 25).cast("int").alias("key"),
                   "o_orderkey")
    plain = big.join(n, "key").count()
    salted = salted_join(big, n, on=["key"], n_salts=8).count()
    assert plain == salted


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # §scale: bucketBy co-locates both sides on the join key at write
    # time — the join then needs NO shuffle at read time.
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # external tables (explicit path): warehouse.dir is static config
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey").option(
        "path", str(tmp_path / "orders_b")
    ).mode("overwrite").saveAsTable("orders_b")
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey").option(
        "path", str(tmp_path / "customer_b")
    ).mode("overwrite").saveAsTable("customer_b")
    try:
        joined = spark.table("orders_b").join(
            spark.table("customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = plan_of(joined)
        assert count_nodes(plan, "Exchange") == 0, plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
