"""Bucketed-table sink — co-located joins and aggregations without a
shuffle (SURVEY §3 scale work; beyond the reference's MySQL sink).

At 100 TB the dominant cost of a fact⋈fact equi-join or a repeated
groupBy on the same key is the exchange.  Hive-style bucketing removes
it: ``bucketBy(n, key)`` hash-partitions FILES at write time, so a
later scan already satisfies ``HashPartitioning(key, n)`` and Catalyst
plans SortMergeJoin / HashAggregate with NO Exchange on the bucketed
side — the shuffle is paid once at ingest instead of once per query.
``sortBy`` additionally pre-sorts within each bucket file, letting the
join skip its per-partition Sort when one file per bucket exists.

Usage pattern (both sides written with the SAME key and bucket count):

    write_bucketed(fact, "fact_by_custkey", ["custkey"], 64)
    write_bucketed(dim_updates, "updates_by_custkey", ["custkey"], 64)
    spark.table("fact_by_custkey").join(
        spark.table("updates_by_custkey"), "custkey")   # no Exchange

Mismatched bucket counts still avoid the big side's shuffle when
``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is on (the
larger count coalesces into the smaller by unioning bucket files).

Bucketed tables require the session catalog (``saveAsTable`` — a plain
``parquet(path)`` write cannot record the bucket spec); pass ``path``
to keep the data outside the default warehouse while registering the
spec in the catalog.  ``tests/test_bucketed.py`` plan-gates the
no-Exchange contracts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet-backed bucketed table.

    ``sort_cols`` defaults to ``bucket_cols`` (sorted buckets let a
    downstream SortMergeJoin skip its Sort when each bucket holds one
    file).  One file per bucket is ensured by repartitioning on the
    bucket columns first — without it every input task writes a file
    per bucket (tasks × buckets small files, and the sorted-bucket
    optimization turns off)."""
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1: {num_buckets}")
    w = (
        df.repartition(num_buckets, *[df[c] for c in bucket_cols])
        .write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    """Drop the catalog entry (external data at ``path=`` survives)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
