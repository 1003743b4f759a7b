"""Incremental aggregate maintenance: a materialized per-key rollup
kept current by MERGEABLE partials, never by recomputation.

At 100 TB an append-only event log's per-key statistics (count / sum /
min / max / mean / variance) cannot be recomputed per ingest batch.
The standard shape — what every OLAP engine's materialized view
maintenance does under the hood — is:

1. per batch, aggregate ONLY the batch into per-key PARTIALS whose
   algebra merges: (n, sum, min, max, sum_sq);
2. commit the partials as one batch partition of a parquet store
   (idempotent per batch id, history never rewritten — same contract
   as ``llmops/incremental.py``'s hash store);
3. reads merge-on-read: one aggregation over the partials (a few rows
   per key per batch — orders of magnitude smaller than the log), with
   the final statistics derived at the end (mean = sum/n,
   var = sum_sq/n − mean²).

The merge is associative and commutative, so ANY batch slicing — or a
later compaction of many partitions into one — yields bit-identical
counts/sums and the same min/max; tests pin this against the direct
single-pass aggregation.  sum_sq-based variance is the textbook
mergeable form; it loses precision when |mean| ≫ stddev (documented
caveat — switch the store to Chan et al. M2 partials if your keys'
values are like that).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rollup_partials(
    batch: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Per-key mergeable partials of ONE batch: (keys…, n, sum_v,
    min_v, max_v, sum_sq).  One hash aggregation with map-side
    combine; NULL values are excluded from all five (SQL aggregate
    semantics), n counts non-null values."""
    v = F.col(value_col)
    return batch.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(v).alias("n"),
        F.sum(v).alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        F.sum(v * v).alias("sum_sq"),
    )


def merge_partials(partials: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge partials (from any number of batches / any slicing) into
    per-key totals plus the derived statistics.  The inputs are
    partial rows, so this aggregation is over |keys|×|batches| rows —
    not the event log."""
    merged = partials.groupBy(*[F.col(k) for k in keys]).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        F.sum("sum_sq").alias("sum_sq"),
    )
    mean = F.col("sum_v") / F.col("n")
    return merged.select(
        *keys,
        "n",
        "sum_v",
        "min_v",
        "max_v",
        mean.alias("avg_v"),
        (F.col("sum_sq") / F.col("n") - mean * mean).alias("var_pop"),
    )


def commit_rollup(
    batch: DataFrame,
    store_path: str,
    keys: Sequence[str],
    value_col: str,
    batch_id: str,
) -> None:
    """Aggregate one ingest batch to partials and commit them as the
    store's ``batch=<id>`` partition.  Dynamic partition overwrite:
    replaying a batch id rewrites only its own partition — idempotent,
    history untouched."""
    (
        rollup_partials(batch, keys, value_col)
        .withColumn("batch", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(store_path)
    )


def read_rollup(
    spark: SparkSession, store_path: str, keys: Sequence[str]
) -> DataFrame:
    """Merge-on-read of the partial store: current per-key statistics
    across every committed batch.  Empty store → empty result with the
    merged schema."""
    key_fields = ", ".join(f"{k} string" for k in keys)
    schema = (
        f"{key_fields}, n bigint, sum_v double, min_v double, "
        "max_v double, sum_sq double, batch string"
    )
    try:
        partials = spark.read.parquet(store_path)
    except Exception:
        partials = spark.createDataFrame([], schema)
    return merge_partials(partials.drop("batch"), keys)


def compact_rollup(
    spark: SparkSession,
    store_path: str,
    keys: Sequence[str],
    compacted_path: str,
) -> None:
    """Fold every committed partition into ONE partial row per key at
    ``compacted_path`` (a fresh store the caller swaps in — no
    in-place rewrite, so a crash mid-compaction loses nothing).  Reads
    after the swap are identical by merge associativity (pinned in
    tests)."""
    partials = spark.read.parquet(store_path).drop("batch")
    merged = partials.groupBy(*[F.col(k) for k in keys]).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        F.sum("sum_sq").alias("sum_sq"),
    )
    (
        merged.withColumn("batch", F.lit("__compacted__"))
        .write.mode("overwrite")
        .partitionBy("batch")
        .parquet(compacted_path)
    )
    # sanity: the compacted store is a valid store (readable, one
    # partition); the swap itself is the caller's atomic rename
    assert os.path.isdir(compacted_path)


# ---------------------------------------------------------------------------
# Incremental DISTINCT-COUNT rollup — HLL registers as the partial
# state (the sum/min/max partials above can't answer "how many
# distinct users per key" incrementally; registers can: they merge by
# per-bucket max exactly like sums merge by addition).  Same store
# mechanics as the numeric rollup: one batch-partitioned commit per
# ingest (idempotent dynamic overwrite), merge-on-read over ≤ m rows
# per key per batch, compact-to-fresh-store.  At 100 TB the store
# grows with keys × m × batches until compaction — never with fact
# rows.


def commit_hll_rollup(
    batch: DataFrame,
    store_path: str,
    keys: Sequence[str],
    item_col: str,
    batch_id: str,
    m: int = 64,
) -> None:
    """Reduce one ingest batch to per-key HLL registers and commit
    them as the store's ``batch=<id>`` partition (idempotent replay,
    history untouched — the numeric-rollup contract)."""
    from .sketch import hll_build

    (
        hll_build(batch, item_col, m=m, group_cols=keys)
        .withColumn("batch", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(store_path)
    )


def read_hll_rollup(
    spark: SparkSession,
    store_path: str,
    keys: Sequence[str],
) -> DataFrame:
    """Merge-on-read: current per-(key, bucket) max_rank across every
    committed batch — the live register set.  Empty store → empty
    typed frame."""
    key_fields = ", ".join(f"{k} string" for k in keys)
    schema = f"{key_fields}, bucket bigint, max_rank int, batch string"
    try:
        partials = spark.read.parquet(store_path)
    except Exception:
        partials = spark.createDataFrame([], schema)
    return (
        partials.drop("batch")
        .groupBy(*[F.col(k) for k in keys], "bucket")
        .agg(F.max("max_rank").alias("max_rank"))
    )


def hll_rollup_estimates(
    registers: DataFrame, keys: Sequence[str], m: int = 64
) -> DataFrame:
    """Per-key distinct-count estimates from merged registers, as pure
    column arithmetic (no driver collect): the standard HLL harmonic
    mean with the small-range linear-counting correction — the grouped
    twin of ``sketch.hll_estimate`` (equality pinned in tests).
    Expected relative error ≈ 1.04/√m."""
    alpha = 0.709 if m == 64 else 0.7213 / (1 + 1.079 / m)
    agg = registers.groupBy(*[F.col(k) for k in keys]).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("__s_present"),
        F.count("*").alias("__n_regs"),
    )
    zeros = F.lit(m) - F.col("__n_regs")
    s = F.col("__s_present") + zeros.cast("double")  # absent ⇒ 2^-0
    raw = F.lit(alpha * m * m) / s
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(*keys, est.alias("est_distinct"))


def compact_hll_rollup(
    spark: SparkSession,
    store_path: str,
    keys: Sequence[str],
    compacted_path: str,
) -> None:
    """Fold every committed partition into one register row per
    (key, bucket) at a fresh store path (crash-safe swap, merge
    associativity makes reads identical — same contract as
    ``compact_rollup``)."""
    (
        read_hll_rollup(spark, store_path, keys)
        .withColumn("batch", F.lit("compacted"))
        .write.mode("overwrite")
        .partitionBy("batch")
        .parquet(compacted_path)
    )
