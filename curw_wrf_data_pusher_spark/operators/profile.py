"""Table profiling (ANALYZE-style column statistics) as ONE scan.

A warehouse engine ships an ANALYZE/profiling path — null rates,
cardinalities, value ranges per column — for optimizer statistics and
data-quality monitoring.  The naive form runs one aggregation per
column (k scans of a 100 TB table); this one computes every
per-column aggregate in a SINGLE ``agg`` over one scan, reduces to a
single driver-sized row, and unpivots that row map-side with
``stack`` — so the cost is one pass regardless of column count.

``approx`` cardinalities use HyperLogLog++ (``approx_count_distinct``,
constant memory per column); ``exact_distinct=True`` switches to exact
``count(DISTINCT ...)`` — Spark plans multi-column exact distincts via
an Expand (rows × columns blow-up), which is the correctness twin for
tests/oracles, not the 100 TB default.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, null_frac,
    n_distinct, min_value, max_value), one row per profiled column.
    min/max are the TYPED extrema cast to string after aggregation
    (so numeric columns order numerically, not lexically).
    ``n_distinct`` excludes NULLs (both engines' count-distinct
    semantics)."""
    cols = list(columns) if columns is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        distinct = (
            F.countDistinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{i}"),
            distinct.alias(f"__nd_{i}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{i}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{i}"),
        ]
    one = df.agg(*aggs)
    stack_args = []
    for i, c in enumerate(cols):
        stack_args += [
            f"'{c}'", f"__nn_{i}", f"__nd_{i}", f"__mn_{i}", f"__mx_{i}",
        ]
    stacked = one.select(
        F.col("__n"),
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)})"
            " as (column, __nn, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        F.col("column"),
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).alias("n_nulls"),
        # plain long/long division — bit-identical across engines
        ((F.col("__n") - F.col("__nn")) / F.col("__n")).alias("null_frac"),
        F.col("n_distinct"),
        F.col("min_value"),
        F.col("max_value"),
    )


def equi_width_histogram(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Equi-width histogram: k equal-span buckets over [min, max],
    as (bucket, lo, hi, n).  The span comes from ONE single-row
    min/max aggregate broadcast onto the scan (the reviewed
    single-row-BNLJ shape used throughout the engine) — two scans,
    no global sort, counts combine map-side.  The top edge closes the
    last bucket (v = max lands in bucket k−1)."""
    v = F.col(col).cast("double")
    stats = df.agg(
        F.min(v).alias("__lo"), F.max(v).alias("__hi")
    )
    w = (F.col("__hi") - F.col("__lo")) / F.lit(float(k))
    bucket = F.least(
        F.floor((v - F.col("__lo")) / w).cast("int"), F.lit(k - 1)
    )
    return (
        df.join(F.broadcast(stats))
        .filter(v.isNotNull())
        .select(
            # zero-span (constant column) degenerates to bucket 0
            F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
            .otherwise(bucket)
            .alias("bucket"),
            F.col("__lo"),
            F.col("__hi"),
        )
        .groupBy("bucket", "__lo", "__hi")
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            (F.col("__lo") + F.col("bucket")
             * ((F.col("__hi") - F.col("__lo")) / F.lit(float(k))))
            .alias("lo"),
            (F.col("__lo") + (F.col("bucket") + 1)
             * ((F.col("__hi") - F.col("__lo")) / F.lit(float(k))))
            .alias("hi"),
            "n",
        )
    )


def equi_depth_histogram(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Equi-depth (equal-frequency) histogram: bucket boundaries are
    the exact interpolated i/k percentiles, assignment is "number of
    interior boundaries ≤ v" — one boundary ROW broadcast map-side, no
    global window/sort (the ``score_cut_buckets`` shape generalized to
    k cuts).  Duplicate boundaries (heavy skew) produce empty buckets
    rather than wrong counts; bucket spans (lo, hi) ride along from
    the same boundary array."""
    v = F.col(col).cast("double")
    pcts = F.array(*[F.lit(i / k) for i in range(k + 1)])
    cuts_row = df.agg(F.percentile(v, pcts).alias("__cuts"))
    cuts = F.col("__cuts")
    # interior cuts only: slice(2, k-1) drops min and max
    bucket = F.least(
        F.aggregate(
            F.slice(cuts, 2, k - 1),
            F.lit(0),
            lambda acc, c: acc + F.when(v >= c, 1).otherwise(0),
        ),
        F.lit(k - 1),
    )
    return (
        df.join(F.broadcast(cuts_row))
        .filter(v.isNotNull())
        .select(bucket.alias("bucket"), cuts.alias("__cuts"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.first("__cuts").alias("__cuts"))
        .select(
            "bucket",
            F.element_at("__cuts", F.col("bucket") + 1).alias("lo"),
            F.element_at("__cuts", F.col("bucket") + 2).alias("hi"),
            "n",
        )
    )
