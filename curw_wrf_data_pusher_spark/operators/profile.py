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
    if exact_distinct:
        # the exact twin runs as TWO single-row aggregates crossed
        # back together: multi-column count(DISTINCT) plans an Expand,
        # and min/max over STRING columns use variable-width buffers
        # that knock the aggregate off HashAggregate onto the
        # interpreted SortAggregate — one combined agg pushes
        # (rows × (k+1)) expanded rows through the slow path (measured
        # 9.6 s vs 1.5 s split at sf0.1).  The production approx path
        # below keeps the ONE-scan contract (no Expand; at 100 TB the
        # scan I/O dominates, so a second pass costs more than the
        # SortAggregate CPU tax it would save).
        dist_aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.countDistinct(F.col(c)).alias(f"__nd_{i}")
            for i, c in enumerate(cols)
        ]
        base_aggs = []
        for i, c in enumerate(cols):
            base_aggs += [
                F.count(F.col(c)).alias(f"__nn_{i}"),
                F.min(F.col(c)).cast("string").alias(f"__mn_{i}"),
                F.max(F.col(c)).cast("string").alias(f"__mx_{i}"),
            ]
        one = df.agg(*dist_aggs).crossJoin(
            F.broadcast(df.agg(*base_aggs))
        )
    else:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, c in enumerate(cols):
            aggs += [
                F.count(F.col(c)).alias(f"__nn_{i}"),
                F.approx_count_distinct(c).alias(f"__nd_{i}"),
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


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    k: int = 10,
    scale: int = 9,
) -> DataFrame:
    """Distribution drift of one numeric column between a REFERENCE
    sample and a CURRENT sample — the data-quality monitor that walks
    a lake's daily partitions and alarms when an upstream feed shifts.

    Buckets are the reference's exact equi-depth cuts (so the
    reference occupies ~1/k per bucket by construction); two drift
    statistics come out per run:

    - ``chi2``: Pearson's Σ (observed − expected)² / expected of the
      current counts against reference proportions;
    - ``tvd``: total-variation distance, ½ Σ |cur_frac − ref_frac|.

    Both avoid PSI's logarithm on purpose: log is the one primitive
    whose last-bit behavior is NOT guaranteed identical across
    engines, while +/−/×/÷ on identical operands are.  Per-bucket
    terms are doubles derived from exact integer counts with a fixed
    association; the scalar summaries quantize each term to integer
    nano-units and SUM the integers — exact in any aggregation order,
    so the result is partitioning- and engine-independent.

    Returns k ``part='bucket'`` rows (bucket, ref_n, cur_n, chi_term,
    tvd_term) plus one ``part='summary'`` row where ref_n/cur_n carry
    the totals and chi_term/tvd_term carry chi² and TVD.

    Plan: one percentile aggregation on ref (single boundary row,
    broadcast), one map-side bucket assignment + count per side, a
    k-row join — the fact tables stream once each."""
    v = F.col(col).cast("double")
    pcts = F.array(*[F.lit(i / k) for i in range(k + 1)])
    cuts_row = ref.agg(F.percentile(v, pcts).alias("__cuts"))
    bucket = F.least(
        F.aggregate(
            F.slice(F.col("__cuts"), 2, k - 1),
            F.lit(0),
            lambda acc, c: acc + F.when(v >= c, 1).otherwise(0),
        ),
        F.lit(k - 1),
    ).alias("bucket")

    def counts(df, name):
        return (
            df.join(F.broadcast(cuts_row))
            .filter(v.isNotNull())
            .select(bucket)
            .groupBy("bucket")
            .agg(F.count("*").alias(name))
        )

    rc = counts(ref, "ref_n")
    cc = counts(cur, "cur_n")
    buckets = rc.join(cc, "bucket", "full").select(
        "bucket",
        F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
        F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
    )
    totals = buckets.agg(
        F.sum("ref_n").alias("__rt"), F.sum("cur_n").alias("__ct")
    )
    # a side with zero non-null values (the exact bad feed the
    # quality gate quarantines) must degrade to NULL terms, not die
    # with ANSI DIVIDE_BY_ZERO inside foreachBatch — callers treat a
    # NULL tvd as "drifted/unmeasurable" (see streaming/quality_monitor)
    rt = F.when(F.col("__rt") > 0, F.col("__rt").cast("double"))
    ct = F.when(F.col("__ct") > 0, F.col("__ct").cast("double"))
    expected = F.col("ref_n").cast("double") * ct / rt
    diff = F.col("cur_n").cast("double") - expected
    chi_term = F.when(F.col("ref_n") > 0, diff * diff / expected)
    tvd_term = F.abs(
        F.col("cur_n").cast("double") / ct
        - F.col("ref_n").cast("double") / rt
    )
    per_bucket = buckets.crossJoin(F.broadcast(totals)).select(
        F.lit("bucket").alias("part"),
        F.col("bucket").cast("long").alias("bucket"),
        "ref_n",
        "cur_n",
        chi_term.alias("chi_term"),
        tvd_term.alias("tvd_term"),
    )
    # the summary re-aggregates the k bucket rows; without a
    # materialization boundary the union's two branches would each
    # re-run the whole subtree (both fact scans + the percentile row)
    # — lazily checkpoint the k-row frame so everything upstream
    # executes exactly once
    per_bucket = per_bucket.localCheckpoint(eager=False)
    q = 10 ** scale
    summary = per_bucket.agg(
        F.sum("ref_n").alias("ref_n"),
        F.sum("cur_n").alias("cur_n"),
        (
            # measurability gate: tvd_term is NULL on every bucket row
            # exactly when a side's total is zero (unmeasurable run) —
            # sum over all-NULL then yields NULL, so chi2 is NULL
            # alongside tvd instead of a misleading "no drift" 0.0.
            # On measurable runs tvd_term is non-null everywhere and
            # the per-bucket ref_n==0 → coalesce-to-0 behavior is
            # unchanged.
            F.sum(
                F.when(
                    F.col("tvd_term").isNotNull(),
                    F.floor(
                        F.coalesce("chi_term", F.lit(0.0)) * q + F.lit(0.5)
                    ).cast("long"),
                )
            )
            / F.lit(float(q))
        ).alias("chi_term"),
        (
            F.sum(F.floor(F.col("tvd_term") * q + F.lit(0.5)).cast("long"))
            / F.lit(2.0 * q)
        ).alias("tvd_term"),
    ).select(
        F.lit("summary").alias("part"),
        F.lit(None).cast("long").alias("bucket"),
        "ref_n", "cur_n", "chi_term", "tvd_term",
    )
    return per_bucket.unionByName(summary)
