"""Time-series regularization: dense-grid gap filling with forward-fill
or linear interpolation.

Reference parity: the reference pushes gauge observations on a fixed
15-minute cadence and forecasts on an hourly one
(``gen_active_stations_rfields.py`` resamples obs to the model grid);
real gauge feeds DROP timesteps, and the reference simply emits holes.
A usable engine fills them: this operator densifies each key's series
onto the exact step grid between its first and last observation and
fills the holes — pandas' ``resample().interpolate()``, re-expressed
as distributed DataFrame ops.

Scale (per-key series over a 100 TB event log):
- the grid is GENERATED map-side via ``sequence``+``explode`` — never
  materialized on the driver, never a cross join against a calendar
  table;
- ONE shuffle total (the per-key ``lead`` window over the OBSERVED
  series); the dense grid is emitted per consecutive-observation span
  with both bracketing neighbors already attached, so the window cost
  scales with observations, not with the densified grid — no global
  windows, no joins, no driver loops;
- each gap finds its bracketing observations from its span row
  regardless of gap length (no iterative self-joins).

Both fill methods are closed-form over the bracketing neighbors, so
the whole operator is oracle-expressible; ``w6_gap_fill`` hash-pins
grid membership, gap flags and interpolated values against DuckDB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    series: DataFrame,
    key_cols: Sequence[str],
    slot_col: str = "slot",
    value_col: str = "value",
    step: int = 1,
    method: str = "linear",
) -> DataFrame:
    """Densify (key, integer slot, value) series onto every ``step``
    between each key's min and max slot, filling missing slots.

    ``slot_col`` is an integer time index (e.g. epoch // 3600 for an
    hourly grid) — callers bucket raw timestamps first (see
    ``s10_window_resample`` for the tumbling-window form).  Input must
    have at most one row per (key, slot); values are assumed non-null
    (a null observed value would be treated as a gap by the neighbor
    scan but keeps its grid row's observed flag).

    ``method``: ``'linear'`` interpolates between the bracketing
    observations; ``'ffill'`` repeats the previous one; ``'none'``
    leaves gaps null (pure densify).  Boundary slots are observed by
    construction (the grid spans min..max of OBSERVED slots), so
    linear/ffill never see a one-sided gap.

    SPAN FORM (optimization round 14; results identical for the
    contract's non-null values): every gap slot's bracketing
    neighbors are, by construction, a CONSECUTIVE observed pair — so
    one ``lead`` window over the OBSERVED series attaches each
    observation's successor, and the dense grid is generated map-side
    per span ``[t0, t1)`` with both neighbors already in the row.
    The previous form densified FIRST and scanned for neighbors with
    two ignore-nulls windows over the exploded grid: at sf0.1 that
    double window over 1.05 M grid rows was 48 executor-CPU-s of the
    query's 61 — 11× the observed rows (and unboundedly more for
    sparse series at 100 TB).  This form windows 95 k observed rows
    and deletes the grid⟕series join outright; the interpolation
    expression tree is unchanged, so fills agree bit-for-bit.

    Output: (*key_cols, slot_col, value_filled, is_gap)."""
    if method not in ("linear", "ffill", "none"):
        raise ValueError(f"unknown fill method: {method!r}")
    keys = [F.col(k) for k in key_cols]
    try:
        n_shuffle = int(
            series.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except (TypeError, ValueError):
        # some platforms set a non-numeric value (e.g. "auto");
        # fall back to the cluster's default parallelism for the pin
        n_shuffle = series.sparkSession.sparkContext.defaultParallelism
    # Pin the window exchange to the CONFIGURED shuffle partitions:
    # the stage reading it explodes each span into its grid slots
    # (the classic explode-inflation AQE blind spot — coalescing is
    # blind to the post-explode row count), and the pin is the same
    # ceiling the plan starts from; the window's hash(keys)
    # requirement is satisfied by this exchange, so no extra shuffle.
    w = Window.partitionBy(*keys).orderBy(slot_col)
    spans = series.repartition(n_shuffle, *key_cols).select(
        *keys,
        F.col(slot_col).alias("__t0"),
        F.col(value_col).alias("__x0"),
        F.lead(slot_col).over(w).alias("__t1"),
        F.lead(value_col).over(w).alias("__x1"),
    )
    # span [t0, t1) slot grid, map-side; the key's last observation
    # (lead NULL) contributes exactly its own slot
    g = spans.select(
        *keys,
        "__t0", "__x0", "__t1", "__x1",
        F.explode(
            F.sequence(
                F.col("__t0"),
                F.coalesce(F.col("__t1") - step, F.col("__t0")),
                F.lit(step),
            )
        ).alias(slot_col),
    )
    observed = F.col(slot_col) == F.col("__t0")
    if method == "linear":
        # same expression tree as the windowed form (a + (b-a) * (dt/dT)
        # with both differences cast to double) — bit-identical fills
        fill = F.col("__x0") + (F.col("__x1") - F.col("__x0")) * (
            (F.col(slot_col) - F.col("__t0")).cast("double")
            / (F.col("__t1") - F.col("__t0")).cast("double")
        )
    elif method == "ffill":
        fill = F.col("__x0")
    else:
        fill = F.lit(None).cast("double")
    return g.select(
        *keys,
        F.col(slot_col),
        F.when(observed, F.col("__x0")).otherwise(fill).alias(
            "value_filled"
        ),
        (~observed).alias("is_gap"),
    )


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: float = 3.5,
    scale: float = 1.4826,
) -> DataFrame:
    """Robust per-group outlier detection via the median absolute
    deviation: flag rows where |x − median| > k · (scale · MAD).

    Median/MAD instead of mean/stddev because the classic z-score is
    circular on dirty data — the outliers it should find inflate the
    very stddev it thresholds on (masking).  The median and MAD have a
    50% breakdown point; ``scale`` = 1.4826 makes MAD a consistent
    σ estimator under normality (Hampel '74 / Iglewicz–Hoaglin '93,
    who also give the default cutoff k = 3.5).

    Plan shape / 100 TB: two grouped EXACT-percentile aggregations
    (median of x, then median of |x − med|) + two equi-joins of the
    per-group stat rows back onto the facts.  The stat frames are one
    row per GROUP — unbounded in general — so they carry NO broadcast
    hint: AQE broadcasts them when measured-small and shuffles on the
    group key otherwise.  The fact table is scanned twice but never
    shuffled on anything wider than the group key, and there are no
    global windows.  For a one-scan
    approximate variant at extreme scale, substitute
    ``percentile_approx`` in the same shape.

    Returns the input columns plus (group_median, group_mad, robust_z,
    is_outlier); robust_z is NULL when MAD = 0 (constant group — every
    deviation is then flagged iff it is nonzero)."""
    gcols = [F.col(c) for c in group_cols]
    med = df.groupBy(*gcols).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("group_median")
    )
    with_med = df.join(med, on=list(group_cols))
    dev = F.abs(F.col(value_col) - F.col("group_median"))
    mad = (
        with_med.select(*gcols, dev.alias("__dev"))
        .groupBy(*gcols)
        .agg(F.percentile(F.col("__dev"), F.lit(0.5)).alias("group_mad"))
    )
    out = with_med.join(mad, on=list(group_cols))
    sigma = F.lit(scale) * F.col("group_mad")
    robust_z = F.when(sigma > 0, dev / sigma)
    return out.select(
        "*",
        robust_z.alias("robust_z"),
        F.when(sigma > 0, dev > F.lit(k) * sigma)
        .otherwise(dev > 0)
        .alias("is_outlier"),
    )


def robust_scale(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    scale: float = 1.4826,
) -> DataFrame:
    """Per-group feature scaling for model inputs, built ONLY on exact
    order statistics (percentiles, median, MAD, min, max) — no means
    or stddevs, so results are independent of partitioning/sum order
    and bit-reproducible across engines.  Adds three columns:

    - ``v_winsor``: value clipped to the group's [lower, upper]
      interpolated percentiles (outlier-robust clipping);
    - ``v_minmax``: (v − min)/(max − min), NULL for constant groups;
    - ``v_robust_z``: (v − median)/(scale·MAD) — the signed
      Iglewicz–Hoaglin modified z-score, NULL when MAD = 0.

    Plan: one grouped aggregation collects (percentile array, min,
    max), a second collects the MAD (median needs to exist first);
    both stat frames are group-cardinality rows — unbounded in
    general, so un-hinted: AQE broadcasts them when measured-small,
    else the join shuffles on the group key."""
    gcols = [F.col(c) for c in group_cols]
    v = F.col(value_col)
    stats = df.groupBy(*gcols).agg(
        F.percentile(v, F.array(F.lit(lower), F.lit(0.5), F.lit(upper))).alias(
            "__q"
        ),
        F.min(v).alias("__mn"),
        F.max(v).alias("__mx"),
    )
    with_stats = df.join(stats, on=list(group_cols))
    med = F.col("__q")[1]
    mad = (
        with_stats.select(*gcols, F.abs(v - med).alias("__dev"))
        .groupBy(*gcols)
        .agg(F.percentile(F.col("__dev"), F.lit(0.5)).alias("__mad"))
    )
    out = with_stats.join(mad, on=list(group_cols))
    span = F.col("__mx") - F.col("__mn")
    sigma = F.lit(scale) * F.col("__mad")
    return out.select(
        *df.columns,
        F.least(F.greatest(v, F.col("__q")[0]), F.col("__q")[2]).alias(
            "v_winsor"
        ),
        F.when(span > 0, (v - F.col("__mn")) / span).alias("v_minmax"),
        F.when(sigma > 0, (v - med) / sigma).alias("v_robust_z"),
    )


def interval_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Sweep-line concurrency: for a table of [start, end) intervals,
    the step function (t, n_active) of how many are open at each
    boundary timestamp — concurrent sessions, device uptime overlap,
    or any occupancy profile.

    The naive form is ONE global window over every ±1 delta — all
    rows to a single partition.  This implementation is the scalable
    three-phase prefix sum:

    1. deltas (+1 at start, −1 at end-exclusive) combine per distinct
       timestamp, then a running sum WITHIN each ``bucket``
       (date_trunc hour/day) — windows partitioned by bucket;
    2. per-bucket totals cumulate over the bucket timeline — a global
       window over BUCKET-cardinality rows only (hours in the data's
       span: bounded, the allowlisted class);
    3. each in-bucket running value adds its bucket's carry-in offset
       — a map-side join against the bounded offset frame.

    Equal start/end timestamps cancel before the scan (zero-length
    intervals are never counted), and the counts are integer sums —
    exact in any order."""
    s = df.select(F.col(start_col).alias("t"), F.lit(1).alias("d"))
    e = df.filter(F.col(end_col).isNotNull()).select(
        F.col(end_col).alias("t"), F.lit(-1).alias("d")
    )
    per_t = (
        s.unionByName(e)
        .groupBy("t")
        .agg(F.sum("d").alias("d"))
        .withColumn("__b", F.date_trunc(bucket, F.col("t")))
    )
    w_local = Window.partitionBy("__b").orderBy("t")
    local = per_t.withColumn("__run", F.sum("d").over(w_local))
    # bounded: one row per bucket (hours/days spanned by the data)
    w_glob = Window.orderBy("__b")
    offsets = (
        per_t.groupBy("__b")
        .agg(F.sum("d").alias("__bt"))
        .withColumn(
            "__off", F.sum("__bt").over(w_glob) - F.col("__bt")
        )
        .select("__b", "__off")
    )
    return (
        local.join(offsets, "__b")
        .select(
            "t",
            (F.col("__run") + F.col("__off")).cast("long").alias("n_active"),
        )
    )
