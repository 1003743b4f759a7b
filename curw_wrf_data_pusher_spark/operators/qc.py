"""Sensor quality-control flags for observation series (beyond the
reference's operator surface; the standard hydro-met QC pair its
gauge-ingestion side needs — WMO "Guide to the GDPFS" QC families:
persistence and step tests).

- :func:`flatline_flags` — persistence test: a sensor stuck at one
  value reports plausible-looking data that is physically dead air; a
  run of ``min_run``+ identical consecutive readings flags every row
  in the run.
- :func:`spike_flags` — step test: an absolute jump between
  consecutive readings above ``max_jump`` flags the arriving row.

Both are one-Exchange plans: every window partitions by the series
key and orders by the caller's (time, tiebreak) columns, so the flags
for a series compute inside one shuffle partition — the same shape as
the engine's other per-series window operators (w1/w5/w13/w14), and
the run-length trick is the two-pass lag→cumsum group id used by
sessionize (w4).

Work in exact integer units (counts, quantized levels, centi-units)
when the flags feed a cross-engine hash — float equality between
engines is exactly what the repo's float-discipline notes warn about;
the registered ``w18_obs_qc`` row quantizes first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _series_window(series_cols: Sequence[str], order_cols: Sequence[str]):
    return Window.partitionBy(*series_cols).orderBy(*order_cols)


def flatline_flags(
    df: DataFrame,
    series_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    min_run: int,
    flag_col: str = "flatline_flag",
    run_len_col: str | None = "run_len",
) -> DataFrame:
    """Flag every row inside a run of ``min_run`` or more CONSECUTIVE
    equal values per series (null-safe equality: consecutive NULLs
    count as a run too — a dead feed often reports NULLs).

    Plan: lag → null-safe change marker → running sum gives the run
    id → count over (series, run id) gives the run length — two
    Window passes and one aggregate-window over the SAME partition
    keys prefix, one Exchange total."""
    w = _series_window(series_cols, order_cols)
    chg = F.when(
        F.lag(value_col).over(w).eqNullSafe(F.col(value_col)), 0
    ).otherwise(1)
    run_id = F.sum(chg).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_run = df.withColumn("__run_id", run_id)
    run_len = F.count(F.lit(1)).over(
        Window.partitionBy(*series_cols, "__run_id")
    )
    out = with_run.withColumn(
        "__run_len", run_len.cast("long")
    ).withColumn(flag_col, F.col("__run_len") >= min_run)
    if run_len_col is not None:
        out = out.withColumn(run_len_col, F.col("__run_len"))
    return out.drop("__run_id", "__run_len")


def spike_flags(
    df: DataFrame,
    series_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    max_jump,
    flag_col: str = "spike_flag",
) -> DataFrame:
    """Flag rows whose absolute change from the previous reading
    exceeds ``max_jump`` (the arriving row is the suspect).  The first
    row of a series (no predecessor) and NULL neighbours are never
    flagged.  Pass an integer-unit column and threshold when the
    result feeds a cross-engine hash."""
    w = _series_window(series_cols, order_cols)
    jump = F.abs(F.col(value_col) - F.lag(value_col).over(w))
    return df.withColumn(
        flag_col, F.coalesce(jump > max_jump, F.lit(False))
    )


def qc_flags(
    df: DataFrame,
    series_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    min_run: int,
    max_jump,
    level_col: str | Column | None = None,
) -> DataFrame:
    """Both QC tests in one pass (shared series window / one
    Exchange): persistence on ``level_col`` (default: the value
    itself — pass a quantized level when raw values are too noisy to
    ever repeat) and the step test on ``value_col``."""
    staged = df
    lvl = "__qc_level"
    if level_col is None:
        staged = staged.withColumn(lvl, F.col(value_col))
    elif isinstance(level_col, str):
        staged = staged.withColumn(lvl, F.col(level_col))
    else:
        staged = staged.withColumn(lvl, level_col)
    out = flatline_flags(
        staged, series_cols, order_cols, lvl, min_run
    )
    out = spike_flags(out, series_cols, order_cols, value_col, max_jump)
    return out.drop(lvl)
