"""Adjacent difference over time — the reference's defining transform
(SURVEY §2.4 A1 / §2.5 W1).

Reference: ``diff = prcp[1:] - prcp[:-1]`` per grid cell, converting a
cumulative rainfall series to per-interval rainfall; the first timestep
is consumed (wrf_data_pusher.py:63-65,198; gen_rfields.py:76-78,159).

Spark form: ``value - lag(value) OVER (PARTITION BY series ORDER BY
time)`` then drop the first row of each series.  The window shuffles
once on the series key — at 100 TB the series key (grid cell / tms_id)
is high-cardinality and uniformly distributed (grid cells), so the
shuffle is balanced; no skew handling needed.  If upstream data is
already partitioned by series (the NetCDF reader emits whole cells per
file), AQE keeps this a local sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def adjacent_diff(
    df: DataFrame,
    series_cols: Sequence[str],
    order_col: str | Column,
    value_col: str = "value",
    out_col: str = "diff",
    keep_first: bool = False,
) -> DataFrame:
    """Per-series adjacent difference.

    keep_first=False drops the first instant of each series (its diff is
    undefined), matching the reference's ``prcp[1:] - prcp[:-1]``.
    """
    w = Window.partitionBy(*series_cols).orderBy(order_col)
    lagged = F.lag(F.col(value_col)).over(w)
    out = df.withColumn(out_col, F.col(value_col) - lagged)
    if not keep_first:
        out = out.filter(F.col(out_col).isNotNull())
    return out
