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
- the grid is GENERATED map-side from each key's (min, max) aggregate
  row via ``sequence``+``explode`` — never materialized on the driver,
  never a cross join against a calendar table;
- one aggregation shuffle (per-key min/max), one equi-join shuffle
  (grid ⟕ observed), one window shuffle (per-key neighbor scan); all
  keyed on the series key — no global windows, no driver loops;
- neighbor lookup is the last/first IGNORE NULLS window pair, so each
  gap finds its bracketing observations in one pass regardless of gap
  length (no iterative self-joins).

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

    Output: (*key_cols, slot_col, value_filled, is_gap)."""
    if method not in ("linear", "ffill", "none"):
        raise ValueError(f"unknown fill method: {method!r}")
    keys = [F.col(k) for k in key_cols]
    span = series.groupBy(*keys).agg(
        F.min(slot_col).alias("__mn"), F.max(slot_col).alias("__mx")
    )
    grid = span.select(
        *keys,
        F.explode(
            F.sequence(F.col("__mn"), F.col("__mx"), F.lit(step))
        ).alias(slot_col),
    )
    j = grid.join(
        series.select(*keys, F.col(slot_col), F.col(value_col)),
        [*key_cols, slot_col],
        "left",
    )
    w = Window.partitionBy(*keys).orderBy(slot_col)
    obs = F.when(
        F.col(value_col).isNotNull(),
        F.struct(
            F.col(slot_col).alias("t"), F.col(value_col).alias("x")
        ),
    )
    prev = F.last(obs, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = F.first(obs, ignorenulls=True).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if method == "linear":
        fill = prev["x"] + (nxt["x"] - prev["x"]) * (
            (F.col(slot_col) - prev["t"]).cast("double")
            / (nxt["t"] - prev["t"]).cast("double")
        )
    elif method == "ffill":
        fill = prev["x"]
    else:
        fill = F.lit(None).cast("double")
    return j.select(
        *keys,
        F.col(slot_col),
        F.when(F.col(value_col).isNotNull(), F.col(value_col))
        .otherwise(fill)
        .alias("value_filled"),
        F.col(value_col).isNull().alias("is_gap"),
    )
