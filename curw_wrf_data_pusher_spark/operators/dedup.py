"""Latest-run dedup — "newest forecast-generation-time per series"
(SURVEY §2.4 A6 / §2.5 W2).

Reference: ``get_latest_timeseries(sim_tag, station, source, variable,
unit)`` returns the single series at its max fgt
(gen_active_stations_rfields.py:191-193).

Two physical strategies, both exposed (the engine's bench picks the
window form by default):

- ``latest_per_series``      : row_number() over (series ORDER BY
  version DESC) == 1 — one shuffle, one sort, no join.  Preferred when
  the full row set is needed anyway.
- ``latest_per_series_join`` : semi-join against groupBy(series).
  agg(max(version)) — two scans but map-side partial aggregation makes
  the agg tiny; preferred when the dedup key set is small relative to
  the fact table (broadcast the agg side).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_series(
    df: DataFrame,
    series_cols: Sequence[str],
    version_cols: Sequence[str],
) -> DataFrame:
    """Keep only the newest row per series; deterministic tie-break via
    the full version_cols list (callers append a unique id last)."""
    w = Window.partitionBy(*series_cols).orderBy(
        *[F.col(c).desc() for c in version_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_per_series_join(
    df: DataFrame,
    series_cols: Sequence[str],
    version_col: str,
) -> DataFrame:
    """max-version semi-join variant of :func:`latest_per_series`.

    No broadcast hint: the aggregated side has one row per SERIES —
    dim-like (~hundreds of stations) in the WRF domain but unbounded
    in general, so the join strategy is left to AQE, which broadcasts
    exactly when the measured aggregate is small and falls back to a
    shuffled semi-join when it isn't.  The window form at
    :func:`latest_per_series` (one shuffle, no join) is the primary
    implementation."""
    latest = df.groupBy(*series_cols).agg(
        F.max(version_col).alias(version_col)
    )
    return df.join(
        latest, on=[*series_cols, version_col], how="left_semi"
    )
