"""Hybrid rfield assembly — the E3 pipeline's core relational shape
(SURVEY §2.3 J1/J2, §2.7 U1/U2, §2.8 R2).

Reference (gen_active_stations_rfields.py:161-251): per obs station,
outer-merge each WRF system's latest forecast series on time, left-merge
the observed series, drop rows with any null, stack stations, sort.

Spark form: **no per-station loop** — all stations and sources live in
one long DataFrame ``(station, source, time, value)``; the iterated
outer merge becomes a single pivot; dropna-after-outer-join is kept
*literally* (drop any-null rows after the pivot) because its semantics
("instants covered by every source") must survive upstream mean
variants (SURVEY §7 hard parts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pivot import pivot_by_source


def hybrid_wide_frame(
    long_df: DataFrame,
    sources: Sequence[str],
    station_cols: Sequence[str] = ("station_id", "longitude", "latitude"),
    time_col: str = "time",
    source_col: str = "source",
    value_col: str = "value",
    dropna: bool = True,
    mean: bool = False,
) -> DataFrame:
    """Long (station, source, time, value) → wide time×sources frame.

    ``mean=True`` (the *_mean_* variants,
    gen_active_stations_mean_rfields.py:196-216): values are first
    averaged per (station, time, source) — pooling e.g. all mapped d03
    grid points of an obs station; NaN-skipping pandas mean ≡ Spark avg
    ignoring nulls — and only then pivoted + dropna'd, preserving the
    reference's mean-before-dropna ordering.
    """
    df = long_df
    if mean:
        df = df.groupBy(*station_cols, time_col, source_col).agg(
            F.avg(value_col).alias(value_col)
        )
    wide = pivot_by_source(
        df,
        key_cols=[*station_cols, time_col],
        pivot_col=source_col,
        pivot_values=sources,
        value_col=value_col,
        agg="first",
    )
    if dropna:
        wide = wide.na.drop("any", subset=list(sources))
    return wide
