"""Reshape operators — grid unpivot and source pivot
(SURVEY §2.8 R1/R2).

R1 (wide→long): the reference unpivots the (time × y × x) grid with
nested Python loops (wrf_data_pusher.py:211-268).  Spark form: the
NetCDF reader already emits long rows; for array-valued columns the
generic ``unpivot`` here uses ``stack`` (melt) — pure Catalyst, no UDF.

R2 (long→wide): the reference builds columns WRF_A..WRF_SE,obs via
iterated pandas outer merges (gen_active_stations_rfields.py:195-213).
Spark form: ``groupBy(keys).pivot(source, values).agg(first(value))`` —
one shuffle; passing the explicit pivot-value list avoids the extra
distinct-collect job and keeps the plan static for AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "measure",
    value_name: str = "value",
) -> DataFrame:
    """Melt value_cols into (var_name, value_name) long rows via stack —
    stays inside whole-stage codegen, zero shuffle."""
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    stack_expr = f"stack({len(value_cols)}, {pairs}) as (`{var_name}`, `{value_name}`)"
    return df.select(*[F.col(c) for c in id_cols], F.expr(stack_expr))


def pivot_by_source(
    df: DataFrame,
    key_cols: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    value_col: str = "value",
    agg: str = "first",
) -> DataFrame:
    """Long → wide by source.  ``agg='first'`` matches the reference's
    merge (one value per (key, source)); ``'avg'``/``'sum'`` give the
    ensemble-mean variants."""
    agg_fn = {"first": F.first, "avg": F.avg, "sum": F.sum, "max": F.max}[agg]
    return (
        df.groupBy(*key_cols)
        .pivot(pivot_col, list(pivot_values))
        .agg(agg_fn(value_col))
    )
