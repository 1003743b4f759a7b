"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) covers sort-merge
join skew at runtime; these explicit forms cover the cases AQE can't:
a single hot GROUP BY key whose partial aggregation still funnels into
one reducer, and broadcast-infeasible joins against a skewed key.

Salts are derived deterministically (xxhash64 of the whole row, mod n)
— no RNG state, reproducible plans, stable tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: aggregates that re-combine losslessly across salt partitions
_COMBINE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) then groupBy(keys).

    ``aggs``: {column: 'sum'|'count'|'min'|'max'} → output column
    ``{fn}_{column}``.  A hot key's rows spread over ``n_salts``
    reducers in phase 1; phase 2 combines n_salts tiny rows per key.
    """
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).alias("__salt")
    partial_cols, final_cols = [], []
    for col, fn in aggs.items():
        phase1, phase2 = _COMBINE[fn]
        name = f"{fn}_{col}"
        partial_cols.append(phase1(col).alias(f"__p_{name}"))
        final_cols.append(phase2(f"__p_{name}").alias(name))
    return (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*partial_cols)
        .groupBy(*keys)
        .agg(*final_cols)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-tolerant equi-join: the big side gets a deterministic salt,
    the small side is replicated ``n_salts`` times, and the join runs
    on (keys + salt) so one hot key spreads over n_salts tasks.

    Use only when the small side is too big to broadcast but small
    enough to replicate; otherwise prefer broadcast (no shuffle at all).
    """
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts))
    )
    small_rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    out = big_salted.join(small_rep, [*on, "__salt"], how)
    return out.drop("__salt")
