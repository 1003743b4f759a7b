"""Approximate query processing over DETERMINISTIC hash samples
(beyond the reference; the sketch family's companion for ad-hoc
aggregates).

``df.sample()`` is seed-dependent and re-draws per execution — useless
for reproducible estimates or cross-engine checks.  Hash sampling
fixes both: a row is in the p-sample iff the first 8 hex digits of
``md5(key)`` fall below ``p · 16^8``.  Properties that matter at
100 TB:

- **Deterministic & engine-portable**: the same rows sample in Spark,
  DuckDB, or anything with md5 — estimates are reproducible run to
  run and auditable row by row (the a26 oracle re-derives them).
- **Map-side only**: the filter pushes into the scan stage; a p=1 %
  estimate reads all rows but aggregates 1 % of them, cutting shuffle
  and agg state by 100×.  (With the sample key as a partition/bucket
  column, the scan itself prunes.)
- **Nested-sample monotonicity**: the q-sample ⊆ p-sample for q < p
  (same hash, lower cut), so refining an estimate reuses prior work.
- **Horvitz-Thompson unbiased**: E[sum(v in sample)/p] = sum(v); same
  for counts.  Relative error ~ 1/√(n·p) on well-behaved values.

The estimator divides an exact DECIMAL sum (order-free) by the
constant p at the very end — one double division on identical inputs,
so the a26 oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 16^8 — the hash space of the first 8 md5 hex digits.
_HASH_SPACE = 1 << 32


def sample_cut(fraction: float) -> int:
    """The integer cut c such that P[hash < c] = fraction."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1]: {fraction}")
    return int(fraction * _HASH_SPACE)


def hash_sample(
    df: DataFrame, key: Column | str, fraction: float
) -> DataFrame:
    """The deterministic p-fraction sample of ``df`` keyed on ``key``
    (any expression; distinct keys sample atomically, so sampling on
    an entity key keeps entities whole).  NULL keys are coalesced to
    a sentinel so they participate in the sample as one atomic group
    rather than being silently dropped (md5(NULL) is NULL, which
    would bias Horvitz-Thompson estimates low on nullable keys)."""
    k = F.col(key) if isinstance(key, str) else key
    k = F.coalesce(k.cast("string"), F.lit("\x00<null-key>"))
    h = F.conv(F.substring(F.md5(k.cast("string")), 1, 8), 16, 10)
    return df.filter(h.cast("long") < F.lit(sample_cut(fraction)))


def approx_sum_count(
    df: DataFrame,
    key: Column | str,
    value_col: str,
    fraction: float,
    group_cols: list[str] | None = None,
    sum_decimals: int = 2,
) -> DataFrame:
    """Horvitz-Thompson estimates of per-group sum and count from the
    deterministic ``fraction`` sample: (group…, n_sampled, est_count,
    est_sum).  The sum aggregates in DECIMAL (order-free exactness)
    and inflates by 1/p only at the end."""
    sampled = hash_sample(df, key, fraction)
    dec = f"decimal(38,{sum_decimals})"
    agg = sampled.groupBy(*(group_cols or [])).agg(
        F.count("*").alias("n_sampled"),
        F.sum(F.col(value_col).cast(dec)).alias("__s"),
    )
    p = F.lit(float(fraction))
    return agg.select(
        *(group_cols or []),
        "n_sampled",
        (F.col("n_sampled") / p).alias("est_count"),
        (F.col("__s").cast("double") / p).alias("est_sum"),
    )
