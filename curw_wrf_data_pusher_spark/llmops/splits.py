"""Leakage-safe train/validation/test splitting.

Beyond-reference surface: a training-data pipeline must partition the
corpus so that near-identical documents (same site, same crawl page,
same dedup cluster) never straddle the train/eval boundary — doc-level
random splits leak.  The standard fix is GROUP-level assignment: hash
a group key (domain, url prefix, dedup-cluster id) and route the whole
group by the hash.

Design for 100 TB:
- assignment is ONE map-side expression — md5 of the group key against
  precomputed hex thresholds; no shuffle, no driver state, and the
  split is stable under repartitioning, appends, and re-runs (the same
  group always lands in the same split, so incremental batches agree
  with history);
- md5 (not xxhash64) so the assignment is ENGINE-PORTABLE: any system
  with md5 reproduces the exact split — the DuckDB oracle re-derives
  it bit-for-bit, and a downstream consumer can verify membership
  without Spark;
- fraction → threshold quantization error is ≤ 2⁻³² of the key space
  (thresholds compare the first 8 md5 hex chars lexicographically ≡
  numerically — md5 output is uniform), far below sampling noise at
  any corpus size.
"""

from __future__ import annotations

from collections.abc import Mapping
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_thresholds(fractions: Mapping[str, float]) -> list[tuple[str, str]]:
    """Cumulative 8-hex-char upper bounds for each split, in the
    mapping's order; the last split absorbs rounding remainder."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    out: list[tuple[str, str]] = []
    cum = 0.0
    for name, frac in fractions.items():
        cum += frac
        out.append((name, format(min(int(cum * 16**8), 16**8 - 1), "08x")))
    return out


def split_bucket(group: Column, salt: str) -> Column:
    """The 8-hex-char assignment bucket for a group key — lowercase
    md5 prefix, identical in any md5-bearing engine."""
    return F.substring(
        F.md5(F.concat_ws("|", group.cast("string"), F.lit(salt))), 1, 8
    )


def grouped_split(
    df: DataFrame,
    group_col: str | Column,
    fractions: Mapping[str, float] | None = None,
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """``df`` plus ``out_col``: the split every row's GROUP belongs to.

    All rows sharing a group key get the same label by construction —
    the no-leakage property is structural, not sampled.  Change
    ``salt`` to draw an independent re-split."""
    if fractions is None:
        fractions = {"train": 0.8, "valid": 0.1, "test": 0.1}
    group = F.col(group_col) if isinstance(group_col, str) else group_col
    bucket = split_bucket(group, salt)
    names = list(fractions)
    # CASE bucket < th1 THEN s1 WHEN bucket < th2 THEN s2 ... ELSE last
    case = reduce(
        lambda acc, nt: acc.when(bucket < F.lit(nt[1]), F.lit(nt[0])),
        split_thresholds(fractions)[:-1],
        F.when(F.lit(False), F.lit(None).cast("string")),
    ).otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, case)


def split_leakage_report(
    assigned: DataFrame, group_col: str, split_col: str = "split"
) -> DataFrame:
    """(n_groups, n_leaky_groups): groups appearing under more than one
    split label.  Structurally zero for ``grouped_split`` output — this
    is the audit a pipeline runs over EXTERNALLY-provided splits."""
    per_group = assigned.groupBy(group_col).agg(
        F.countDistinct(split_col).alias("n_splits")
    )
    return per_group.agg(
        F.count("*").alias("n_groups"),
        F.sum((F.col("n_splits") > 1).cast("long")).alias("n_leaky_groups"),
    )
