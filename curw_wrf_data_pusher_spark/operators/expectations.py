"""Data-quality expectations: declarative row-level rules evaluated in
ONE scan, plus key-uniqueness checks and a raising pipeline gate.

An ingestion pipeline validates before it commits (the reference
fail-fasts on config — `wrf_data_pusher.py:345-369` — but trusts its
data; a 100 TB lake cannot).  Rules are plain boolean Columns, so the
whole rule set compiles into a single aggregate pass over one scan —
k rules cost one job, not k.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_expectations(
    df: DataFrame, rules: Sequence[tuple[str, Column]]
) -> DataFrame:
    """Evaluate row-level rules; one output row per rule:
    (rule, n_rows, n_violations, violation_frac, passed).  A NULL rule
    result counts as a violation (unknown is not acceptable).

    Scale: every rule folds into one aggregate over one scan — the
    single-row result is then unpivoted map-side with ``stack``."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_name, cond) in enumerate(rules):
        aggs.append(
            F.sum(
                F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
            ).cast("long").alias(f"__v_{i}")
        )
    one = df.agg(*aggs)
    stack_args = []
    for i, (name, _cond) in enumerate(rules):
        stack_args += [f"'{name}'", f"__v_{i}"]
    return (
        one.select(
            F.col("__n"),
            F.expr(
                f"stack({len(rules)}, {', '.join(stack_args)})"
                " as (rule, n_violations)"
            ),
        )
        .select(
            F.col("rule"),
            F.col("__n").alias("n_rows"),
            F.col("n_violations"),
            (F.col("n_violations") / F.col("__n")).alias("violation_frac"),
            (F.col("n_violations") == 0).alias("passed"),
        )
    )


def unique_key_violations(
    df: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Key groups holding more than one row: (*key_cols, n_rows).
    Not expressible as a row-level rule — needs its own hash-groupBy
    (one shuffle on the key; map-side partial counts)."""
    return (
        df.groupBy(*[F.col(c) for c in key_cols])
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def expect(
    df: DataFrame,
    rules: Sequence[tuple[str, Column]] = (),
    unique_key: Sequence[str] | None = None,
    max_violation_frac: float = 0.0,
) -> DataFrame:
    """The pipeline gate: raise ``ValueError`` naming every failed
    expectation when any rule's violation fraction exceeds
    ``max_violation_frac`` (or the key is not unique); otherwise
    return ``df`` unchanged for further composition.  This collects
    only the per-rule report (k rows), never data rows."""
    failures: list[str] = []
    if rules:
        for r in check_expectations(df, rules).collect():
            if r.n_rows > 0 and r.violation_frac > max_violation_frac:
                failures.append(
                    f"{r.rule}: {r.n_violations}/{r.n_rows} rows"
                )
    if unique_key is not None:
        dups = unique_key_violations(df, unique_key)
        n_dup_groups = dups.limit(1_000).count()
        if n_dup_groups > 0:
            failures.append(
                f"unique_key{tuple(unique_key)}: "
                f"{'>=1000' if n_dup_groups >= 1000 else n_dup_groups}"
                " duplicated key group(s)"
            )
    if failures:
        raise ValueError(
            "expectations failed: " + "; ".join(failures)
        )
    return df
