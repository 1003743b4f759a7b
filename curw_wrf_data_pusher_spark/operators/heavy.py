"""Heavy hitters: exact threshold form + a bounded-memory
Misra-Gries sketch (mergeable-summaries form).

Why both at 100 TB: the exact form is one hash aggregation — right
whenever the DISTINCT key count fits a shuffle (token vocabularies
do).  When it doesn't (e.g. raw URLs, user ids, n-grams at web scale),
the sketch caps executor memory at k counters per task regardless of
cardinality and ships only P·k summary rows to the merge — the
classic frequent-items summary (Misra & Gries '82) with the merge
rule proved mergeable by Agarwal et al., PODS'12: sum matching
counters, then subtract the (k+1)-th largest value and drop ≤0.
Guarantee after any merge tree: every item with true frequency
> N/(k+1) survives, and estimates undercount by at most N/(k+1).

Plan shape: the sketch is ONE mapInPandas pass (Arrow-batched, k
counters of state) → a tiny groupBy over ≤ partitions·k rows → a
k-bounded TakeOrdered.  No global windows, no driver-side item loops.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_compress(counters: Counter, k: int) -> None:
    """In-place mergeable-summaries compression to ≤ k entries:
    subtract the (k+1)-th largest count from every counter, drop the
    non-positive ones."""
    if len(counters) <= k:
        return
    import numpy as np

    vals = np.fromiter(counters.values(), dtype="int64")
    # (k+1)-th largest = the largest value that must reach zero
    thr = np.partition(vals, len(vals) - (k + 1))[len(vals) - (k + 1)]
    for item in list(counters):
        c = counters[item] - thr
        if c > 0:
            counters[item] = c
        else:
            del counters[item]


def _mg_partition(k: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: Counter = Counter()
        for pdf in batches:
            # batch-exact counts merged into the summary, then
            # compressed — equivalent to item-at-a-time MG but
            # vectorized per Arrow batch
            counters.update(Counter(pdf["item"].dropna()))
            _mg_compress(counters, k)
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "cnt": list(counters.values())}
            )

    return fn


def heavy_hitters_mg(
    df: DataFrame, col: str, k: int = 64
) -> DataFrame:
    """Approximate heavy hitters: (item, est) for the top-k summary
    items.  ``est`` undercounts the true frequency by at most
    N/(k+1); any item with true frequency above N/(k+1) is present.
    Output membership beyond that guarantee depends on partitioning
    (inherent to the sketch) — use ``heavy_hitters_exact`` when the
    key cardinality affords an exact aggregation."""
    src = df.select(F.col(col).cast("string").alias("item"))
    summaries = src.mapInPandas(_mg_partition(k), "item string, cnt long")
    merged = summaries.groupBy("item").agg(F.sum("cnt").alias("est"))
    return merged.orderBy(F.desc("est"), "item").limit(k)


def heavy_hitters_exact(
    df: DataFrame, col: str, min_fraction: float
) -> DataFrame:
    """Exact items with frequency > ``min_fraction`` of the rows:
    (item, n_occurrences, freq_ratio).  One hash aggregation plus a
    broadcast one-row total — a single lazy plan, no driver count."""
    src = df.select(F.col(col).alias("item"))
    counts = src.groupBy("item").agg(F.count(F.lit(1)).alias("n_occurrences"))
    total = src.agg(F.count(F.lit(1)).alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(
            F.col("n_occurrences")
            > F.lit(min_fraction) * F.col("__total").cast("double")
        )
        .select(
            "item",
            "n_occurrences",
            (
                F.col("n_occurrences").cast("double")
                / F.col("__total").cast("double")
            ).alias("freq_ratio"),
        )
    )
