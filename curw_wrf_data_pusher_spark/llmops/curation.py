"""Dataset-curation operators a training-data pipeline runs before a
corpus ships: benchmark-contamination detection and sequence packing.

Both are pure Catalyst (window functions + joins — no UDF in any hot
path) and partition-safe at 100 TB:

- contamination joins on the shingle (one shuffle per side, map-side
  distinct partials); the held-out side is tiny relative to the corpus
  so its shingle set broadcasts when small enough — Spark's AQE decides.
- packing never uses a global window: the token stream is partitioned
  by a group column (source, shard, ...), each group packed
  independently — exactly how multi-worker tokenization shards a
  corpus in practice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shingle_contamination(
    docs: DataFrame,
    is_test: Column,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination report: for every held-out (test)
    document, the share of its word n-gram shingles that appear in ANY
    training document — the n-gram-overlap decontamination check
    (GPT-3/PaLM style, n=13 there; n is a parameter).

    Returns (doc_id, n_shingles, n_contaminated, contamination) for
    test docs with ≥1 shingle.  Plan: shingle once with the test flag
    carried map-side onto every shingle row (NOT joined back on id —
    that would shuffle the whole shingle table a second time), split by
    the flag, distinct train shingles, one equi-join on the shingle —
    the corpus-side heavy lifting is distinct partial aggregation
    (map-side combine), and nothing ever collects."""
    from .dedup import shingles

    sh = shingles(
        docs.withColumn("__is_test", is_test),
        n=n, id_col=id_col, text_col=text_col, carry=("__is_test",),
    )
    test_sh = sh.filter(F.col("__is_test")).select(id_col, "shingle")
    train_sh = (
        sh.filter(~F.col("__is_test")).select("shingle").distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        test_sh.join(train_sh, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("__hit").alias("n_contaminated"),
            F.round(
                F.count("__hit") / F.count("*"), 6
            ).alias("contamination"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing: within each group, documents
    (ordered by id) form one token stream chunked into fixed
    ``capacity``-token training examples; each document maps to the
    bin range it lands in.

    Returns (doc_id, grp, n_tokens, start_offset, bin_start,
    bin_end) where bin ids are per-group chunk indexes and a document
    spanning a chunk boundary has bin_end > bin_start (it is split
    across examples — the standard pretraining concat-and-chunk
    layout).  The window partitions by the group column: no global
    sort, each group packs independently and in parallel."""
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), " "))
    toks = docs.select(
        F.col(id_col),
        F.col(group_col).alias("grp"),
        n_tokens.cast("long").alias("n_tokens"),
    ).withColumn("cum_tokens", F.sum("n_tokens").over(
        Window.partitionBy("grp").orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ))
    return toks.select(
        id_col,
        "grp",
        "n_tokens",
        (F.col("cum_tokens") - F.col("n_tokens")).alias("start_offset"),
        F.floor(
            (F.col("cum_tokens") - F.col("n_tokens")) / capacity
        ).cast("long").alias("bin_start"),
        F.floor((F.col("cum_tokens") - 1) / capacity).cast("long").alias(
            "bin_end"
        ),
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "sample:v1",
) -> DataFrame:
    """Deterministic per-group sampling — the corpus-mixing step that
    up/down-weights sources when assembling a training mix.

    A document is kept iff its 32-bit hash (first 8 hex digits of
    md5(salt:id) — the engine's portable hash, identical in any SQL
    engine for oracle checks; swap xxhash64 in for raw speed at scale)
    falls under rate × 2^32: reproducible across runs and cluster
    sizes (no RNG state, no sampleBy seed drift), stable under
    repartitioning, and a pure map-side filter — no shuffle at any
    scale.  Changing ``salt`` draws an independent sample."""
    h32 = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    rate = F.lit(float(default_rate))
    for g, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == g, F.lit(float(r))).otherwise(rate)
    return docs.filter(h32 < rate * F.lit(float(2**32)))
