"""Distributed n-gram language-model scoring with stupid backoff.

Stupid backoff (Brants et al., EMNLP 2007, "Large Language Models in
Machine Translation") was designed FOR distributed count-based LMs: no
normalized discounting state, just raw count tables and a fixed 0.4
backoff factor, which is exactly what a shuffle-based engine builds
well.  The published pipeline trains count tables on one corpus split
and scores held-out text — the CCNet-style fluency gate
(`retrieval.ngram_logfreq_scores` is the model-free cousin; this is
the real conditional-probability form with the backoff chain).

Exactness contract: per-position scores are quantized to integer
nano-units using PURE BIGINT arithmetic —

    tri   level: (10^9       * c(w1 w2 w3)) div c(w1 w2)
    bi    level: (4 * 10^8   * c(w2 w3))    div c(w2)      (0.4  * 1e9)
    uni   level: (16 * 10^7  * c(w3))       div N          (0.16 * 1e9)

— so the per-document sum is an exact integer in BOTH engines (Spark
``div`` and DuckDB ``//`` are both floor division on non-negative
integers; no float enters the oracle-checked path anywhere).  The
scale*count product widens to DECIMAL(38,0) before the division: at
100 TB a common token's count reaches ~2.5e13 and 10^9 * c would
overflow BIGINT (silent wrap with ANSI off, hard error with ANSI on);
DECIMAL(38,0) holds it exactly and ``div`` still returns the floored
BIGINT quotient (<= SCALE by construction, since c <= ctx always).

Scale design (the 100 TB story):
- grams hash map-side to 32-bit ints (the corpus-standard md5
  convention; collisions merge counts and are mirrored exactly by the
  oracle), so only (id, hash) rows shuffle — never gram strings;
- count tables are TYPE-sized (vocabulary-scale, far below token
  scale for natural language) and are built with map-side partial
  aggregation: three uniform-hash groupBys over the train split;
- scoring goes through a TYPE-level score table: the eval split's
  distinct trigram types join the five count tables (type-scale
  shuffled equi-joins — a vocabulary is too big to broadcast at
  100 TB, so no broadcast hints; every join side sits above an
  aggregation Exchange, so AQE has a measured size and only picks
  broadcast when a table is genuinely small), then one join maps
  positions back to their type score and one per-document aggregate
  finishes.  Wire cost: the distinct dedups map-side (ships
  ~type-scale bytes), so the token-scale shuffles are exactly the
  type join-back and the map-side-combined doc aggregate — fixed at
  two regardless of how many count tables the backoff chain touches
  (the direct form would shuffle token instances once per table).

Reference anchor: the reference engine has no LM scoring; this is
part of the beyond-reference training-data curation surface
(SURVEY.md "LLM-data-pipeline operators").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textkeys import gram_hash as _gram_hash
from .textkeys import tokenize as _tokens

#: Quantization scale: scores are integer nano-probabilities.
SCALE = 1_000_000_000
#: Brants et al.'s fixed backoff factor 0.4, pre-multiplied into the
#: integer scale so the arithmetic never leaves BIGINT.
BI_SCALE = 400_000_000  # 0.4  * SCALE
UNI_SCALE = 160_000_000  # 0.4^2 * SCALE


def _gram_hash_stream(tok: DataFrame, n: int) -> DataFrame:
    """One row per order-``n`` gram instance of the tokenized frame,
    as the portable 32-bit hash column ``h`` (map-side explode)."""
    if n == 1:
        return tok.select(F.explode("__t").alias("__w")).select(
            _gram_hash("__w").alias("h")
        )
    parts = " || ' ' || ".join(f"__t[i + {j}]" for j in range(n))
    return (
        tok.filter(F.size("__t") >= n)
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(__t) - {n}), i -> {parts})"
                )
            ).alias("__g")
        )
        .select(_gram_hash("__g").alias("h"))
    )


def ngram_count_tables(
    train: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame, int]:
    """Build the stupid-backoff count tables from the training split:
    (trigram counts keyed h123, bigram counts keyed h12, unigram
    counts keyed h1, total token count N).

    ONE union pass over the tokenized train split feeds one
    map-side-combined (n, h) groupBy, and the type-scale result is
    localCheckpointed: the five downstream scoring joins consume tri
    once and bi/uni twice each, and Catalyst shares no common
    subplans across join branches — unmaterialized, each branch
    re-ran its own scan + tokenize + md5 + aggregate over the corpus
    (measured 5 redundant corpus passes on the llm_stupid_backoff
    plan).  The scalar N is exactly sum(c | n=1) — one unigram
    instance per token, and hash collisions merge counts without
    changing the sum — so it reads off the checkpoint instead of a
    fourth corpus pass."""
    tok = _tokens(train, id_col, text_col)
    merged = (
        _gram_hash_stream(tok, 1)
        .select(F.lit(1).alias("n"), "h")
        .unionByName(
            _gram_hash_stream(tok, 2).select(F.lit(2).alias("n"), "h")
        )
        .unionByName(
            _gram_hash_stream(tok, 3).select(F.lit(3).alias("n"), "h")
        )
        .groupBy("n", "h")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    # first action — materializes the checkpoint the joins then reuse
    n_tokens = (
        merged.filter(F.col("n") == 1).select(F.sum("c")).collect()[0][0]
        or 0
    )
    tri, bi, uni = split_count_tables(merged)
    return tri, bi, uni, int(n_tokens)


# ---------------------------------------------------------------------------
# Incremental n-gram count store: at 100 TB the count tables are never
# rebuilt from scratch — each ingest batch appends its COUNT PARTIALS
# (counts are additive, the textbook mergeable aggregate) and readers
# merge on read.  Same idempotence contract as the dedup stores
# (llmops/incremental.py): a batch id owns one partition, replaying it
# dynamic-overwrites only that partition, history is never rewritten.
# ---------------------------------------------------------------------------


def update_ngram_count_store(
    docs: DataFrame,
    store_path: str,
    batch: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Append one batch's n-gram count partials (n, h, c) as a store
    partition.  Three map-side-combined groupBys over THIS BATCH only
    — the standing corpus is never rescanned.  Total train tokens are
    recoverable as sum(c | n=1), so the store needs no side metadata."""
    tok = _tokens(docs, id_col, text_col)
    parts = [
        _gram_hash_stream(tok, n)
        .groupBy("h")
        .agg(F.count("*").alias("c"))
        .select(F.lit(n).alias("n"), "h", "c")
        for n in (1, 2, 3)
    ]
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    (
        u.withColumn("batch", F.lit(batch))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(store_path)
    )


def read_merged_counts(
    spark, store_path: str, exclude_batch: str | None = None
) -> DataFrame:
    """Merge-on-read (n, h, c) view of the count store: ONE uniform
    (n, h) shuffle summing the per-batch partials (type-scale, far
    below token scale).

    ``exclude_batch`` drops one batch partition from the view (a
    partition-pruned filter).  The streaming LM gate passes its OWN
    batch key here so a replayed micro-batch scores against
    store-minus-self — without it, a batch that already committed its
    partials would re-score against a store that includes itself and
    could route documents differently on replay.  NOTE: compaction
    folds history into batch='compacted', which makes exclude_batch
    unable to carve a pre-compaction batch back out — so compact ONLY
    while no gate is running and its checkpoint has committed every
    batch whose partials are in the store (the same quiesce-then-swap
    discipline as the other stores' compaction)."""
    raw = spark.read.parquet(store_path)
    if exclude_batch is not None:
        raw = raw.filter(F.col("batch") != exclude_batch)
    return raw.groupBy("n", "h").agg(F.sum("c").alias("c"))


def split_count_tables(
    merged: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Split a merged (n, h, c) view into the (tri, bi, uni) frames
    of the ``ngram_count_tables`` contract."""
    tri = merged.filter(F.col("n") == 3).select("h", F.col("c").alias("c3"))
    bi = merged.filter(F.col("n") == 2).select("h", F.col("c").alias("c2"))
    uni = merged.filter(F.col("n") == 1).select("h", F.col("c").alias("c1"))
    return tri, bi, uni


def read_ngram_count_tables(
    spark, store_path: str, exclude_batch: str | None = None
) -> tuple[DataFrame, DataFrame, DataFrame, int]:
    """Merge-on-read view of the count store: sums the per-batch
    partials into the same (tri, bi, uni, n_tokens) contract as
    ``ngram_count_tables`` — scoring code cannot tell the difference.
    Composes ``read_merged_counts`` + ``split_count_tables`` plus the
    scalar N aggregate (callers in a hot loop — the streaming gate —
    persist the merged view themselves so the N collect and the five
    scoring joins share one store scan)."""
    merged = read_merged_counts(spark, store_path, exclude_batch)
    tri, bi, uni = split_count_tables(merged)
    n_tokens = (
        merged.filter(F.col("n") == 1).agg(F.sum("c")).collect()[0][0] or 0
    )
    return tri, bi, uni, int(n_tokens)


def compact_ngram_count_store(
    spark, store_path: str, compacted_path: str
) -> None:
    """Fold the per-batch partials into ONE summed partition at a
    fresh path (crash-safe swap, the incremental-store compaction
    pattern).  Counts are additive so compaction SUMS — readers see
    identical tables before and after.

    Operational contract (same as the other stores): compact only
    while no writer is running AND every batch whose partials are in
    the store has committed its stream checkpoint — compaction
    collapses batch provenance to 'compacted', so a mid-recovery
    replay could no longer exclude its own partials via
    ``read_merged_counts(exclude_batch=...)``."""
    (
        spark.read.parquet(store_path)
        .groupBy("n", "h")
        .agg(F.sum("c").alias("c"))
        .withColumn("batch", F.lit("compacted"))
        .write.mode("overwrite")
        .partitionBy("batch")
        .parquet(compacted_path)
    )


def stupid_backoff_scores(
    eval_docs: DataFrame,
    tri: DataFrame,
    bi: DataFrame,
    uni: DataFrame,
    n_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every trigram position of ``eval_docs`` against the
    count tables with the stupid-backoff chain; returns one row per
    document with >= 1 trigram position:

    (id, n_scored, n_tri, n_bi, n_uni, score_q) — n_* are the
    positions resolved at each backoff level and score_q is the exact
    integer nano-score sum (see module docstring for the formula).

    Hash-collision robustness: a backoff level only fires when BOTH
    its numerator and its denominator count are positive, so a
    colliding trigram hash with a zero-count context can never divide
    by zero — it falls through to the next level, identically in the
    SQL mirror."""
    tok = _tokens(eval_docs, id_col, text_col).filter(F.size("__t") >= 3)
    # one struct per trigram position, all five gram keys map-side
    pos = tok.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(sequence(0, size(__t) - 3), i -> struct("
                " __t[i] || ' ' || __t[i+1] || ' ' || __t[i+2] as g123,"
                " __t[i] || ' ' || __t[i+1] as g12,"
                " __t[i+1] || ' ' || __t[i+2] as g23,"
                " __t[i+1] as g2, __t[i+2] as g3))"
            )
        ).alias("p"),
    ).select(
        F.col(id_col),
        _gram_hash("p.g123").alias("h123"),
        _gram_hash("p.g12").alias("h12"),
        _gram_hash("p.g23").alias("h23"),
        _gram_hash("p.g2").alias("h2"),
        _gram_hash("p.g3").alias("h3"),
        # checkpointed: both consumers (the type distinct and the
        # final join-back) otherwise re-run tokenize + 5 md5s per
        # position over the whole eval split.  The row is 6 fixed
        # ints (~48 B/position) — materializing once is cheaper than
        # the second hashing pass (same trade setsim_join makes for
        # its token frame); lazy, so the single final action both
        # fills and reads it.
    ).localCheckpoint(eager=False)
    # TYPE-level score table: distinct key tuples join the count
    # tables once, positions then join back by tuple (token instances
    # shuffle twice total regardless of table count).
    types = pos.select("h123", "h12", "h23", "h2", "h3").distinct()
    ctx2 = bi.select(F.col("h").alias("h12"), F.col("c2").alias("ctx2"))
    num2 = bi.select(F.col("h").alias("h23"), F.col("c2").alias("num2"))
    ctx1 = uni.select(F.col("h").alias("h2"), F.col("c1").alias("ctx1"))
    num1 = uni.select(F.col("h").alias("h3"), F.col("c1").alias("num1"))
    scored_types = (
        types.join(tri.withColumnRenamed("h", "h123"), "h123", "left")
        .join(ctx2, "h12", "left")
        .join(num2, "h23", "left")
        .join(ctx1, "h2", "left")
        .join(num1, "h3", "left")
        .select(
            "h123",
            "h12",
            "h23",
            "h2",
            "h3",
            F.when(
                (F.coalesce("c3", F.lit(0)) > 0)
                & (F.coalesce("ctx2", F.lit(0)) > 0),
                F.lit("tri"),
            )
            .when(
                (F.coalesce("num2", F.lit(0)) > 0)
                & (F.coalesce("ctx1", F.lit(0)) > 0),
                F.lit("bi"),
            )
            .otherwise(F.lit("uni"))
            .alias("level"),
            # scale * count widens to DECIMAL(38,0) before the floor
            # division: a BIGINT multiply wraps (ANSI off) or errors
            # (ANSI on) once a count exceeds ~9.2e9, which common
            # tokens DO at 100 TB (~2.5e13 tokens).  DECIMAL holds
            # scale*c up to 1e38 exactly and `div` still floors to
            # BIGINT (the quotient is <= SCALE by construction), so
            # both engines' integer chains stay identical — DuckDB's
            # HUGEINT multiply is exact the same way.
            F.when(
                (F.coalesce("c3", F.lit(0)) > 0)
                & (F.coalesce("ctx2", F.lit(0)) > 0),
                F.expr(
                    f"cast({SCALE} as decimal(38, 0)) * c3 div ctx2"
                ),
            )
            .when(
                (F.coalesce("num2", F.lit(0)) > 0)
                & (F.coalesce("ctx1", F.lit(0)) > 0),
                F.expr(
                    f"cast({BI_SCALE} as decimal(38, 0)) * num2 div ctx1"
                ),
            )
            .otherwise(
                F.expr(
                    f"cast({UNI_SCALE} as decimal(38, 0))"
                    f" * coalesce(num1, 0L)"
                    f" div {max(int(n_tokens), 1)}L"
                )
            )
            .alias("q"),
        )
    )
    return (
        pos.join(scored_types, ["h123", "h12", "h23", "h2", "h3"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_scored"),
            F.sum(F.when(F.col("level") == "tri", 1).otherwise(0))
            .cast("long")
            .alias("n_tri"),
            F.sum(F.when(F.col("level") == "bi", 1).otherwise(0))
            .cast("long")
            .alias("n_bi"),
            F.sum(F.when(F.col("level") == "uni", 1).otherwise(0))
            .cast("long")
            .alias("n_uni"),
            F.sum("q").cast("long").alias("score_q"),
        )
    )
