"""Incremental exact dedup against a persisted content-hash store —
the production ingestion mode: each new crawl batch dedups against
everything already ingested, not just against itself.

The store is a parquet directory of (content_hash, batch) rows,
partitioned by batch: each ingest APPENDS one partition (no rewrite of
history), rollback/retention is dropping a partition directory, and
the store carries 16 bytes + ids per document regardless of document
size — at 100 TB of corpus the hash store is ~tens of GB, and the
probe is one shuffled anti-join on a uniform 128-bit key (AQE handles
the relative sizes; the batch side is typically the small one).

Flow:

    survivors = dedup_against_store(spark, new_docs, store)
    ... write survivors to the lake ...
    update_dedup_store(spark, survivors, store, batch="2024-07-01")

Crash between the two steps re-ingests at worst one batch — and
because ``dedup_against_store`` also dedups WITHIN the batch and the
store append is idempotent per batch partition, replaying a batch
converges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_STORE_SCHEMA = "content_hash string, batch string"


def read_dedup_store(spark: SparkSession, store_path: str) -> DataFrame:
    """The store's (content_hash, batch) rows; an empty frame with the
    store schema when no store exists yet (first ingest)."""
    try:
        return spark.read.schema(_STORE_SCHEMA).parquet(store_path)
    except Exception:
        return spark.createDataFrame([], _STORE_SCHEMA)


def dedup_against_store(
    spark: SparkSession,
    new_docs: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The batch's surviving documents: in-batch exact dedup (min-id
    representative per content) followed by an anti-join against the
    persisted hash store.  Returns every input column plus
    ``content_hash`` (so ``update_dedup_store`` needs no re-hash).

    Plan: the content md5 is computed map-side; the in-batch window
    and the store anti-join both key on it, so document text shuffles
    once, on a uniform key."""
    w = Window.partitionBy("content_hash")
    in_batch = (
        new_docs.withColumn("content_hash", F.md5(F.col(text_col)))
        .withColumn("__canon", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("__canon"))
        .drop("__canon")
    )
    seen = read_dedup_store(spark, store_path).select("content_hash")
    return in_batch.join(seen, "content_hash", "left_anti")


def update_dedup_store(
    spark: SparkSession,
    survivors: DataFrame,
    store_path: str,
    batch: str,
) -> None:
    """Append the batch's content hashes as one store partition.
    Replaying the same batch id overwrites ONLY its own partition
    (dynamic partition overwrite), so the commit is idempotent and
    history partitions are never rewritten."""
    col = (
        F.col("content_hash")
        if "content_hash" in survivors.columns
        else F.md5(F.col("text"))
    )
    (
        survivors.select(col.alias("content_hash"))
        .distinct()
        .withColumn("batch", F.lit(batch))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(store_path)
    )


# ---------------------------------------------------------------------------
# Incremental NEAR-dedup against a persisted MinHash signature store
# ---------------------------------------------------------------------------
# The near-dup twin of the content-hash store above: each crawl batch
# is near-dedup'd against everything already ingested without ever
# touching the standing corpus TEXT.  The store carries k=8 signature
# longs + id per document (~80 bytes/doc — a 100 TB corpus's store is
# tens of GB), partitioned by batch with the same append/replay
# contract as the exact store.
#
# Probe plan (all sizes relative to the BATCH, never the corpus):
#   1. batch signatures  — map-only (minhash_signatures_from_text)
#   2. store probe       — both sides banded map-side (band_buckets),
#                          ONE equi-join on the uniform (band, bucket)
#                          key; candidate pairs carry ids only
#   3. verification      — signature-estimated Jaccard (agreeing
#                          components / k): two id-joins against the
#                          k-long signatures, no shingle fan-out
#   4. in-batch dedup    — lsh_candidate_pairs within the batch, same
#                          estimator, exists-earlier drop rule
#
# Drop rule: a batch document is dropped iff a verified match exists in
# the store, or a verified in-batch partner with a SMALLER id exists.
# The in-batch rule is greedy non-transitive (the partner may itself be
# store-dropped) — deterministic, order-free, and conservative in the
# right direction for a dedup: near-dup chains collapse to their
# earliest member.  Documents with fewer than n tokens have no
# signature and trivially survive.

from .dedup import (  # noqa: E402  (section-local imports, see header)
    MINHASH_COEFFS,
    band_buckets,
    estimated_jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures_from_text,
)

NEARDUP_K = len(MINHASH_COEFFS)
_SIG_COLS = ", ".join(f"mh_{j} bigint" for j in range(NEARDUP_K))
_NEARDUP_STORE_SCHEMA = f"doc_id bigint, {_SIG_COLS}, batch string"


def read_neardup_store(spark: SparkSession, store_path: str) -> DataFrame:
    """The persisted signature rows (doc_id, mh_0..mh_k-1, batch); an
    empty typed frame when no store exists yet (first ingest)."""
    try:
        return spark.read.schema(_NEARDUP_STORE_SCHEMA).parquet(store_path)
    except Exception:
        return spark.createDataFrame([], _NEARDUP_STORE_SCHEMA)


def _neardup_drops(
    sig_new: DataFrame,
    store_sigs: DataFrame,
    bands: int,
    rows_per_band: int,
    threshold: float,
    in_batch: bool,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(doc_id, reason, matched_id, est_jaccard) rows for every
    verified match of a batch document; a document may carry several
    rows (one per matched partner)."""
    k = NEARDUP_K
    agree = sum(
        F.when(F.col(f"a_mh_{j}") == F.col(f"b_mh_{j}"), 1).otherwise(0)
        for j in range(k)
    )
    a_sig = sig_new.select(
        F.col("doc_id"),
        *[F.col(f"mh_{j}").alias(f"a_mh_{j}") for j in range(k)],
    )
    b_sig = store_sigs.select(
        F.col("doc_id").alias("matched_id"),
        *[F.col(f"mh_{j}").alias(f"b_mh_{j}") for j in range(k)],
    )
    new_b = band_buckets(sig_new, "doc_id", bands, rows_per_band)
    store_b = band_buckets(
        store_sigs.select("doc_id", *[f"mh_{j}" for j in range(k)]),
        "doc_id", bands, rows_per_band,
    ).withColumnRenamed("doc_id", "matched_id")
    if max_bucket_size is not None:
        # hot-bucket cap: a boilerplate/template bucket with 10^5 store
        # members would fan every probing batch doc out 10^5× — the
        # same skew lsh_candidate_pairs caps.  Degree is counted over
        # one extra pass of the (small) bucket frame; dropped buckets
        # are reportable via neardup_hot_store_buckets.
        degree = store_b.groupBy("band", "bucket").agg(
            F.count("*").alias("__deg")
        )
        store_b = (
            store_b.join(degree, ["band", "bucket"])
            .filter(F.col("__deg") <= max_bucket_size)
            .drop("__deg")
        )
    store_cand = (
        new_b.join(store_b, ["band", "bucket"])
        .select("doc_id", "matched_id")
        .distinct()
    )
    store_drops = (
        store_cand.join(a_sig, "doc_id")
        .join(b_sig, "matched_id")
        .withColumn("est_jaccard", agree.cast("double") / F.lit(float(k)))
        .filter(F.col("est_jaccard") >= threshold)
        .select(
            "doc_id", F.lit("store").alias("reason"),
            "matched_id", "est_jaccard",
        )
    )
    if not in_batch:
        return store_drops
    cand = lsh_candidate_pairs(
        sig_new, bands=bands, rows_per_band=rows_per_band
    )
    batch_drops = (
        estimated_jaccard_pairs(sig_new, cand)
        .filter(F.col("est_jaccard") >= threshold)
        .select(
            F.col("id_b").alias("doc_id"),  # id_a < id_b: earlier wins
            F.lit("batch").alias("reason"),
            F.col("id_a").alias("matched_id"),
            "est_jaccard",
        )
    )
    return store_drops.unionByName(batch_drops)


def neardup_hot_store_buckets(
    store_sigs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Accounting companion to ``max_bucket_size``: the store buckets a
    capped probe ignores, as (band, bucket, n_members).  Empty when no
    cap is set.  Log its count next to the drop metrics — a growing
    hot-bucket population means template content that belongs in the
    EXACT dedup store, not the near-dup probe."""
    grouped = band_buckets(
        store_sigs.select("doc_id", *[f"mh_{j}" for j in range(NEARDUP_K)]),
        "doc_id", bands, rows_per_band,
    ).groupBy("band", "bucket").agg(F.count("*").alias("n_members"))
    if max_bucket_size is None:
        return grouped.filter(F.lit(False))
    return grouped.filter(F.col("n_members") > max_bucket_size)


def neardup_batch_drops(
    new_docs: DataFrame,
    store_sigs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 4,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    in_batch: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Accounting view: every verified (batch doc, matched partner)
    with its estimated Jaccard — what a production ingest should log
    next to the survivor count.  ``store_sigs`` is a signature frame
    (from ``read_neardup_store`` or built in-line for tests)."""
    sig_new = minhash_signatures_from_text(
        new_docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
        text_col=text_col, id_col="doc_id", n=n,
    )
    # The probe consumes sig_new in FOUR branches (band explode,
    # a-side verify, in-batch candidates, in-batch verify) and
    # Catalyst shares no subplans across branches — without
    # materialization each branch re-runs the shingle explode + md5 +
    # 8-way min aggregation over the batch TEXT.  The signature frame
    # is id + k longs (~80 B/doc, batch-sized — never corpus-sized),
    # so the checkpoint is cheap at any scale; lazy, first action
    # fills it.
    sig_new = sig_new.localCheckpoint(eager=False)
    return _neardup_drops(
        sig_new, store_sigs, bands, rows_per_band, threshold, in_batch,
        max_bucket_size,
    ).withColumnRenamed("doc_id", id_col)


def neardup_filter_batch(
    new_docs: DataFrame,
    store_sigs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 4,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    in_batch: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """The batch's surviving documents: every input column plus the
    signature columns mh_0..mh_k-1 (NULL for sub-n-token documents),
    ready for ``update_neardup_store``."""
    sig_new = minhash_signatures_from_text(
        new_docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
        text_col=text_col, id_col="doc_id", n=n,
    ).localCheckpoint(eager=False)  # same 4-branch reuse as above,
    # plus the final signature left-join — batch-sized
    drops = _neardup_drops(
        sig_new, store_sigs, bands, rows_per_band, threshold, in_batch,
        max_bucket_size,
    ).select(F.col("doc_id").alias(id_col)).distinct()
    return new_docs.join(drops, id_col, "left_anti").join(
        sig_new.withColumnRenamed("doc_id", id_col), id_col, "left"
    )


def update_neardup_store(
    spark: SparkSession,
    survivors: DataFrame,
    store_path: str,
    batch: str,
    id_col: str = "doc_id",
) -> None:
    """Append the batch survivors' signatures as one store partition
    (dynamic partition overwrite — replaying a batch id rewrites only
    its own partition, same idempotence contract as the exact store).
    Signature-less rows (sub-n-token docs) are skipped: they can never
    be near-dup matches."""
    (
        survivors.select(
            F.col(id_col).cast("bigint").alias("doc_id"),
            *[f"mh_{j}" for j in range(NEARDUP_K)],
        )
        .filter(F.col("mh_0").isNotNull())
        .withColumn("batch", F.lit(batch))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(store_path)
    )


def compact_neardup_store(
    spark: SparkSession, store_path: str, compacted_path: str
) -> None:
    """Fold the per-batch signature partitions into ONE partition at a
    fresh path (crash-safe swap, the exact store's compaction
    pattern).  Signatures are immutable per doc id, so compaction is a
    dedup by id — batch provenance collapses to 'compacted'."""
    (
        read_neardup_store(spark, store_path)
        .dropDuplicates(["doc_id"])
        .drop("batch")
        .withColumn("batch", F.lit("compacted"))
        .write.mode("overwrite")
        .partitionBy("batch")
        .parquet(compacted_path)
    )


# -- eval-set contamination gate (static store) -------------------------

_CONTAM_SCHEMA = "shingle_hash string"


def build_contamination_store(
    spark: SparkSession,
    eval_docs: DataFrame,
    store_path: str,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One-time: the DISTINCT n-gram shingle hashes of the held-out
    eval/benchmark corpus → a parquet store.  Unlike the dedup and
    near-dup stores this one is STATIC — the eval set is fixed, so
    there is no per-batch commit protocol, just an overwrite.
    Hash-only rows (md5) keep the store compact and make the probe
    join a fixed-width string equi-join."""
    from .dedup import shingles

    sh = (
        shingles(eval_docs, n=n, id_col=id_col, text_col=text_col)
        .select(F.md5("shingle").alias("shingle_hash"))
        .distinct()
    )
    sh.write.mode("overwrite").parquet(store_path)


def read_contamination_store(
    spark: SparkSession, store_path: str
) -> DataFrame:
    """Unlike the dedup/near-dup stores, a missing store here is NOT
    a legitimate first-ingest state — the eval store must be
    pre-built by :func:`build_contamination_store`, so an unreadable
    path is always misconfiguration and silently serving an empty
    store would let contaminated documents through with no signal.
    Fail loudly instead."""
    try:
        return spark.read.schema(_CONTAM_SCHEMA).parquet(store_path)
    except Exception as e:
        raise ValueError(
            f"contamination store at {store_path!r} is missing or "
            "unreadable — build it first with "
            "build_contamination_store()"
        ) from e


def contamination_filter_batch(
    batch_docs: DataFrame,
    store: DataFrame,
    max_contamination: float = 0.2,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop batch documents whose eval-shingle overlap share exceeds
    ``max_contamination`` — the GPT-3/PaLM n-gram decontamination
    check as a streaming-ingest stage (the batch twin is
    curation.shingle_contamination).  Plan: shingle the batch
    map-side, ONE equi-join on the hash against the (already
    distinct) store, per-doc share, anti-join the offenders.  Docs
    too short to produce a shingle carry no overlap evidence and are
    kept."""
    from .dedup import shingles

    sh = shingles(
        batch_docs, n=n, id_col=id_col, text_col=text_col
    ).select(id_col, F.md5("shingle").alias("shingle_hash"))
    hits = sh.join(
        store.withColumn("__hit", F.lit(1)), "shingle_hash", "left"
    )
    contaminated = (
        hits.groupBy(id_col)
        .agg(
            (F.count("__hit") / F.count("*")).alias("__share")
        )
        .filter(F.col("__share") > max_contamination)
        .select(id_col)
    )
    return batch_docs.join(contaminated, id_col, "left_anti")
