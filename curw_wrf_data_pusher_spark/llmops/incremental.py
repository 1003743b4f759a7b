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
