"""Streaming corpus ingestion: new document drops flow through
quality featurization and cross-batch exact dedup into the curated
lake — the continuous form of the batch curation pipeline.

Composition per micro-batch (``foreachBatch`` running the SAME batch
operators the offline pipeline uses — one code path to trust):

    arrivals → text_features (map-only quality/token stats)
             → dedup_against_store (in-batch fold + anti-join vs the
               persisted hash store)
             → [optional] neardup_filter_batch (MinHash signature
               store probe — cross-batch NEAR-dup survivors only)
             → overwrite the batch's ``ingest_batch`` corpus partition
             → update_dedup_store (+ update_neardup_store) (batch =
               micro-batch id; dynamic partition overwrite makes
               redelivery idempotent)

Exactly-once story (cross-restart-tested in
tests/test_doc_ingest_stream.py): the streaming checkpoint guarantees
each source file lands in exactly one micro-batch; within a batch the
corpus rows AND both store commits key on the micro-batch id as
dynamic-overwrite partitions.  A crash anywhere between the corpus
write and the last store commit replays the whole batch into the SAME
partitions — rewriting, never duplicating — so a second availableNow
run over the same checkpoint converges the corpus and both stores.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..llmops.incremental import (
    contamination_filter_batch,
    dedup_against_store,
    neardup_filter_batch,
    read_contamination_store,
    read_neardup_store,
    update_dedup_store,
    update_neardup_store,
)
from ..llmops.textstats import text_features

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def stream_ingest_documents(
    spark: SparkSession,
    watch_dir: str,
    store_path: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: StructType | str = DOC_SCHEMA,
    min_tokens: int | None = None,
    available_now: bool = True,
    neardup_store_path: str | None = None,
    neardup_threshold: float = 0.5,
    neardup_max_bucket_size: int | None = None,
    contamination_store_path: str | None = None,
    max_contamination: float = 0.2,
    _fail_before_store_update=None,
) -> StreamingQuery:
    """Watch ``watch_dir`` for parquet document drops; append deduped,
    featurized survivors to ``out_dir`` and their content hashes to
    the store.  ``min_tokens`` optionally drops too-short documents
    before they cost a store probe.  ``available_now=True`` processes
    the backlog then stops (the cron-equivalent trigger).

    ``neardup_store_path`` additionally probes the persisted MinHash
    signature store after the exact stage (exact goes first: it is
    cheaper and removes byte-identical copies before any banding);
    survivors' signatures commit to the same micro-batch partition id,
    so the two stores advance in lockstep under replay.

    ``contamination_store_path`` additionally drops documents whose
    eval-shingle overlap exceeds ``max_contamination`` (the GPT-3
    n-gram decontamination check against a STATIC store built once by
    ``build_contamination_store`` — it never commits per batch, so it
    needs no replay protocol).

    BREAKING layout note (round 10): the curated corpus is written
    partitioned by ``ingest_batch`` with dynamic partition overwrite
    (the exactly-once contract).  An ``out_dir`` populated by the
    pre-round-10 plain-append layout (no ``ingest_batch`` column,
    files at the dir root) would silently mix layouts on the first
    new-style write — so a legacy corpus is detected (probed THROUGH
    Spark, so remote paths work) and refused with a one-time
    migration: rewrite the old rows into an ``ingest_batch=legacy``
    partition."""
    # refuse a legacy (pre-partitioned-layout) corpus dir up front
    # rather than mixing layouts on the first micro-batch.  Only the
    # no-corpus-yet cases (missing path / nothing to infer a schema
    # from) map to "not legacy"; a transient FS/auth failure must
    # ABORT the stream start, not silently skip the guard it exists
    # to provide.
    from pyspark.errors import AnalysisException

    from ..functions.errors import is_missing_input

    try:
        legacy = "ingest_batch" not in spark.read.parquet(out_dir).columns
    except AnalysisException as exc:
        # missing dir / empty dir = no corpus yet; any OTHER analysis
        # failure (unreadable, mixed-format) aborts the stream start
        # instead of skipping the guard it exists to provide
        if not is_missing_input(exc, allow_empty=True):
            raise
        legacy = False  # no corpus yet — the first write creates it
    if legacy:
        raise ValueError(
            f"curated corpus at {out_dir!r} uses the legacy plain-append "
            "layout (no ingest_batch partition column). Migrate once "
            "before streaming into it, e.g.: read the old rows and "
            "rewrite them under ingest_batch='legacy' with "
            "df.withColumn('ingest_batch', lit('legacy'))"
            ".write.partitionBy('ingest_batch').parquet(<new_dir>)."
        )
    arrivals = spark.readStream.schema(schema).parquet(watch_dir)

    def _ingest(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # carry everything incl. the text itself: features project the
        # text away by default, and both the store hash and the corpus
        # append need it
        feats = text_features(
            batch_df,
            carry=[c for c in batch_df.columns if c != "doc_id"],
        )
        if min_tokens is not None:
            feats = feats.filter(feats.n_tokens >= min_tokens)
        survivors = dedup_against_store(spark, feats, store_path)
        if neardup_store_path is not None:
            survivors = neardup_filter_batch(
                survivors,
                read_neardup_store(spark, neardup_store_path),
                threshold=neardup_threshold,
                max_bucket_size=neardup_max_bucket_size,
            )
        if contamination_store_path is not None:
            survivors = contamination_filter_batch(
                survivors,
                read_contamination_store(
                    spark, contamination_store_path
                ),
                max_contamination=max_contamination,
            )
        survivors = survivors.localCheckpoint()
        # EXACTLY-ONCE output under replay: both the corpus rows and
        # the store commits key on the micro-batch id.  The corpus
        # write is a dynamic overwrite of its own ``ingest_batch``
        # partition (a replayed batch rewrites the same partition
        # instead of appending duplicates — the earlier plain append
        # here duplicated corpus rows when a crash landed between the
        # append and the store commit); the store updates were already
        # idempotent per-batch partitions.  Corpus first, stores
        # second: a crash in between replays into the same partitions.
        sig_cols = [c for c in survivors.columns if c.startswith("mh_")]
        bpart = f"b{batch_id:08d}"
        (
            survivors.drop("content_hash", *sig_cols)
            .withColumn("ingest_batch", F.lit(bpart))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(out_dir)
        )
        if _fail_before_store_update is not None:
            # fault-injection point (tests): simulate a crash in the
            # corpus-committed / stores-not-yet window
            _fail_before_store_update(batch_id)
        update_dedup_store(spark, survivors, store_path, batch=bpart)
        if neardup_store_path is not None:
            update_neardup_store(
                spark, survivors, neardup_store_path, batch=bpart
            )

    writer = arrivals.writeStream.foreachBatch(_ingest).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
