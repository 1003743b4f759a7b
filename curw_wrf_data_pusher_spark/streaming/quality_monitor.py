"""Streaming data-quality gate: per-micro-batch expectations +
distribution-drift metrics against a STATIC reference, with failing
batches quarantined instead of appended.

The production pattern behind it: a lake ingestion stream should not
trust upstream feeds — each arriving batch is (1) checked against
declarative expectations (null rates, ranges, uniqueness — the batch
``check_expectations`` operator) and (2) compared to a frozen
reference sample's distribution (``distribution_drift``'s chi²/TVD —
log-free, engine-exact).  Batches that pass append to the clean
corpus; batches that fail land whole in a quarantine directory for
humans, and EVERY batch appends one metrics row — the time series a
dashboard alarms on.

foreachBatch reuses the BATCH operators unchanged (the repo-wide
streaming discipline: one implementation, two execution modes), so
the gate's semantics are exactly the batch monitors', and
``available_now`` replays are idempotent per batch id (outputs are
batch-keyed like the dedup store's commits)."""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def _contains_map_type(dt) -> bool:
    """True when ``dt`` contains a MapType anywhere (maps are not
    orderable, so they cannot participate in the struct-max dedup)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map_type(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map_type(f.dataType) for f in dt.fields)
    return False


def _run_batch_dir(base: str, batch_key: str) -> str:
    """Run-scoped output partition: ``batch=<run_id>-b<batch_id>``.

    Streaming batch ids restart at 0 under a fresh checkpoint, so
    keying outputs on the bare batch id lets a restarted run silently
    overwrite a prior run's batch-0..n directories while the count
    store (already run-scoped) keeps both runs' partials — the
    accepted corpus and the self-trained LM would diverge.  Keying on
    the SAME run-scoped key the store uses makes output, quarantine,
    metrics and store partitions line up one-to-one."""
    return os.path.join(base, f"batch={batch_key}")


def stream_quality_monitor(
    spark: SparkSession,
    watch_dir: str,
    reference: DataFrame,
    value_col: str,
    out_dir: str,
    quarantine_dir: str,
    metrics_dir: str,
    checkpoint_dir: str,
    schema: StructType | str,
    max_tvd: float = 0.5,
    max_null_frac: float = 0.0,
    k: int = 10,
    available_now: bool = True,
    rules: Sequence[tuple[str, Column]] | None = None,
    max_violation_frac: float = 0.0,
    run_id: str | None = None,
) -> StreamingQuery:
    """Watch ``watch_dir`` for parquet drops; per micro-batch compute
    the null fraction of ``value_col`` and its drift (chi², TVD on
    the reference's equi-depth cuts) vs the static ``reference``
    frame, then route the batch whole: ``out_dir`` when
    ``tvd <= max_tvd`` and ``null_frac <= max_null_frac``, else
    ``quarantine_dir``.  Every batch writes one row to
    ``metrics_dir``: (batch_id, n_rows, null_frac, chi2, tvd,
    passed).

    All three sinks are RUN-SCOPED batch-keyed overwrites
    (``batch=<run_id>-b<batch_id>``, ``run_id`` defaulting to a digest
    of the checkpoint path — the same contract as ``stream_lm_gate``):
    a redelivered micro-batch under the SAME checkpoint replaces its
    own output instead of duplicating it, while a restarted run with a
    FRESH checkpoint (whose batch ids restart at 0) gets a new run_id
    and so cannot silently overwrite a prior run's batch-0..n clean /
    quarantine / metrics directories.  If you clear and reuse the SAME
    checkpoint path, pass a fresh explicit ``run_id``.

    The reference should be a bounded sample (it participates in
    every batch's percentile aggregation); freeze it with
    ``localCheckpoint`` or persist it to parquet once.

    ``rules`` are declarative per-row expectations — the batch
    ``check_expectations`` rule list ((name, boolean Column) pairs,
    NULL counting as a violation).  A batch passes the rule gate only
    when EVERY rule's violation fraction is ≤ ``max_violation_frac``;
    a failing rule quarantines the batch exactly like drift does, and
    the metrics row carries (n_rule_violations, rules_passed) so the
    dashboard can tell a schema/contract break from a distribution
    shift.  All rules fold into ONE aggregate over one batch scan."""
    import hashlib

    from ..operators.expectations import check_expectations
    from ..operators.profile import distribution_drift

    # "batch" is reserved: the run-scoped output partitioning
    # (batch=<run_id>-b<id>) surfaces it as a partition column when
    # the clean/quarantine/metrics trees are read back
    field_names = (
        spark.createDataFrame([], schema).columns
        if isinstance(schema, str)
        else [f.name for f in schema.fields]
    )
    if "batch" in field_names:
        raise ValueError(
            "input schema may not contain the reserved column 'batch' "
            "(it is the gate's run-scoped output partition key)"
        )
    if run_id is None:
        run_id = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]

    arrivals = spark.readStream.schema(schema).parquet(watch_dir)

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        n_rows = batch_df.count()
        n_null = batch_df.filter(F.col(value_col).isNull()).count()
        null_frac = n_null / n_rows
        summary = [
            r
            for r in distribution_drift(
                reference, batch_df, value_col, k=k
            ).collect()
            if r.part == "summary"
        ][0]
        chi2, tvd = summary.chi_term, summary.tvd_term
        # a NULL tvd means the drift was unmeasurable (e.g. zero
        # non-null values in the batch — exactly the bad feed this
        # gate exists for): treat it as FAILED so the batch
        # quarantines and still emits its metrics row, rather than
        # crashing the stream on a None comparison
        rules_passed = True
        n_rule_violations = 0
        if rules:
            res = check_expectations(batch_df, list(rules)).collect()
            n_rule_violations = int(sum(r.n_violations for r in res))
            rules_passed = all(
                r.n_violations <= max_violation_frac * r.n_rows
                for r in res
            )
        passed = (
            tvd is not None
            and tvd <= max_tvd
            and null_frac <= max_null_frac
            and rules_passed
        )
        target = out_dir if passed else quarantine_dir
        batch_key = f"{run_id}-b{batch_id:020d}"
        batch_df.write.mode("overwrite").parquet(
            _run_batch_dir(target, batch_key)
        )
        spark.createDataFrame(
            [(batch_id, n_rows, float(null_frac),
              None if chi2 is None else float(chi2),
              None if tvd is None else float(tvd),
              n_rule_violations, rules_passed, passed)],
            "batch_id long, n_rows long, null_frac double, "
            "chi2 double, tvd double, n_rule_violations long, "
            "rules_passed boolean, passed boolean",
        ).write.mode("overwrite").parquet(
            _run_batch_dir(metrics_dir, batch_key)
        )

    writer = arrivals.writeStream.foreachBatch(_gate).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_gauge_qc(
    spark: SparkSession,
    watch_dir: str,
    store_dir: str,
    qc_dir: str,
    checkpoint_dir: str,
    schema: StructType | str = "hash_id string, time string, value double",
    min_run: int = 4,
    max_jump=3000,
    level_expr: Column | None = None,
    available_now: bool = True,
    store_buckets: int | None = None,
) -> StreamingQuery:
    """W18's WMO QC flags over the LIVE gauge stream — the reference's
    actual QC target (gen_active_stations_rfields.py:205's 15-min
    gauge series feed the hybrid products; a stuck or spiking gauge
    poisons them silently).

    Per micro-batch of arriving readings (hash_id, time, value):

    1. upsert the arrivals into the standing hash_id-partitioned
       gauge store (late readings and corrections REPLACE by
       (hash_id, time) — the K1 idempotence contract; within a
       micro-batch the LAST-arriving source file wins, ordered by
       file mtime then path, so an original and its correction
       landing in one availableNow batch resolve deterministically);
    2. re-run the BATCH ``qc_flags`` operator over the FULL history
       of exactly the touched series (QC is not prefix-incremental: a
       late reading can split a flatline run or create a step, so
       flags both appear AND retract — only a recompute of the
       affected series is correct);
    3. dynamic-partition-overwrite those series' partitions of the QC
       table — untouched series keep their standing flags.

    Batch equivalence is structural: step 2 IS the registered batch
    operator (one code path), and the per-series recompute equals the
    full-frame recompute because every qc window partitions by the
    series key (pinned in tests/test_quality_monitor_stream.py,
    including the late-arrival retraction).  Replays are idempotent:
    both writes are keyed merges/overwrites.

    Scale: the per-batch work is O(touched series × their history) —
    a gauge network is dims-scale (10²-10⁴ series), and the QC
    recompute reads only the touched hash_id partitions of the store.
    ``max_jump``/``min_run``/``level_expr`` pass through to
    ``qc_flags`` (use integer centi-units for cross-engine hashing,
    like the w18 row).

    ``store_buckets`` (round-13 100x probe finding): per-SERIES
    partition dirs hit the filesystem-metadata wall at the top of the
    dims range — the 10,000-series probe spent ~20 min per
    partitioned write committing 10k directories, and a
    store-bootstrapping batch does three of them.  With
    ``store_buckets=N`` the store and QC table partition on
    ``bucket = pmod(xxhash64(hash_id), N)`` instead (NOT an
    underscore-prefixed name: ``_``-prefixed partition directories
    read as hidden paths to half the Hadoop/Spark listing stack —
    found the hard way when a ``__bucket=`` store was mistaken for
    empty and overwritten): any batch
    writes at most N directories, and a correction touching k series
    prunes to ≤k buckets (~k·S/N series' history read — still
    pruned, amplified only by the bucket width).  Flags equal the
    per-series layout's exactly (every window partitions by hash_id;
    the extra ``bucket`` partition column rides along in the QC
    table; an input schema already containing ``bucket`` is rejected
    at construction).  Use it above ~2k series; default None keeps the
    per-series layout and output schema."""
    from pyspark.sql import Window

    from ..operators.qc import qc_flags
    from ..sinks.upsert import upsert_parquet

    # carry the source file's (mtime, path) so same-batch redeliveries
    # have a total arrival order — one availableNow run after downtime
    # can hold an original AND its correction in a single micro-batch
    if store_buckets:
        field_names = (
            spark.createDataFrame([], schema).columns
            if isinstance(schema, str)
            else [f.name for f in schema.fields]
        )
        if "bucket" in field_names:
            raise ValueError(
                "input schema may not contain 'bucket' when "
                "store_buckets is set — it becomes the store/QC "
                "partition column"
            )
    arrivals = (
        spark.readStream.schema(schema)
        .parquet(watch_dir)
        .select(
            "*",
            F.col("_metadata.file_modification_time").alias("__mt"),
            F.col("_metadata.file_path").alias("__fp"),
        )
    )

    def _qc(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # intra-batch last-wins per (hash_id, time): latest source
        # file's reading survives (mtime, path-tiebroken) — without
        # this, an original and its same-batch correction BOTH land
        # and break the K1 replace-by-key contract
        w_arr = Window.partitionBy("hash_id", "time").orderBy(
            F.col("__mt").desc(), F.col("__fp").desc()
        )
        deduped = (
            batch_df.withColumn("__rn", F.row_number().over(w_arr))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__mt", "__fp")
        )
        if store_buckets:
            part_col = "bucket"
            deduped = deduped.withColumn(
                part_col,
                F.pmod(F.xxhash64("hash_id"), F.lit(store_buckets))
                .cast("int"),
            )
        else:
            part_col = "hash_id"
        # partitioned store: the merge touches only the arriving
        # partitions (partition col is hash_id or a pure function of
        # it, so upsert_parquet's scoped merge stays key-consistent)
        upsert_parquet(
            spark, deduped, store_dir, keys=["hash_id", "time"],
            partition_cols=[part_col],
        )
        # bounded collect: partition values are dims-scale (series)
        # or store_buckets-scale; the literal isin prunes the store
        # scan to the touched partitions at PLANNING time (a
        # semi-join would scan all partitions)
        touched = [
            r[part_col]
            for r in deduped.select(part_col).distinct().collect()
        ]
        hist = spark.read.parquet(store_dir).filter(
            F.col(part_col).isin(touched)
        )
        flags = qc_flags(
            hist,
            series_cols=["hash_id"],
            order_cols=["time"],
            value_col="value",
            min_run=min_run,
            max_jump=max_jump,
            level_col=level_expr,
        )
        (
            flags.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(part_col)
            .parquet(qc_dir)
        )

    writer = arrivals.writeStream.foreachBatch(_qc).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_lm_gate(
    spark: SparkSession,
    watch_dir: str,
    store_path: str,
    out_dir: str,
    quarantine_dir: str,
    metrics_dir: str,
    checkpoint_dir: str,
    schema: StructType | str,
    min_avg_q: int = 1,
    update_store: bool = True,
    available_now: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    run_id: str | None = None,
) -> StreamingQuery:
    """Streaming LM fluency gate: per micro-batch, score arriving
    documents with the stupid-backoff LM against the PERSISTED n-gram
    count store and route PER DOCUMENT (the CCNet shape — a batch is
    not all-good or all-bad): docs whose mean per-position nano-score
    clears ``min_avg_q`` append to the clean corpus, the rest land in
    quarantine; survivors' count partials then feed the store back
    (``update_store``), so the gate's language model grows with the
    corpus it accepts — the incremental LM loop.

    Contracts, all batch-operator-backed (one implementation, two
    execution modes):
    - the pass test is EXACT integer arithmetic: ``score_q >=
      min_avg_q * n_scored`` (no float division);
    - docs with fewer than 3 tokens have no trigram positions and
      pass unjudged (NULL score in the routed output) — the gate
      judges fluency, not length (length gates are
      ``quality_features``' job);
    - COLD START: while the store is absent/empty every doc passes
      unjudged and (with ``update_store``) bootstraps the store;
    - REPLAY: outputs are batch-keyed overwrites AND scoring reads
      store-minus-self (``read_merged_counts(...,
      exclude_batch=<own batch key>)``), so a redelivered micro-batch
      whose store commit already landed re-scores against exactly the
      state it originally saw and re-routes identically.  Any store
      read error other than missing-input re-raises
      (``functions.errors.is_missing_input``);
    - STORE *AND OUTPUT* KEYS ARE RUN-SCOPED: streaming batch ids
      restart at 0 with a fresh checkpoint, so store partitions AND
      the clean/quarantine/metrics output partitions all key on
      ``<run_id>-b<batch_id>`` where ``run_id`` defaults to a digest
      of the checkpoint path — restarting over an existing store +
      output tree with a NEW checkpoint location can neither
      overwrite a prior run's batch directories nor mis-exclude its
      partials (the accepted corpus and the self-trained LM stay in
      lockstep).  If you clear and reuse the SAME checkpoint path,
      pass a fresh explicit ``run_id``;
    - WITHIN-BATCH DEDUP: duplicate ``id_col`` rows in one
      micro-batch (upstream redelivery) collapse to ONE
      DETERMINISTIC representative — the struct-max over the
      remaining columns — so a replay that re-delivers conflicting
      rows under one id keeps the same row it kept the first time
      (an arbitrary-pick dedup could route/store a different
      duplicate on replay).  A duplicated document cannot
      double-count into the self-training store.  CROSS-batch exact
      dedup is the dedup store's job (``llmops.incremental``) —
      compose it upstream when the feed can replay across batches."""
    import hashlib

    from pyspark.sql.utils import AnalysisException

    from ..functions.errors import is_missing_input
    from ..llmops.ngramlm import (
        read_merged_counts,
        split_count_tables,
        stupid_backoff_scores,
        update_ngram_count_store,
    )

    # "batch" is reserved too: the run-scoped output partitioning
    # (batch=<run_id>-b<id>) surfaces it as a partition column when
    # the clean/quarantine/metrics trees are read back
    reserved = {"score_q", "n_scored", "__fail", "batch"}
    struct = (
        spark.createDataFrame([], schema).schema
        if isinstance(schema, str)
        else schema
    )
    field_names = [f.name for f in struct.fields]
    clash = reserved & set(field_names)
    if clash:
        raise ValueError(
            f"input schema may not contain reserved gate columns {clash} "
            "(e.g. do not point the gate at its own clean output)"
        )
    # The within-batch dedup takes max(struct(<non-id cols>)), which
    # requires every non-id column to be ORDERABLE; a MapType anywhere
    # in a non-id column would otherwise die per-batch inside the
    # stream with an opaque AnalysisException — fail fast here instead
    unorderable = [
        f.name
        for f in struct.fields
        if f.name != id_col and _contains_map_type(f.dataType)
    ]
    if unorderable:
        raise ValueError(
            "within-batch dedup orders non-id columns, but these are "
            f"unorderable (contain MapType): {unorderable}; drop or "
            "re-encode them (e.g. map_entries to a sorted array) "
            "before the gate"
        )
    if run_id is None:
        run_id = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]

    arrivals = spark.readStream.schema(schema).parquet(watch_dir)

    def _gate(raw_df: DataFrame, batch_id: int) -> None:
        if raw_df.isEmpty():
            return
        # within-batch redelivery dedup (DETERMINISTIC representative:
        # struct-max over the non-id columns, so a replay with
        # conflicting duplicate rows keeps the same one) + one
        # materialization: every downstream action (count, scoring
        # self-join, both route writes, store update) reads the
        # cached batch, not the files
        other_cols = [c for c in raw_df.columns if c != id_col]
        batch_df = (
            raw_df.groupBy(id_col)
            .agg(F.max(F.struct(*other_cols)).alias("__rep"))
            .select(F.col(id_col), "__rep.*")
            .select(*raw_df.columns)
            .persist()
        )
        merged = None
        routed = None
        try:
            batch_key = f"{run_id}-b{batch_id:020d}"
            tables = None
            n_tokens = 0
            try:
                # persist the merged model view: the N collect and the
                # five scoring joins share ONE store scan per batch
                merged = read_merged_counts(
                    spark, store_path, exclude_batch=batch_key
                ).persist()
                n_tokens = int(
                    merged.filter(F.col("n") == 1)
                    .agg(F.sum("c"))
                    .collect()[0][0]
                    or 0
                )
                if n_tokens > 0:
                    tables = split_count_tables(merged)
            except AnalysisException as e:
                if not is_missing_input(e, allow_empty=True):
                    raise
            n_rows = batch_df.count()
            if tables is None:
                # bootstrap: no model yet — everything passes unjudged
                survivors = batch_df.select(
                    *batch_df.columns,
                    F.lit(None).cast("long").alias("score_q"),
                    F.lit(None).cast("long").alias("n_scored"),
                )
                rejected = survivors.limit(0)
                n_scored_docs = 0
            else:
                scores = stupid_backoff_scores(
                    batch_df, *tables, n_tokens,
                    id_col=id_col, text_col=text_col,
                ).select(id_col, "score_q", "n_scored")
                joined = batch_df.join(scores, id_col, "left")
                # exact integer pass test; unscored (short) docs pass
                fail = (
                    F.col("n_scored").isNotNull()
                    & (
                        F.col("score_q")
                        < F.lit(min_avg_q) * F.col("n_scored")
                    )
                )
                routed = joined.select(
                    *batch_df.columns, "score_q", "n_scored",
                    fail.alias("__fail"),
                ).persist()  # score ONCE; routes + store read the cache
                survivors = routed.filter(~F.col("__fail")).drop("__fail")
                rejected = routed.filter(F.col("__fail")).drop("__fail")
                n_scored_docs = routed.filter(
                    F.col("n_scored").isNotNull()
                ).count()
            survivors.write.mode("overwrite").parquet(
                _run_batch_dir(out_dir, batch_key)
            )
            rejected.write.mode("overwrite").parquet(
                _run_batch_dir(quarantine_dir, batch_key)
            )
            n_rejected = rejected.count()
            if update_store:
                update_ngram_count_store(
                    survivors.select(id_col, text_col),
                    store_path,
                    batch=batch_key,
                    id_col=id_col,
                    text_col=text_col,
                )
            spark.createDataFrame(
                [(batch_id, n_rows, n_scored_docs, n_rejected,
                  tables is not None)],
                "batch_id long, n_rows long, n_scored_docs long, "
                "n_rejected long, model_available boolean",
            ).write.mode("overwrite").parquet(
                _run_batch_dir(metrics_dir, batch_key)
            )
        finally:
            # bound executor storage on long-running streams
            batch_df.unpersist()
            if merged is not None:
                merged.unpersist()
            if routed is not None:
                routed.unpersist()

    writer = arrivals.writeStream.foreachBatch(_gate).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
