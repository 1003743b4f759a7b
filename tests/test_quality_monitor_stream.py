"""Streaming quality gate: in-distribution batches append to the
clean dir, drifted/null-ridden batches land in quarantine, every
batch emits one metrics row, and redelivery replaces (not duplicates)
batch outputs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.streaming.quality_monitor import (
    stream_quality_monitor,
)

SCHEMA = "id long, v double"


def _drop(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _dirs(tmp_path):
    d = {n: str(tmp_path / n)
         for n in ("incoming", "clean", "quarantine", "metrics", "ckpt")}
    os.makedirs(d["incoming"])
    return d


def _reference(spark):
    # frozen uniform reference over [0, 100)
    return spark.range(1000).select(
        F.col("id"), (F.col("id") % 100).cast("double").alias("v")
    ).localCheckpoint()


def test_quality_monitor_routes_and_reports(spark, tmp_path):
    d = _dirs(tmp_path)
    ref = _reference(spark)

    # batch 0: same distribution → clean
    _drop(spark, d["incoming"], [(i, float(i % 100)) for i in range(500)])
    q = stream_quality_monitor(
        spark, d["incoming"], ref, "v", d["clean"], d["quarantine"],
        d["metrics"], d["ckpt"], SCHEMA, max_tvd=0.3,
    )
    q.awaitTermination(120)

    # batch 1: shifted by +500 → every row above the reference's range
    _drop(spark, d["incoming"],
          [(1000 + i, 500.0 + i % 100) for i in range(500)])
    q = stream_quality_monitor(
        spark, d["incoming"], ref, "v", d["clean"], d["quarantine"],
        d["metrics"], d["ckpt"], SCHEMA, max_tvd=0.3,
    )
    q.awaitTermination(120)

    clean = spark.read.parquet(d["clean"])
    quar = spark.read.parquet(d["quarantine"])
    assert clean.count() == 500 and quar.count() == 500
    assert clean.agg(F.max("v")).collect()[0][0] < 100
    assert quar.agg(F.min("v")).collect()[0][0] >= 500

    m = {r.batch_id: r for r in spark.read.parquet(d["metrics"]).collect()}
    assert len(m) == 2
    passed = [r for r in m.values() if r.passed]
    failed = [r for r in m.values() if not r.passed]
    assert len(passed) == 1 and len(failed) == 1
    assert passed[0].tvd <= 0.3 and failed[0].tvd > 0.3
    assert failed[0].chi2 > passed[0].chi2
    assert all(r.n_rows == 500 and r.null_frac == 0.0 for r in m.values())


def test_quality_monitor_null_gate_and_idempotent_redelivery(
    spark, tmp_path
):
    d = _dirs(tmp_path)
    ref = _reference(spark)

    rows = [(i, float(i % 100)) for i in range(99)] + [(99, None)]
    _drop(spark, d["incoming"], rows)
    q = stream_quality_monitor(
        spark, d["incoming"], ref, "v", d["clean"], d["quarantine"],
        d["metrics"], d["ckpt"], SCHEMA, max_tvd=0.5, max_null_frac=0.0,
    )
    q.awaitTermination(120)

    # one NULL → quarantined despite in-distribution values
    assert not os.path.exists(d["clean"]) or \
        spark.read.parquet(d["clean"]).count() == 0
    assert spark.read.parquet(d["quarantine"]).count() == 100
    m = spark.read.parquet(d["metrics"]).collect()
    assert len(m) == 1 and not m[0].passed and m[0].null_frac == 0.01

    # redelivery: wipe the checkpoint so the same files replay as a
    # fresh batch 0 — outputs must be REPLACED (batch-keyed overwrite),
    # not duplicated
    import shutil

    shutil.rmtree(d["ckpt"])
    q = stream_quality_monitor(
        spark, d["incoming"], ref, "v", d["clean"], d["quarantine"],
        d["metrics"], d["ckpt"], SCHEMA, max_tvd=0.5, max_null_frac=0.0,
    )
    q.awaitTermination(120)
    assert spark.read.parquet(d["quarantine"]).count() == 100
    assert len(spark.read.parquet(d["metrics"]).collect()) == 1


def test_quality_monitor_quarantines_all_null_batch(spark, tmp_path):
    """Round-8 advisor fix: a batch whose value column is ENTIRELY
    null made distribution_drift raise DIVIDE_BY_ZERO inside
    foreachBatch — the stream died with no quarantine write and no
    metrics row.  Now the drift degenerates to NULL tvd, the batch
    quarantines whole, and the metrics row records the failure."""
    d = _dirs(tmp_path)
    ref = _reference(spark)

    _drop(spark, d["incoming"], [(i, None) for i in range(50)])
    q = stream_quality_monitor(
        spark, d["incoming"], ref, "v", d["clean"], d["quarantine"],
        d["metrics"], d["ckpt"], SCHEMA, max_tvd=0.5, max_null_frac=0.1,
    )
    q.awaitTermination(120)
    assert q.exception() is None
    assert spark.read.parquet(d["quarantine"]).count() == 50
    m = spark.read.parquet(d["metrics"]).collect()
    assert len(m) == 1 and not m[0].passed
    assert m[0].tvd is None and m[0].null_frac == 1.0


def test_quality_monitor_expectation_rules_gate(spark, tmp_path):
    d = _dirs(tmp_path)
    ref = _reference(spark)
    rules = [
        ("v_in_range", F.col("v").between(0, 200)),
        ("id_positive", F.col("id") >= 0),
    ]

    # batch 0: in-distribution AND rule-clean → clean dir
    _drop(spark, d["incoming"], [(i, float(i % 100)) for i in range(200)])
    q = stream_quality_monitor(
        spark, d["incoming"], ref, "v", d["clean"], d["quarantine"],
        d["metrics"], d["ckpt"], SCHEMA, max_tvd=0.3, rules=rules,
    )
    q.awaitTermination(120)

    # batch 1: distribution still fine (same shape) but two rows break
    # the id_positive rule → quarantined by the RULE gate alone
    rows = [(1000 + i, float(i % 100)) for i in range(198)]
    rows += [(-1, 50.0), (-2, 60.0)]
    _drop(spark, d["incoming"], rows)
    q = stream_quality_monitor(
        spark, d["incoming"], ref, "v", d["clean"], d["quarantine"],
        d["metrics"], d["ckpt"], SCHEMA, max_tvd=0.3, rules=rules,
    )
    q.awaitTermination(120)

    clean = spark.read.parquet(d["clean"])
    quar = spark.read.parquet(d["quarantine"])
    assert clean.count() == 200 and quar.count() == 200

    m = {r.batch_id: r for r in spark.read.parquet(d["metrics"]).collect()}
    ok = [r for r in m.values() if r.passed][0]
    bad = [r for r in m.values() if not r.passed][0]
    assert ok.n_rule_violations == 0 and ok.rules_passed
    assert bad.n_rule_violations == 2 and not bad.rules_passed
    # the drift gate itself did NOT fire — rule break is the only cause
    assert bad.tvd is not None and bad.tvd <= 0.3
    # tolerance: the same 1% violation rate passes at a loose threshold
    d2 = {n: str(tmp_path / ("t2_" + n))
          for n in ("incoming", "clean", "quarantine", "metrics", "ckpt")}
    os.makedirs(d2["incoming"])
    _drop(spark, d2["incoming"], rows)
    q = stream_quality_monitor(
        spark, d2["incoming"], ref, "v", d2["clean"], d2["quarantine"],
        d2["metrics"], d2["ckpt"], SCHEMA, max_tvd=0.3, rules=rules,
        max_violation_frac=0.05,
    )
    q.awaitTermination(120)
    assert spark.read.parquet(d2["clean"]).count() == 200


# ---------------------------------------------------------------------------
# stream_gauge_qc: W18's WMO QC over the live gauge stream


GAUGE_SCHEMA = "hash_id string, time string, value double"


def _gauge_drop(spark, path, rows):
    spark.createDataFrame(rows, GAUGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _gauge_dirs(tmp_path):
    d = {n: str(tmp_path / n)
         for n in ("incoming", "store", "qc", "ckpt")}
    os.makedirs(d["incoming"])
    return d


def _run_qc(spark, d, **kw):
    from curw_wrf_data_pusher_spark.streaming.quality_monitor import (
        stream_gauge_qc,
    )

    q = stream_gauge_qc(
        spark, d["incoming"], d["store"], d["qc"], d["ckpt"],
        min_run=3, max_jump=30.0, **kw,
    )
    q.awaitTermination(120)


def _ts(i):
    return f"2024-06-01 {i // 4:02d}:{15 * (i % 4):02d}:00"


def test_stream_gauge_qc_flags_and_late_arrival_retraction(
    spark, tmp_path
):
    """Flags appear for a dead gauge as its run crosses min_run across
    micro-batches, and a LATE correction retracts them — exactly what
    a batch recompute over the corrected series would produce."""
    d = _gauge_dirs(tmp_path)

    # batch 1: g1 flat at 5.0 for 2 readings (below min_run=3),
    # g2 healthy ramp
    _gauge_drop(spark, d["incoming"], [
        ("g1", _ts(0), 5.0), ("g1", _ts(1), 5.0),
        ("g2", _ts(0), 1.0), ("g2", _ts(1), 2.0),
    ])
    _run_qc(spark, d)
    qc1 = {(r.hash_id, r.time): (r.flatline_flag, r.spike_flag)
           for r in spark.read.parquet(d["qc"]).collect()}
    assert not any(fl for fl, _ in qc1.values())

    # batch 2: g1 stays flat (run reaches 3 → flags whole run) and a
    # step spike lands on g2
    _gauge_drop(spark, d["incoming"], [
        ("g1", _ts(2), 5.0),
        ("g2", _ts(2), 90.0),
    ])
    _run_qc(spark, d)
    qc2 = {(r.hash_id, r.time): (r.flatline_flag, r.spike_flag)
           for r in spark.read.parquet(d["qc"]).collect()}
    assert qc2[("g1", _ts(0))][0] and qc2[("g1", _ts(1))][0]
    assert qc2[("g1", _ts(2))][0]
    assert qc2[("g2", _ts(2))][1]  # the 2.0 -> 90.0 jump
    assert not qc2[("g2", _ts(1))][1]

    # batch 3: a LATE CORRECTION re-delivers g1's middle reading with
    # the real value — the flatline run splits, flags RETRACT
    _gauge_drop(spark, d["incoming"], [("g1", _ts(1), 7.5)])
    _run_qc(spark, d)
    qc3 = {(r.hash_id, r.time): (r.flatline_flag, r.spike_flag)
           for r in spark.read.parquet(d["qc"]).collect()}
    assert not any(fl for fl, _ in qc3.values())
    # the store holds the corrected reading exactly once
    store = spark.read.parquet(d["store"])
    assert store.filter("hash_id = 'g1'").count() == 3
    g1_mid = store.filter(
        (F.col("hash_id") == "g1") & (F.col("time") == _ts(1))
    ).collect()
    assert [r.value for r in g1_mid] == [7.5]


def test_stream_gauge_qc_same_batch_correction_last_wins(
    spark, tmp_path
):
    """An original and its correction arriving in ONE micro-batch
    (the availableNow-after-downtime case) resolve to the correction:
    intra-batch last-wins by source-file mtime, and the store never
    holds two rows for one (hash_id, time) key."""
    d = _gauge_dirs(tmp_path)
    _gauge_drop(spark, d["incoming"], [
        ("g1", _ts(0), 5.0), ("g1", _ts(1), 5.0), ("g1", _ts(2), 5.0),
    ])
    _gauge_drop(spark, d["incoming"], [("g1", _ts(1), 9.0)])
    # force distinct, ordered mtimes (same-second writes would tie)
    files = sorted(
        __import__("glob").glob(os.path.join(d["incoming"], "*.parquet"))
    )
    for i, f in enumerate(sorted(files, key=os.path.getmtime)):
        os.utime(f, (1717290000 + 60 * i, 1717290000 + 60 * i))
    _run_qc(spark, d)  # ONE run → one batch holds both files
    store = spark.read.parquet(d["store"]).filter("hash_id = 'g1'")
    rows = {(r.time): r.value for r in store.collect()}
    assert rows == {_ts(0): 5.0, _ts(1): 9.0, _ts(2): 5.0}
    qc = {r.time: (r.flatline_flag, r.spike_flag)
          for r in spark.read.parquet(d["qc"]).collect()}
    # the correction splits the would-be flatline run of 3
    assert not any(fl for fl, _ in qc.values())


def test_stream_gauge_qc_equals_batch_operator(spark, tmp_path):
    """Batch equivalence: after any sequence of drops, the streamed QC
    table row-for-row equals the registered batch operator run over
    the final store — one code path, recompute-scoped per series."""
    from curw_wrf_data_pusher_spark.operators.qc import qc_flags

    d = _gauge_dirs(tmp_path)
    _gauge_drop(spark, d["incoming"], [
        ("g1", _ts(i), 5.0) for i in range(4)
    ] + [("g2", _ts(i), float(i)) for i in range(4)])
    _run_qc(spark, d)
    _gauge_drop(spark, d["incoming"], [
        ("g2", _ts(4), 80.0), ("g3", _ts(0), 1.0),
    ])
    _run_qc(spark, d)

    streamed = sorted(
        map(tuple, spark.read.parquet(d["qc"]).select(
            "hash_id", "time", "value", "flatline_flag", "spike_flag"
        ).collect())
    )
    batch = sorted(
        map(tuple, qc_flags(
            spark.read.parquet(d["store"]),
            series_cols=["hash_id"], order_cols=["time"],
            value_col="value", min_run=3, max_jump=30.0,
        ).select(
            "hash_id", "time", "value", "flatline_flag", "spike_flag"
        ).collect())
    )
    assert streamed == batch and len(streamed) == 10


# ---------------------------------------------------------------------------
# Streaming LM fluency gate (stupid backoff vs the persisted n-gram
# count store): bootstrap pass-through, per-document routing once the
# model exists, self-training store growth, and batch-route
# equivalence of the scoring.
# ---------------------------------------------------------------------------

DOC_SCHEMA = "doc_id long, text string"


def _drop_docs(spark, path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _lm_dirs(tmp_path):
    d = {n: str(tmp_path / n)
         for n in ("incoming", "clean", "quarantine", "metrics",
                   "ckpt", "store")}
    os.makedirs(d["incoming"])
    return d


def test_stream_lm_gate_bootstrap_route_and_self_training(spark, tmp_path):
    from curw_wrf_data_pusher_spark.llmops.ngramlm import (
        read_ngram_count_tables,
        stupid_backoff_scores,
    )
    from curw_wrf_data_pusher_spark.streaming.quality_monitor import (
        stream_lm_gate,
    )

    d = _lm_dirs(tmp_path)
    fluent = "the quick brown fox jumps over the lazy dog again and again"
    # batch 0 (bootstrap: no store yet -> everything passes unjudged)
    _drop_docs(spark, d["incoming"], [(i, fluent) for i in range(6)])
    q = stream_lm_gate(
        spark, d["incoming"], d["store"], d["clean"], d["quarantine"],
        d["metrics"], d["ckpt"], DOC_SCHEMA, min_avg_q=1,
    )
    q.awaitTermination(120)

    clean0 = spark.read.parquet(d["clean"])
    assert clean0.count() == 6
    assert clean0.filter(F.col("score_q").isNotNull()).count() == 0
    store_batches = set(
        r.batch for r in spark.read.parquet(d["store"])
        .select("batch").distinct().collect()
    )
    assert len(store_batches) == 1  # bootstrap batch committed partials

    # batch 1: five fluent docs + one gibberish doc (no trigram of it
    # appears in the store -> every position backs off to unseen
    # unigrams -> score_q == 0 -> rejected)
    gibberish = "zxq wvu tsr qpo nml kji hgf edc ba"
    rows = [(100 + i, fluent) for i in range(5)] + [(999, gibberish)]
    _drop_docs(spark, d["incoming"], rows)
    q = stream_lm_gate(
        spark, d["incoming"], d["store"], d["clean"], d["quarantine"],
        d["metrics"], d["ckpt"], DOC_SCHEMA, min_avg_q=1,
    )
    q.awaitTermination(120)

    quar = spark.read.parquet(d["quarantine"])
    assert [r.doc_id for r in quar.collect()] == [999]
    assert quar.collect()[0].score_q == 0
    clean = spark.read.parquet(d["clean"])
    assert clean.count() == 11  # 6 bootstrap + 5 fluent survivors
    # batch-1 survivors were genuinely judged (non-null scores)
    judged = clean.filter(F.col("doc_id") >= 100)
    assert judged.count() == 5
    assert all(r.score_q > 0 for r in judged.collect())

    # self-training: the store grew by exactly the survivors' batch
    store_batches2 = set(
        r.batch for r in spark.read.parquet(d["store"])
        .select("batch").distinct().collect()
    )
    assert len(store_batches2) == 2 and store_batches < store_batches2

    # batch-route equivalence: scoring batch-1 docs with the BATCH
    # operator against store-minus-batch-1 reproduces the routing
    b1_key = sorted(store_batches2 - store_batches)[0]
    tri, bi, uni, n = read_ngram_count_tables(
        spark, d["store"], exclude_batch=b1_key
    )
    batch1 = spark.createDataFrame(rows, DOC_SCHEMA)
    scores = {
        r.doc_id: r.score_q
        for r in stupid_backoff_scores(batch1, tri, bi, uni, n).collect()
    }
    assert scores[999] == 0
    assert all(scores[100 + i] >= 1 * 10 for i in range(5))
    stream_scores = {r.doc_id: r.score_q for r in judged.collect()}
    assert {k: v for k, v in scores.items() if k != 999} == stream_scores

    # metrics: batch 0 had no model, batch 1 did and rejected one doc
    m = {r.batch_id: r for r in spark.read.parquet(d["metrics"]).collect()}
    assert len(m) == 2
    boot = m[min(m)]
    live = m[max(m)]
    assert not boot.model_available and boot.n_rejected == 0
    assert live.model_available and live.n_rejected == 1
    assert live.n_scored_docs == 6


def test_stream_lm_gate_reserved_columns_rejected(spark, tmp_path):
    import pytest

    from curw_wrf_data_pusher_spark.streaming.quality_monitor import (
        stream_lm_gate,
    )

    d = _lm_dirs(tmp_path)
    with pytest.raises(ValueError, match="reserved gate columns"):
        stream_lm_gate(
            spark, d["incoming"], d["store"], d["clean"], d["quarantine"],
            d["metrics"], d["ckpt"], "doc_id long, text string, score_q long",
        )


def test_stream_lm_gate_within_batch_dedup_and_run_scoped_keys(
    spark, tmp_path
):
    from curw_wrf_data_pusher_spark.streaming.quality_monitor import (
        stream_lm_gate,
    )

    d = _lm_dirs(tmp_path)
    text = "alpha beta gamma delta epsilon zeta eta theta"
    # the same doc_id arrives twice in one micro-batch (upstream
    # redelivery) -> exactly one survives, counted once in the store
    _drop_docs(spark, d["incoming"], [(1, text), (1, text), (2, text)])
    q = stream_lm_gate(
        spark, d["incoming"], d["store"], d["clean"], d["quarantine"],
        d["metrics"], d["ckpt"], DOC_SCHEMA,
    )
    q.awaitTermination(120)

    clean = spark.read.parquet(d["clean"])
    assert clean.count() == 2
    assert clean.filter(F.col("doc_id") == 1).count() == 1
    store = spark.read.parquet(d["store"])
    # unigram total == tokens of TWO docs, not three
    n_uni = store.filter(F.col("n") == 1).agg(F.sum("c")).collect()[0][0]
    assert n_uni == 2 * len(text.split(" "))
    run1_batches = {r.batch for r in store.select("batch").distinct().collect()}
    assert len(run1_batches) == 1

    # restart over the SAME store with a FRESH checkpoint: streaming
    # batch ids restart at 0, but the run-scoped key must NOT collide
    # with (or overwrite / mis-exclude) the first run's partition
    _drop_docs(spark, d["incoming"] + "2", [(10, text)])
    os.makedirs(d["ckpt"] + "2", exist_ok=True)
    q = stream_lm_gate(
        spark, d["incoming"] + "2", d["store"], d["clean"] + "2",
        d["quarantine"] + "2", d["metrics"] + "2", d["ckpt"] + "2",
        DOC_SCHEMA,
    )
    q.awaitTermination(120)

    store2 = spark.read.parquet(d["store"])
    batches2 = {r.batch for r in store2.select("batch").distinct().collect()}
    assert run1_batches < batches2 and len(batches2) == 2
    # first run's counts intact: total unigram mass grew by doc 10
    n_uni2 = store2.filter(F.col("n") == 1).agg(F.sum("c")).collect()[0][0]
    assert n_uni2 == n_uni + len(text.split(" "))
    # the restarted run scored against the existing model: doc 10 is
    # the same fluent text, so it was judged (model existed) and passed
    clean2 = spark.read.parquet(d["clean"] + "2")
    assert clean2.count() == 1
    assert clean2.collect()[0].score_q is not None


def test_stream_lm_gate_deterministic_duplicate_representative(
    spark, tmp_path
):
    """Conflicting rows under ONE doc_id in a micro-batch collapse to
    the struct-max representative — deterministic, so a replay that
    re-delivers the same conflicting pair keeps the same row (an
    arbitrary dropDuplicates pick could route/store differently)."""
    from curw_wrf_data_pusher_spark.streaming.quality_monitor import (
        stream_lm_gate,
    )

    d = _lm_dirs(tmp_path)
    lo = "aaa bbb ccc ddd eee"
    hi = "zzz yyy xxx www vvv"  # struct-max over (text,) keeps this
    _drop_docs(spark, d["incoming"], [(1, lo), (1, hi)])
    q = stream_lm_gate(
        spark, d["incoming"], d["store"], d["clean"], d["quarantine"],
        d["metrics"], d["ckpt"], DOC_SCHEMA,
    )
    q.awaitTermination(120)
    clean = spark.read.parquet(d["clean"]).collect()
    assert len(clean) == 1
    assert clean[0].text == hi
    # the store counted ONLY the kept representative's tokens
    n_uni = (
        spark.read.parquet(d["store"])
        .filter(F.col("n") == 1).agg(F.sum("c")).collect()[0][0]
    )
    assert n_uni == len(hi.split(" "))


def test_stream_lm_gate_restart_does_not_overwrite_outputs(
    spark, tmp_path
):
    """Fresh checkpoint over the SAME output tree: streaming batch
    ids restart at 0, but the run-scoped output keys must keep the
    first run's batch directories intact (previously batch-id-keyed
    dirs were silently overwritten while the run-scoped store kept
    both runs' partials — corpus and LM diverged)."""
    from curw_wrf_data_pusher_spark.streaming.quality_monitor import (
        stream_lm_gate,
    )

    d = _lm_dirs(tmp_path)
    text = "alpha beta gamma delta epsilon zeta"
    _drop_docs(spark, d["incoming"], [(1, text), (2, text)])
    q = stream_lm_gate(
        spark, d["incoming"], d["store"], d["clean"], d["quarantine"],
        d["metrics"], d["ckpt"], DOC_SCHEMA,
    )
    q.awaitTermination(120)
    assert spark.read.parquet(d["clean"]).count() == 2
    assert len(spark.read.parquet(d["metrics"]).collect()) == 1

    # second run: same clean/quarantine/metrics/store dirs, fresh
    # checkpoint and a fresh incoming feed -> batch id restarts at 0
    _drop_docs(spark, d["incoming"] + "2", [(10, text)])
    q = stream_lm_gate(
        spark, d["incoming"] + "2", d["store"], d["clean"],
        d["quarantine"], d["metrics"], d["ckpt"] + "2", DOC_SCHEMA,
    )
    q.awaitTermination(120)

    clean = spark.read.parquet(d["clean"])
    assert clean.count() == 3  # run 1's two docs survived the restart
    assert {r.doc_id for r in clean.collect()} == {1, 2, 10}
    # one metrics row PER RUN-BATCH, not one overwritten batch-0 row
    m = spark.read.parquet(d["metrics"]).collect()
    assert len(m) == 2
    # output partitions and store partitions share the run-scoped key
    store_batches = {
        r.batch for r in spark.read.parquet(d["store"])
        .select("batch").distinct().collect()
    }
    out_batches = {r.batch for r in clean.select("batch").distinct().collect()}
    assert out_batches == store_batches


def test_stream_lm_gate_rejects_batch_column(spark, tmp_path):
    import pytest

    from curw_wrf_data_pusher_spark.streaming.quality_monitor import (
        stream_lm_gate,
    )

    d = _lm_dirs(tmp_path)
    with pytest.raises(ValueError, match="reserved gate columns"):
        stream_lm_gate(
            spark, d["incoming"], d["store"], d["clean"], d["quarantine"],
            d["metrics"], d["ckpt"], "doc_id long, text string, batch string",
        )


def test_stream_gauge_qc_bucketed_store_equals_per_series(spark, tmp_path):
    """store_buckets (the round-13 100x-probe layout: per-series
    partition dirs hit the metadata wall at 10k series) must produce
    byte-identical flags to the per-series layout — same arrivals,
    same retraction behavior, the store merely partitioned on
    pmod(xxhash64(hash_id), N)."""
    rows1 = [("g1", _ts(i), 5.0) for i in range(4)] + [
        ("g2", _ts(i), float(i)) for i in range(4)
    ]
    rows2 = [("g2", _ts(4), 80.0), ("g1", _ts(1), 9.0), ("g3", _ts(0), 1.0)]

    d1 = {n: str(tmp_path / ("ps_" + n))
          for n in ("incoming", "store", "qc", "ckpt")}
    os.makedirs(d1["incoming"])
    d2 = {n: str(tmp_path / ("bk_" + n))
          for n in ("incoming", "store", "qc", "ckpt")}
    os.makedirs(d2["incoming"])
    for d, kw in ((d1, {}), (d2, {"store_buckets": 4})):
        _gauge_drop(spark, d["incoming"], rows1)
        _run_qc(spark, d, **kw)
        _gauge_drop(spark, d["incoming"], rows2)  # incl. g1 correction
        _run_qc(spark, d, **kw)
    cols = ["hash_id", "time", "value", "flatline_flag", "spike_flag"]
    per_series = sorted(map(tuple, spark.read.parquet(
        d1["qc"]).select(*cols).collect()))
    bucketed = sorted(map(tuple, spark.read.parquet(
        d2["qc"]).select(*cols).collect()))
    # 10 distinct keys: 8 from batch 1, +g2@ts4 +g3@ts0 (the g1
    # correction REPLACES its key)
    assert per_series == bucketed and len(bucketed) == 10
    # the bucketed store wrote bucket dirs, not per-series dirs
    bucket_dirs = [
        p for p in os.listdir(d2["store"]) if p.startswith("bucket=")
    ]
    assert bucket_dirs and len(bucket_dirs) <= 4
    # the g1 retraction really happened in the bucketed layout too:
    # the correction at _ts(1) split the flatline run below min_run
    g1 = {r.time: r.flatline_flag for r in spark.read.parquet(d2["qc"])
          .filter(F.col("hash_id") == "g1").collect()}
    assert not any(g1.values())


def test_quality_monitor_run_scoped_outputs(spark, tmp_path):
    """Round-13 advice (medium): a restarted run with a FRESH
    checkpoint restarts batch ids at 0 — bare batch-id output keys
    let it silently overwrite the prior run's batch-0 clean/
    quarantine/metrics dirs.  Run-scoped keys (digest of the
    checkpoint path) keep both runs' outputs."""
    d = _dirs(tmp_path)
    ref = _reference(spark)

    _drop(spark, d["incoming"], [(i, float(i % 100)) for i in range(200)])
    q = stream_quality_monitor(
        spark, d["incoming"], ref, "v", d["clean"], d["quarantine"],
        d["metrics"], d["ckpt"], SCHEMA, max_tvd=0.3,
    )
    q.awaitTermination(120)
    assert spark.read.parquet(d["clean"]).count() == 200

    # second run: NEW checkpoint dir, new data, batch ids restart at 0
    d2_incoming = str(tmp_path / "incoming2")
    os.makedirs(d2_incoming)
    _drop(spark, d2_incoming,
          [(1000 + i, float(i % 100)) for i in range(300)])
    q = stream_quality_monitor(
        spark, d2_incoming, ref, "v", d["clean"], d["quarantine"],
        d["metrics"], str(tmp_path / "ckpt2"), SCHEMA, max_tvd=0.3,
    )
    q.awaitTermination(120)

    # BOTH runs' batch-0 outputs survive side by side
    clean = spark.read.parquet(d["clean"])
    assert clean.count() == 500
    assert clean.select("batch").distinct().count() == 2
    m = spark.read.parquet(d["metrics"]).collect()
    assert len(m) == 2 and all(r.batch_id == 0 for r in m)


def test_quality_monitor_reserved_batch_column(spark, tmp_path):
    import pytest

    d = _dirs(tmp_path)
    with pytest.raises(ValueError, match="reserved column 'batch'"):
        stream_quality_monitor(
            spark, d["incoming"], _reference(spark), "v", d["clean"],
            d["quarantine"], d["metrics"], d["ckpt"],
            "id long, v double, batch string",
        )


def test_stream_lm_gate_unorderable_column_rejected(spark, tmp_path):
    """Round-13 advice (low): the struct-max within-batch dedup
    orders every non-id column; a MapType column would die per-batch
    inside the stream — fail fast at construction instead."""
    import pytest

    from curw_wrf_data_pusher_spark.streaming.quality_monitor import (
        stream_lm_gate,
    )

    d = _lm_dirs(tmp_path)
    with pytest.raises(ValueError, match="unorderable"):
        stream_lm_gate(
            spark, d["incoming"], d["store"], d["clean"], d["quarantine"],
            d["metrics"], d["ckpt"],
            "doc_id long, text string, tags map<string,string>",
        )
    # nested maps are caught too
    with pytest.raises(ValueError, match="unorderable"):
        stream_lm_gate(
            spark, d["incoming"], d["store"], d["clean"], d["quarantine"],
            d["metrics"], d["ckpt"],
            "doc_id long, text string, "
            "meta struct<inner: map<string, long>>",
        )
    # a map on the ID column itself is irrelevant to the dedup order
    # and arrays/structs without maps stay accepted
    stream_lm_gate(
        spark, d["incoming"], d["store"], d["clean"], d["quarantine"],
        d["metrics"], d["ckpt"],
        "doc_id long, text string, spans array<struct<a: long, b: long>>",
    ).stop()
