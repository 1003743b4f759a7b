"""Incremental dedup store: first ingest, cross-batch dedup, replay
idempotence, and history-partition preservation."""

from __future__ import annotations

import glob

from curw_wrf_data_pusher_spark.llmops.incremental import (
    dedup_against_store,
    read_dedup_store,
    update_dedup_store,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_dedup_lifecycle(spark, tmp_path):
    store = str(tmp_path / "store")

    # first ingest: no store yet — everything fresh, internal dup folds
    b1 = _batch(spark, [(1, "alpha"), (2, "beta"), (3, "alpha")])
    s1 = dedup_against_store(spark, b1, store)
    assert sorted(r.doc_id for r in s1.collect()) == [1, 2]
    update_dedup_store(spark, s1, store, batch="b1")
    assert read_dedup_store(spark, store).count() == 2

    # second batch: cross-batch repeats die, fresh survives
    b2 = _batch(spark, [(10, "alpha"), (11, "gamma"), (12, "beta"),
                        (13, "gamma")])
    s2 = dedup_against_store(spark, b2, store)
    assert sorted(r.doc_id for r in s2.collect()) == [11]
    update_dedup_store(spark, s2, store, batch="b2")

    # replaying batch 2 after its commit: nothing survives, and the
    # re-commit of an empty batch partition doesn't corrupt history
    s2r = dedup_against_store(spark, b2, store)
    assert s2r.count() == 0
    update_dedup_store(spark, s2r, store, batch="b2")
    hashes = {r.content_hash for r in
              read_dedup_store(spark, store).collect()}
    assert len(hashes) == 3  # alpha, beta, gamma

    # history partitions intact: b1's directory untouched by b2 commits
    assert glob.glob(f"{store}/batch=b1/*.parquet")
    per_batch = {
        r.batch: r["count"] for r in
        read_dedup_store(spark, store).groupBy("batch").count().collect()
    }
    assert per_batch["b1"] == 2


def test_update_store_without_hash_column(spark, tmp_path):
    store = str(tmp_path / "store2")
    b = _batch(spark, [(1, "x"), (2, "y")])
    # survivors frame lacking content_hash: update re-hashes text
    update_dedup_store(spark, b, store, batch="b1")
    assert read_dedup_store(spark, store).count() == 2
    s = dedup_against_store(spark, _batch(spark, [(3, "x"), (4, "z")]),
                            store)
    assert [r.doc_id for r in s.collect()] == [4]
