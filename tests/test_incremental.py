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


# --- near-dup signature store ------------------------------------------

from curw_wrf_data_pusher_spark.llmops.incremental import (  # noqa: E402
    neardup_batch_drops,
    neardup_filter_batch,
    read_neardup_store,
    update_neardup_store,
)

_TEMPLATE = ("the quick brown fox jumps over the lazy dog near the old "
             "river bank every single morning before sunrise")
_NOVEL = ("completely different content about distributed query engines "
          "and columnar storage formats with vectorized execution")


def _mutate(text, i):
    words = text.split()
    words[i] = f"tok{i}"
    return " ".join(words)


def test_neardup_store_lifecycle(spark, tmp_path):
    store = str(tmp_path / "ndstore")

    # first ingest against an empty store: in-batch near-dups collapse
    b1 = _batch(spark, [(1, _TEMPLATE), (2, _mutate(_TEMPLATE, 3)),
                        (3, _NOVEL)])
    s1 = neardup_filter_batch(b1, read_neardup_store(spark, store))
    ids1 = sorted(r.doc_id for r in s1.collect())
    assert 1 in ids1 and 3 in ids1          # earliest template + novel
    assert 2 not in ids1                    # in-batch near-dup of 1
    update_neardup_store(spark, s1, store, batch="b1")
    assert read_neardup_store(spark, store).count() == len(ids1)

    # second batch: near-copy of stored template dies with reason
    # 'store'; fresh doc survives; sub-n-token doc trivially survives
    b2 = _batch(spark, [(10, _mutate(_TEMPLATE, 7)),
                        (11, "short text"),
                        (12, "an entirely new subject covering spectral "
                             "graph partitioning and network flows")])
    drops = neardup_batch_drops(b2, read_neardup_store(spark, store))
    d = {(r.doc_id, r.reason, r.matched_id) for r in drops.collect()}
    assert (10, "store", 1) in d
    assert all(doc != 11 and doc != 12 for doc, _, _ in d)

    s2 = neardup_filter_batch(b2, read_neardup_store(spark, store))
    ids2 = sorted(r.doc_id for r in s2.collect())
    assert ids2 == [11, 12]
    # signature columns ride along; the sub-n-token doc's are NULL
    rows = {r.doc_id: r.mh_0 for r in s2.collect()}
    assert rows[11] is None and rows[12] is not None

    # store update skips the signature-less survivor
    update_neardup_store(spark, s2, store, batch="b2")
    before = read_neardup_store(spark, store).count()
    assert read_neardup_store(spark, store).filter(
        "batch = 'b2'"
    ).count() == 1

    # replay of b2 is idempotent (dynamic overwrite of its partition)
    update_neardup_store(spark, s2, store, batch="b2")
    assert read_neardup_store(spark, store).count() == before


def test_neardup_filter_and_drops_are_consistent(spark, tmp_path):
    store_sigs = read_neardup_store(spark, str(tmp_path / "none"))
    batch = _batch(spark, [
        (i, _mutate(_TEMPLATE, i % 5)) for i in range(6)
    ] + [(100, _NOVEL)])
    survivors = {r.doc_id for r in
                 neardup_filter_batch(batch, store_sigs).collect()}
    dropped = {r.doc_id for r in
               neardup_batch_drops(batch, store_sigs).collect()}
    assert survivors & dropped == set()
    assert survivors | dropped == {0, 1, 2, 3, 4, 5, 100}
    assert 0 in survivors and 100 in survivors  # earliest + novel


def test_neardup_hot_bucket_cap(spark, tmp_path):
    # store = 30 near-identical template docs (a hot bucket family) +
    # one distinct doc; probing with a cap skips the template family
    store_docs = _batch(spark, [
        (i, _mutate(_TEMPLATE, i % 3)) for i in range(30)
    ] + [(500, _NOVEL)])
    from curw_wrf_data_pusher_spark.llmops.dedup import (
        minhash_signatures_from_text,
    )
    from curw_wrf_data_pusher_spark.llmops.incremental import (
        neardup_hot_store_buckets,
    )
    store_sigs = minhash_signatures_from_text(store_docs)

    batch = _batch(spark, [(1000, _mutate(_TEMPLATE, 1)),
                           (1001, _mutate(_NOVEL, 2))])
    uncapped = neardup_batch_drops(batch, store_sigs, in_batch=False)
    capped = neardup_batch_drops(
        batch, store_sigs, in_batch=False, max_bucket_size=5
    )
    un = {(r.doc_id, r.matched_id) for r in uncapped.collect()}
    cp = {(r.doc_id, r.matched_id) for r in capped.collect()}
    assert cp <= un                      # cap only removes matches
    # the template match set shrinks; the novel match (small bucket,
    # cluster of 1) survives the cap
    assert any(d == 1001 for d, _ in cp)
    assert len([1 for d, _ in un if d == 1000]) > \
        len([1 for d, _ in cp if d == 1000])

    hot = neardup_hot_store_buckets(store_sigs, max_bucket_size=5)
    assert hot.count() > 0
    assert hot.agg({"n_members": "max"}).collect()[0][0] >= 6
    # no cap → empty accounting frame
    assert neardup_hot_store_buckets(store_sigs).count() == 0


def test_neardup_store_compaction(spark, tmp_path):
    from curw_wrf_data_pusher_spark.llmops.incremental import (
        compact_neardup_store,
    )

    store = str(tmp_path / "nd3")
    empty = read_neardup_store(spark, str(tmp_path / "none2"))
    b1 = _batch(spark, [(1, _TEMPLATE), (2, _NOVEL)])
    update_neardup_store(
        spark, neardup_filter_batch(b1, empty), store, batch="b1"
    )
    b2 = _batch(spark, [(3, _mutate(_NOVEL, 1) + " extra tail words")])
    update_neardup_store(
        spark,
        neardup_filter_batch(b2, read_neardup_store(spark, store)),
        store, batch="b2",
    )
    before = sorted(
        map(tuple, read_neardup_store(spark, store).drop("batch").collect())
    )
    cpath = str(tmp_path / "nd3c")
    compact_neardup_store(spark, store, cpath)
    after_df = read_neardup_store(spark, cpath)
    assert {r.batch for r in after_df.collect()} == {"compacted"}
    assert sorted(map(tuple, after_df.drop("batch").collect())) == before
    # probes against the compacted store behave identically
    probe = _batch(spark, [(10, _TEMPLATE)])
    d1 = {(r.doc_id, r.matched_id) for r in
          neardup_batch_drops(probe, read_neardup_store(spark, store))
          .collect()}
    d2 = {(r.doc_id, r.matched_id) for r in
          neardup_batch_drops(probe, after_df).collect()}
    assert d1 == d2 and (10, 1) in d2


def test_missing_contamination_store_fails_loudly(spark, tmp_path):
    """Unlike the dedup stores (missing = first ingest), a missing
    contamination store is always misconfiguration — silently
    serving an empty store would wave contaminated docs through."""
    import pytest

    from curw_wrf_data_pusher_spark.llmops.incremental import (
        read_contamination_store,
    )

    with pytest.raises(ValueError, match="build_contamination_store"):
        read_contamination_store(
            spark, str(tmp_path / "nope")
        ).collect()
