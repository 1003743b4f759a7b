"""Model-based quality filter: hashed-unigram Naive Bayes.

The closed-form fit means correctness is checkable end-to-end: the
oracle-parity test (tests/test_oracle_parity, llm_quality_classifier)
hash-pins weights+priors+scores against DuckDB; these tests cover the
LEARNING behavior (separates distributions), determinism under
repartition, the smoothing/default-weight path on unseen vocabulary,
and the deterministic logistic-acceptance mode.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.llmops.quality_model import (
    filter_by_quality,
    score_quality_nb,
    train_quality_nb,
)


def _corpus(spark):
    """Two clearly-separated unigram distributions + held-out docs."""
    hq = [(i, "clean prose with varied careful structure", True)
          for i in range(40)]
    lq = [(i + 100, "spam spam buy now buy spam now", False)
          for i in range(40)]
    return spark.createDataFrame(hq + lq, "doc_id long, text string, label boolean")


def test_classifier_separates_distributions(spark):
    train = _corpus(spark)
    model = train_quality_nb(train, n_buckets=256)
    held_out = spark.createDataFrame(
        [(1000, "careful varied prose structure"),
         (1001, "buy spam buy spam now now")],
        "doc_id long, text string",
    )
    scores = {r.doc_id: r.score
              for r in score_quality_nb(held_out, model).collect()}
    assert scores[1000] > 0 > scores[1001]


def test_scores_repartition_invariant(spark):
    train = _corpus(spark)
    model = train_quality_nb(train, n_buckets=256)
    docs = train.select("doc_id", "text")
    a = sorted((r.doc_id, round(r.score, 9))
               for r in score_quality_nb(docs, model).collect())
    b = sorted(
        (r.doc_id, round(r.score, 9))
        for r in score_quality_nb(docs.repartition(13), model).collect()
    )
    assert a == b


def test_unseen_vocabulary_falls_back_to_default_llr(spark):
    model = train_quality_nb(_corpus(spark), n_buckets=256)
    # a token whose bucket (very likely) never appeared in training:
    # score must be finite and equal prior + n_tokens * default_llr
    # when every bucket is unseen
    novel = spark.createDataFrame(
        [(1, "zzqx9 zzqx8 zzqx7")], "doc_id long, text string"
    )
    row = score_quality_nb(novel, model).first()
    expected = model.prior_llr + 3 * model.default_llr
    assert row.score == pytest.approx(expected, rel=1e-9)


def test_training_requires_both_classes(spark):
    one_class = spark.createDataFrame(
        [(1, "a b", True), (2, "c d", True)],
        "doc_id long, text string, label boolean",
    )
    with pytest.raises(ValueError, match="both classes"):
        train_quality_nb(one_class)


def test_filter_threshold_and_logistic_are_deterministic(spark):
    train = _corpus(spark)
    model = train_quality_nb(train, n_buckets=256)
    docs = train.select("doc_id", "text")
    hard = filter_by_quality(docs, model, threshold=0.0)
    kept = {r.doc_id for r in hard.select("doc_id").collect()}
    # the hard cut keeps exactly the high-quality half (clear margin)
    assert kept == {r.doc_id for r in train.filter("label").collect()}
    soft1 = {r.doc_id for r in filter_by_quality(
        docs, model, acceptance="logistic").select("doc_id").collect()}
    soft2 = {r.doc_id for r in filter_by_quality(
        docs.repartition(7), model, acceptance="logistic"
    ).select("doc_id").collect()}
    assert soft1 == soft2  # md5 coin flips, not RNG
    # logistic acceptance at a clear margin keeps (nearly) all positives
    pos = {r.doc_id for r in train.filter("label").collect()}
    assert len(soft1 & pos) >= int(0.9 * len(pos))


def test_score_plan_has_broadcast_join_and_no_cartesian(spark):
    train = _corpus(spark)
    model = train_quality_nb(train, n_buckets=256)
    plan = score_quality_nb(
        train.select("doc_id", "text"), model
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
