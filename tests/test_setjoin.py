"""Prefix-filtered exact set-similarity join (llmops/setjoin.py).

The load-bearing claim is recall 1.0: the prefix-filtered plan must
equal the quadratic all-pairs baseline exactly, at every threshold.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.llmops.dedup import ngram_jaccard_pairs
from curw_wrf_data_pusher_spark.llmops.setjoin import (
    prefix_candidates,
    setsim_dropped_tokens,
    setsim_join,
    token_sets,
)


def _tok(spark, rows):
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    return token_sets(docs)


@pytest.fixture(scope="module")
def corpus_tokens(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),       # J=2/3 with 1
        (3, "alpha beta gamma delta epsilon"),    # J=1 with 1
        (4, "omega psi chi phi upsilon"),
        (5, "omega psi chi phi tau"),             # J=2/3 with 4
        (6, "alpha omega"),                       # small set
        (7, "unique solitary tokens only here"),
        (8, "beta gamma delta"),                  # subset of 1: J=3/7
    ]
    return _tok(spark, rows).cache()


@pytest.mark.parametrize("t", [0.3, 0.5, 0.66, 0.9])
def test_setsim_equals_quadratic_baseline(spark, corpus_tokens, t):
    got = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in setsim_join(corpus_tokens, threshold=t).collect()
    }
    base = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in ngram_jaccard_pairs(
            corpus_tokens.withColumnRenamed("token", "shingle"),
            min_jaccard=t,
        ).collect()
    }
    assert got == base
    if t <= 0.5:
        assert got, "baseline should find pairs at loose thresholds"


def test_prefix_candidates_are_superset_of_matches(spark, corpus_tokens):
    cand = {
        (r.id_a, r.id_b)
        for r in prefix_candidates(corpus_tokens, threshold=0.5).collect()
    }
    matches = {
        (r.id_a, r.id_b)
        for r in setsim_join(corpus_tokens, threshold=0.5).collect()
    }
    assert matches <= cand
    # ...and a strict subset of all pairs: the filter must prune
    n_docs = corpus_tokens.select("doc_id").distinct().count()
    assert len(cand) < n_docs * (n_docs - 1) / 2


def test_setsim_property_random_bags(spark):
    # deterministic pseudo-random corpus: md5-derived token bags
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat_ws(":", F.lit(str(i)), F.col("id"))),
                                1, 4,
                            ),
                            16, 10,
                        ).cast("long") % 30
                    ).cast("string"),
                )
                for i in range(12)
            ],
        ).alias("text"),
    )
    tok = token_sets(docs)
    for t in (0.4, 0.7):
        got = {
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in setsim_join(tok, threshold=t).collect()
        }
        base = {
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in ngram_jaccard_pairs(
                tok.withColumnRenamed("token", "shingle"), min_jaccard=t
            ).collect()
        }
        assert got == base


def test_hot_token_cap_and_accounting(spark):
    # template corpus: every doc shares the same rare-ish tokens, so
    # prefix groups get hot
    rows = [(i, "boiler plate header common x%d" % (i % 2)) for i in range(30)]
    tok = _tok(spark, rows)
    uncapped = setsim_join(tok, threshold=0.5)
    capped = setsim_join(tok, threshold=0.5, max_token_group=5)
    dropped = setsim_dropped_tokens(
        tok, threshold=0.5, max_token_group=5
    )
    assert capped.count() < uncapped.count()
    d = dropped.collect()
    assert d and all(r.n_members > 5 for r in d)
    # cap=None keeps exactness and reports zero drops
    assert setsim_dropped_tokens(tok, threshold=0.5).count() == 0


def test_setsim_plan_has_no_nested_loop_join(spark, corpus_tokens):
    plan = (
        setsim_join(corpus_tokens, threshold=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_setsim_between_equals_quadratic_cross_baseline(spark):
    rows_a = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "omega psi chi phi upsilon"),
        (3, "one two three four"),
    ]
    rows_b = [
        (1, "alpha beta gamma delta zeta"),     # id collides with A's 1
        (9, "omega psi chi phi upsilon"),       # J=1 with A's 2
        (10, "five six seven eight"),
    ]
    from curw_wrf_data_pusher_spark.llmops.setjoin import (
        setsim_join_between,
    )

    ta, tb = _tok(spark, rows_a), _tok(spark, rows_b)
    for t in (0.3, 0.6, 0.95):
        got = {
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in setsim_join_between(ta, tb, threshold=t).collect()
        }
        # quadratic cross baseline
        inter = (
            ta.withColumnRenamed("doc_id", "id_a")
            .join(
                tb.withColumnRenamed("doc_id", "id_b")
                .withColumnRenamed("token", "tb"),
                F.col("token") == F.col("tb"),
            )
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("i"))
        )
        sza = ta.groupBy("doc_id").count().withColumnRenamed("count", "na")
        szb = tb.groupBy("doc_id").count().withColumnRenamed("count", "nb")
        base = {
            (r.id_a, r.id_b, round(r.j, 9))
            for r in inter.join(sza, inter.id_a == sza.doc_id)
            .join(szb, inter.id_b == szb.doc_id)
            .select(
                "id_a", "id_b",
                (F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))).alias("j"),
            )
            .filter(F.col("j") >= t)
            .collect()
        }
        assert got == base, f"threshold {t}"
