"""SemDeDup-style semantic dedup tests: single-cluster equivalence to
the all-pairs exists-earlier rule, template-cluster resolution, the
hot-cell cap + accounting, determinism, and a no-cartesian plan gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.llmops.simsearch import (
    neardup_pairs,
    semantic_dedup,
    semantic_dropped_clusters,
)
from curw_wrf_data_pusher_spark.sources.lake import load_table
from tests.test_plans_quality import plan_of


def test_single_cluster_matches_allpairs_rule(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, n_clusters=1, threshold=0.35).collect()
    pairs = neardup_pairs(emb, threshold=0.35).collect()
    expect_dropped = {r.id_b for r in pairs}
    got_dropped = {r.vec_id for r in out if not r.is_kept}
    assert got_dropped == expect_dropped
    assert all(r.cluster == 0 for r in out)
    assert len(out) == emb.count()


def _template_corpus(spark):
    base = [float((7 * d) % 13 - 6) for d in range(8)]
    other = [float((5 * d) % 11 - 5) for d in range(8)]
    rows = [(i, base) for i in range(10)] + [(100 + i, other) for i in range(3)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_template_cluster_keeps_anchor_only(spark):
    emb = _template_corpus(spark)
    out = {r.vec_id: r for r in
           semantic_dedup(emb, n_clusters=2, threshold=0.999).collect()}
    # identical vectors: the smallest id survives, the rest drop
    assert out[0].is_kept
    assert not any(out[i].is_kept for i in range(1, 10))
    assert out[100].is_kept
    assert not out[101].is_kept and not out[102].is_kept
    # identical vectors must share a cluster
    assert len({out[i].cluster for i in range(10)}) == 1


def test_max_cluster_size_cap_and_accounting(spark):
    emb = _template_corpus(spark)
    capped = semantic_dedup(
        emb, n_clusters=2, threshold=0.999, max_cluster_size=5
    ).collect()
    by_id = {r.vec_id: r for r in capped}
    # the 10-member template cell is excluded from comparison: all kept
    assert all(by_id[i].is_kept for i in range(10))
    # the 3-member cell still dedups
    assert by_id[100].is_kept and not by_id[101].is_kept
    dropped = semantic_dropped_clusters(
        emb, n_clusters=2, max_cluster_size=5
    ).collect()
    assert len(dropped) == 1 and dropped[0].n_members == 10
    # None cap reports nothing and keeps exact semantics
    assert semantic_dropped_clusters(emb, n_clusters=2).count() == 0


def test_semantic_dedup_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 100
    )
    a = sorted(map(tuple, semantic_dedup(emb, n_clusters=4,
                                         threshold=0.35).collect()))
    b = sorted(map(tuple, semantic_dedup(emb, n_clusters=4,
                                         threshold=0.35).collect()))
    assert a == b


def test_semantic_dedup_plan_has_no_cartesian(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    plan = plan_of(semantic_dedup(emb, n_clusters=4, threshold=0.35))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
