"""Persisted IVF index tests: build→search equality with the
on-the-fly ivf_topk (same deterministic codebook), partition pruning
of unprobed lists, codebook roundtrip, and the refined-centroid path."""

from __future__ import annotations

from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.llmops.annindex import (
    build_ivf_index,
    load_ivf_centroids,
    search_ivf_index,
)
from curw_wrf_data_pusher_spark.llmops.simsearch import ivf_topk
from curw_wrf_data_pusher_spark.sources.lake import load_table
from tests.test_plans_quality import plan_of


def test_index_search_matches_ivf_topk(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "ivf")
    built = build_ivf_index(emb, path, n_centroids=8)
    assert load_ivf_centroids(spark, path) == built
    fresh = sorted(map(tuple, ivf_topk(
        emb, queries, k=5, n_centroids=8, n_probe=3).collect()))
    indexed = sorted(map(tuple, search_ivf_index(
        spark, path, queries, k=5, n_probe=3).collect()))
    assert indexed == fresh and len(indexed) > 0


def test_search_prunes_unprobed_partitions(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=8)
    one_q = emb.filter(F.col("vec_id") == 0)
    out = search_ivf_index(spark, path, one_q, k=3, n_probe=1)
    plan = plan_of(out)
    # the lists scan carries a partition filter on centroid, and the
    # pruned read touches exactly the probed list's files
    import re

    assert re.search(r"PartitionFilters: \[.*centroid", plan), plan
    # n_probe=1 → the filter pins exactly one centroid value, so the
    # scan reads 1 of the 8 list directories
    assert re.search(r"PartitionFilters: \[[^\]]*centroid#\d+ = \d+",
                     plan), plan
    import os

    dirs = [d for d in os.listdir(f"{path}/lists")
            if d.startswith("centroid=")]
    assert len(dirs) == 8


def test_index_with_refined_centroids(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    path = str(tmp_path / "ivf_r")
    build_ivf_index(emb, path, n_centroids=4, refine_iterations=1)
    fresh = sorted(map(tuple, ivf_topk(
        emb, queries, k=3, n_centroids=4, n_probe=2,
        refine_iterations=1).collect()))
    indexed = sorted(map(tuple, search_ivf_index(
        spark, path, queries, k=3, n_probe=2).collect()))
    assert indexed == fresh and len(indexed) > 0


def test_probe_all_equals_bruteforce_via_index(spark, sf_dir, tmp_path):
    from curw_wrf_data_pusher_spark.llmops.simsearch import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 200
    )
    queries = emb.filter(F.col("vec_id") < 3)
    path = str(tmp_path / "ivf_all")
    build_ivf_index(emb, path, n_centroids=4)
    exact = sorted(map(tuple, cosine_topk(emb, queries, k=5).collect()))
    indexed = sorted(map(tuple, search_ivf_index(
        spark, path, queries, k=5, n_probe=4).collect()))
    assert indexed == exact


def test_pq_index_search_matches_pq_topk(spark, sf_dir, tmp_path):
    """build→persist→search must equal the on-the-fly pq_topk with the
    same codebooks (shared adc_topk_over_codes stage), and the
    persisted codebooks must round-trip exactly."""
    from curw_wrf_data_pusher_spark.llmops.annindex import (
        build_pq_index,
        load_pq_codebooks,
        search_pq_index,
    )
    from curw_wrf_data_pusher_spark.llmops.pq import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "pq")
    books = build_pq_index(emb, path, m=16, k_sub=32)
    assert load_pq_codebooks(spark, path) == books
    fresh = sorted(map(tuple, pq_topk(
        emb, queries, m=16, k_sub=32, k=5, books=books).collect()))
    indexed = sorted(map(tuple, search_pq_index(
        spark, path, queries, k=5).collect()))
    assert indexed == fresh and len(indexed) == 25
    # the serving scan reads the m-int codes table, not embeddings:
    # codes parquet carries id + 16 code columns and no vector column
    import pyarrow.parquet as pa
    import glob

    f = glob.glob(f"{path}/codes/*.parquet")[0]
    names = pa.read_schema(f).names
    assert "embedding" not in names and len(names) == 17


def test_pq_index_with_lloyd_refinement(spark, sf_dir, tmp_path):
    from curw_wrf_data_pusher_spark.llmops.annindex import (
        build_pq_index,
        search_pq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    path = str(tmp_path / "pqr")
    build_pq_index(emb, path, m=16, k_sub=32, refine_iterations=2)
    out = search_pq_index(spark, path, queries, k=5).collect()
    assert len(out) == 15
    assert {r.q_id for r in out} == {0, 1, 2}


def test_filtered_pq_index_serving_pushes_predicate(
    spark, sf_dir, tmp_path
):
    """Filtered serving: metadata persisted with the codes via
    extra_cols, a codes_filter at search time (a) equals ADC ranking
    over only the matching rows and (b) reaches the codes parquet scan
    as a pushed filter."""
    from curw_wrf_data_pusher_spark.llmops.annindex import (
        build_pq_index,
        search_pq_index,
    )
    from curw_wrf_data_pusher_spark.llmops.pq import (
        adc_topk_over_codes,
        pq_encode_arrow,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "pqf")
    books = build_pq_index(emb, path, m=16, k_sub=32,
                           extra_cols=["label"])

    filtered = search_pq_index(
        spark, path, queries, k=5, codes_filter=F.col("label") == 1
    )
    # semantic twin: ADC over the pre-filtered freshly-encoded corpus
    want = sorted(map(tuple, adc_topk_over_codes(
        pq_encode_arrow(emb.filter("label = 1"), books),
        queries, books, k=5,
    ).collect()))
    got = sorted(map(tuple, filtered.collect()))
    assert got == want and len(got) == 25

    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(label), EqualTo(label,1)]" in plan \
        or "EqualTo(label,1)" in plan, plan


def test_filtered_ivf_probe_all_equals_filtered_exact(spark, sf_dir):
    from curw_wrf_data_pusher_spark.llmops.simsearch import (
        cosine_topk,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = sorted(map(tuple, cosine_topk(
        emb, queries, k=5, corpus_filter="label = 2").collect()))
    probe_all = sorted(map(tuple, ivf_topk(
        emb, queries, k=5, n_centroids=8, n_probe=8,
        corpus_filter="label = 2").collect()))
    assert exact == probe_all and len(exact) == 25
    # fewer probes: still filter-respecting, ranks stay 1..k dense
    few = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=2,
                   corpus_filter="label = 2")
    rows = few.collect()
    assert all(r.rank <= 5 for r in rows)
    ok = {r.vec_id for r in emb.filter("label = 2")
          .select("vec_id").collect()}
    assert all(r.n_id in ok for r in rows)
