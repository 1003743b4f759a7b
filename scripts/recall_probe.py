#!/usr/bin/env python
"""PQ / PQ-Lloyd / OPQ recall at NON-NOISE scale (judge r11 task 6).

The round-10/11 recall notes (10 queries over 5k vectors) were
sampling noise — 0.28 for both pq-lloyd and OPQ.  This probe measures
recall@{1,5,10} against the EXACT squared-euclidean top-10 (ADC
approximates L2, so L2 is the right ground truth) over a corpus of
``RECALL_FACTOR`` × the sf0.1 embeddings (default 25× = 50k vectors,
sign-flip replicas preserving intra-replica geometry exactly — see
scale_probe.build_nx_embeddings) with ``RECALL_QUERIES`` (default
100) held-out query vectors.

Methods, identical serving plan (pq_topk ADC scan; only the codebook
provenance differs):
  pq        seed codebooks (deterministic corpus slices)
  pq-lloyd  + refine_codebooks (distributed Lloyd, N_LLOYD iters)
  opq       opq_train rotation + codebooks, rotated corpus/queries

Usage: python scripts/recall_probe.py      # prints one JSON line
       RECALL_FACTOR=100 RECALL_QUERIES=200 python scripts/recall_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

from curw_wrf_data_pusher_spark.session import get_spark  # noqa: E402

FACTOR = int(os.environ.get("RECALL_FACTOR", "25"))
N_Q = int(os.environ.get("RECALL_QUERIES", "100"))
M = int(os.environ.get("RECALL_M", "8"))
K_SUB = int(os.environ.get("RECALL_KSUB", "16"))
N_LLOYD = int(os.environ.get("RECALL_LLOYD", "4"))
OPQ_ITERS = int(os.environ.get("RECALL_OPQ_ITERS", "3"))
K = 10


def exact_topk(corpus, queries, k):
    """Ground truth: exact squared-L2 top-k per query (self excluded),
    one shuffle-free crossJoin scored by a JVM fold + per-query
    row_number."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    q = queries.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    c = corpus.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("nv")
    )
    d2 = F.aggregate(
        F.zip_with("qv", "nv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("q_id").orderBy("d2", "n_id")
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("d2", d2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank")
    )


def topk_sets(df, k):
    out: dict[int, set] = {}
    for r in df.collect():
        if r["rank"] <= k:
            out.setdefault(r["q_id"], set()).add(r["n_id"])
    return out


def recall_at(approx, exact, k):
    """(mean, stderr) of per-query recall — the stderr makes 'outside
    the noise floor' a checkable claim, not an adjective."""
    vals = [
        len({n for n in approx.get(q, set())} & e) / min(k, len(e))
        for q, e in exact.items()
    ]
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / max(n - 1, 1)
    return round(mean, 3), round((var / n) ** 0.5, 4)


def anisotropize(spark, emb):
    """x → R0 · diag(s) · x with a decaying spectrum s and a FIXED
    seeded rotation R0 mixing dimensions across subspace boundaries —
    the textbook OPQ regime (Ge et al. CVPR'13 §1: PQ's independence
    assumption breaks when variance is unevenly spread and correlated
    across subspaces; the learned rotation re-aligns it).  The base
    corpus is isotropic random, where NO rotation can help — this
    transform makes the rotation win measurable if it exists."""
    import numpy as np

    from curw_wrf_data_pusher_spark.llmops.opq import rotate_vectors

    dim = len(emb.select("embedding").first()[0])
    rng = np.random.default_rng(42)
    r0 = np.linalg.qr(rng.standard_normal((dim, dim)))[0]
    s = np.exp(-np.arange(dim) / 8.0)
    # rotate_vectors computes x @ A = Aᵀx, so applying M·x needs
    # A = Mᵀ; passing R0·diag(s) itself would apply diag(s)·R0ᵀ·x,
    # whose covariance is exactly diag(s²) — axis-aligned decay with
    # NO cross-subspace mixing, silently dropping the correlated
    # regime this transform exists to create
    a = (r0 * s[None, :]).T  # (R0 @ diag(s))ᵀ → applies R0·diag(s)·x
    return rotate_vectors(emb, a.tolist())


def main() -> None:
    from pyspark.sql import functions as F

    from curw_wrf_data_pusher_spark.llmops.opq import (
        opq_train,
        rotate_vectors,
    )
    from curw_wrf_data_pusher_spark.llmops.pq import (
        pq_codebooks,
        pq_topk,
        refine_codebooks,
    )
    from scale_probe import build_nx_embeddings

    spark = get_spark("recall-probe")
    work = os.path.join("/tmp/scale_probe", f"x{FACTOR}")
    os.makedirs(work, exist_ok=True)
    build_nx_embeddings(spark, FACTOR, work)
    emb = spark.read.parquet(os.path.join(work, "embeddings.parquet"))
    aniso = os.environ.get("RECALL_ANISO", "0") == "1"
    if aniso:
        emb = anisotropize(spark, emb)
        emb.persist()
    n_corpus = emb.count()
    # hold the queries out of the codebook/rotation training corpus so
    # recall is out-of-sample, but search the FULL corpus (standard
    # ANN-benchmark protocol searches the indexed set)
    queries = emb.filter(F.col("vec_id") < N_Q).persist()
    corpus = emb.persist()
    train = corpus.filter(F.col("vec_id") >= N_Q)

    result = {
        "n_corpus": n_corpus, "n_queries": N_Q, "m": M, "k_sub": K_SUB,
        "lloyd_iters": N_LLOYD, "opq_iters": OPQ_ITERS,
        "corpus_kind": "anisotropic" if aniso else "isotropic",
    }

    t0 = time.time()
    exact10 = exact_topk(corpus, queries, K).persist()
    exact_by_k = {
        k: topk_sets(exact10.filter(F.col("rank") <= k), k)
        for k in (1, 5, 10)
    }
    result["exact_s"] = round(time.time() - t0, 1)

    def measure(tag, books, rot=None):
        from pyspark.sql import Window

        t = time.time()
        cp, qp = corpus, queries
        if rot is not None:
            cp = rotate_vectors(corpus, rot)
            qp = rotate_vectors(queries, rot)
        # fetch K+1 and RE-RANK after removing the self-match: the
        # query's own row attains the minimum ADC (its code argmins
        # every distance table), so filtering self AFTER a K-cut
        # would structurally zero recall@1 and waste one slot at
        # every k — a measurement artifact, not a code-budget fact
        got = pq_topk(cp, qp, m=M, k_sub=K_SUB, k=K + 1, books=books)
        got = got.filter(F.col("n_id") != F.col("q_id"))
        w_rr = Window.partitionBy("q_id").orderBy("rank")
        got = (
            got.withColumn("rank", F.row_number().over(w_rr))
            .filter(F.col("rank") <= K)
        )
        full = topk_sets(got, K)
        for k in (1, 5, 10):
            sub = topk_sets(got.filter(F.col("rank") <= k), k)
            mean, se = recall_at(sub, exact_by_k[k], k)
            result[f"recall@{k}_{tag}"] = mean
            result[f"recall@{k}_{tag}_se"] = se
        result[f"serve_s_{tag}"] = round(time.time() - t, 1)
        return full

    seed_books = pq_codebooks(train, m=M, k_sub=K_SUB)
    measure("pq", seed_books)

    t0 = time.time()
    lloyd_books = refine_codebooks(train, seed_books, n_iters=N_LLOYD)
    result["lloyd_train_s"] = round(time.time() - t0, 1)
    measure("pq_lloyd", lloyd_books)

    t0 = time.time()
    rot, opq_books = opq_train(
        train, m=M, k_sub=K_SUB, n_iters=OPQ_ITERS, lloyd_iters=1
    )
    result["opq_train_s"] = round(time.time() - t0, 1)
    measure("opq", opq_books, rot=rot)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
