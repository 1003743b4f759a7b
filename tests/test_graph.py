"""PageRank power iteration (operators/graph.py) vs a numpy mirror."""

from __future__ import annotations

import numpy as np
import pytest

from curw_wrf_data_pusher_spark.operators.graph import (
    canonical_by_centrality,
    pagerank,
)


def _numpy_pagerank(edges, n_ids, damping=0.85, iters=25, directed=False):
    ids = sorted(n_ids)
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    out = {i: [] for i in range(n)}
    for a, b in edges:
        out[idx[a]].append(idx[b])
        if not directed:
            out[idx[b]].append(idx[a])
    # dedupe parallel edges like the operator does
    out = {i: sorted(set(v)) for i, v in out.items()}
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - damping) / n)
        dangling = sum(r[i] for i in range(n) if not out[i])
        nxt += damping * dangling / n
        for i, dsts in out.items():
            if dsts:
                share = damping * r[i] / len(dsts)
                for d in dsts:
                    nxt[d] += share
        r = nxt
    return {ids[i]: r[i] for i in range(n)}


def test_pagerank_matches_numpy_mirror_undirected(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 6)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    # tol=0 so the operator runs exactly as many iterations as the
    # mirror (the default tol early-exit leaves ~1e-7 residual)
    got = {
        r.node: r.rank
        for r in pagerank(df, max_iter=25, tol=0.0).collect()
    }
    want = _numpy_pagerank(edges, {1, 2, 3, 4, 5, 6})
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-8)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # hub 3 outranks leaf 4
    assert got[3] > got[4]


def test_pagerank_directed_with_dangling(spark):
    edges = [(1, 2), (2, 3), (1, 3)]  # 3 is dangling
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.rank
        for r in pagerank(df, directed=True, max_iter=30, tol=0.0).collect()
    }
    want = _numpy_pagerank(edges, {1, 2, 3}, directed=True, iters=30)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-8)
    assert got[3] > got[2] > got[1]
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_converges_early(spark):
    # star graph converges fast; tol exit must not change the answer
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    a = {r.node: r.rank for r in pagerank(df, max_iter=12, tol=0.0).collect()}
    b = {r.node: r.rank for r in pagerank(df, max_iter=12, tol=1e-10).collect()}
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-8)


def test_canonical_by_centrality_picks_hub(spark):
    # component A: 1-2, 1-3, 1-4 (1 is the hub); component B: 8-9
    edges = [(1, 2), (1, 3), (1, 4), (8, 9)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r.doc_id: r for r in canonical_by_centrality(df).collect()}
    assert {out[i].cluster_id for i in (1, 2, 3, 4)} == {1}
    assert all(out[i].canonical_id == 1 for i in (1, 2, 3, 4))
    assert out[1].is_canonical and not out[2].is_canonical
    # the symmetric 8-9 component ties on rank → smaller id wins
    assert out[8].canonical_id == 8 and out[9].canonical_id == 8
