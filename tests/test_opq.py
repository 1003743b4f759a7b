"""OPQ (llmops/opq.py): the learned rotation is orthogonal, rotation
round-trips, and quantization error beats axis-aligned PQ at the same
Lloyd budget on correlated data — the Ge et al. CVPR'13 contract."""

from __future__ import annotations

import numpy as np
import pytest

from curw_wrf_data_pusher_spark.llmops.opq import (
    opq_topk,
    opq_train,
    rotate_vectors,
)
from curw_wrf_data_pusher_spark.llmops.pq import (
    _argmin_codes,
    pq_codebooks,
    refine_codebooks,
)


def _correlated_corpus(spark, n=300, d=16, seed=3):
    """Vectors with strong cross-dimension correlation — the case
    axis-aligned PQ handles worst and OPQ exists to fix."""
    rng = np.random.RandomState(seed)
    A = rng.randn(d, d)
    X = (rng.randn(n, d) @ A).astype(np.float32)
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return (
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ),
        X.astype(np.float64),
    )


def _qerr(Xr, books):
    m = len(books)
    d_sub = len(books[0][0])
    err = 0.0
    for s in range(m):
        c = np.asarray(books[s])
        sub = Xr[:, s * d_sub:(s + 1) * d_sub]
        codes = _argmin_codes(sub, c, 9)
        err += float(((sub - c[codes]) ** 2).sum())
    return err


def test_rotation_is_orthogonal_and_roundtrips(spark):
    emb, _ = _correlated_corpus(spark)
    R, _books = opq_train(emb, m=4, k_sub=8, n_iters=2)
    Rm = np.asarray(R)
    assert np.abs(Rm @ Rm.T - np.eye(len(Rm))).max() < 1e-12
    # rotate then counter-rotate restores the vectors
    back = rotate_vectors(
        rotate_vectors(emb, R), Rm.T.tolist()
    ).orderBy("vec_id").collect()
    orig = emb.orderBy("vec_id").collect()
    got = np.vstack([r["embedding"] for r in back])
    want = np.vstack([r["embedding"] for r in orig])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_opq_beats_axis_aligned_pq_on_correlated_data(spark):
    emb, X = _correlated_corpus(spark)
    n_iters, m, k_sub = 3, 4, 8
    R, opq_books = opq_train(
        emb, m=m, k_sub=k_sub, n_iters=n_iters, lloyd_iters=1
    )
    pq_books = refine_codebooks(
        emb, pq_codebooks(emb, m=m, k_sub=k_sub), n_iters=n_iters
    )
    e_pq = _qerr(X, pq_books)
    e_opq = _qerr(X @ np.asarray(R), opq_books)
    assert e_opq < e_pq, (e_opq, e_pq)


def test_opq_topk_serves_like_pq(spark):
    """The serving plan returns k rows per query with valid corpus
    ids and the rotation pre-applied (scores are rotated-space ADC)."""
    emb, _ = _correlated_corpus(spark, n=120)
    out = opq_topk(
        emb, emb.filter("vec_id < 3"), m=4, k_sub=8, k=5, n_iters=1
    ).collect()
    assert len(out) == 15
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rows in by_q.items():
        assert len(rows) == 5
        assert len({r["n_id"] for r in rows}) == 5


def test_opq_train_rejects_indivisible_dim(spark):
    rows = [(1, [1.0, 2.0, 3.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="not divisible"):
        opq_train(emb, m=2, k_sub=1, n_iters=1)


def test_opq_error_does_not_increase_with_iterations(spark):
    """The alternation's joint objective is non-increasing: more OPQ
    iterations never raise quantization error (training is
    deterministic, so the comparison is exact)."""
    emb, X = _correlated_corpus(spark, n=200)
    R1, b1 = opq_train(emb, m=4, k_sub=8, n_iters=1, lloyd_iters=1)
    R3, b3 = opq_train(emb, m=4, k_sub=8, n_iters=3, lloyd_iters=1)
    e1 = _qerr(X @ np.asarray(R1), b1)
    e3 = _qerr(X @ np.asarray(R3), b3)
    assert e3 <= e1 + 1e-9, (e3, e1)


def test_persisted_opq_index_roundtrip(spark, tmp_path):
    """build_pq_index(opq_iterations=…) persists the rotation beside
    the codebooks; search_pq_index auto-rotates queries — the OPQ
    serving result equals running the ADC by hand on rotated frames."""
    from curw_wrf_data_pusher_spark.llmops.annindex import (
        build_pq_index,
        load_pq_rotation,
        search_pq_index,
    )
    from curw_wrf_data_pusher_spark.llmops.pq import pq_topk

    emb, _ = _correlated_corpus(spark, n=120)
    path = str(tmp_path / "opq_index")
    books = build_pq_index(emb, path, m=4, k_sub=8, opq_iterations=1)
    R = load_pq_rotation(spark, path)
    assert R is not None and len(R) == 16
    q = emb.filter("vec_id < 3")
    got = {
        (r["q_id"], r["rank"]): (r["n_id"], r["adc"])
        for r in search_pq_index(spark, path, q, k=5).collect()
    }
    want = {
        (r["q_id"], r["rank"]): (r["n_id"], r["adc"])
        for r in pq_topk(
            rotate_vectors(emb, R), rotate_vectors(q, R),
            m=4, k_sub=8, k=5, books=books,
        ).collect()
    }
    assert got == want
    # a plain (non-OPQ) index has no rotation and serves unrotated
    p2 = str(tmp_path / "plain_index")
    build_pq_index(emb, p2, m=4, k_sub=8)
    assert load_pq_rotation(spark, p2) is None
    # ONLY the missing-path AnalysisException maps to None: a
    # non-parquet garbage file at the rotation path is a real read
    # problem and must raise, not silently serve unrotated
    import pytest

    bad = tmp_path / "bad_index" / "rotation"
    bad.mkdir(parents=True)
    (bad / "part-00000.parquet").write_bytes(b"not a parquet file")
    with pytest.raises(Exception):
        load_pq_rotation(spark, str(tmp_path / "bad_index"))


def test_rotate_vectors_exact_matches_blas_and_fold_order(spark):
    """The oracle-comparable rotation twin: allclose to the BLAS form,
    and BIT-identical to a sequential left-fold reference (the order
    the llm_opq_serve SQL mirror uses)."""
    from curw_wrf_data_pusher_spark.llmops.opq import rotate_vectors_exact

    emb, X = _correlated_corpus(spark, n=80)
    rng = np.random.RandomState(9)
    Rm, _ = np.linalg.qr(rng.randn(16, 16))
    got = np.vstack([
        r["embedding"]
        for r in rotate_vectors_exact(emb, Rm.tolist())
        .orderBy("vec_id").collect()
    ])
    # close to BLAS (they differ only in final-ulp accumulation order)
    np.testing.assert_allclose(got, X @ Rm, rtol=1e-12)
    # bit-identical to the strict left fold the SQL mirror spells out
    ref = np.zeros_like(got)
    for j in range(16):
        accv = np.zeros(len(X))
        for i in range(16):
            accv = accv + X[:, i] * Rm[i, j]
        ref[:, j] = accv
    assert (got == ref).all()
    # output element type widened to double (exact float32 -> float64)
    out_schema = rotate_vectors_exact(emb, Rm.tolist()).schema
    assert out_schema["embedding"].dataType.elementType.simpleString() \
        == "double"
