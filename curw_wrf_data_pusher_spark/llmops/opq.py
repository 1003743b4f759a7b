"""OPQ — Optimized Product Quantization (Ge et al., CVPR'13).

PQ quantizes fixed, axis-aligned subspaces; OPQ learns an orthogonal
rotation ``R`` so the subspaces align with the data's principal
structure before quantization, cutting reconstruction error (and
raising ANN recall) at identical index size.  The non-parametric
alternation:

    repeat:
      1. Lloyd-refine the codebooks on the ROTATED corpus
         (``pq.refine_codebooks`` — one Arrow pass per sweep,
         map-side partial sums);
      2. fix codes/centroids and solve the orthogonal Procrustes
         problem  min_R ‖X·R − Ĉ‖_F  →  R = U·Vᵀ from the SVD of
         Xᵀ·Ĉ  (X = original vectors, Ĉ = the codebook
         reconstruction of the rotated vectors).

Spark shape: each iteration is TWO corpus passes (the Lloyd sweep and
one ``mapInPandas`` pass that rotates, encodes, reconstructs and
emits a single d×d partial ``XᵀĈ`` matrix PER BATCH — map-side
combine; only ``n_batches`` rows of d² doubles ever shuffle).  The
d×d SVD runs on the driver (d = 64 here; cost is microseconds and
independent of corpus size).  This is an index-BUILD cost paid once
per corpus, exactly like ``refine_codebooks``; serving reuses the
standard ADC path on rotated queries.

Iterative (no SQL oracle); quality is pinned by pytest: R stays
orthogonal and round-trips, quantization error does not increase
with more iterations, and it is strictly better than axis-aligned
PQ at equal Lloyd budget on correlated data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .pq import _argmin_codes, pq_codebooks, refine_codebooks


def rotate_vectors(
    df: DataFrame,
    rotation,
    vec_col: str = "embedding",
) -> DataFrame:
    """Replace ``vec_col`` with ``vec @ R`` (one vectorized numpy
    matmul per Arrow batch; all other columns pass through)."""
    import numpy as np
    import pandas as pd

    R = np.asarray(rotation, dtype=np.float64)
    schema = df.schema
    # preserve the column's element precision: a float32 column stays
    # float32, a double column must NOT silently round-trip through
    # float32
    elem = schema[vec_col].dataType.elementType.simpleString()
    out_dt = np.float64 if elem == "double" else np.float32

    def rot(batches):
        for pdf in batches:
            if len(pdf):
                V = np.vstack(pdf[vec_col].to_numpy()).astype(
                    np.float64
                )
                pdf = pdf.copy()
                pdf[vec_col] = pd.Series(
                    list((V @ R).astype(out_dt)), index=pdf.index
                )
            yield pdf

    return df.mapInPandas(rot, schema)


def rotate_vectors_exact(
    df: DataFrame,
    rotation,
    vec_col: str = "embedding",
) -> DataFrame:
    """Oracle-comparable twin of :func:`rotate_vectors`: the rotated
    coordinate ``out[j] = Σ_i vec[i]·R[i][j]`` is accumulated as a
    STRICT LEFT FOLD over the input dimensions in index order, from
    +0.0, in float64 — bit-identical to a left-associated SQL sum
    ``0.0 + e[1]*r1j + e[2]*r2j + …`` (same IEEE ops in the same
    order), unlike BLAS ``V @ R`` whose blocked/pairwise accumulation
    differs in final ulps.  Output element type is double regardless
    of input (float32 → float64 widening is exact, so both engines
    start from identical values).

    Cost is the same n·d² flops as the matmul, just sequenced: a
    Python loop of d vectorized (n × d) multiply-adds per Arrow batch.
    Use :func:`rotate_vectors` (BLAS) wherever results feed float-
    tolerant consumers; use this twin when the output must hash-match
    a SQL mirror (the registered ``llm_opq_serve`` row)."""
    import numpy as np
    import pandas as pd

    R = np.asarray(rotation, dtype=np.float64)
    d = R.shape[0]
    fields = [
        f if f.name != vec_col
        else T.StructField(
            vec_col, T.ArrayType(T.DoubleType(), False), f.nullable
        )
        for f in df.schema.fields
    ]
    schema = T.StructType(fields)

    def rot(batches):
        for pdf in batches:
            if len(pdf):
                V = np.vstack(pdf[vec_col].to_numpy()).astype(
                    np.float64
                )
                acc = np.zeros((len(V), d), dtype=np.float64)
                for i in range(d):  # strict left fold, oracle order
                    acc += V[:, i:i + 1] * R[i, :]
                pdf = pdf.copy()
                pdf[vec_col] = pd.Series(list(acc), index=pdf.index)
            yield pdf

    return df.mapInPandas(rot, schema)


def _xtc_partials(
    corpus: DataFrame,
    rotation,
    books,
    vec_col: str,
    score_scale: int,
):
    """One corpus pass → the d×d ``XᵀĈ`` Procrustes matrix: rotate,
    encode (shared ``_argmin_codes`` kernel), reconstruct from the
    codebooks, emit ONE flattened d×d partial per batch, sum the
    bounded partials on the driver."""
    import numpy as np

    R = np.asarray(rotation, dtype=np.float64)
    cents = [np.asarray(b, dtype=np.float64) for b in books]
    m = len(books)
    d_sub = len(books[0][0])
    d = m * d_sub
    schema = T.StructType(
        [T.StructField("xtc", T.ArrayType(T.DoubleType()), False)]
    )

    def partial(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            Xr = X @ R
            C = np.empty_like(Xr)
            for s in range(m):
                sub = Xr[:, s * d_sub:(s + 1) * d_sub]
                codes = _argmin_codes(sub, cents[s], score_scale)
                C[:, s * d_sub:(s + 1) * d_sub] = cents[s][codes]
            yield pd.DataFrame({"xtc": [(X.T @ C).ravel().tolist()]})

    rows = corpus.mapInPandas(partial, schema).collect()
    S = np.zeros((d, d), dtype=np.float64)
    for r in rows:
        S += np.asarray(r["xtc"], dtype=np.float64).reshape(d, d)
    return S


def opq_train(
    corpus: DataFrame,
    m: int = 4,
    k_sub: int = 8,
    n_iters: int = 3,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_scale: int = 9,
):
    """Learn (R, books).  Returns the rotation as a nested list (so it
    travels in closures without numpy types) and the refined
    codebooks for the ROTATED space."""
    import numpy as np

    # pq_codebooks validates dim % m (same message) and the corpus
    # size — no extra Spark job here just to re-derive dim
    books = pq_codebooks(
        corpus, m=m, k_sub=k_sub, id_col=id_col, vec_col=vec_col
    )
    dim = m * len(books[0][0])
    R = np.eye(dim, dtype=np.float64)
    for _ in range(n_iters):
        # rotation fused into the Lloyd sweep's Arrow pass (one
        # Python boundary per sweep instead of two; bit-identical to
        # refining rotate_vectors(corpus, R) — pq._fused_rotation)
        books = refine_codebooks(
            corpus, books, n_iters=lloyd_iters,
            id_col=id_col, vec_col=vec_col, score_scale=score_scale,
            rotation=R.tolist(),
        )
        S = _xtc_partials(
            corpus, R.tolist(), books, vec_col, score_scale
        )
        U, _sv, Vt = np.linalg.svd(S)
        R = U @ Vt
    # the loop updates R LAST, so `books` were refined under the
    # previous iteration's rotation — one more Lloyd pass under the
    # final R makes the returned (R, books) pair a consistent
    # alternation step (Ge et al. §4; each half-step is
    # non-increasing, so the monotonicity contract is preserved)
    books = refine_codebooks(
        corpus, books, n_iters=lloyd_iters,
        id_col=id_col, vec_col=vec_col, score_scale=score_scale,
        rotation=R.tolist(),
    )
    return R.tolist(), books


def opq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    m: int = 4,
    k_sub: int = 8,
    k: int = 5,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_scale: int = 9,
    rotation=None,
    books=None,
) -> DataFrame:
    """OPQ ADC top-k: train (or reuse) the rotation + codebooks, then
    run the standard PQ ADC scan over the rotated corpus with rotated
    queries — the serving plan is IDENTICAL to ``pq_topk`` (corpus
    never shuffles; per-query distance tables broadcast).  The corpus
    rotation is fused into the encode's Arrow pass (one Python
    boundary instead of two; bit-identical — pq._fused_rotation);
    the bounded query side keeps its own rotate stage."""
    from ..sources.lake import spread
    from .pq import adc_topk_over_codes, pq_encode_arrow

    if rotation is None or books is None:
        rotation, books = opq_train(
            corpus, m=m, k_sub=k_sub, n_iters=n_iters,
            id_col=id_col, vec_col=vec_col, score_scale=score_scale,
        )
    codes = spread(
        pq_encode_arrow(
            corpus, books, id_col, vec_col, score_scale,
            rotation=rotation,
        )
    )
    return adc_topk_over_codes(
        codes, rotate_vectors(queries, rotation, vec_col=vec_col),
        books, k=k, id_col=id_col, vec_col=vec_col,
        score_scale=score_scale,
    )
