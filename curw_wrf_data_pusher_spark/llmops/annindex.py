"""Persisted IVF index: build once, search many times with
partition-pruned list reads.

``ivf_topk`` (simsearch.py) recomputes centroid assignment on every
call — right for ad-hoc queries, wrong for a serving corpus searched
repeatedly.  This module persists the index as plain parquet:

    <path>/centroids/   (cidx, centroid array<double>) — k×dim, tiny
    <path>/lists/       corpus rows partitioned by centroid=<cidx>

The 100 TB story is in the LAYOUT: the inverted lists are parquet
PARTITIONS, so a search collects its probe set driver-side
(n_queries × n_probe ints), pushes it as an ``isin`` filter, and the
scan's partition pruning skips every unprobed list's files entirely —
search I/O is (n_probe / n_centroids) of the corpus, enforced by the
reader, not by a join the optimizer might reorder.  Build cost is one
scan + one shuffle (the partitioned write clusters rows by centroid).

Results are identical to ``ivf_topk`` with the same parameters: both
derive the same deterministic codebook via ``ivf_centroids`` (pinned
by tests/test_annindex.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .simsearch import (
    _dot_sql,
    _nearest_centroid_expr,
    _norm_sql,
    ivf_centroids,
)


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iterations: int = 0,
) -> list[list[float]]:
    """Assign every corpus vector to its nearest centroid and persist
    centroid-partitioned inverted lists plus the codebook.  Returns
    the centroids (also persisted).  Assignment is a map-side JVM
    expression over broadcast centroid literals; the only shuffle is
    the partitioned write's clustering."""
    spark = corpus.sparkSession
    centroids = ivf_centroids(
        corpus, n_centroids, id_col=id_col, vec_col=vec_col,
        refine_iterations=refine_iterations,
    )
    # backtick-quote the user-supplied column name before it is
    # spliced into SQL (a name with dots/spaces/reserved words would
    # otherwise break or mis-resolve inside _nearest_centroid_expr)
    vec_sql = "`" + vec_col.replace("`", "``") + "`"
    assigned = corpus.select(F.col(id_col), F.col(vec_col)).withColumn(
        "centroid",
        _nearest_centroid_expr(vec_sql, centroids, 1)[0],
    )
    # repartition on the partition column: without it every input task
    # writes a file into every centroid directory (tasks × k small
    # files); with it each list is a few contiguous files
    assigned.repartition("centroid").write.mode("overwrite").partitionBy(
        "centroid"
    ).parquet(f"{path}/lists")
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cidx int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    return centroids


def load_ivf_centroids(spark: SparkSession, path: str) -> list[list[float]]:
    """The persisted codebook, ordered by centroid index."""
    rows = sorted(
        spark.read.parquet(f"{path}/centroids").collect(),
        key=lambda r: r.cidx,
    )
    return [[float(x) for x in r.centroid] for r in rows]


def search_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_scale: int = 9,
) -> DataFrame:
    """Top-k cosine search against a persisted index: each query
    probes its ``n_probe`` nearest lists; only those parquet
    partitions are read (static partition pruning via the collected
    probe set — verify with ``PartitionFilters`` in the scan plan).
    Returns (q_id, n_id, rank, cos), identical to ``ivf_topk`` with
    the same codebook parameters."""
    centroids = load_ivf_centroids(spark, path)
    q = (
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        )
        .withColumn(
            "centroid",
            F.explode(
                _nearest_centroid_expr("q_vec", centroids, n_probe)
            ),
        )
        .withColumn("q_norm", F.expr(_norm_sql("q_vec")))
    )
    probe_set = sorted(
        r.centroid for r in q.select("centroid").distinct().collect()
    )
    lists = spark.read.parquet(f"{path}/lists").filter(
        F.col("centroid").isin(probe_set)
    )
    c = lists.select(
        "centroid",
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
    ).withColumn("n_norm", F.expr(_norm_sql("n_vec")))
    scored = (
        c.join(F.broadcast(q), "centroid")
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn(
            "cos",
            F.round(
                F.expr(_dot_sql("q_vec", "n_vec"))
                / (F.col("q_norm") * F.col("n_norm")),
                score_scale,
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "cos")
        .dropDuplicates(["q_id", "n_id"])
    )


# ---------------------------------------------------------------------------
# Persisted PQ index — the compressed-serving tier next to the IVF
# lists above.  Where the IVF layout saves I/O by PRUNING partitions,
# the PQ layout saves it by COMPRESSION: the codes table stores m
# small ints per vector (m·~1-4 bytes after parquet dictionary/bit-
# pack encoding) instead of dim floats, so the per-query serving scan
# reads a fraction of the corpus bytes and never re-encodes.  Build
# cost is one map-only Arrow encode + the write.  ADC scoring over
# the persisted codes is byte-identical to pq_topk with the same
# codebooks (shared adc_topk_over_codes stage; pinned by
# tests/test_annindex.py).

def build_pq_index(
    corpus: DataFrame,
    path: str,
    m: int = 4,
    k_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_scale: int = 9,
    refine_iterations: int = 0,
    extra_cols: Sequence[str] = (),
    opq_iterations: int = 0,
) -> list[list[list[float]]]:
    """Encode the corpus once and persist:

    ``<path>/codes``      (id, code_0 … code_{m−1} [, extra…]) parquet
    ``<path>/codebooks``  (s, c, centroid array<double>) — m·k_sub rows
    ``<path>/rotation``   (i, row array<double>) — only when OPQ is on

    ``refine_iterations`` > 0 runs Lloyd refinement on the seed
    codebooks before encoding (better recall, loses SQL-oracle
    reproducibility — see pq.refine_codebooks).

    ``opq_iterations`` > 0 instead trains an OPQ rotation + codebooks
    (llmops/opq.py) and persists the rotation beside the codebooks;
    ``search_pq_index`` auto-rotates queries when a rotation is
    present, so OPQ serving is transparent to callers.

    ``extra_cols`` persists metadata columns (label, source, date…)
    alongside each row's codes, enabling FILTERED serving: a
    ``codes_filter`` at :func:`search_pq_index` then pushes into the
    codes parquet scan itself, so a selective predicate prunes I/O and
    ADC work before any distance math."""
    from .pq import pq_codebooks, pq_encode_arrow, refine_codebooks

    spark = corpus.sparkSession
    rotation = None
    if opq_iterations:
        from .opq import opq_train, rotate_vectors

        rotation, books = opq_train(
            corpus, m=m, k_sub=k_sub, n_iters=opq_iterations,
            id_col=id_col, vec_col=vec_col, score_scale=score_scale,
        )
        corpus = rotate_vectors(corpus, rotation, vec_col=vec_col)
    else:
        books = pq_codebooks(corpus, m, k_sub, id_col, vec_col)
        if refine_iterations:
            books = refine_codebooks(
                corpus, books, n_iters=refine_iterations,
                id_col=id_col, vec_col=vec_col,
                score_scale=score_scale,
            )
    codes = pq_encode_arrow(corpus, books, id_col, vec_col, score_scale)
    if extra_cols:
        codes = codes.join(
            corpus.select(id_col, *extra_cols), id_col
        )
    codes.write.mode("overwrite").parquet(f"{path}/codes")
    spark.createDataFrame(
        [
            (s, c, books[s][c])
            for s in range(len(books))
            for c in range(len(books[s]))
        ],
        "s int, c int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    if rotation is not None:
        spark.createDataFrame(
            [(i, row) for i, row in enumerate(rotation)],
            "i int, row array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{path}/rotation"
        )
    return books


def load_pq_rotation(spark: SparkSession, path: str):
    """The persisted OPQ rotation as a nested list, or None when the
    index was built without OPQ.

    Existence is probed THROUGH Spark (path-not-found at load time =
    "no rotation") — a driver-local ``os.path.exists`` would return
    False for any non-local index path (hdfs://, s3a://, different
    working dir) and silently serve an OPQ index unrotated: wrong
    neighbors, no error.  Only the MISSING-PATH case maps to None:
    a transient read failure or an empty-but-present rotation dir
    raises instead of silently serving unrotated (the same wrong
    neighbors through a different door)."""
    from pyspark.errors import AnalysisException

    from ..functions.errors import is_missing_input

    try:
        # path resolution is eager at load() even with a schema —
        # a missing dir raises HERE, before any data is read
        reader = spark.read.schema("i int, row array<double>").parquet(
            f"{path}/rotation"
        )
    except AnalysisException as exc:
        # ONLY the missing-path condition means "unrotated index";
        # any other analysis failure (unreadable location, bad path
        # config) must propagate — mapping it to None would serve
        # wrong neighbors silently.
        if is_missing_input(exc):
            return None
        raise
    rows = reader.collect()  # real read failures propagate loudly
    if not rows:
        raise ValueError(
            f"rotation dir at {path}/rotation exists but holds no "
            "rows — interrupted index write? Rebuild the index rather "
            "than serving it unrotated."
        )
    rows.sort(key=lambda r: r.i)
    return [[float(x) for x in r.row] for r in rows]


def load_pq_codebooks(
    spark: SparkSession, path: str
) -> list[list[list[float]]]:
    """The persisted codebooks, ordered (subspace, centroid)."""
    rows = spark.read.parquet(f"{path}/codebooks").collect()
    m = 1 + max(r.s for r in rows)
    k_sub = 1 + max(r.c for r in rows)
    books = [[None] * k_sub for _ in range(m)]
    for r in rows:
        books[r.s][r.c] = [float(x) for x in r.centroid]
    return books


def search_pq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_scale: int = 9,
    codes_filter: Column | str | None = None,
) -> DataFrame:
    """ADC top-k against the persisted codes — (q_id, n_id, rank,
    adc), identical to ``pq_topk`` with the same codebooks.  The scan
    reads only the m-int codes table; the exact query side broadcasts
    its per-subspace distance tables as in pq_topk.

    ``codes_filter`` (over the codes table's columns — persist
    metadata via build_pq_index(extra_cols=…)) gives filter-then-rank
    semantics and is applied DIRECTLY on the parquet read, so Spark
    pushes it into the scan (plan-gated: PushedFilters) — the filtered
    serving path reads only matching row groups."""
    from .pq import adc_topk_over_codes

    books = load_pq_codebooks(spark, path)
    rotation = load_pq_rotation(spark, path)
    if rotation is not None:  # OPQ index: rotate the (tiny) query side
        from .opq import rotate_vectors

        queries = rotate_vectors(queries, rotation, vec_col=vec_col)
    codes = spark.read.parquet(f"{path}/codes")
    if codes_filter is not None:
        codes = codes.filter(codes_filter)
    return adc_topk_over_codes(
        codes, queries, books, k=k, id_col=id_col, vec_col=vec_col,
        score_scale=score_scale,
    )
