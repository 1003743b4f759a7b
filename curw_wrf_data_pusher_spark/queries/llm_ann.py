"""Product-quantization ANN and incremental stores (split from the
former queries/llm.py monolith): PQ encode/ADC top-k, shortlist
re-rank, persisted-index search, PQ-Lloyd and OPQ variants, filtered
ANN, incremental cross-batch near-dup, BPE pair counts, Gopher
repetition signals, mixture schedules, and budget sampling.
Registration order is load-bearing (queries/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llmops.dedup import minhash_signatures_from_text
from ..llmops.simsearch import cosine_topk
from ..sources.lake import load_table
from .registry import register
from .llm_dedup import (
    _BAND_BUCKETS,
    _LINE_WRAP_SQL,
    _MH_AGREE,
    _MH_TERMS,
    _SHINGLE_CTE,
    _wrap_8_tokens,
)


# ---------------------------------------------------------------------------
# Product-quantization ANN (llmops/pq.py): deterministic seed
# codebooks → map-side encoding → ADC top-k.  The oracle re-derives
# the ENTIRE quantizer in SQL — same (md5(id), id) seed sampling, the
# same left-associated (e[i]−c[i])·(e[i]−c[i]) distance sums rounded
# to 9 dp, the same (distance, centroid-index) argmin tie-break — so
# codes AND distances are compared bit-for-bit, not just the final
# ranking.
_PQ_M, _PQ_KSUB, _PQ_DSUB, _PQ_K = 16, 32, 4, 5


def _pq_dist_sql(vec: str, seed: str, s: int) -> str:
    terms = [
        f"({vec}[{i}] - {seed}[{i}]) * ({vec}[{i}] - {seed}[{i}])"
        for i in range(s * _PQ_DSUB + 1, (s + 1) * _PQ_DSUB + 1)
    ]
    return "round(" + " + ".join(terms) + ", 9)"


_PQ_CODE_CTES = ",\n    ".join(
    f"""code{s} AS (
      SELECT vec_id, c AS code_{s} FROM (
        SELECT vec_id, c,
               row_number() OVER (PARTITION BY vec_id ORDER BY d{s}, c)
                 AS rn
        FROM enc) WHERE rn = 1)"""
    for s in range(_PQ_M)
)

#: shared CTE prefix: seeds → per-subspace distances → codes → ADC
#: pairs (used by both the plain ADC row and the rerank row)
_PQ_CTES = f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    seeds AS (
      SELECT row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS c,
             e
      FROM v
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
      LIMIT {_PQ_KSUB}
    ),
    enc AS (
      SELECT v.vec_id, s.c,
             {", ".join(f"{_pq_dist_sql('v.e', 's.e', s)} AS d{s}"
                        for s in range(_PQ_M))}
      FROM v CROSS JOIN seeds s
    ),
    {_PQ_CODE_CTES},
    codes AS (
      SELECT * FROM code0
      {" ".join(f"JOIN code{s} USING (vec_id)" for s in range(1, _PQ_M))}
    ),
    q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 10),
    pairs AS (
      SELECT q.q_id, codes.vec_id AS n_id,
             {" + ".join(_pq_dist_sql('q.qe', f's{s}.e', s)
                         for s in range(_PQ_M))} AS adc
      FROM q CROSS JOIN codes
      {" ".join(f"JOIN seeds s{s} ON s{s}.c = codes.code_{s}"
                for s in range(_PQ_M))}
    )"""

_PQ_ORACLE = f"""{_PQ_CTES}
    SELECT q_id, n_id, CAST(rank AS BIGINT) AS rank, adc FROM (
      SELECT *, row_number() OVER (
               PARTITION BY q_id ORDER BY adc, n_id) AS rank
      FROM pairs)
    WHERE rank <= {_PQ_K}
    """

_PQ_RERANK_OVERFETCH = 4
_PQ_EXACT_DIST = "round(" + " + ".join(
    f"(qv.e[{i}] - nv.e[{i}]) * (qv.e[{i}] - nv.e[{i}])"
    for i in range(1, 65)
) + ", 9)"

_PQ_RERANK_ORACLE = f"""{_PQ_CTES},
    cand AS (
      SELECT q_id, n_id FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY q_id ORDER BY adc, n_id) AS rn
        FROM pairs)
      WHERE rn <= {_PQ_RERANK_OVERFETCH * _PQ_K}
    ),
    rr AS (
      SELECT c.q_id, c.n_id, {_PQ_EXACT_DIST} AS dist
      FROM cand c
      JOIN v nv ON nv.vec_id = c.n_id
      JOIN v qv ON qv.vec_id = c.q_id
    )
    SELECT q_id, n_id, CAST(rank AS BIGINT) AS rank, dist FROM (
      SELECT *, row_number() OVER (
               PARTITION BY q_id ORDER BY dist, n_id) AS rank
      FROM rr)
    WHERE rank <= {_PQ_K}
    """


@register("llm_pq_topk", oracle=_PQ_ORACLE)
def llm_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.pq import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_topk(
        emb, emb.filter(F.col("vec_id") < 10),
        m=_PQ_M, k_sub=_PQ_KSUB, k=_PQ_K,
    )


# ---------------------------------------------------------------------------
# Gopher-style intra-document repetition signals
# (llmops/textstats.repetition_signals) over the 8-token line re-wrap
# — duplicate-line fractions (count and character-weighted) plus the
# most frequent word 2-gram and the fraction of characters it covers.
# One map-side scan; the oracle rebuilds every signal from unnested
# (line, count) / consecutive-token-pair aggregates.
@register(
    "llm_repetition_signals",
    oracle=f"""
    WITH w AS ({_LINE_WRAP_SQL}),
    lines AS (
      SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM w
    ),
    lc AS (
      SELECT doc_id, line, count(*) AS cnt FROM lines GROUP BY 1, 2
    ),
    lagg AS (
      SELECT doc_id,
             CAST(sum(cnt) AS BIGINT) AS n_lines,
             count(*) AS n_distinct,
             sum(cnt * length(line)) AS n_line_chars,
             sum(CASE WHEN cnt >= 2 THEN cnt * length(line)
                      ELSE 0 END) AS dup_chars
      FROM lc GROUP BY doc_id
    ),
    toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM w
    ),
    g0 AS (
      SELECT doc_id, unnest(t) AS tok,
             generate_subscripts(t, 1) AS pos
      FROM toks
    ),
    grams AS (
      SELECT a.doc_id, a.tok || ' ' || b.tok AS gram
      FROM g0 a JOIN g0 b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    gc AS (
      SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2
    ),
    topg AS (
      SELECT doc_id, gram, cnt FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY cnt DESC, gram) AS rn
        FROM gc) WHERE rn = 1
    )
    SELECT l.doc_id,
           l.n_lines,
           1.0 - CAST(l.n_distinct AS DOUBLE) / CAST(l.n_lines AS DOUBLE)
             AS dup_line_frac,
           CASE WHEN l.n_line_chars > 0
                THEN CAST(l.dup_chars AS DOUBLE)
                     / CAST(l.n_line_chars AS DOUBLE) END
             AS dup_line_char_frac,
           t.gram AS top_2gram,
           CAST(t.cnt * length(t.gram) AS DOUBLE)
             / CAST(length(w.text) AS DOUBLE) AS top_2gram_char_frac
    FROM lagg l
    JOIN w USING (doc_id)
    LEFT JOIN topg t USING (doc_id)
    """,
)
def llm_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.textstats import repetition_signals
    from ..sources.lake import spread

    # spread: the operator is deliberately map-side (one scan, zero
    # shuffles), so a single-file scan's one partition serializes all
    # of its explode/lambda work — measured 3 near-serial tasks
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", _wrap_8_tokens().alias("text")
    )
    return repetition_signals(docs)


# ---------------------------------------------------------------------------
# Training-mix planning (llmops/curation.mix_schedule): token budget ×
# mixture weights → per-source allocation and epoch counts.  Weights
# are quarters (binary-exact) so the weight-total is identical under
# any aggregation order; token sums are integers.
@register(
    "llm_mix_schedule",
    oracle="""
    WITH t AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT)
               AS available_tokens
      FROM documents GROUP BY 1
    ),
    w AS (
      SELECT *, CASE source WHEN 'src0' THEN 0.25
                            WHEN 'src17' THEN 2.0
                            WHEN 'src18' THEN 2.5
                            ELSE 1.0 END AS weight
      FROM t
    ),
    tot AS (SELECT sum(weight) AS tw FROM w)
    SELECT source, n_docs, available_tokens, weight,
           1000000.0 * weight / tw AS alloc_tokens,
           1000000.0 * weight / tw / available_tokens AS epochs
    FROM w CROSS JOIN tot
    """,
)
def llm_mix_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.curation import mix_schedule

    docs = load_table(spark, sf_dir, "documents")
    return mix_schedule(
        docs,
        weights={"src0": 0.25, "src17": 2.0, "src18": 2.5},
        token_budget=1_000_000,
    )


# ---------------------------------------------------------------------------
# Budget-aware sampling — the APPLY form of llm_mix_schedule
# (llmops/curation.budget_sample): per source, greedy hash-order
# selection while the running token total stays within the source's
# share of a 10k-token budget.  One group-key shuffle serving both
# window passes; the oracle re-derives ranks, running sums and
# allocations.
@register(
    "llm_budget_sample",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             len(string_split(trim(text), ' ')) AS tok,
             md5('budget:v1:' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    tw AS (
      SELECT sum(CASE source WHEN 'src0' THEN 0.25
                             WHEN 'src17' THEN 2.0
                             WHEN 'src18' THEN 2.5
                             ELSE 1.0 END) AS w
      FROM (SELECT DISTINCT source FROM documents)
    ),
    c AS (
      SELECT doc_id, source, tok,
             sum(tok) OVER (PARTITION BY source ORDER BY h, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum,
             CASE source WHEN 'src0' THEN 0.25
                         WHEN 'src17' THEN 2.0
                         WHEN 'src18' THEN 2.5
                         ELSE 1.0 END AS wt
      FROM d
    )
    SELECT doc_id, source, CAST(tok AS BIGINT) AS n_tokens,
           CAST(cum AS BIGINT) AS cum_tokens
    FROM c CROSS JOIN tw
    WHERE cum <= 10000.0 * wt / w
    """,
)
def llm_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.curation import budget_sample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    out = budget_sample(
        docs,
        weights={"src0": 0.25, "src17": 2.0, "src18": 2.5},
        token_budget=10_000,
    )
    return out.select("doc_id", "source", "n_tokens", "cum_tokens")


# The PRODUCTION PQ shape as its own oracle row: ADC shortlist of
# overfetch·k, exact squared-euclidean re-rank of just the shortlist
# — the oracle re-derives quantizer, shortlist AND the 64-term exact
# distances (same left-associated fold the engine computes).
@register("llm_pq_rerank", oracle=_PQ_RERANK_ORACLE)
def llm_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.pq import pq_topk_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_topk_rerank(
        emb, emb.filter(F.col("vec_id") < 10),
        m=_PQ_M, k_sub=_PQ_KSUB, k=_PQ_K,
        overfetch=_PQ_RERANK_OVERFETCH,
    )


# Persisted-PQ serving scan (UNREGISTERED bench row).  Separates the
# two costs llm_pq_topk/llm_pq_lloyd_topk fuse: the index BUILD
# (codebooks + arrow encode + parquet write — paid once per corpus)
# happens only when the per-(sf,mtime) index directory is missing, so
# under the bench's best-of-REPS the reported time is the SERVING
# path alone — codebook load + compressed codes scan + ADC — the cost
# a query actually pays against a standing index.
def llm_pq_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..llmops.annindex import build_pq_index, search_pq_index

    emb = load_table(spark, sf_dir, "embeddings")
    # key the cache on (sf_dir, source mtime): a regenerated dataset
    # must rebuild, not serve a stale index
    src = os.path.join(sf_dir, "embeddings.parquet")
    mtime = int(os.stat(src).st_mtime) if os.path.exists(src) else 0
    tag = f'{sf_dir.strip("/").replace("/", "_")}_{mtime}'
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_pq_index_{tag}"
    )
    if not os.path.exists(os.path.join(path, "codebooks")):
        build_pq_index(emb, path, m=_PQ_M, k_sub=_PQ_KSUB)
    return search_pq_index(
        spark, path, emb.filter(F.col("vec_id") < 10), k=_PQ_K,
    )


# Lloyd-refined PQ (UNREGISTERED bench row — refine_codebooks is
# iterative, so no SQL oracle exists; search quality is pinned by the
# numpy-mirror pytest in tests/test_pq.py and the recall note in
# SCALING.md).  Benches the PRODUCTION quantizer path: seed codebooks
# → n_iters Lloyd sweeps (each one arrow encode + one grouped agg,
# corpus never collected) → ADC top-k with the refined books.
def llm_pq_lloyd_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.pq import pq_codebooks, pq_topk, refine_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_codebooks(emb, m=_PQ_M, k_sub=_PQ_KSUB)
    books = refine_codebooks(emb, books, n_iters=3)
    return pq_topk(
        emb, emb.filter(F.col("vec_id") < 10),
        m=_PQ_M, k_sub=_PQ_KSUB, k=_PQ_K, books=books,
    )


# Incremental near-dedup: a new crawl batch (doc_id % 4 == 0) probed
# against the already-ingested corpus's persisted MinHash signature
# store (doc_id % 4 != 0) — llmops/incremental.py's near-dup twin of
# the exact content-hash store, hermetic here by deriving the store
# signatures in-query.  Output: one row per verified (batch doc,
# matched partner) with reason 'store' (cross-batch match) or 'batch'
# (in-batch exists-earlier match), plus a 'survivor' row per batch doc
# with no verified match.  est_jaccard = agreeing components / 8 —
# exact eighths, no cross-engine float hazard.
@register(
    "llm_incremental_neardup",
    oracle=f"""
    {_SHINGLE_CTE},
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS x
      FROM sh
    ),
    sig AS (
      SELECT doc_id, {_MH_TERMS}
      FROM hashed GROUP BY doc_id
    ),
    buckets AS ({_BAND_BUCKETS}),
    nb AS (SELECT * FROM buckets WHERE doc_id % 4 = 0),
    sb AS (SELECT * FROM buckets WHERE doc_id % 4 <> 0),
    store_cand AS (
      SELECT DISTINCT n.doc_id, s.doc_id AS matched_id
      FROM nb n JOIN sb s ON n.band = s.band AND n.bucket = s.bucket
    ),
    store_drops AS (
      SELECT c.doc_id, 'store' AS reason, c.matched_id,
             CAST({_MH_AGREE} AS DOUBLE) / 8.0 AS est_jaccard
      FROM store_cand c
      JOIN sig a ON a.doc_id = c.doc_id
      JOIN sig b ON b.doc_id = c.matched_id
      WHERE CAST({_MH_AGREE} AS DOUBLE) / 8.0 >= 0.5
    ),
    batch_cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM nb a JOIN nb b
        ON a.band = b.band AND a.bucket = b.bucket
       AND a.doc_id < b.doc_id
    ),
    batch_drops AS (
      SELECT c.id_b AS doc_id, 'batch' AS reason, c.id_a AS matched_id,
             CAST({_MH_AGREE} AS DOUBLE) / 8.0 AS est_jaccard
      FROM batch_cand c
      JOIN sig a ON a.doc_id = c.id_a
      JOIN sig b ON b.doc_id = c.id_b
      WHERE CAST({_MH_AGREE} AS DOUBLE) / 8.0 >= 0.5
    ),
    drops AS (
      SELECT * FROM store_drops UNION ALL SELECT * FROM batch_drops
    )
    SELECT doc_id, reason, matched_id, est_jaccard FROM drops
    UNION ALL
    SELECT d.doc_id, 'survivor' AS reason,
           CAST(NULL AS BIGINT) AS matched_id,
           CAST(NULL AS DOUBLE) AS est_jaccard
    FROM documents d
    WHERE d.doc_id % 4 = 0
      AND d.doc_id NOT IN (SELECT doc_id FROM drops)
    """,
)
def llm_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.incremental import neardup_batch_drops
    from ..sources.lake import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    # Hermetic twin of read_neardup_store: the store signatures are
    # DERIVED from corpus text here, and both probe sides (band
    # explode + b-side verify) consume them — materialize the ~80 B/doc
    # signature frame once instead of re-running the corpus shingle
    # pass per branch.  (Production reads these from parquet, where
    # the scan is the cheap path and no checkpoint is wanted.)
    store_sigs = minhash_signatures_from_text(corpus).localCheckpoint(
        eager=False
    )
    # drops feeds BOTH the output union and the survivor anti-join —
    # checkpoint the verified-match rows (bounded: matches only) so
    # the whole candidate/verify join pipeline runs once.
    drops = neardup_batch_drops(
        batch, store_sigs, threshold=0.5
    ).localCheckpoint(eager=False)
    survivors = batch.join(
        drops.select("doc_id").distinct(), "doc_id", "left_anti"
    ).select(
        "doc_id",
        F.lit("survivor").alias("reason"),
        F.lit(None).cast("bigint").alias("matched_id"),
        F.lit(None).cast("double").alias("est_jaccard"),
    )
    return drops.unionByName(survivors)


# Filtered vector search: top-k among neighbors satisfying a metadata
# predicate (label = 1) — filter-then-rank, the standard contract of
# production vector stores.  Compound row pinning BOTH paths: the
# exact filtered scan and the shared-index IVF with every list probed
# (n_probe == n_centroids), which must coincide with the exact result
# by construction — the oracle emits the same exact rows under both op
# tags, so any divergence between the two Spark paths hash-fails.
@register(
    "llm_filtered_ann",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e, label
               FROM embeddings),
    n AS (SELECT vec_id, e, label,
                 sqrt(list_inner_product(e, e)) AS nrm FROM v),
    q AS (SELECT vec_id AS q_id, e AS q_e, nrm AS q_norm
          FROM n WHERE vec_id < 10),
    scored AS (
      SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, n_id) AS rank
      FROM (
        SELECT q_id, c.vec_id AS n_id,
               round(list_inner_product(q_e, c.e) / (q_norm * c.nrm), 9)
                 AS cos
        FROM q, n c WHERE c.vec_id <> q_id AND c.label = 1
      )
    ),
    topk AS (SELECT q_id, n_id, rank, cos FROM scored WHERE rank <= 5)
    SELECT 'exact' AS op, q_id, n_id, rank, cos FROM topk
    UNION ALL
    SELECT 'ivf_probe_all' AS op, q_id, n_id, rank, cos FROM topk
    """,
)
def llm_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.simsearch import cosine_topk, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(
        emb, queries, k=5, corpus_filter=F.col("label") == 1
    ).select(F.lit("exact").alias("op"), "q_id", "n_id", "rank", "cos")
    ivf = ivf_topk(
        emb, queries, k=5, n_centroids=8, n_probe=8,
        corpus_filter="label = 1",
    ).select(
        F.lit("ivf_probe_all").alias("op"), "q_id", "n_id", "rank", "cos"
    )
    return exact.unionByName(ivf)


# BPE pair counting — the corpus-scale half of tokenizer training
# (llmops/tokenizer.py; Sennrich et al. ACL'16).  One shuffle on the
# word key builds the bounded vocabulary; the adjacent-pair explode
# and weighted count are map-side over that bounded frame.  The full
# merge LOOP is iterative (no SQL twin) and is pytest-pinned on the
# classic toy corpus in tests/test_tokenizer.py; this row oracle-gates
# the counting round the loop's argmax consumes.  Deterministic
# top-20: (cnt DESC, a, b) is a total order.
@register(
    "llm_bpe_pair_counts",
    oracle="""
    WITH words AS (
      SELECT w, count(*) AS c FROM (
        SELECT unnest(regexp_split_to_array(trim(lower(text)),
                                            '\\s+')) AS w
        FROM documents) WHERE length(w) > 0 GROUP BY w
    ),
    pairs AS (
      SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b, c
      FROM words, unnest(range(1, length(w))) AS t(i)
    )
    SELECT a, b, CAST(sum(c) AS BIGINT) AS cnt
    FROM pairs GROUP BY a, b
    ORDER BY cnt DESC, a, b LIMIT 20
    """,
)
def llm_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.tokenizer import pair_counts, to_symbols, word_counts

    docs = load_table(spark, sf_dir, "documents")
    counts = pair_counts(to_symbols(word_counts(docs)))
    return counts.orderBy(F.desc("cnt"), "a", "b").limit(20)


# OPQ — rotation-optimized PQ (UNREGISTERED bench row, like
# llm_pq_lloyd_topk: the training alternation is iterative, no SQL
# twin; quality is pinned by tests/test_opq.py — orthogonal R,
# quantization error strictly below axis-aligned PQ at equal Lloyd
# budget).  Benches the full index-build + ADC serve: n_iters ×
# (one Lloyd sweep + one Procrustes pass) then the standard ADC scan
# over the rotated corpus.
def llm_opq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.opq import opq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return opq_topk(
        emb, emb.filter(F.col("vec_id") < 10),
        m=_PQ_M, k_sub=_PQ_KSUB, k=_PQ_K, n_iters=3,
    )


# ---------------------------------------------------------------------------
# OPQ SERVING with a pinned trained index (queries/_opq_pinned.py:
# opq_train(m=8, k_sub=8, n_iters=2) frozen as literals) — the
# registered, oracle-gated face of the OPQ family.  Training is
# iterative (no SQL twin; pinned by tests/test_opq.py + the
# llm_opq_topk bench row); SERVING is pure arithmetic, so the oracle
# mirrors it term-for-term: rotate every vector by the literal R
# (left-associated 64-term sums ≡ rotate_vectors_exact's strict left
# fold), encode against the literal codebooks (same rounded-argmin as
# PQ), ADC-score queries vec_id<10, rank by (adc, n_id).  Float
# literals carry an ``e0`` exponent so DuckDB parses them as DOUBLE
# via strtod (exact repr round-trip) — a plain decimal literal goes
# through DECIMAL and lands 1 ulp off ~10% of the time (probed).
_OPQ_M, _OPQ_KSUB, _OPQ_DSUB, _OPQ_K = 8, 8, 8, 5


def _dlit(x: float) -> str:
    r = repr(float(x))
    if "e" not in r and "E" not in r:
        r += "e0"
    return f"({r})" if r.startswith("-") else r


def _opq_sql() -> str:
    from ._opq_pinned import OPQ_BOOKS, OPQ_R

    dim = len(OPQ_R)
    # rotated coordinate j (1-based): 0.0 + e[1]*R[0][j] + …  — the
    # leading 0.0 mirrors the Spark fold's +0.0 seed (kills any -0.0
    # sign divergence on exact cancellation)
    rot_elems = ", ".join(
        "(0.0 + "
        + " + ".join(
            f"e[{i + 1}]*{_dlit(OPQ_R[i][j])}" for i in range(dim)
        )
        + ")"
        for j in range(dim)
    )
    books_rows = ",\n      ".join(
        f"({c}, "
        + ", ".join(
            "["
            + ", ".join(_dlit(x) for x in OPQ_BOOKS[s][c])
            + "]::DOUBLE[]"
            for s in range(_OPQ_M)
        )
        + ")"
        for c in range(_OPQ_KSUB)
    )

    def dist(vec: str, cent: str, s: int) -> str:
        terms = " + ".join(
            f"({vec}[{i}] - {cent}[{i - s * _OPQ_DSUB}])"
            f" * ({vec}[{i}] - {cent}[{i - s * _OPQ_DSUB}])"
            for i in range(s * _OPQ_DSUB + 1, (s + 1) * _OPQ_DSUB + 1)
        )
        return f"round({terms}, 9)"

    code_ctes = ",\n    ".join(
        f"""code{s} AS (
          SELECT vec_id, c AS code_{s} FROM (
            SELECT vec_id, c,
                   row_number() OVER (
                     PARTITION BY vec_id ORDER BY d{s}, c) AS rn
            FROM enc) WHERE rn = 1)"""
        for s in range(_OPQ_M)
    )
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    rot AS (SELECT vec_id, [{rot_elems}] AS re FROM v),
    books (c, {", ".join(f"cent{s}" for s in range(_OPQ_M))}) AS (
      VALUES {books_rows}
    ),
    enc AS (
      SELECT r.vec_id, b.c,
             {", ".join(f"{dist('r.re', f'b.cent{s}', s)} AS d{s}"
                        for s in range(_OPQ_M))}
      FROM rot r CROSS JOIN books b
    ),
    {code_ctes},
    codes AS (
      SELECT * FROM code0
      {" ".join(f"JOIN code{s} USING (vec_id)"
                for s in range(1, _OPQ_M))}
    ),
    rotq AS (SELECT vec_id AS q_id, re FROM rot WHERE vec_id < 10),
    pairs AS (
      SELECT q.q_id, codes.vec_id AS n_id,
             {" + ".join(dist('q.re', f'b{s}.cent{s}', s)
                         for s in range(_OPQ_M))} AS adc
      FROM rotq q CROSS JOIN codes
      {" ".join(f"JOIN books b{s} ON b{s}.c = codes.code_{s}"
                for s in range(_OPQ_M))}
    )
    SELECT q_id, n_id, CAST(rank AS BIGINT) AS rank, adc FROM (
      SELECT *, row_number() OVER (
               PARTITION BY q_id ORDER BY adc, n_id) AS rank
      FROM pairs)
    WHERE rank <= {_OPQ_K}
    """


@register("llm_opq_serve", oracle=_opq_sql())
def llm_opq_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve OPQ ADC top-k with the pinned index: exact-fold rotate →
    arrow encode vs the pinned codebooks → broadcast distance tables →
    rank.  The corpus never shuffles; rotation and encode are map-only
    Arrow passes, the ADC scan is the shared pq_topk stage."""
    from ..llmops.opq import rotate_vectors_exact
    from ..llmops.pq import pq_topk
    from ._opq_pinned import OPQ_BOOKS, OPQ_R

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    # rotate the FILTERED query side separately: a filter cannot push
    # below the opaque mapInPandas rotation, so filtering the rotated
    # corpus would run the O(n·d²) exact fold over the whole table a
    # second time just to keep 10 rows (row-wise op — results
    # identical either way)
    return pq_topk(
        rotate_vectors_exact(emb, OPQ_R),
        rotate_vectors_exact(emb.filter(F.col("vec_id") < 10), OPQ_R),
        m=_OPQ_M, k_sub=_OPQ_KSUB, k=_OPQ_K, books=OPQ_BOOKS,
    )


# ---------------------------------------------------------------------------
