"""Filtering, mixing, and split families (split from the former
queries/llm.py monolith): SemDeDup, n-gram log-frequency, vocab
top-k, the quality classifier, temperature mixing, text
normalization, train/test splits, exact set-similarity (self + cross)
joins, per-source caps, and tokenizer encoding.  Registration order
is load-bearing (queries/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llmops.dedup import shingles
from ..sources.lake import load_table
from .registry import register
from .llm_dedup import _SHINGLE_CTE


# llm_semantic_dedup: SemDeDup (cluster-then-compare) end-to-end.  The
# DuckDB mirror re-derives the md5-ordered centroid seeds, the
# cosine-argmax assignment (tie to the smallest centroid index) and
# the same-cell exists-earlier drop rule, so the whole algorithm —
# seeding, assignment, and dedup decision — is hash-pinned, not just
# the survivor count.  Registered in the tail (head window is full);
# tests/test_oracle_parity gates it locally.
@register(
    "llm_semantic_dedup",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    n AS (SELECT vec_id, e, sqrt(list_inner_product(e, e)) AS nrm
          FROM v),
    seeds AS (
      SELECT e AS c_e, nrm AS c_nrm,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                vec_id) - 1 AS cidx
      FROM n
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
    ),
    asg AS (
      SELECT vec_id, cluster FROM (
        SELECT n.vec_id, s.cidx AS cluster,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY round(list_inner_product(n.e, s.c_e)
                                / (n.nrm * s.c_nrm), 9) DESC,
                          s.cidx) AS rk
        FROM n CROSS JOIN seeds s
      ) WHERE rk = 1
    ),
    dropped AS (
      SELECT DISTINCT b.vec_id AS vec_id
      FROM asg a JOIN asg b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      JOIN n na ON na.vec_id = a.vec_id
      JOIN n nb ON nb.vec_id = b.vec_id
      WHERE round(list_inner_product(na.e, nb.e)
                  / (na.nrm * nb.nrm), 9) >= 0.35
    )
    SELECT a.vec_id, a.cluster, (d.vec_id IS NULL) AS is_kept
    FROM asg a LEFT JOIN dropped d USING (vec_id)
    """,
)
def llm_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.simsearch import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, n_clusters=8, threshold=0.35)


# llm_ngram_logfreq: corpus-frequency fluency scoring (the hermetic
# analogue of CCNet's KenLM perplexity filter — the corpus is the
# language model).  The per-document double sum folds in gram-hash-
# sorted order on BOTH engines, so the hash pins the fold itself.
# Tail row; tests/test_oracle_parity gates it locally.
@register(
    "llm_ngram_logfreq",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t
                  FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
               i -> ('0x' || substr(md5(t[i] || ' ' || t[i+1]),
                                    1, 8))::BIGINT)) AS gh
      FROM toks WHERE len(t) >= 2
    ),
    c AS (SELECT gh, count(*) AS cnt FROM g GROUP BY gh),
    j AS (SELECT doc_id, g.gh, ln(cnt) AS lc
          FROM g JOIN c USING (gh)),
    sc AS (
      SELECT doc_id, count(*) AS n_grams,
             round(list_reduce(list_transform(
                 list_sort(list(struct_pack(g := gh, c := lc))),
                 x -> x.c), (a, b) -> a + b) / count(*), 9)
               AS avg_logfreq
      FROM j GROUP BY doc_id
    ),
    b AS (
      SELECT quantile_cont(avg_logfreq, 0.3333333333333333) AS lo,
             quantile_cont(avg_logfreq, 0.6666666666666666) AS hi
      FROM sc
    )
    SELECT sc.doc_id, sc.n_grams, sc.avg_logfreq,
           CASE WHEN sc.avg_logfreq >= b.hi THEN 'head'
                WHEN sc.avg_logfreq >= b.lo THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM sc CROSS JOIN b
    """,
)
def llm_ngram_logfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.retrieval import ngram_logfreq_scores, score_cut_buckets
    from ..sources.lake import spread

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    # compound: the fluency scorer + the CCNet head/middle/tail tiering
    # (broadcast-boundary form, no global window — the exact Spark
    # percentile and DuckDB's quantile_cont share the linear-
    # interpolation definition, so the cut doubles agree bit-for-bit)
    return score_cut_buckets(ngram_logfreq_scores(docs, n=2))


# llm_vocab_topk: corpus vocabulary top-k (tokenizer-prep / Zipf
# diagnostic).  Exercises the TakeOrderedAndProject global top-k path
# (per-partition heaps, no full sort shuffle) with rank assignment via
# a k-bounded array sort instead of a partition-less window.  Tail
# row; tests/test_oracle_parity gates it locally.
@register(
    "llm_vocab_topk",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(trim(text), ' ')) AS term
                 FROM documents),
    c AS (SELECT term, count(*) AS n_occurrences FROM tok
          GROUP BY term)
    SELECT row_number() OVER (ORDER BY n_occurrences DESC, term)
             AS rank,
           term, n_occurrences
    FROM c ORDER BY n_occurrences DESC, term LIMIT 50
    """,
)
def llm_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.retrieval import vocab_topk
    from ..sources.lake import spread

    docs = spread(load_table(spark, sf_dir, "documents")).select("text")
    return vocab_topk(docs, k=50)


# llm_quality_classifier: model-based quality filtering (the GPT-3 /
# CCNet "train a classifier on a reference corpus, keep crawl docs it
# scores highly" stage).  Hashed-unigram Naive Bayes — closed-form fit
# is ONE count aggregation, so the whole train→score pipeline is
# deterministic and oracle-expressible; the driver hash pins the
# smoothed log-ratio weights, priors, per-doc scores AND the keep cut.
# In-sample demonstration: positive class = lang='en' documents.
# Tail row; tests/test_oracle_parity gates it locally.
@register(
    "llm_quality_classifier",
    oracle="""
    WITH tok AS (
      SELECT doc_id, (lang = 'en') AS y,
             ('0x' || substr(md5(t.token), 1, 8))::BIGINT % 1024
               AS bucket
      FROM documents, unnest(string_split(trim(text), ' ')) AS t(token)
    ),
    cnt AS (
      SELECT bucket,
             sum(CASE WHEN y THEN 1 ELSE 0 END) AS n_pos,
             sum(CASE WHEN y THEN 0 ELSE 1 END) AS n_neg
      FROM tok GROUP BY bucket
    ),
    tot AS (SELECT sum(n_pos) AS t_pos, sum(n_neg) AS t_neg FROM cnt),
    dpr AS (
      SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS d_pos,
             sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS d_neg
      FROM documents
    ),
    w AS (
      SELECT bucket,
             ln((n_pos + 1.0) / (t_pos + 1024.0))
               - ln((n_neg + 1.0) / (t_neg + 1024.0)) AS llr
      FROM cnt CROSS JOIN tot
    ),
    sc AS (
      SELECT tok.doc_id, count(*) AS n_tokens,
             round(ln(d_pos::DOUBLE / d_neg) + sum(w.llr), 6)
               AS score_r
      FROM tok JOIN w USING (bucket) CROSS JOIN dpr
      GROUP BY tok.doc_id, d_pos, d_neg
    )
    SELECT doc_id, n_tokens, score_r,
           (score_r > 0.0) AS keep
    FROM sc
    """,
)
def llm_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.quality_model import score_quality_nb, train_quality_nb
    from ..sources.lake import spread

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", (F.col("lang") == "en").alias("label")
    )
    model = train_quality_nb(
        docs, label_col="label", n_buckets=1024, alpha=1.0
    )
    scored = score_quality_nb(docs, model)
    # round BEFORE the keep cut so the boolean is a function of the
    # hash-pinned rounded value in both engines (sum-order float noise
    # can't flip it)
    score_r = F.round(F.col("score"), 6).alias("score_r")
    return scored.select(
        "doc_id", "n_tokens", score_r
    ).withColumn("keep", F.col("score_r") > F.lit(0.0))


# llm_temperature_mix: temperature-α source rebalancing (mBERT/XLM-R
# multinomial smoothing) realized as a deterministic epoch-weighted
# corpus.  α=0.5 keeps every float op correctly rounded (sqrt + IEEE
# div/mul), so the md5-threshold copy decisions agree bit-for-bit and
# the driver hash pins weight DERIVATION + realized multiplicities.
# Tail row; tests/test_oracle_parity gates it locally.
@register(
    "llm_temperature_mix",
    oracle="""
    WITH cnt AS (
      SELECT source, count(*)::DOUBLE AS c FROM documents GROUP BY source
    ),
    tot AS (
      SELECT sum(c) AS n,
             /* sorted-group fold mirrors the Python-side sum order */
             list_reduce(list_transform(
                 list_sort(list(struct_pack(g := source, c := c))),
                 x -> sqrt(x.c)), (a, b) -> a + b) AS z
      FROM cnt
    ),
    w AS (
      SELECT source, ((sqrt(c) / z) * n) / c AS w
      FROM cnt CROSS JOIN tot
    ),
    b AS (
      SELECT doc_id, d.source,
             ('0x' || substr(md5('sample:v1:' || CAST(doc_id AS VARCHAR)),
                             1, 8))::BIGINT AS h32,
             w.w
      FROM documents d JOIN w USING (source)
    ),
    c2 AS (
      SELECT doc_id, source, round(w, 9) AS w_r,
             CAST(floor(w) AS BIGINT)
               + CASE WHEN h32 < (w - floor(w)) * 4294967296.0
                      THEN 1 ELSE 0 END AS n
      FROM b
    )
    SELECT doc_id, source, w_r, unnest(range(0, n)) AS copy_id FROM c2
    """,
)
def llm_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.curation import (
        match_case,
        temperature_mix,
        temperature_weights,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    weights = temperature_weights(docs, alpha=0.5)
    w_expr = match_case(F.col("source"), weights, None)
    return (
        temperature_mix(docs, alpha=0.5)
        .withColumn("w_r", F.round(w_expr, 9))
        .select("doc_id", "source", "w_r", F.col("copy_id").cast("long"))
    )


# llm_normalize_text: canonicalization tier (control-char strip,
# whitespace collapse, casefold, Unicode NFC).  The corpus is ASCII,
# so a synthetic messy suffix (double space, combining acute, tab,
# uppercase, BEL) is appended to every doc to make each tier bite —
# same device as the redact_pii gate.  The NFC tier runs through the
# Arrow pandas_udf on the Spark side and nfc_normalize in DuckDB;
# clean_md5 pins the full byte-level output.  Tail row;
# tests/test_oracle_parity gates it locally.
@register(
    "llm_normalize_text",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             /* chr()-built suffix: register() collapses whitespace
                runs in oracle strings, so a literal '  ' would lose
                a byte */
             text || chr(32) || chr(32) || chr(101) || chr(769)
                  || chr(9) || 'X' || chr(7) || chr(32) AS raw
      FROM documents
    ),
    n AS (
      SELECT doc_id, raw,
             nfc_normalize(lower(trim(regexp_replace(regexp_replace(
                 raw, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
                 '[ \\t\\r\\n]+', ' ', 'g')))) AS clean
      FROM aug
    )
    /* byte lengths: DuckDB length() counts grapheme CLUSTERS (the
       combining acute collapses), Spark counts UTF-16 units — octet
       lengths agree everywhere */
    SELECT doc_id, strlen(raw) AS len_raw, strlen(clean) AS len_clean,
           md5(clean) AS clean_md5
    FROM n
    """,
)
def llm_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.curation import normalize_text

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("text"), F.lit("  e\u0301\tX\x07 ")).alias("raw"),
    )
    n = normalize_text(
        docs, text_col="raw", out_col="clean", lowercase=True, form="NFC"
    )
    return n.select(
        "doc_id",
        F.octet_length("raw").cast("long").alias("len_raw"),
        F.octet_length("clean").cast("long").alias("len_clean"),
        F.md5("clean").alias("clean_md5"),
    )


# ---------------------------------------------------------------------------
# Leakage-safe train/valid/test split: GROUP-level md5 assignment so
# documents sharing a group key (domain / crawl page / dedup cluster —
# here a source#page stand-in built from source and doc_id) never
# straddle the train/eval boundary.  Compound row: per-doc assignments
# + per-split totals + the structural leak audit (must be 0 groups).
# Thresholds are the first 8 md5 hex chars vs literals: train < 0.8,
# valid < 0.9 of the 16^8 space (cccccccc / e6666666).
@register(
    "llm_train_test_split",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             source || '#' || CAST(doc_id // 8 AS VARCHAR) AS group_key
      FROM documents
    ),
    a AS (
      SELECT doc_id, group_key,
             CASE WHEN substr(md5(group_key || '|' || 'split-v1'), 1, 8)
                       < 'cccccccc' THEN 'train'
                  WHEN substr(md5(group_key || '|' || 'split-v1'), 1, 8)
                       < 'e6666666' THEN 'valid'
                  ELSE 'test' END AS split
      FROM g
    ),
    leak AS (
      SELECT count(*) AS n
      FROM (SELECT group_key FROM a GROUP BY group_key
            HAVING count(DISTINCT split) > 1)
    )
    SELECT 'assign' AS part, doc_id, group_key, split, 1::BIGINT AS n
    FROM a
    UNION ALL
    SELECT 'summary', NULL, NULL, split, count(*) FROM a GROUP BY split
    UNION ALL
    SELECT 'leak', NULL, NULL, NULL, n FROM leak
    """,
)
def llm_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.splits import grouped_split, split_leakage_report

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            "#", F.col("source"), (F.col("doc_id") / 8).cast("long").cast("string")
        ).alias("group_key"),
    )
    a = grouped_split(docs, "group_key")
    assign = a.select(
        F.lit("assign").alias("part"),
        "doc_id",
        "group_key",
        "split",
        F.lit(1).cast("long").alias("n"),
    )
    summary = a.groupBy("split").agg(F.count("*").alias("n")).select(
        F.lit("summary").alias("part"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("string").alias("group_key"),
        "split",
        "n",
    )
    leak = split_leakage_report(a, "group_key").select(
        F.lit("leak").alias("part"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("string").alias("group_key"),
        F.lit(None).cast("string").alias("split"),
        F.col("n_leaky_groups").cast("long").alias("n"),
    )
    return assign.unionByName(summary).unionByName(leak)


# ---------------------------------------------------------------------------
# Exact set-similarity self-join (AllPairs/PPJoin prefix filtering):
# the scalable EXACT replacement for the quadratic all-pairs Jaccard.
# The oracle is the quadratic baseline itself, so this row pins the
# prefix filter's recall-1.0 claim end-to-end: every pair the
# quadratic join finds at J ≥ 0.5, the prefix-filtered plan must find
# with the identical jaccard value — and no extras.  Set elements are
# the 3-gram shingles (word SETS are degenerate on this corpus: a
# 31-word vocabulary makes nearly every doc pair word-similar).
@register(
    "llm_setsim_pairs",
    oracle=f"""
    {_SHINGLE_CTE},
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    i AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(inter::DOUBLE / (sa.n + sb.n - inter), 9) AS jaccard
    FROM i JOIN sz sa ON sa.doc_id = i.id_a
           JOIN sz sb ON sb.doc_id = i.id_b
    WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.5
    """,
)
def llm_setsim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.dedup import shingles
    from ..llmops.setjoin import setsim_join

    docs = load_table(spark, sf_dir, "documents")
    out = setsim_join(
        shingles(docs), token_col="shingle", threshold=0.5
    )
    return out.select(
        "id_a", "id_b", F.round("jaccard", 9).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# Deterministic per-source document cap — the hard-ceiling companion
# to rate-based stratified sampling.  The oracle re-derives the
# hash-order rank, so the row pins the exact kept SET, not just its
# size per group.
@register(
    "llm_source_cap",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('cap:v1:' || doc_id::VARCHAR), doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= 15
    """,
)
def llm_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.curation import cap_per_group

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_per_group(docs, max_per_group=15, group_col="source")


# ---------------------------------------------------------------------------
# Cross-corpus (R×S) exact set-similarity join: the corpus split into
# even/odd doc_id halves stands in for train-vs-benchmark; the oracle
# is the quadratic cross-side baseline, so the row pins the R×S prefix
# filter's recall end-to-end (union-wide token order, cross-side-only
# pair expansion, per-side verify joins).
@register(
    "llm_setsim_cross",
    oracle=f"""
    {_SHINGLE_CTE},
    a AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 2 = 0),
    b AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 2 = 1),
    sza AS (SELECT doc_id, count(*) AS n FROM a GROUP BY doc_id),
    szb AS (SELECT doc_id, count(*) AS n FROM b GROUP BY doc_id),
    i AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM a JOIN b ON a.shingle = b.shingle
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(inter::DOUBLE / (sza.n + szb.n - inter), 9) AS jaccard
    FROM i JOIN sza ON sza.doc_id = i.id_a
           JOIN szb ON szb.doc_id = i.id_b
    WHERE inter::DOUBLE / (sza.n + szb.n - inter) >= 0.5
    """,
)
def llm_setsim_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.dedup import shingles
    from ..llmops.setjoin import setsim_join_between

    docs = load_table(spark, sf_dir, "documents")
    tok_a = shingles(docs.filter(F.col("doc_id") % 2 == 0))
    tok_b = shingles(docs.filter(F.col("doc_id") % 2 == 1))
    out = setsim_join_between(
        tok_a, tok_b, token_col="shingle", threshold=0.5
    )
    return out.select(
        "id_a", "id_b", F.round("jaccard", 9).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# Token encoding against a learned vocabulary: vocab_topk(k=20) leaves
# 11 of the corpus's 31 words out-of-vocabulary, so the row pins vocab
# construction, the broadcast lookup, OOV mapping AND exact sequence
# order (ids_md5 is order-sensitive via the position sort).
@register(
    "llm_token_encode",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(trim(text), ' ')) AS term
                 FROM documents),
    c AS (SELECT term, count(*) AS n FROM tok GROUP BY term
          ORDER BY n DESC, term LIMIT 20),
    v AS (SELECT row_number() OVER (ORDER BY n DESC, term) AS tid, term
          FROM c),
    d AS (SELECT doc_id, unnest(l) AS term,
                 generate_subscripts(l, 1) AS pos
          FROM (SELECT doc_id, string_split(trim(text), ' ') AS l
                FROM documents)),
    e AS (SELECT d.doc_id, d.pos, coalesce(v.tid, -1) AS tid
          FROM d LEFT JOIN v USING (term))
    SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           md5(string_agg(tid::VARCHAR, ',' ORDER BY pos)) AS ids_md5
    FROM e GROUP BY doc_id
    """,
)
def llm_token_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.retrieval import encode_tokens, vocab_topk

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    vocab = vocab_topk(docs, k=20)
    enc = encode_tokens(docs, vocab)
    return enc.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        F.md5(
            F.array_join(
                F.transform(F.col("ids"), lambda x: x.cast("string")), ","
            )
        ).alias("ids_md5"),
    )


