"""Language-model statistics and media decode (split from the
former queries/llm.py monolith): GloVe-style co-occurrence, privacy
audit, real WAV/BMP/PNG media decode, stupid-backoff LM scores, DSIR
importance weights, the incremental n-gram count store, and
per-source corpus entropy.  Registration order is load-bearing
(queries/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lake import load_table
from .registry import register


# GloVe-style windowed co-occurrence counts
# (llmops/textstats.cooccurrence_counts): the embedding-training
# pre-pass — symmetric order-normalized token pairs within a ±4
# window, exact integer counts, top-50 by (cnt DESC, a, b).  The
# expansion is map-side O(tokens × window); the oracle rebuilds it
# with a positional self-join.
@register(
    "llm_cooccurrence",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)),
                                               '\\s+'),
                         x -> x <> '') AS t
      FROM documents
      WHERE len(list_filter(regexp_split_to_array(trim(lower(text)),
                                                  '\\s+'),
                            x -> x <> '')) >= 2
    ),
    pos AS (
      SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS i
      FROM toks
    ),
    pairs AS (
      SELECT least(p.tok, q.tok) AS a, greatest(p.tok, q.tok) AS b
      FROM pos p JOIN pos q
        ON p.doc_id = q.doc_id AND q.i > p.i AND q.i <= p.i + 4
    )
    SELECT a, b, CAST(count(*) AS BIGINT) AS cnt
    FROM pairs GROUP BY a, b
    ORDER BY cnt DESC, a, b LIMIT 50
    """,
)
def llm_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.textstats import cooccurrence_counts
    from ..sources.lake import spread

    # spread: the pair expansion is map-side, so the single-file
    # scan's one partition serialized it (measured 4 tasks total)
    docs = spread(load_table(spark, sf_dir, "documents"))
    return cooccurrence_counts(docs, window=4).orderBy(
        F.desc("cnt"), "a", "b"
    ).limit(50)


# ---------------------------------------------------------------------------
# Training-data privacy audit (llmops/textstats.k_anonymity_audit):
# k-anonymity + l-diversity per (lang, source) quasi-identifier with
# the 50-char length bucket as the sensitive attribute — exact
# integer counts, so the flags hash across engines.  At sf0.01:
# 9/97 groups pass k=12, 49/97 pass l=4 (meaningful mixes).
@register(
    "llm_privacy_audit",
    oracle="""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT floor(n_chars / 50.0)::BIGINT)
                AS BIGINT) AS n_sensitive,
           count(*) >= 12 AS k_ok,
           count(DISTINCT floor(n_chars / 50.0)::BIGINT) >= 4 AS l_ok
    FROM documents GROUP BY lang, source
    """,
)
def llm_privacy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.textstats import k_anonymity_audit

    docs = load_table(spark, sf_dir, "documents")
    return k_anonymity_audit(
        docs, ["lang", "source"],
        F.floor(F.col("n_chars") / F.lit(50.0)).cast("long"),
        k=12, l=4,
    )


# ---------------------------------------------------------------------------
# REAL media decode gate (round 12, llmops/media_codecs): payloads are
# built IN SPARK with the real BMP/WAV encoders from arithmetic
# parameters of doc_id, then decoded by the real default decoders —
# and the oracle recomputes the same metadata ARITHMETICALLY (BMP
# n_bytes = 54 + height·stride with 4-byte row padding; mono 16-bit
# WAV n_bytes = 44 + 2·n_samples), so a wrong header walk, stride,
# padding or chunk layout in EITHER the encoder or the decoder breaks
# the hash.  Tail row (rotation candidate); tests/test_media_codecs.py
# carries the byte-level ground truth (stdlib `wave`, hand-filtered
# PNG scanlines).
@register(
    "llm_media_decode",
    oracle="""
    SELECT doc_id, 'image' AS modality,
           CAST(1 + doc_id % 13 AS INT) AS width,
           CAST(1 + doc_id % 7 AS INT) AS height,
           CAST(54 + (1 + doc_id % 7)
                     * (((1 + doc_id % 13) * 3 + 3) // 4 * 4)
                AS BIGINT) AS n_bytes,
           CAST(1 AS INT) AS n_frames, true AS ok
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, 'audio', 8000, 1,
           CAST(44 + 2 * (1 + doc_id % 50) AS BIGINT),
           CAST(1 + doc_id % 50 AS INT), true
    FROM documents WHERE doc_id % 2 = 1
    """,
)
def llm_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..llmops.multimodal import extract_media_metadata

    ids = load_table(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        import numpy as np

        from ..llmops.media_codecs import encode_bmp, encode_wav

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 2 == 0:
                    w, h = 1 + d % 13, 1 + d % 7
                    payload = encode_bmp(
                        np.full((h, w, 3), d % 256, dtype=np.uint8)
                    )
                    rows.append((d, "image", payload))
                else:
                    n = 1 + d % 50
                    payload = encode_wav(
                        np.full(n, d % 1000, dtype=np.int16), 8000
                    )
                    rows.append((d, "audio", payload))
            yield pd.DataFrame(
                rows, columns=["id", "modality", "content"]
            )

    media = ids.mapInPandas(
        build, "id long, modality string, content binary"
    )
    meta = extract_media_metadata(media)
    return meta.select(
        F.col("id").alias("doc_id"), "modality",
        "width", "height", "n_bytes", "n_frames", "ok",
    )


# ---------------------------------------------------------------------------
# Stupid-backoff n-gram LM scoring (Brants et al., EMNLP 2007 — the
# count-table LM designed FOR distributed engines).  Counts come from
# the even-doc_id half of the corpus; the odd half is scored, so the
# backoff chain genuinely fires (self-corpus scoring never backs off).
# EXACT-INTEGER oracle: per-position scores quantize to nano-units
# with pure BIGINT floor division on both engines (Spark `div`,
# DuckDB `//`) — no float enters the hash anywhere; see
# llmops/ngramlm.py for the scale story (type-level score table; the
# token-scale shuffles are fixed at two — type join-back + doc agg —
# regardless of backoff depth).  Tail row; tests/test_oracle_parity
# gates it locally.
@register(
    "llm_stupid_backoff",
    oracle="""
    WITH tr AS (SELECT string_split(trim(text), ' ') AS t
                FROM documents WHERE doc_id % 2 = 0),
    ev AS (SELECT doc_id, string_split(trim(text), ' ') AS t
           FROM documents WHERE doc_id % 2 = 1),
    uni AS (SELECT h, count(*) AS c1 FROM (
              SELECT ('0x' || substr(md5(unnest(t)), 1, 8))::BIGINT AS h
              FROM tr) GROUP BY h),
    bi AS (SELECT h, count(*) AS c2 FROM (
             SELECT ('0x' || substr(md5(unnest(list_transform(
                      range(1, len(t)), i -> t[i] || ' ' || t[i+1]))),
                    1, 8))::BIGINT AS h
             FROM tr WHERE len(t) >= 2) GROUP BY h),
    tric AS (SELECT h, count(*) AS c3 FROM (
               SELECT ('0x' || substr(md5(unnest(list_transform(
                        range(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))),
                      1, 8))::BIGINT AS h
               FROM tr WHERE len(t) >= 3) GROUP BY h),
    n AS (SELECT greatest(coalesce(sum(len(t)), 0), 1) AS n_tokens
          FROM tr),
    pos AS (SELECT doc_id,
                   unnest(list_transform(range(1, len(t) - 1),
                     i -> struct_pack(
                       h123 := ('0x' || substr(md5(t[i] || ' ' || t[i+1]
                                || ' ' || t[i+2]), 1, 8))::BIGINT,
                       h12 := ('0x' || substr(md5(t[i] || ' ' || t[i+1]),
                               1, 8))::BIGINT,
                       h23 := ('0x' || substr(md5(t[i+1] || ' ' || t[i+2]),
                               1, 8))::BIGINT,
                       h2 := ('0x' || substr(md5(t[i+1]), 1, 8))::BIGINT,
                       h3 := ('0x' || substr(md5(t[i+2]), 1, 8))::BIGINT
                     ))) AS p
            FROM ev WHERE len(t) >= 3),
    flat AS (SELECT doc_id, p.h123 AS h123, p.h12 AS h12, p.h23 AS h23,
                    p.h2 AS h2, p.h3 AS h3 FROM pos),
    sc AS (
      SELECT f.doc_id,
             CASE WHEN coalesce(c3, 0) > 0 AND coalesce(b1.c2, 0) > 0
                    THEN 'tri'
                  WHEN coalesce(b2.c2, 0) > 0 AND coalesce(u1.c1, 0) > 0
                    THEN 'bi'
                  ELSE 'uni' END AS level,
             CASE WHEN coalesce(c3, 0) > 0 AND coalesce(b1.c2, 0) > 0
                    THEN (1000000000::BIGINT * c3) // b1.c2
                  WHEN coalesce(b2.c2, 0) > 0 AND coalesce(u1.c1, 0) > 0
                    THEN (400000000::BIGINT * b2.c2) // u1.c1
                  ELSE (160000000::BIGINT * coalesce(u2.c1, 0))
                       // n.n_tokens END AS q
      FROM flat f
      LEFT JOIN tric ON f.h123 = tric.h
      LEFT JOIN bi b1 ON f.h12 = b1.h
      LEFT JOIN bi b2 ON f.h23 = b2.h
      LEFT JOIN uni u1 ON f.h2 = u1.h
      LEFT JOIN uni u2 ON f.h3 = u2.h
      CROSS JOIN n)
    SELECT doc_id, count(*) AS n_scored,
           sum(CASE WHEN level = 'tri' THEN 1 ELSE 0 END)::BIGINT AS n_tri,
           sum(CASE WHEN level = 'bi' THEN 1 ELSE 0 END)::BIGINT AS n_bi,
           sum(CASE WHEN level = 'uni' THEN 1 ELSE 0 END)::BIGINT AS n_uni,
           sum(q)::BIGINT AS score_q
    FROM sc GROUP BY doc_id
    """,
)
def llm_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.ngramlm import ngram_count_tables, stupid_backoff_scores
    from ..sources.lake import spread

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    train = docs.filter(F.col("doc_id") % 2 == 0)
    ev = docs.filter(F.col("doc_id") % 2 == 1)
    tri, bi, uni, n_tokens = ngram_count_tables(train)
    return stupid_backoff_scores(ev, tri, bi, uni, n_tokens)


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al., NeurIPS 2023): hashed
# bag-of-ngrams importance of every document against a target domain
# (here sources src0-src2 standing in for the curated target).  The
# integer invariants (gram counts, count-table dot products, unseen
# target mass) are EXACT BIGINT; the log importance weight folds in
# bucket-sorted order and rounds to 6 dp (the repo's reproducible-ln
# contract, with a coarser grain than logfreq because the unnormalized
# sum is larger).  Resampling (Gumbel top-k) is pytest-gated in
# tests/test_dsir_ngramlm.py — argsort of seeded keys has no stable
# SQL form.  Tail row; tests/test_oracle_parity gates it locally.
@register(
    "llm_dsir_weights",
    oracle="""
    WITH tok AS (SELECT doc_id, source,
                        string_split(trim(text), ' ') AS t
                 FROM documents),
    grams AS (
      SELECT doc_id,
             ('0x' || substr(md5(unnest(t)), 1, 8))::BIGINT % 4096
               AS bucket
      FROM tok
      UNION ALL
      SELECT doc_id,
             ('0x' || substr(md5(unnest(list_transform(range(1, len(t)),
                      i -> t[i] || ' ' || t[i+1]))), 1, 8))::BIGINT % 4096
      FROM tok WHERE len(t) >= 2),
    feats AS (SELECT doc_id, bucket, count(*) AS c
              FROM grams GROUP BY doc_id, bucket),
    flag AS (SELECT doc_id,
                    CASE WHEN source IN ('src0', 'src1', 'src2')
                         THEN 1 ELSE 0 END AS is_t
             FROM documents),
    models AS (
      SELECT bucket,
             sum(CASE WHEN is_t = 1 THEN c ELSE 0 END)::BIGINT AS tc,
             sum(c)::BIGINT AS rc
      FROM feats JOIN flag USING (doc_id) GROUP BY bucket),
    tot AS (SELECT sum(tc)::DOUBLE AS t_total,
                   sum(rc)::DOUBLE AS r_total FROM models),
    j AS (
      SELECT doc_id, bucket, c, tc, rc,
             c * ln(((tc + 1.0) * (r_total + 4096.0))
                    / ((rc + 1.0) * (t_total + 4096.0))) AS contrib
      FROM feats JOIN models USING (bucket) CROSS JOIN tot)
    SELECT doc_id,
           sum(c)::BIGINT AS n_grams,
           sum(c * tc)::BIGINT AS dot_t,
           sum(c * rc)::BIGINT AS dot_r,
           sum(CASE WHEN tc = 0 THEN c ELSE 0 END)::BIGINT AS unseen_t,
           round(list_reduce(list_transform(
               list_sort(list(struct_pack(b := bucket, v := contrib))),
               x -> x.v), (a, b) -> a + b), 6) AS logw
    FROM j GROUP BY doc_id
    """,
)
def llm_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.dsir import (
        dsir_bucket_models,
        dsir_log_weights,
        hashed_ngram_features,
    )
    from ..sources.lake import spread

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "text"
    )
    feats = hashed_ngram_features(docs, buckets=4096).localCheckpoint(
        eager=False
    )
    target_ids = docs.filter(
        F.col("source").isin("src0", "src1", "src2")
    ).select("doc_id")
    # Both corpus-scale consumers (the bucket models and the scoring
    # join) read the checkpointed feats — (id, bucket, c) is ~20 B of
    # fixed-width ints per row, cheaper to materialize once on local
    # disk than to re-run the tokenize + per-gram md5 explode (A/B at
    # sf0.1: 2.41 -> 2.22 s best-of-5).  models is a B-row frame; its
    # checkpoint makes the totals collect read 4096 materialized rows.
    models = dsir_bucket_models(feats, target_ids).localCheckpoint()
    t_total, r_total = models.agg(
        F.sum("tc"), F.sum("rc")
    ).collect()[0]
    return dsir_log_weights(
        feats, models, int(t_total), int(r_total),
        buckets=4096, alpha=1.0, score_scale=6,
    )


# ---------------------------------------------------------------------------
# Incremental n-gram count STORE lifecycle, oracle-gated: the Spark
# side builds the store from TWO batch appends (even/odd doc_ids) into
# a per-(sf,mtime) cached temp directory, then answers from the
# MERGE-ON-READ view (read_merged_counts + split_count_tables) — while
# the oracle computes trigram counts directly over the whole corpus
# and never sees a store.  A hash match therefore proves
# two-batch-append + partial-sum-on-read == one-shot counting, the
# store's core algebra, under the driver's gate (the lifecycle edges —
# replay idempotence, compaction, store-fed scoring — stay in
# tests/test_dsir_ngramlm.py).  Top-50 trigrams by (count desc, hash)
# with the k-bounded array-rank device (no partition-less window).
@register(
    "llm_ngram_store_topk",
    oracle="""
    WITH toks AS (SELECT string_split(trim(text), ' ') AS t
                  FROM documents),
    tri AS (SELECT ('0x' || substr(md5(unnest(list_transform(
                     range(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))),
                   1, 8))::BIGINT AS h
            FROM toks WHERE len(t) >= 3),
    c AS (SELECT h, count(*) AS c3 FROM tri GROUP BY h),
    top AS (SELECT h, c3 FROM c ORDER BY c3 DESC, h LIMIT 50)
    SELECT row_number() OVER (ORDER BY c3 DESC, h) AS rank, h, c3
    FROM top
    """,
)
def llm_ngram_store_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..llmops.ngramlm import (
        read_merged_counts,
        split_count_tables,
        update_ngram_count_store,
    )
    from ..sources.lake import spread

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    # key the cached store on (sf_dir, source mtime), like the PQ
    # index row: a regenerated dataset rebuilds instead of serving a
    # stale store.  Completeness is a COMMIT MARKER, not directory
    # existence: a crashed or concurrently-running build exposes a
    # batch partition directory before its write commits, so
    # directory presence could serve a half-built store.  Builds go
    # to a pid-private dir, the _COMPLETE sentinel lands after BOTH
    # batches succeed, and an atomic rename publishes; losing the
    # publish race just means serving our own complete private build.
    src = os.path.join(sf_dir, "documents.parquet")
    mtime = int(os.stat(src).st_mtime) if os.path.exists(src) else 0
    tag = f'{sf_dir.strip("/").replace("/", "_")}_{mtime}'
    store = os.path.join(
        tempfile.gettempdir(), f"spark_graft_lm_store_{tag}"
    )
    if not os.path.exists(os.path.join(store, "_COMPLETE")):
        import shutil

        build = f"{store}.build-{os.getpid()}"
        shutil.rmtree(build, ignore_errors=True)
        update_ngram_count_store(
            docs.filter(F.col("doc_id") % 2 == 0), build, batch="even"
        )
        update_ngram_count_store(
            docs.filter(F.col("doc_id") % 2 == 1), build, batch="odd"
        )
        with open(os.path.join(build, "_COMPLETE"), "w"):
            pass
        if os.path.exists(os.path.join(store, "_COMPLETE")):
            # another process committed while we built: serve theirs
            shutil.rmtree(build, ignore_errors=True)
        else:
            try:
                if os.path.isdir(store):
                    # stale half-build leftover (no _COMPLETE marker)
                    shutil.rmtree(store)
                os.rename(build, store)
            except OSError:
                # lost the publish race: our build is still complete
                store = build
    tri, _, _ = split_count_tables(read_merged_counts(spark, store))
    top = tri.orderBy(F.col("c3").desc(), F.col("h")).limit(50)
    packed = top.agg(
        F.array_sort(
            F.collect_list(
                F.struct((-F.col("c3")).alias("negc"), F.col("h").alias("h"))
            )
        ).alias("a")
    )
    return packed.select(F.posexplode("a").alias("pos", "s")).select(
        (F.col("pos") + 1).cast("long").alias("rank"),
        F.col("s.h").alias("h"),
        (-F.col("s.negc")).cast("long").alias("c3"),
    )


# ---------------------------------------------------------------------------
# Per-source unigram Shannon entropy + type/token counts — the corpus
# card's lexical diagnostic (low entropy flags templated/collapsed
# sources; the type count sizes the tokenizer budget).  Exact BIGINT
# counts; the entropy double uses the repo's reproducible-ln contract
# (hash-sorted fold, 9 dp, identical p = c/(1.0*N) expression trees in
# both engines).  Tail row; tests/test_oracle_parity gates it locally.
@register(
    "llm_corpus_entropy",
    oracle="""
    WITH tok AS (SELECT source, unnest(string_split(trim(text), ' '))
                   AS w
                 FROM documents),
    hs AS (SELECT source,
                  ('0x' || substr(md5(w), 1, 8))::BIGINT AS h
           FROM tok),
    c AS (SELECT source, h, count(*) AS c FROM hs GROUP BY source, h),
    n AS (SELECT source, sum(c) AS n_tokens FROM c GROUP BY source),
    j AS (SELECT c.source, c.h, n.n_tokens,
                 -((c.c / (1.0 * n.n_tokens))
                   * ln(c.c / (1.0 * n.n_tokens))) AS contrib
          FROM c JOIN n USING (source))
    SELECT source,
           max(n_tokens)::BIGINT AS n_tokens,
           count(*)::BIGINT AS n_types,
           round(list_reduce(list_transform(
               list_sort(list(struct_pack(t := h, c := contrib))),
               x -> x.c), (a, b) -> a + b), 9) AS entropy
    FROM j GROUP BY source
    """,
)
def llm_corpus_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.textstats import corpus_entropy
    from ..sources.lake import spread

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "source", "text"
    )
    return corpus_entropy(docs, group_col="source")
