"""Stupid-backoff n-gram LM (llmops/ngramlm) and DSIR importance
resampling (llmops/dsir): pure-Python mirrors of the scoring math on
hand corpora that exercise every backoff level, plus the Gumbel
resample contract the SQL oracle cannot express.

The registered rows (llm_stupid_backoff / llm_dsir_weights) pin the
full-corpus results against DuckDB in tests/test_oracle_parity; these
tests pin the SEMANTICS against independent reimplementations.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.llmops.dsir import (
    dsir_bucket_models,
    dsir_log_weights,
    dsir_resample,
    hashed_ngram_features,
)
from curw_wrf_data_pusher_spark.llmops.ngramlm import (
    BI_SCALE,
    SCALE,
    UNI_SCALE,
    ngram_count_tables,
    stupid_backoff_scores,
)


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)


def _mirror_backoff(train_texts, eval_texts):
    """Independent dict-based stupid backoff (hash-keyed, like the
    engine, so collisions — if any — merge identically)."""
    uni: dict[int, int] = {}
    bi: dict[int, int] = {}
    tri: dict[int, int] = {}
    n_tokens = 0
    for t in train_texts:
        w = t.strip().split(" ")
        n_tokens += len(w)
        for x in w:
            uni[_h(x)] = uni.get(_h(x), 0) + 1
        for i in range(len(w) - 1):
            g = _h(w[i] + " " + w[i + 1])
            bi[g] = bi.get(g, 0) + 1
        for i in range(len(w) - 2):
            g = _h(w[i] + " " + w[i + 1] + " " + w[i + 2])
            tri[g] = tri.get(g, 0) + 1
    out = {}
    for doc_id, t in eval_texts:
        w = t.strip().split(" ")
        if len(w) < 3:
            continue
        counts = {"tri": 0, "bi": 0, "uni": 0}
        score = 0
        for i in range(len(w) - 2):
            h123 = _h(" ".join(w[i : i + 3]))
            h12 = _h(w[i] + " " + w[i + 1])
            h23 = _h(w[i + 1] + " " + w[i + 2])
            h2, h3 = _h(w[i + 1]), _h(w[i + 2])
            if tri.get(h123, 0) > 0 and bi.get(h12, 0) > 0:
                counts["tri"] += 1
                score += SCALE * tri[h123] // bi[h12]
            elif bi.get(h23, 0) > 0 and uni.get(h2, 0) > 0:
                counts["bi"] += 1
                score += BI_SCALE * bi[h23] // uni[h2]
            else:
                counts["uni"] += 1
                score += UNI_SCALE * uni.get(h3, 0) // max(n_tokens, 1)
        out[doc_id] = (len(w) - 2, counts, score)
    return out


def test_stupid_backoff_all_levels_vs_mirror(spark):
    # train: "a b c" seen, "b d" seen as bigram, "e" unigram-only,
    # "zz" never seen -> eval hits tri, bi, uni-seen and uni-unseen
    train = ["a b c a b c", "x b d y", "e e q"]
    ev = [
        (1, "a b c zz b d"),  # tri (a b c), uni (b c zz? ...), bi, ...
        (2, "zz zz zz"),  # pure unseen -> all uni with q = 0
        (3, "q a b c e x"),  # mixes tri + backoffs
    ]
    train_df = spark.createDataFrame(
        [(i + 100, t) for i, t in enumerate(train)], "doc_id long, text string"
    )
    ev_df = spark.createDataFrame(ev, "doc_id long, text string")
    tri, bi, uni, n_tokens = ngram_count_tables(train_df)
    got = {
        r["doc_id"]: r.asDict()
        for r in stupid_backoff_scores(ev_df, tri, bi, uni, n_tokens).collect()
    }
    exp = _mirror_backoff(train, ev)
    assert set(got) == set(exp)
    levels_seen = {"tri": 0, "bi": 0, "uni": 0}
    for doc_id, (n_sc, counts, score) in exp.items():
        g = got[doc_id]
        assert g["n_scored"] == n_sc
        assert (g["n_tri"], g["n_bi"], g["n_uni"]) == (
            counts["tri"],
            counts["bi"],
            counts["uni"],
        ), doc_id
        assert g["score_q"] == score, doc_id
        for k in levels_seen:
            levels_seen[k] += counts[k]
    # the corpus genuinely exercises every backoff level
    assert all(v > 0 for v in levels_seen.values()), levels_seen


def test_stupid_backoff_self_corpus_never_backs_off(spark):
    # scoring the training corpus itself: every trigram instance is a
    # trigram type of the count tables -> 100% tri level
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "b c d a b")], "doc_id long, text string"
    )
    tri, bi, uni, n = ngram_count_tables(docs)
    rows = stupid_backoff_scores(docs, tri, bi, uni, n).collect()
    assert all(r["n_bi"] == 0 and r["n_uni"] == 0 for r in rows)
    assert all(r["n_tri"] == r["n_scored"] for r in rows)


def _mirror_dsir(texts, targets, buckets=64, alpha=1.0):
    feats: dict[int, dict[int, int]] = {}
    for doc_id, t in texts:
        w = t.strip().split(" ")
        grams = list(w) + [w[i] + " " + w[i + 1] for i in range(len(w) - 1)]
        d = feats.setdefault(doc_id, {})
        for g in grams:
            b = _h(g) % buckets
            d[b] = d.get(b, 0) + 1
    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for doc_id, d in feats.items():
        for b, c in d.items():
            rc[b] = rc.get(b, 0) + c
            if doc_id in targets:
                tc[b] = tc.get(b, 0) + c
    t_total, r_total = sum(tc.values()), sum(rc.values())
    out = {}
    for doc_id, d in feats.items():
        logw = 0.0
        # bucket-sorted fold order, like the engine
        for b in sorted(d):
            c = d[b]
            ratio = ((tc.get(b, 0) + alpha) * (r_total + alpha * buckets)) / (
                (rc[b] + alpha) * (t_total + alpha * buckets)
            )
            logw += c * math.log(ratio)
        out[doc_id] = (
            sum(d.values()),
            sum(c * tc.get(b, 0) for b, c in d.items()),
            sum(c * rc[b] for b, c in d.items()),
            sum(c for b, c in d.items() if tc.get(b, 0) == 0),
            round(logw, 6),
        )
    return out


def test_dsir_weights_vs_mirror(spark):
    texts = [
        (1, "the quick brown fox jumps"),
        (2, "the quick quick fox"),
        (3, "lorem ipsum dolor sit amet"),
        (4, "brown fox the quick"),
        (5, "ipsum sit sit dolor"),
    ]
    targets = {1, 2}
    docs = spark.createDataFrame(
        [(i, "t" if i in targets else "r", t) for i, t in texts],
        "doc_id long, source string, text string",
    )
    feats = hashed_ngram_features(docs, buckets=64)
    models = dsir_bucket_models(
        feats, docs.filter(F.col("source") == "t").select("doc_id")
    ).localCheckpoint()
    t_total, r_total = models.agg(F.sum("tc"), F.sum("rc")).collect()[0]
    got = {
        r["doc_id"]: r.asDict()
        for r in dsir_log_weights(
            feats, models, int(t_total), int(r_total), buckets=64,
            alpha=1.0, score_scale=6,
        ).collect()
    }
    exp = _mirror_dsir(texts, targets, buckets=64)
    assert set(got) == set(exp)
    for doc_id, (n, dt, dr, un, lw) in exp.items():
        g = got[doc_id]
        assert (g["n_grams"], g["dot_t"], g["dot_r"], g["unseen_t"]) == (
            n, dt, dr, un,
        ), doc_id
        assert g["logw"] == pytest.approx(lw, abs=2e-6), doc_id
    # target docs must out-weigh the off-domain docs
    assert min(got[1]["logw"], got[2]["logw"]) > max(
        got[3]["logw"], got[5]["logw"]
    )


def test_dsir_resample_deterministic_and_seeded(spark):
    rows = [(i, float(i) / 7.0) for i in range(40)]
    w = spark.createDataFrame(rows, "doc_id long, logw double")
    top = dsir_resample(w, k=5, deterministic=True).collect()
    assert sorted(r["doc_id"] for r in top) == [35, 36, 37, 38, 39]
    s1 = {r["doc_id"] for r in dsir_resample(w, k=10, seed="s1").collect()}
    s1b = {r["doc_id"] for r in dsir_resample(w, k=10, seed="s1").collect()}
    s2 = {r["doc_id"] for r in dsir_resample(w, k=10, seed="s2").collect()}
    assert s1 == s1b  # same seed -> same sample
    assert s1 != s2  # different seed -> (overwhelmingly) different
    # Gumbel-top-k still biases toward heavy weights: the top-weight
    # quartile should dominate the sample
    heavy = sum(1 for d in s1 if d >= 30)
    assert heavy >= 4


def _df_counts(df, key, val):
    return {r[key]: r[val] for r in df.collect()}


def test_ngram_count_store_incremental_lifecycle(spark, tmp_path):
    from curw_wrf_data_pusher_spark.llmops.ngramlm import (
        compact_ngram_count_store,
        read_ngram_count_tables,
        update_ngram_count_store,
    )

    store = str(tmp_path / "lm_store")
    b1 = spark.createDataFrame(
        [(1, "a b c a"), (2, "b c d")], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(3, "c d e a b"), (4, "a")], "doc_id long, text string"
    )
    update_ngram_count_store(b1, store, batch="b1")
    update_ngram_count_store(b2, store, batch="b2")

    # merge-on-read == one-shot tables over the unioned corpus
    tri_s, bi_s, uni_s, n_s = read_ngram_count_tables(spark, store)
    tri_d, bi_d, uni_d, n_d = ngram_count_tables(b1.unionByName(b2))
    assert n_s == n_d == 13  # 4 + 3 + 5 + 1 tokens
    assert _df_counts(uni_s, "h", "c1") == _df_counts(uni_d, "h", "c1")
    assert _df_counts(bi_s, "h", "c2") == _df_counts(bi_d, "h", "c2")
    assert _df_counts(tri_s, "h", "c3") == _df_counts(tri_d, "h", "c3")

    # snapshot the first read's contents BEFORE replaying (an
    # overwrite rewrites the partition files, so pre-replay frames
    # must not be re-collected afterwards — standard store contract)
    uni_snap = _df_counts(uni_s, "h", "c1")
    bi_snap = _df_counts(bi_s, "h", "c2")
    tri_snap = _df_counts(tri_s, "h", "c3")

    # replaying a batch id is idempotent (dynamic partition overwrite)
    update_ngram_count_store(b2, store, batch="b2")
    tri_r, bi_r, uni_r, n_r = read_ngram_count_tables(spark, store)
    assert n_r == n_s
    assert _df_counts(uni_r, "h", "c1") == uni_snap

    # compaction sums partials; readers see identical tables
    compacted = str(tmp_path / "lm_store_compacted")
    compact_ngram_count_store(spark, store, compacted)
    tri_c, bi_c, uni_c, n_c = read_ngram_count_tables(spark, compacted)
    assert n_c == n_s
    assert _df_counts(tri_c, "h", "c3") == tri_snap
    assert _df_counts(bi_c, "h", "c2") == bi_snap
    assert _df_counts(uni_c, "h", "c1") == uni_snap

    # scoring from the store == scoring from the direct tables
    ev = spark.createDataFrame([(9, "a b c x y")], "doc_id long, text string")
    from_store = stupid_backoff_scores(ev, tri_r, bi_r, uni_r, n_r).collect()
    direct = stupid_backoff_scores(ev, tri_d, bi_d, uni_d, n_d).collect()
    key = lambda d: d["doc_id"]  # noqa: E731
    assert sorted((r.asDict() for r in from_store), key=key) == sorted(
        (r.asDict() for r in direct), key=key
    )


def test_corpus_entropy_vs_hand_values(spark):
    from curw_wrf_data_pusher_spark.llmops.textstats import corpus_entropy

    docs = spark.createDataFrame(
        [
            ("A", "a a b b"),          # uniform over 2 types -> ln 2
            ("B", "x x x"),            # single type -> 0
            ("C", "p q r s"),          # uniform over 4 types -> ln 4
            ("C", "p q"),              # second doc, same distribution
        ],
        "source string, text string",
    )
    got = {
        r["source"]: r.asDict()
        for r in corpus_entropy(docs, group_col="source").collect()
    }
    assert got["A"]["n_tokens"] == 4 and got["A"]["n_types"] == 2
    assert got["A"]["entropy"] == pytest.approx(math.log(2), abs=1e-9)
    assert got["B"]["n_tokens"] == 3 and got["B"]["n_types"] == 1
    assert abs(got["B"]["entropy"]) == 0.0  # single-type group
    assert got["C"]["n_tokens"] == 6 and got["C"]["n_types"] == 4
    # C: counts (2,2,1,1)/6 -> H = ln 6 - (4/6) ln 2
    expect = math.log(6) - (4 / 6) * math.log(2)
    assert got["C"]["entropy"] == pytest.approx(expect, abs=1e-9)


def test_stupid_backoff_counts_beyond_bigint_scale(spark):
    """100 TB-regime counts: scale*count exceeds BIGINT on every
    backoff level (c3 > 9.2e9 wraps SCALE*c3, num2 > 2.3e10 wraps
    BI_SCALE*num2, num1 > 5.7e10 wraps UNI_SCALE*num1).  The
    DECIMAL(38,0) widening keeps the integer chain exact where the
    old BIGINT multiply silently wrapped (ANSI off) or hard-errored
    (ANSI on — this session's default, so this test FAILS LOUDLY on a
    regression either way)."""
    C3 = 20_000_000_000          # trigram count at ~2.5e13 tokens
    CTX2 = 60_000_000_000
    NUM2 = 70_000_000_000
    CTX1 = 90_000_000_000
    NUM1 = 80_000_000_000
    N = 25_000_000_000_000       # ~100 TB of text
    tri = spark.createDataFrame([(_h("a b c"), C3)], "h long, c3 long")
    bi = spark.createDataFrame(
        [(_h("a b"), CTX2), (_h("c d"), NUM2)], "h long, c2 long"
    )
    uni = spark.createDataFrame(
        [(_h("c"), CTX1), (_h("z"), NUM1)], "h long, c1 long"
    )
    ev = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y z")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in stupid_backoff_scores(ev, tri, bi, uni, N).collect()
    }
    # doc 1: position (a b c) tri-level, position (b c d) bi-level
    exp1 = SCALE * C3 // CTX2 + BI_SCALE * NUM2 // CTX1
    assert (got[1]["n_tri"], got[1]["n_bi"]) == (1, 1)
    assert got[1]["score_q"] == exp1
    # doc 2: single position (x y z) backs off to the unigram of "z"
    exp2 = UNI_SCALE * NUM1 // N
    assert got[2]["n_uni"] == 1
    assert got[2]["score_q"] == exp2
    # sanity: every product genuinely exceeds the BIGINT range the
    # old arithmetic used
    assert min(SCALE * C3, BI_SCALE * NUM2, UNI_SCALE * NUM1) > 2**63


def test_gram_hash_single_definition():
    """textkeys declares itself the ONE hash definition every
    gram-hashing family shares; this pins the contract — a private
    copy of the conv(substring(md5 expression anywhere else in the
    package is the silent-desync hazard the docstring warns about."""
    import pathlib

    import curw_wrf_data_pusher_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    offenders = [
        str(p.relative_to(root))
        for p in root.rglob("*.py")
        if p.name != "textkeys.py"
        and "conv(substring(md5" in p.read_text()
    ]
    assert offenders == [], (
        f"inline gram-hash copies outside textkeys.py: {offenders}"
    )
