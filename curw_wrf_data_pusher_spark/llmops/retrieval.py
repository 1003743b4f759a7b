"""Lexical retrieval scoring over the documents table: corpus term
statistics, TF-IDF, and BM25 — the ranking tier a training-data
pipeline uses for quality-weighted sampling, query-based corpus
slicing, and contamination triage.

Beyond-reference surface (the reference engine — wrf_data_pusher.py —
has no text-retrieval path).

Plan shape at 100 TB: tokens explode map-side and are immediately
filtered to the query-term set (a broadcast literal array), so only
matching (doc, term) rows ever shuffle — one hash aggregation for
term frequencies.  The corpus-level statistics (N, avgdl, per-term
document frequency) partial-aggregate map-side to |terms|+1 rows and
ride back on broadcast joins.  No UDFs; every expression is JVM-side
Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textkeys import gram_hash_sql


def _tokens(text_col: str) -> Column:
    """Whitespace tokens of the trimmed text — the same tokenization
    textstats uses (split on single spaces), so retrieval and quality
    features agree on document length."""
    return F.split(F.trim(F.col(text_col)), " ")


def term_stats(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(document, query-term) term frequency plus document length:
    (id, term, tf, dl).  Documents containing none of the terms have
    no rows here — BM25/TF-IDF treat them as score 0.

    The explode is filtered to the query terms BEFORE any shuffle, so
    the aggregation input is |matches|, not |corpus tokens|."""
    toks = docs.select(
        F.col(id_col),
        F.size(_tokens(text_col)).alias("dl"),
        F.explode(_tokens(text_col)).alias("term"),
    ).filter(F.col("term").isin(terms))
    return toks.groupBy(id_col, "term", "dl").agg(
        F.count("*").cast("long").alias("tf")
    )


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    score_scale: int = 9,
) -> DataFrame:
    """Okapi BM25 score of every matching document for the query-term
    bag ``terms`` (standard formulation, idf = ln(1 + (N - df + 0.5) /
    (df + 0.5))):

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Returns (id, score, n_matched) for documents matching ≥ 1 term,
    rounded to ``score_scale`` decimals for cross-engine determinism.

    Corpus stats (N, avgdl) reduce to ONE row and per-term df to
    |terms| rows — both broadcast; the per-document work never
    re-shuffles after the single term-frequency aggregation."""
    ts = term_stats(docs, terms, id_col, text_col)
    corpus = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size(_tokens(text_col))).alias("avgdl"),
    )
    df_t = ts.groupBy("term").agg(
        F.count("*").cast("double").alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_part = (
        F.col("tf").cast("double") * F.lit(k1 + 1.0)
    ) / (
        F.col("tf").cast("double")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
        )
    )
    return (
        ts.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn("contrib", idf * tf_part)
        .groupBy(id_col)
        .agg(
            _sorted_fold_sum(score_scale).alias("score"),
            F.count("*").cast("long").alias("n_matched"),
        )
    )


def _sorted_fold_sum(
    score_scale: int, key_col: str = "term", val_col: str = "contrib"
) -> Column:
    """Sum the per-``key_col`` ``val_col`` doubles in KEY-SORTED
    left-fold order instead of ``F.sum``: float addition isn't
    associative, so a shuffle-order-dependent sum changes in the last
    ulp across partitionings — this form is bit-reproducible on any
    cluster layout (and matches the DuckDB oracle's identical sorted
    list_reduce).  Per-document key lists are bounded (query terms /
    feature buckets), so the collect is a few elements, not a corpus
    blow-up.  Shared by the BM25/TF-IDF scorers and DSIR."""
    sorted_contribs = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(key_col).alias("t"), F.col(val_col).alias("c")
                )
            )
        ),
        lambda x: x["c"],
    )
    return F.round(
        F.aggregate(
            sorted_contribs, F.lit(0.0), lambda acc, v: acc + v
        ),
        score_scale,
    )


def tfidf_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    score_scale: int = 9,
) -> DataFrame:
    """Classic TF-IDF (tf · ln(N/df)) summed over the query terms —
    the simpler sibling of ``bm25_scores`` with the same plan shape.
    Returns (id, score, n_matched) for documents matching ≥ 1 term."""
    ts = term_stats(docs, terms, id_col, text_col)
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    df_t = ts.groupBy("term").agg(
        F.count("*").cast("double").alias("df")
    )
    contrib = F.col("tf").cast("double") * F.log(
        F.col("n_docs") / F.col("df")
    )
    return (
        ts.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("contrib", contrib)
        .groupBy(id_col)
        .agg(
            _sorted_fold_sum(score_scale).alias("score"),
            F.count("*").cast("long").alias("n_matched"),
        )
    )


def ngram_logfreq_scores(
    docs: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_scale: int = 9,
) -> DataFrame:
    """Per-document mean log corpus-frequency of its word n-grams — a
    data-derived fluency proxy.  CCNet filters on KenLM perplexity
    against an external LM; in a hermetic pipeline the corpus itself
    is the language model: documents whose n-grams are globally rare
    (OCR noise, gibberish, wrong-language fragments) score low, and
    template boilerplate scores anomalously high — curation filters
    both tails.

    Returns (id, n_grams, avg_logfreq) for documents with >= 1 n-gram
    (n-grams count WITH multiplicity; avg_logfreq = mean ln(corpus
    occurrences of the gram), rounded to ``score_scale``).

    Scale: grams hash map-side to 32-bit ints (the corpus-standard
    md5 convention — collisions merge counts, negligible and mirrored
    exactly by the oracle), so only (id, hash) rows shuffle.  Three
    uniform-key shuffles: the corpus gram count, the count join back
    onto the gram stream, and the per-document aggregate.  The count
    table is vocabulary-sized — too big to broadcast at 100 TB, which
    is why the join stays a shuffled equi-join on the uniform hash.
    The per-document sum folds in gram-hash-sorted order (same
    rationale as ``_sorted_fold_sum``) so the double total is
    bit-reproducible across partitionings and engines."""
    tok = docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), " ").alias("__t")
    ).filter(F.size("__t") >= n)
    parts = " || ' ' || ".join(f"__t[i + {j}]" for j in range(n))
    grams = tok.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, size(__t) - {n}),"
                f" i -> {gram_hash_sql(parts)})"
            )
        ).alias("__gh"),
    )
    counts = grams.groupBy("__gh").agg(F.count("*").alias("__cnt"))
    joined = grams.join(counts, "__gh").withColumn(
        "__lc", F.log(F.col("__cnt").cast("double"))
    )
    sorted_lcs = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("__gh").alias("g"), F.col("__lc").alias("c"))
            )
        ),
        lambda x: x["c"],
    )
    return joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_grams"),
        F.round(
            F.aggregate(sorted_lcs, F.lit(0.0), lambda a, v: a + v)
            / F.count("*"),
            score_scale,
        ).alias("avg_logfreq"),
    )


def score_cut_buckets(
    scores: DataFrame,
    score_col: str = "avg_logfreq",
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    bucket_col: str = "bucket",
) -> DataFrame:
    """CCNet-style corpus tiering: label each row ``head`` / ``middle``
    / ``tail`` by where its score falls against the corpus's two
    quantile boundaries (CCNet buckets by LM perplexity and keeps the
    head; compose with ``ngram_logfreq_scores`` for the hermetic
    equivalent).  ``head`` is the HIGHEST-scoring tier.

    Scale: deliberately NOT a global ``ntile``/``row_number`` window —
    a partition-less window serializes the whole corpus through one
    task.  Instead the two boundaries reduce to ONE row (exact
    interpolated percentiles, map-side partial aggregation), ride a
    broadcast cross join, and the labeling is a map-side comparison.
    Rows exactly on a boundary go to the higher tier (>= cut)."""
    lo, hi = sorted(cuts)
    bounds = scores.agg(
        F.expr(f"percentile(`{score_col}`, {lo})").alias("__lo"),
        F.expr(f"percentile(`{score_col}`, {hi})").alias("__hi"),
    )
    return (
        scores.crossJoin(F.broadcast(bounds))
        .withColumn(
            bucket_col,
            F.when(F.col(score_col) >= F.col("__hi"), F.lit("head"))
            .when(F.col(score_col) >= F.col("__lo"), F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .drop("__lo", "__hi")
    )


def vocab_topk(
    docs: DataFrame,
    k: int = 50,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """The corpus's top-``k`` vocabulary terms by occurrence count,
    with a deterministic dense rank (count desc, term asc) — the
    tokenizer-training / Zipf-diagnostic staple.

    Scale: one uniform hash-groupBy with map-side combine builds the
    term counts; the global top-k is orderBy+limit, which Spark plans
    as TakeOrderedAndProject (per-partition heaps + a k-row driver
    merge — NO full sort shuffle).  Ranks are then assigned by
    array-sorting the k survivors inside one aggregate row and
    posexploding — bounded by k, so no partition-less window enters
    the plan.  Returns (rank, term, n_occurrences)."""
    counts = (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )
    top = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("term")
    ).limit(k)
    packed = top.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("n_occurrences")).alias("negc"),
                    F.col("term").alias("t"),
                )
            )
        ).alias("a")
    )
    return packed.select(F.posexplode("a").alias("pos", "s")).select(
        (F.col("pos") + 1).cast("long").alias("rank"),
        F.col("s.t").alias("term"),
        (-F.col("s.negc")).cast("long").alias("n_occurrences"),
    )


def encode_tokens(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    term_col: str = "term",
    tid_col: str = "rank",
    oov_id: int = -1,
) -> DataFrame:
    """Encode each document's token sequence against a vocabulary
    (e.g. ``vocab_topk`` output): returns (id, ids array<long>,
    n_tokens, n_oov) with out-of-vocabulary tokens mapped to
    ``oov_id`` — the tokenize→ids step every training pipeline runs
    between curation and sharding.

    Scale: the vocabulary is top-k-bounded by construction, so the
    term lookup is a BROADCAST left join onto the exploded token
    stream; the only shuffle is the per-document reassembly on the id
    key, and order is restored by an in-row array sort on the carried
    position (no window)."""
    from ..sources.lake import spread

    toks = spread(docs).select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.col(text_col)), " ")).alias(
            "pos", "__term"
        ),
    )
    v = vocab.select(
        F.col(term_col).alias("__term"),
        F.col(tid_col).cast("long").alias("__tid"),
    )
    enc = toks.join(F.broadcast(v), "__term", "left").select(
        F.col(id_col),
        F.col("pos"),
        F.coalesce(F.col("__tid"), F.lit(int(oov_id)).cast("long")).alias(
            "tid"
        ),
    )
    packed = enc.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), F.col("tid")))
        ).alias("__a")
    )
    ids = F.transform(F.col("__a"), lambda s: s["tid"])
    return packed.select(
        F.col(id_col),
        ids.alias("ids"),
        F.size("__a").cast("long").alias("n_tokens"),
        F.size(
            F.filter(ids, lambda x: x == F.lit(int(oov_id)))
        ).cast("long").alias("n_oov"),
    )
