"""Text analysis operators: token counting, quality scoring, language
identification (n-gram/stopword heuristic), document fingerprinting.

All pure Catalyst expressions (split / array lambdas / regexp) — the
hot path stays inside whole-stage codegen; no Python executes per row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny stopword inventories for the heuristic language scorer.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein", "zu"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "dans"],
}
LANG_ORDER = ["en", "es", "de", "fr"]  # deterministic tie-break order


def _tokens(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), " ")


def token_count_expr(text_col: str = "text") -> Column:
    """Whitespace token count as a reusable COLUMN expression — the
    single definition behind ``text_features.n_tokens`` and the
    curation pipeline's length filter (one formula, no drift)."""
    return F.size(_tokens(text_col)).cast("long")


def dup_ngram_ratio_expr(text_col: str = "text", k: int = 2) -> Column:
    """Gopher-style repetition signal as a reusable COLUMN expression:
    1 − |distinct k-grams| / |k-grams| (0 = no repetition), NULL for
    docs too short to have a k-gram.  Single definition behind
    ``text_features.dup_{k}gram_ratio`` and the curation pipeline's
    repetition filter.

    PERFORMANCE: the k-gram list is built by ``zip_with`` over k
    SLICES of the token array — never ``element_at(t, i)`` inside a
    ``transform`` lambda.  Catalyst inlines the un-aliased ``split``
    expression into every per-element lambda invocation, so the
    element_at form re-splits the text once per array element —
    O(n²) splits per row.  Measured at sf0.1 (5 000 docs × ~48
    tokens): 102 s for the element_at form vs sub-second for the
    slice/zip form, identical gram lists."""
    t = _tokens(text_col)
    n_grams = F.size(t) - (k - 1)
    grams = F.slice(t, 1, n_grams)
    for j in range(1, k):
        grams = F.zip_with(
            grams,
            F.slice(t, 1 + j, n_grams),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(
        F.size(t) >= k,
        F.lit(1.0)
        - F.size(F.array_distinct(grams)).cast("double") / F.size(grams),
    )


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Length / token / punctuation / stopword features + a composite
    quality score.  Ratios divide exact integer counts, so values are
    bit-identical across engines."""
    t = _tokens(text_col)
    n_tok = F.size(t).cast("long")
    n_char = F.length(F.col(text_col)).cast("long")
    n_punct = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), r"[.!?,;:]", ""))
    ).cast("long")
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(sw, x))).cast("long")
    avg_tok_len = (n_char - (n_tok - 1)).cast("double") / n_tok
    stop_ratio = n_stop.cast("double") / n_tok
    punct_ratio = n_punct.cast("double") / n_char
    score = (
        F.lit(0.4) * F.least(n_tok.cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.4) * stop_ratio
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio)
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_char.alias("n_chars_calc"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords"),
        avg_tok_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-hit heuristic language id: score = #tokens in each
    language's stopword list; argmax with fixed tie-break order."""
    t = _tokens(text_col)
    scores = {}
    for lang in LANG_ORDER:
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        scores[lang] = F.size(F.filter(t, lambda x: F.array_contains(sw, x))).cast("long")
    pred = F.lit(LANG_ORDER[-1])
    for lang in reversed(LANG_ORDER[:-1]):
        later = [scores[l2] for l2 in LANG_ORDER[LANG_ORDER.index(lang) + 1:]]
        cond = scores[lang] >= F.greatest(*later) if len(later) > 1 else (
            scores[lang] >= later[0]
        )
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    out = df.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_ORDER],
        pred.alias("lang_pred"),
    )
    return out


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Normalized content fingerprint: lowercase, collapse whitespace,
    md5. The canonical cheap near-exact-dup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(
        F.col(id_col), F.md5(norm).alias("fingerprint")
    )


#: BPE-ish pre-tokenizer: letter runs, digit runs, punctuation runs —
#: the shape GPT-style byte-pair pre-tokenization produces, minus
#: byte-level escapes (kept engine-portable: same regex semantics in
#: Spark's Java regex and DuckDB's RE2).
BPE_TOKEN_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counting two ways (the training-data-pipeline staple):
    whitespace tokens and BPE-ish regex tokens, plus their ratio (a
    cheap fertility/quality signal)."""
    ws = F.size(_tokens(text_col)).cast("long")
    bpe = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_PATTERN), 0)
    ).cast("long")
    return df.select(
        F.col(id_col),
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        (bpe.cast("double") / ws).alias("bpe_per_ws"),
    )


def text_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry: Sequence[str] = (),
) -> DataFrame:
    """The full per-document text-analysis projection in ONE pass:
    quality features + BPE-ish token counts + language id.  A single
    select over one scan — the production shape (running the three
    operators separately would scan the corpus three times; at 100 TB
    that difference is the whole game).  Column set is the union of
    ``quality_features`` / ``token_counts`` / ``language_id`` (the
    whitespace token count appears once, as ``n_tokens``).

    ``carry``: extra per-document columns passed through the select
    map-side (same pattern as ``dedup.shingles``) — e.g. PII counts a
    preceding ``curation.redact_pii`` attached — so composed feature
    passes stay one scan instead of self-joining on id."""
    t = _tokens(text_col)
    n_tok = token_count_expr(text_col)
    n_char = F.length(F.col(text_col)).cast("long")
    n_punct = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), r"[.!?,;:]", ""))
    ).cast("long")
    sw_en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(sw_en, x))).cast("long")
    stop_ratio = n_stop.cast("double") / n_tok
    punct_ratio = n_punct.cast("double") / n_char
    score = (
        F.lit(0.4) * F.least(n_tok.cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.4) * stop_ratio
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio)
    )
    bpe = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_PATTERN), 0)
    ).cast("long")
    lang_scores = {}
    for lang in LANG_ORDER:
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        lang_scores[lang] = F.size(
            F.filter(t, lambda x: F.array_contains(sw, x))
        ).cast("long")
    pred = F.lit(LANG_ORDER[-1])
    for lang in reversed(LANG_ORDER[:-1]):
        later = [lang_scores[l2] for l2 in LANG_ORDER[LANG_ORDER.index(lang) + 1:]]
        cond = lang_scores[lang] >= F.greatest(*later) if len(later) > 1 else (
            lang_scores[lang] >= later[0]
        )
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    def dup_ngram_ratio(k: int):
        return dup_ngram_ratio_expr(text_col, k)

    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_char.alias("n_chars_calc"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords"),
        ((n_char - (n_tok - 1)).cast("double") / n_tok).alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
        bpe.alias("n_bpe_tokens"),
        (bpe.cast("double") / n_tok).alias("bpe_per_ws"),
        dup_ngram_ratio(2).alias("dup_2gram_ratio"),
        dup_ngram_ratio(3).alias("dup_3gram_ratio"),
        *[lang_scores[lang].alias(f"score_{lang}") for lang in LANG_ORDER],
        pred.alias("lang_pred"),
        *[F.col(c) for c in carry],
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al.,
    arXiv:2112.11446 §A1.1 "repetition filters") — the within-doc
    complement of the corpus-level dedup family:

    - ``n_lines`` / ``dup_line_frac``: fraction of duplicate lines
      (1 − distinct/total), the "same line over and over" signal;
    - ``dup_line_char_frac``: fraction of line characters inside lines
      occurring ≥ 2× — weighting repeats by how much text they cover;
    - ``top_2gram`` / ``top_2gram_char_frac``: the most frequent word
      2-gram (ties → lexicographically smallest) and the fraction of
      document characters its occurrences cover, NULL when the doc has
      no 2-gram.

    Entirely map-side (one scan, zero shuffles).  Intermediate arrays
    (lines, tokens, grams) are materialized as projection columns
    BEFORE any lambda consumes them — referencing an un-aliased array
    expression inside a lambda makes Catalyst re-evaluate it per
    element (the O(n²)-splits trap documented on
    ``dup_ngram_ratio_expr``).

    Per-document cost is O(n log n): duplicate-line chars and the top
    2-gram are computed over the SORTED line/gram arrays — a line's
    duplicate-ness is a neighbor test (equal to its predecessor or
    successor), a gram run's count is the distance between adjacent
    run starts — not a per-distinct ``filter`` rescan of the full
    array.  That earlier form was O(distinct × n) per document,
    quadratic on long repetitive documents, exactly the docs this
    filter targets (probe: 64 docs × 20k tokens, 5k vocab — 21.2 s
    rescanning vs 1.5 s sorted).  Long sums are order-insensitive and
    array_min over (−count, gram) run structs keeps the exact tie
    rule, so results are bit-identical to the rescanning form."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    _zero = F.lit(0).cast("long")
    staged = df.select(
        F.col(id_col),
        F.col(text_col).alias("__txt"),
        F.split(F.col(text_col), "\n").alias("__lines"),
        toks.alias("__t"),
    ).withColumn(
        "__grams",
        F.when(
            F.size("__t") >= 2,
            F.zip_with(
                F.slice(F.col("__t"), 1, F.size("__t") - 1),
                F.slice(F.col("__t"), 2, F.size("__t") - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>")),
    ).withColumn(
        "__slines", F.array_sort("__lines")
    ).withColumn(
        "__sgrams", F.array_sort("__grams")
    ).withColumn(
        # 0-based indexes where a new equal-run starts in the sorted
        # gram array (F.get is 0-based and NULL out of bounds, so
        # index 0 starts a run via the null-safe inequality)
        "__gstarts",
        F.filter(
            F.sequence(F.lit(0), F.size("__sgrams") - 1),
            lambda i: ~F.get(F.col("__sgrams"), i - 1).eqNullSafe(
                F.get(F.col("__sgrams"), i)
            ),
        ),
    )
    n_lines = F.size("__lines").cast("long")
    n_line_chars = F.aggregate(
        F.col("__lines"), _zero,
        lambda acc, x: acc + F.length(x).cast("long"),
    )
    # chars inside lines occurring >= 2x: a sorted line is part of a
    # duplicate run iff it equals its predecessor or successor
    dup_chars = F.aggregate(
        F.transform(
            F.col("__slines"),
            lambda x, i: F.when(
                (F.get(F.col("__slines"), i - 1) == x)
                | (F.get(F.col("__slines"), i + 1) == x),
                F.length(x).cast("long"),
            ).otherwise(_zero),
        ),
        _zero,
        lambda acc, x: acc + x,
    )
    # (-cnt, gram) per run — count is the gap to the next run start;
    # array_min picks highest count, ties to the smallest gram
    top = F.array_min(
        F.transform(
            F.col("__gstarts"),
            lambda s, k: F.struct(
                (
                    -(
                        F.coalesce(
                            F.get(F.col("__gstarts"), k + 1),
                            F.size("__sgrams"),
                        )
                        - s
                    ).cast("long")
                ).alias("neg"),
                F.get(F.col("__sgrams"), s).alias("gram"),
            ),
        )
    )
    top_cnt = (-top["neg"]).cast("long")
    return staged.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct("__lines")).cast("double")
            / n_lines.cast("double")
        ).alias("dup_line_frac"),
        F.when(
            n_line_chars > 0,
            dup_chars.cast("double") / n_line_chars.cast("double"),
        ).alias("dup_line_char_frac"),
        F.when(F.size("__grams") >= 1, top["gram"]).alias("top_2gram"),
        F.when(
            F.size("__grams") >= 1,
            (top_cnt * F.length(top["gram"]).cast("long")).cast("double")
            / F.length("__txt").cast("double"),
        ).alias("top_2gram_char_frac"),
    )


def cooccurrence_counts(
    docs: DataFrame,
    window: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """GloVe-style windowed token co-occurrence counts — the classic
    embedding-training pre-pass (Pennington et al. EMNLP'14 build a
    corpus co-occurrence matrix before any training step).

    For every token position i and offset 1..``window``, the
    order-normalized pair (least, greatest) counts once, so the
    matrix is symmetric and each unordered occurrence is counted
    exactly once.  Plain integer counts (GloVe's 1/d distance
    weighting is a float fold — callers that want it apply it
    downstream; the exact-count matrix is the engine-portable core).

    Scale: the pair expansion is MAP-SIDE and O(tokens × window) per
    document (never tokens² — that is what the window bound is for);
    the only shuffle is the (a, b) pair aggregation, which
    partial-aggregates map-side.  Top-k consumers should
    ``orderBy(...).limit(k)`` (TakeOrdered — no global sort)."""
    if window < 1:
        # sequence(i+1, least(i+0, ...)) would be a DESCENDING
        # sequence: silent self-pairs + inverted offsets, not an error
        raise ValueError(f"window must be >= 1, got {window}")
    # filter empty tokens (trim() strips only spaces, so leading tab/
    # newline text yields a "" token from the \s+ split) — the same
    # convention as tokenizer.word_counts
    toks = docs.select(
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
            lambda s: s != "",
        ).alias("__t")
    ).filter(F.size("__t") >= 2)
    pair_expr = F.expr(
        "flatten(transform(sequence(0, size(__t) - 2),"
        " i -> transform("
        f"   sequence(i + 1, least(i + {int(window)}, size(__t) - 1)),"
        "   j -> struct(least(__t[i], __t[j]) AS a,"
        "               greatest(__t[i], __t[j]) AS b))))"
    )
    return (
        toks.select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str | Column,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """Training-data privacy audit: k-anonymity + l-diversity per
    quasi-identifier group (Sweeney '02; Machanavajjhala et al. '07).
    A group smaller than ``k`` re-identifies its members; a group
    whose sensitive attribute takes fewer than ``l`` distinct values
    discloses it even when k-anonymous.  Output: one row per
    quasi-identifier combination with (n, n_sensitive, k_ok, l_ok).

    One shuffle (the quasi-key aggregation); counts are exact
    integers, so the audit is engine-portable for oracle gating."""
    sens = (
        F.col(sensitive_col)
        if isinstance(sensitive_col, str)
        else sensitive_col
    )
    return df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count("*").cast("long").alias("n"),
        F.countDistinct(sens).cast("long").alias("n_sensitive"),
    ).select(
        *quasi_cols,
        "n",
        "n_sensitive",
        (F.col("n") >= k).alias("k_ok"),
        (F.col("n_sensitive") >= l).alias("l_ok"),
    )


def corpus_entropy(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    score_scale: int = 9,
) -> DataFrame:
    """Per-group unigram Shannon entropy + type/token counts — the
    standard corpus-QA diagnostic (low entropy flags templated or
    collapsed sources; the type count is the tokenizer-budget
    signal; together with Zipf's ``vocab_topk`` they're the corpus
    card's lexical row).

    Returns (group, n_tokens, n_types, entropy) with
    ``entropy = -sum_w p_w ln p_w`` over the group's unigram
    distribution.  n_tokens/n_types are exact BIGINT; the entropy
    double folds in hash-sorted order via the shared
    ``_sorted_fold_sum`` (each |term| <= (ln n)/n-ish, magnitude
    ~ln(types) <= ~15 — the same reproducible-ln regime as
    ``ngram_logfreq_scores``).  Tokens hash through the shared
    32-bit convention so only (group, hash) rows shuffle.

    Scale: one (group, hash) count shuffle (map-side combined,
    type-scale output), a group-total join (group-cardinality-sized
    — AQE broadcasts it), one per-group fold."""
    from .retrieval import _sorted_fold_sum
    from .textkeys import gram_hash

    tok = docs.select(
        F.col(group_col).alias("__g"),
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("__w"),
    ).select("__g", gram_hash("__w").alias("h"))
    counts = tok.groupBy("__g", "h").agg(F.count("*").alias("c"))
    totals = counts.groupBy("__g").agg(F.sum("c").alias("n_tokens"))
    p = F.col("c") / (F.lit(1.0) * F.col("n_tokens"))
    j = counts.join(totals, "__g").select(
        "__g",
        "h",
        "n_tokens",
        (-(p * F.log(p))).alias("contrib"),
    )
    return j.groupBy("__g").agg(
        F.max("n_tokens").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        _sorted_fold_sum(score_scale, key_col="h", val_col="contrib")
        .alias("entropy"),
    ).withColumnRenamed("__g", group_col)
