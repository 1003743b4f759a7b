"""Dataset-curation operators a training-data pipeline runs before a
corpus ships: benchmark-contamination detection and sequence packing.

Both are pure Catalyst (window functions + joins — no UDF in any hot
path) and partition-safe at 100 TB:

- contamination joins on the shingle (one shuffle per side, map-side
  distinct partials); the held-out side is tiny relative to the corpus
  so its shingle set broadcasts when small enough — Spark's AQE decides.
- packing never uses a global window: the token stream is partitioned
  by a group column (source, shard, ...), each group packed
  independently — exactly how multi-worker tokenization shards a
  corpus in practice.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shingle_contamination(
    docs: DataFrame,
    is_test: Column,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination report: for every held-out (test)
    document, the share of its word n-gram shingles that appear in ANY
    training document — the n-gram-overlap decontamination check
    (GPT-3/PaLM style, n=13 there; n is a parameter).

    Returns (doc_id, n_shingles, n_contaminated, contamination) for
    test docs with ≥1 shingle.  Plan: shingle once with the test flag
    carried map-side onto every shingle row (NOT joined back on id —
    that would shuffle the whole shingle table a second time), split by
    the flag, distinct train shingles, one equi-join on the shingle —
    the corpus-side heavy lifting is distinct partial aggregation
    (map-side combine), and nothing ever collects."""
    from .dedup import shingles

    sh = shingles(
        docs.withColumn("__is_test", is_test),
        n=n, id_col=id_col, text_col=text_col, carry=("__is_test",),
    )
    test_sh = sh.filter(F.col("__is_test")).select(id_col, "shingle")
    train_sh = (
        sh.filter(~F.col("__is_test")).select("shingle").distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        test_sh.join(train_sh, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("__hit").alias("n_contaminated"),
            F.round(
                F.count("__hit") / F.count("*"), 6
            ).alias("contamination"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    carry: Sequence[str] = (),
) -> DataFrame:
    """Concat-and-chunk sequence packing: within each group, documents
    (ordered by id) form one token stream chunked into fixed
    ``capacity``-token training examples; each document maps to the
    bin range it lands in.

    Returns (doc_id, grp, n_tokens, start_offset, bin_start,
    bin_end, *carry) where bin ids are per-group chunk indexes and a
    document spanning a chunk boundary has bin_end > bin_start (it is
    split across examples — the standard pretraining concat-and-chunk
    layout).  The window partitions by the group column: no global
    sort, each group packs independently and in parallel.

    ``carry``: extra per-document columns carried through the window
    select map-side (same pattern as ``dedup.shingles``) — callers
    that want doc attributes beside the packing columns name them here
    instead of self-joining the result back on id."""
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), " "))
    toks = docs.select(
        F.col(id_col),
        F.col(group_col).alias("grp"),
        n_tokens.cast("long").alias("n_tokens"),
        *[F.col(c) for c in carry],
    ).withColumn("cum_tokens", F.sum("n_tokens").over(
        Window.partitionBy("grp").orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ))
    return toks.select(
        id_col,
        "grp",
        "n_tokens",
        (F.col("cum_tokens") - F.col("n_tokens")).alias("start_offset"),
        F.floor(
            (F.col("cum_tokens") - F.col("n_tokens")) / capacity
        ).cast("long").alias("bin_start"),
        F.floor((F.col("cum_tokens") - 1) / capacity).cast("long").alias(
            "bin_end"
        ),
        *carry,
    )


def match_case(
    col: Column, mapping: dict[str, float], default: float | None
) -> Column:
    """ONE flat CaseWhen with a branch per mapping key.

    Not a style choice: the folded ``F.when(c, v).otherwise(prev)``
    pattern nests a CaseWhen per key, and Spark's ``TreeNode.toJSON``
    is EXPONENTIAL in that nesting depth (measured ×4 per 2 levels —
    a 20-group weight chain OOMed a 16 GiB driver when the
    plan-quality CI gate serialized the optimized plan).  The flat
    ``when().when()...otherwise()`` builder produces one k-branch
    node — linear to serialize, identical semantics for the mutually
    exclusive equality keys used here."""
    builder = None
    for g, r in sorted(mapping.items()):
        cond = col == g
        val = F.lit(float(r))
        builder = F.when(cond, val) if builder is None else builder.when(
            cond, val
        )
    default_col = (
        F.lit(None).cast("double") if default is None
        else F.lit(float(default))
    )
    if builder is None:
        return default_col
    return builder.otherwise(default_col)


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "sample:v1",
) -> DataFrame:
    """Deterministic per-group sampling — the corpus-mixing step that
    up/down-weights sources when assembling a training mix.

    A document is kept iff its 32-bit hash (first 8 hex digits of
    md5(salt:id) — the engine's portable hash, identical in any SQL
    engine for oracle checks; swap xxhash64 in for raw speed at scale)
    falls under rate × 2^32: reproducible across runs and cluster
    sizes (no RNG state, no sampleBy seed drift), stable under
    repartitioning, and a pure map-side filter — no shuffle at any
    scale.  Changing ``salt`` draws an independent sample."""
    h32 = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    rate = match_case(F.col(group_col), rates, default_rate)
    return docs.filter(h32 < rate * F.lit(float(2**32)))


def _chunk_array(text_col: str, max_tokens: int, overlap: int):
    """Column expression: the document's sliding-window chunks as an
    array<string> — shared by the exploded (`chunk_documents`) and
    map-only summary (`chunk_summary`) forms so they can't drift."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("require 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    t = F.split(F.trim(F.col(text_col)), " ")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size(t) - F.lit(overlap)) / F.lit(float(stride))).cast(
            "int"
        ),
    )
    return F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.array_join(
            F.slice(t, i * F.lit(stride) + F.lit(1), max_tokens), " "
        ),
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window context chunking: cut each document's token
    stream into windows of ``max_tokens`` whitespace tokens, with
    ``overlap`` tokens shared between consecutive windows (stride =
    max_tokens − overlap) — the standard long-document →
    context-window preprocessing step before tokenization/packing.
    The last window is allowed to run short; a document shorter than
    one window yields exactly one chunk.

    Map-only plan (split → sequence → posexplode, all inside
    whole-stage codegen): ZERO shuffles at any scale — chunking 100 TB
    is embarrassingly parallel and this plan keeps it that way.

    Returns (id, chunk_id, n_chunk_tokens, chunk_text)."""
    chunks = _chunk_array(text_col, max_tokens, overlap)
    return (
        docs.select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_id", "chunk_text"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size(F.split(F.col("chunk_text"), " ")).alias(
                "n_chunk_tokens"
            ),
            "chunk_text",
        )
    )


def chunk_summary(
    docs: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\x1f",
) -> DataFrame:
    """Per-document chunking summary computed ENTIRELY map-side: the
    chunk count and an order-sensitive md5 over the chunk texts — the
    same values the exploded form aggregates to (pinned by
    ``test_chunk_summary_matches_exploded``) with ZERO shuffles
    instead of explode → groupBy.  The scale form for "how would this
    corpus chunk?" diagnostics; ``chunk_documents`` remains the
    per-chunk product operator.

    Returns (id, n_ctx_chunks, ctx_chunks_md5)."""
    n, h = chunk_summary_cols(text_col, max_tokens, overlap, sep)
    return docs.select(F.col(id_col), n, h)


def chunk_summary_cols(
    text_col: str,
    max_tokens: int,
    overlap: int = 0,
    sep: str = "\x1f",
) -> tuple[Column, Column]:
    """The two ``chunk_summary`` expressions as raw Columns
    (``n_ctx_chunks``, ``ctx_chunks_md5``) — for callers composing
    them into a wider map-side select instead of a separate frame."""
    chunks = _chunk_array(text_col, max_tokens, overlap)
    return (
        F.size(chunks).cast("long").alias("n_ctx_chunks"),
        F.md5(F.array_join(chunks, sep)).alias("ctx_chunks_md5"),
    )


def upsample_by_group(
    docs: DataFrame,
    weights: dict[str, float],
    default_weight: float = 1.0,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "sample:v1",
) -> DataFrame:
    """Epoch-weighted corpus mixing, the ≥1-weight generalization of
    ``stratified_sample``: a document with group weight w appears
    floor(w) times, plus once more iff its deterministic 32-bit hash
    falls under frac(w) × 2^32.  w < 1 degenerates to exactly
    ``stratified_sample``'s keep set (same md5(salt:id) hash, same
    threshold); w = 2.5 means every doc twice and half of them (a
    stable, repartition-proof half) a third time — how a training mix
    up-weights a high-quality source across epochs.

    Map-side only: hash + explode(sequence) — no shuffle, no RNG
    state, reproducible across runs and cluster sizes.  Output: the
    input columns plus ``copy_id`` (0-based); weight-0 groups drop
    out entirely."""
    h32 = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    w = match_case(F.col(group_col), weights, default_weight)
    frac = w - F.floor(w)
    n_copies = (
        F.floor(w).cast("int")
        + F.when(h32 < frac * F.lit(float(2**32)), F.lit(1)).otherwise(
            F.lit(0)
        )
    )
    # sequence(0, -1) yields [0, -1] (negative step inferred), so the
    # zero-copy case must map to an explicit empty array — explode then
    # drops the row, which is the "weight rounds to 0 copies" semantics
    copies = F.when(
        n_copies > 0, F.sequence(F.lit(0), n_copies - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    return docs.select("*", F.explode(copies).alias("copy_id"))


def corpus_hot_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = 8,
    min_dup_count: int = 2,
) -> DataFrame:
    """The corpus-level boilerplate-line set: md5 hashes (column
    ``__lh``) of every trimmed line of ≥ ``min_line_chars`` chars
    appearing in ≥ ``min_dup_count`` DISTINCT documents.  Compute it
    once (optionally ``.localCheckpoint()`` it) and inject into both
    ``duplicated_line_stats`` and ``remove_duplicated_lines`` via
    their ``hot_lines=`` parameter — otherwise each derives its own
    copy and a stats+removal pass explodes the corpus twice."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), "\n")).alias("__line"),
        )
        .filter(F.length(F.trim(F.col("__line"))) >= min_line_chars)
        .select(F.col(id_col), F.md5(F.trim(F.col("__line"))).alias("__lh"))
        .distinct()
        .groupBy("__lh")
        .agg(F.count("*").alias("__docs"))
        .filter(F.col("__docs") >= min_dup_count)
        .select("__lh")
    )


def duplicated_line_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = 8,
    min_dup_count: int = 2,
    hot_lines: DataFrame | None = None,
) -> DataFrame:
    """CCNet/Gopher-style corpus-level duplicated-line report: per
    document, the fraction of its (non-trivial) lines that occur in
    MORE THAN ONE document across the corpus — boilerplate headers,
    navigation, license blurbs.  Curation filters typically drop or
    trim documents whose dup_line_frac clears a threshold.

    Plan shape at 100 TB: explode to lines map-side, md5 the line so
    only (hash, id) shuffles (never the text), ONE hash-groupBy to
    count cross-corpus occurrences, join the hot-line set back (it is
    the small side — lines appearing >= min_dup_count — so AQE can
    broadcast it), then a per-document aggregate.  No UDFs, no skew:
    line-hash keys are uniform.

    Lines shorter than ``min_line_chars`` are ignored entirely
    (ubiquitous short fragments — '', '---' — would otherwise mark
    every document duplicated).

    ``hot_lines``: a precomputed ``corpus_hot_lines`` frame (ideally
    localCheckpoint-ed) to share with ``remove_duplicated_lines``;
    None derives it from ``docs``.

    Returns (id, n_lines, n_dup_lines, dup_line_frac)."""
    lines = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), "\n")).alias("__line"),
        )
        .filter(F.length(F.trim(F.col("__line"))) >= min_line_chars)
        .select(F.col(id_col), F.md5(F.trim(F.col("__line"))).alias("__lh"))
    )
    # distinct per doc BEFORE counting docs-per-line: a line repeated
    # inside one document is intra-doc repetition (textstats covers
    # it), not cross-corpus boilerplate
    doc_lines = lines.distinct()
    hot = (
        corpus_hot_lines(
            docs, id_col, text_col, min_line_chars, min_dup_count
        )
        if hot_lines is None
        else hot_lines
    )
    flagged = doc_lines.join(hot, "__lh", "left_semi").groupBy(id_col).agg(
        F.count("*").alias("n_dup_lines")
    )
    per_doc = doc_lines.groupBy(id_col).agg(F.count("*").alias("n_lines"))
    return (
        per_doc.join(flagged, id_col, "left")
        .na.fill({"n_dup_lines": 0})
        .select(
            F.col(id_col),
            F.col("n_lines"),
            F.col("n_dup_lines"),
            # plain long/long double division — bit-identical across
            # engines (no round(), whose half-up tie behaviour differs)
            (F.col("n_dup_lines") / F.col("n_lines")).alias("dup_line_frac"),
        )
    )


def remove_duplicated_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = 8,
    min_dup_count: int = 2,
    hot_lines: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style boilerplate removal: delete every occurrence of any
    (non-trivial) line that appears in ``min_dup_count`` or more
    documents across the corpus, preserving the order of what remains.
    Short lines (< ``min_line_chars`` after trim) are never removed —
    they are formatting, not boilerplate evidence.

    Plan shape at 100 TB: posexplode to (id, pos, line) map-side, hash
    qualifying lines so only (hash, id) reaches the hot-line count
    (text itself shuffles only on the id key for reconstruction), ONE
    groupBy to find hot lines (the small side — AQE broadcasts it on
    the anti-join back), then a per-document ordered re-assembly via
    ``array_sort(collect_list(struct(pos, line)))`` — no global sort,
    no window, no UDF.

    ``hot_lines``: a precomputed ``corpus_hot_lines`` frame (ideally
    localCheckpoint-ed) to share with ``duplicated_line_stats``;
    None derives it from ``docs``.

    Round-15 rewrite (guide §2.3/§8 — shuffle keys and metadata, not
    payloads): the pre-r15 form anti-joined a (id, pos, line TEXT)
    explode against the hot set, re-assembled per document with a
    ``collect_list(struct(pos, line))`` groupBy — shuffling every
    surviving line's text — and sort-merge-rejoined the rebuilt text
    onto ``docs`` by id (text shuffled AGAIN, both sides).  Now only
    (id, pos, 32-char md5) rows ever reach an exchange: the hot-line
    decision is made on hashes, the per-document DROP POSITIONS come
    back as one small ``collect_set(pos)`` row, and the text is
    re-sliced from the original ``split`` array in place with an
    indexed ``filter`` — zero text bytes shuffled, and the
    doc-granularity join side is small enough for AQE to broadcast.
    The hot set itself is derived map-side from a per-document
    ``array_distinct`` of the line-hash array (a document's repeats
    collapse inside its own row), so the old corpus-wide
    ``(id, __lh) DISTINCT`` exchange disappears too.

    Returns every input column with ``text_col`` rewritten (documents
    whose every line was boilerplate come back as '')."""
    arr = F.split(F.col(text_col), "\n")

    def _lh(line):
        return F.when(
            F.length(F.trim(line)) >= min_line_chars,
            F.md5(F.trim(line)),
        )

    if hot_lines is None:
        # distinct-per-doc BEFORE the corpus count, computed inside the
        # row: array_distinct over the hash array ≡ the old
        # (id, __lh).distinct() multiset, minus its shuffle
        hot = (
            docs.select(
                F.explode(
                    F.array_distinct(
                        F.filter(
                            F.transform(arr, _lh), lambda h: h.isNotNull()
                        )
                    )
                ).alias("__lh")
            )
            .groupBy("__lh")
            .agg(F.count("*").alias("__docs"))
            .filter(F.col("__docs") >= min_dup_count)
            .select("__lh")
        )
    else:
        hot = hot_lines
    # metadata-only explode: hash projected BEFORE any exchange, line
    # text never leaves the map side
    meta = (
        docs.select(
            F.col(id_col),
            F.posexplode(arr).alias("__pos", "__line"),
        )
        .select(F.col(id_col), "__pos", _lh(F.col("__line")).alias("__lh"))
        .filter(F.col("__lh").isNotNull())
    )
    drops = (
        meta.join(hot, "__lh", "semi")
        .groupBy(id_col)
        .agg(F.collect_set("__pos").alias("__dp"))
    )
    # NULL __dp (no hot lines in this doc) keeps everything; a doc
    # whose EVERY line was boilerplate comes back as '' (empty join)
    others = [F.col(c) for c in docs.columns if c != text_col]
    kept = F.filter(
        arr,
        lambda x, i: ~F.coalesce(
            F.array_contains(F.col("__dp"), i), F.lit(False)
        ),
    )
    return docs.join(drops, id_col, "left").select(
        *others, F.array_join(kept, "\n").alias(text_col)
    )


#: Deterministic redaction patterns: (name, java-regex, replacement).
#: ORDER MATTERS: emails first (their local/domain parts must not be
#: chewed up by later patterns), then IPv4 BEFORE phone — a dotted
#: octet run like 192.168.1.254 also matches the digits-with-
#: separators phone shape, so phones only fire on what survives IP
#: redaction.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4",
     r"(?<![0-9.])(?:(?:25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})\.){3}"
     r"(?:25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})(?![0-9.])",
     "<IP>"),
    # the digit./.digit lookarounds keep the pattern out of dotted
    # numeric runs (malformed IPs, version strings) while still
    # matching 555.123.4567-style phones
    ("phone",
     r"(?<![0-9])(?<![0-9][.])(?:\+?[0-9]{1,3}[ .-]?)?"
     r"(?:\([0-9]{2,4}\)[ .-]?)?"
     r"[0-9]{3}[ .-][0-9]{3,4}(?:[ .-][0-9]{3,4})?(?![0-9])(?![.][0-9])",
     "<PHONE>"),
]


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
    count_matches: bool = True,
) -> DataFrame:
    """Deterministic PII redaction for training corpora: replace
    emails / phone numbers / IPv4 addresses with typed placeholder
    tokens, keeping everything else byte-identical.

    Pure Catalyst (chained ``regexp_replace`` — JVM regex, whole-stage
    codegen, map-only: ZERO shuffles at any scale).  With
    ``count_matches`` each pattern also reports how many times it fired
    per document (``n_<name>``): the count runs against the text AS
    THAT PATTERN SAW IT (after the preceding redactions), so a dotted
    run consumed by the IPv4 pass is not double-counted as a phone.

    This is the regex tier of a PII pipeline — the recall/precision
    ceiling of pattern matching is well known; an NER-model tier would
    ride the same mapInPandas plumbing as ``llmops.multimodal`` codecs.
    Returns the input columns with ``text_col`` redacted (original
    preserved as ``<text_col>_raw``) plus the per-pattern counts."""
    pats = PII_PATTERNS if patterns is None else patterns
    cur = F.col(text_col)
    counts = []
    for name, regex, replacement in pats:
        if count_matches:
            counts.append(
                F.regexp_count(cur, F.lit(regex))
                .cast("long")
                .alias(f"n_{name}")
            )
        cur = F.regexp_replace(cur, regex, replacement)
    others = [F.col(c) for c in docs.columns if c != text_col]
    return docs.select(
        *others,
        cur.alias(text_col),
        F.col(text_col).alias(f"{text_col}_raw"),
        *counts,
    )


def temperature_weights(
    docs: DataFrame,
    group_col: str = "source",
    alpha: float = 0.5,
    target_total: int | None = None,
) -> dict[str, float]:
    """Temperature-based mixture reweighting (the multilingual-LM
    device from mBERT/XLM-R: sample source g with probability
    ∝ p_g^α instead of its natural share p_g, α<1 flattening the head
    so small sources aren't drowned).  Returns per-group epoch weights
    w_g = q_g·T / n_g (q_g = n_g^α / Σ n^α, T = ``target_total`` or
    the corpus size) — feed straight into ``upsample_by_group``.

    One bounded-metadata collect (a row per group); the weights are
    scalars broadcast into the mixer's literal when-chain.  Σ n^α is
    folded in sorted-group order so the float total is reproducible
    (and SQL-mirrorable with an ordered list_reduce).  α=0.5 uses
    sqrt, which IEEE requires correctly rounded — bit-identical across
    engines; other α go through pow(), whose last ulp is libm-specific
    (fine for training mixes, mind it in cross-engine hash pins)."""
    import math

    rows = docs.groupBy(group_col).count().collect()
    counts = {r[group_col]: r["count"] for r in rows}
    n = sum(counts.values())
    t = float(target_total if target_total is not None else n)
    f = math.sqrt if alpha == 0.5 else (lambda c: c**alpha)
    z = 0.0
    for g in sorted(counts):
        z = z + f(float(counts[g]))
    return {g: (f(float(c)) / z) * t / float(c) for g, c in counts.items()}


def temperature_mix(
    docs: DataFrame,
    group_col: str = "source",
    alpha: float = 0.5,
    target_total: int | None = None,
    id_col: str = "doc_id",
    salt: str = "sample:v1",
) -> DataFrame:
    """``upsample_by_group`` driven by ``temperature_weights``: the
    deterministic realized corpus for a temperature-α training mix.
    Output = input columns + ``copy_id``; map-side except the one
    tiny count aggregation that derives the weights."""
    w = temperature_weights(
        docs, group_col=group_col, alpha=alpha, target_total=target_total
    )
    return upsample_by_group(
        docs, weights=w, default_weight=0.0, group_col=group_col,
        id_col=id_col, salt=salt,
    )


#: C0 control characters (minus \t \n \r, handled by whitespace
#: collapse) plus DEL — the bytes that break tokenizers and leak from
#: bad decoders.
CONTROL_CHARS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    lowercase: bool = False,
    collapse_whitespace: bool = True,
    form: str | None = None,
) -> DataFrame:
    """Canonicalize text before dedup/featurization: strip control
    characters, optionally collapse whitespace runs to single spaces
    (+ trim), optionally lowercase, optionally apply Unicode
    normalization (NFC/NFD/NFKC/NFKD).

    Two tiers, deliberately split: the regex/casing tier is pure
    Catalyst (map-only, whole-stage codegen, zero shuffles); Unicode
    normalization has no JVM built-in, so ``form=`` routes the column
    through ONE Arrow-vectorized pandas_udf (`unicodedata`) — the
    documented slow path, opt-in because ASCII-dominant corpora don't
    need it.  Run BEFORE line/shingle dedup so byte-level variants of
    the same content collapse.

    Note: whitespace collapse folds newlines into spaces — run the
    CCNet line-level ops (``duplicated_line_stats``) first, or with
    ``collapse_whitespace=False``."""
    out = out_col or text_col
    c = F.regexp_replace(F.col(text_col), CONTROL_CHARS, "")
    if collapse_whitespace:
        c = F.trim(F.regexp_replace(c, "[ \\t\\r\\n]+", " "))
    if lowercase:
        c = F.lower(c)
    if form is not None:
        if form not in ("NFC", "NFD", "NFKC", "NFKD"):
            raise ValueError(f"unknown normalization form: {form!r}")
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _unicode_norm(s):
            import unicodedata

            return s.map(
                lambda t: None if t is None
                else unicodedata.normalize(form, t)
            )

        c = _unicode_norm(c)
    return df.withColumn(out, c)


def cap_per_group(
    docs: DataFrame,
    max_per_group: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "cap:v1",
) -> DataFrame:
    """Deterministic per-group cap: keep at most ``max_per_group``
    documents from each group — the hard-ceiling companion to
    ``stratified_sample``'s rate form (a rate can't promise "no more
    than N docs from this crawl dump"; a cap can).

    Selection is a uniform hash-order rank (md5(salt:id), ties by id),
    so the kept set is a uniform random size-N subset of the group
    that is reproducible across runs, cluster sizes and
    repartitioning, and each distinct ``salt`` draws an independent
    one.

    Scale: ONE shuffle on the group key for the rank window —
    partitioned by group, never global.  A group with billions of rows
    makes that window's partition hot; for known-giant groups compose
    with ``stratified_sample`` first (rate ≈ N/|group| pre-thins
    map-side) so the windowed remainder is O(N) per group."""
    h = F.md5(
        F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
    )
    rank = F.row_number().over(
        Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    )
    return (
        docs.withColumn("__cap_rank", rank)
        .filter(F.col("__cap_rank") <= max_per_group)
        .drop("__cap_rank")
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample:v1",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis & Spirakis
    '06, the A-ES key trick): each row draws a deterministic uniform
    u ∈ (0,1) from md5(salt:id) and ranks by ln(u)/w — the k LARGEST
    keys are a weight-proportional sample without replacement.  The
    quality-score-weighted cousin of ``stratified_sample`` (per-group
    rates) and ``cap_per_group`` (uniform per-group ceilings): here
    each DOCUMENT's own weight (quality score, recency, dedup-cluster
    size) drives its inclusion odds.

    Deterministic and repartition-proof (no RNG state); a different
    ``salt`` draws an independent sample.  Rows with weight ≤ 0 or
    NULL never qualify.

    Scale: the key is map-side; selection is a global top-k —
    TakeOrderedAndProject (k-bounded per partition, then a k-row
    merge), never a full sort or global window."""
    h32 = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    # (h32 + 0.5) / 2^32 ∈ (0, 1) strictly — ln() never sees 0
    u = (h32.cast("double") + F.lit(0.5)) / F.lit(float(2**32))
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w
    return (
        docs.filter(w > 0)
        .withColumn("__wkey", key)
        .orderBy(F.col("__wkey").desc(), F.col(id_col))
        .limit(k)
        .drop("__wkey")
    )


def mix_schedule(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    default_weight: float = 1.0,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Training-mix planning: given per-source mixture ``weights`` and
    a total ``token_budget``, report per source how many tokens the
    mixture allocates and how many EPOCHS (passes over the source's
    available tokens) that implies — the static planning step behind
    epoch-weighted sampling (``upsample_by_group`` applies a computed
    mixture; this computes one from a budget).

    epochs > 1 flags sources the schedule would repeat (risking
    memorization of small high-weight sources), epochs < 1 sources
    only partially consumed.  Normalization is over the sources
    PRESENT in the corpus — weights of absent sources don't consume
    budget.

    Returns (source, n_docs, available_tokens, weight, alloc_tokens,
    epochs).

    Plan: one grouped aggregation (count + token sum via
    ``textstats.token_count_expr``), a single-row weight-total
    crossed back on (bounded broadcast), map-side arithmetic.  Float
    discipline: keep weights binary-representable (quarters/halves)
    — their sum is then exact in any aggregation order, so results
    are engine- and partitioning-independent; token sums are integer
    (always exact)."""
    from .textstats import token_count_expr

    # flat k-branch CaseWhen — never the folded when().otherwise(prev)
    # nest (exponential TreeNode.toJSON, see match_case docstring)
    w_expr = match_case(F.col(group_col), weights, default_weight)

    per_src = (
        docs.select(F.col(group_col), token_count_expr(text_col).alias("__tok"))
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__tok").alias("available_tokens"),
        )
        .withColumn("weight", w_expr)
    )
    total = per_src.agg(F.sum("weight").alias("__tw"))
    alloc = F.lit(float(token_budget)) * F.col("weight") / F.col("__tw")
    return per_src.crossJoin(F.broadcast(total)).select(
        group_col,
        "n_docs",
        "available_tokens",
        "weight",
        alloc.alias("alloc_tokens"),
        (alloc / F.col("available_tokens")).alias("epochs"),
    )


def budget_sample(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    default_weight: float = 1.0,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "budget:v1",
) -> DataFrame:
    """The APPLY form of :func:`mix_schedule`: select, per source, a
    deterministic subset whose token total fills (without exceeding)
    the source's budget allocation.

    Documents are ranked by the corpus-standard uniform hash order
    (md5(salt:id), ties by id) and taken greedily while the source's
    RUNNING token total stays ≤ its allocation — so the kept set is a
    reproducible uniform draw, repartition-proof, and each distinct
    ``salt`` draws an independent one.  Sources whose allocation
    exceeds their available tokens keep everything (epochs > 1 is the
    scheduler's signal to repeat data, not this operator's to invent
    it).

    Two window passes over ONE group-key partitioning (hash-rank,
    then running token sum in the same order) + the single-row weight
    total — the fact table shuffles once on the group key.

    Returns the kept documents with ``n_tokens`` and the running
    ``cum_tokens`` that justified each keep."""
    from .textstats import token_count_expr

    w_expr = match_case(F.col(group_col), weights, default_weight)
    h = F.md5(
        F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
    )
    staged = docs.withColumn("__tok", token_count_expr(text_col))
    total_w = (
        staged.select(F.col(group_col)).distinct()
        .select(F.sum(match_case(F.col(group_col), weights,
                                 default_weight)).alias("__tw"))
    )
    order = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    cum = (
        staged.withColumn("__cum", F.sum("__tok").over(order))
        .crossJoin(F.broadcast(total_w))
        .withColumn(
            "__alloc",
            F.lit(float(token_budget)) * w_expr / F.col("__tw"),
        )
    )
    return (
        cum.filter(F.col("__cum") <= F.col("__alloc"))
        .select(
            *docs.columns,
            F.col("__tok").alias("n_tokens"),
            F.col("__cum").alias("cum_tokens"),
        )
    )
