"""Tokenizer-training support: corpus-scale BPE merge learning.

A training-data pipeline trains its tokenizer on the curated corpus
(Sennrich et al., "Neural Machine Translation of Rare Words with
Subword Units", ACL'16 — BPE over word frequencies).  The Spark-shaped
decomposition: the CORPUS is touched exactly once (a word-count
aggregation — one shuffle on the word key); every merge iteration then
operates on the bounded distinct-word vocabulary (~100k rows for web
text at any corpus size), so learning 32k merges never rescans or
reshuffles the corpus.  At 100 TB the one corpus pass dominates and
parallelizes perfectly; the iteration cost is independent of corpus
size.

All steps are built-in-function expressions (no Python UDFs): the
symbol fold that applies a merge left-to-right non-overlapping is a
Catalyst ``aggregate`` lambda over the symbol array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: (word, c) frequencies over lowercased
    whitespace tokens — the only corpus-scale shuffle in BPE."""
    return (
        docs.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )


def to_symbols(words: DataFrame) -> DataFrame:
    """(word, c) → (sym: array<string>, c), initial symbols = chars."""
    return words.select(
        F.filter(F.split("word", ""), lambda s: s != "").alias("sym"),
        "c",
    )


def pair_counts(symbols: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the vocabulary, weighted by word
    count: (a, b, cnt).  Map-side explode of a bounded frame."""
    pairs = symbols.filter(F.size("sym") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(sym) - 2), "
                "i -> struct(sym[i] AS a, sym[i + 1] AS b))"
            )
        ).alias("p"),
        "c",
    )
    return pairs.groupBy("p.a", "p.b").agg(
        F.sum("c").cast("long").alias("cnt")
    )


def _merge_expr(a: str, b: str):
    """The fold that applies merge (a, b) → ab to a ``sym`` column,
    left-to-right non-overlapping (the BPE contract) — a Catalyst
    aggregate lambda, no Python in the loop."""
    return F.expr(
        "aggregate(sym, CAST(array() AS array<string>), (acc, s) -> "
        "CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {a} "
        "          AND s = {b} "
        "THEN concat(slice(acc, 1, size(acc) - 1), array({a} || {b})) "
        "ELSE concat(acc, array(s)) END)".format(
            a=_lit_sql(a), b=_lit_sql(b)
        )
    )


def _lit_sql(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def merge_pair(symbols: DataFrame, a: str, b: str) -> DataFrame:
    """Apply ONE merge (a, b) → ab to every symbol sequence."""
    return symbols.withColumn("sym", _merge_expr(a, b))


def bpe_learn(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges: one corpus word-count pass, then
    per-iteration (count pairs → take the argmax → fold-merge) over
    the bounded vocabulary.  Ties break lexicographically (count desc,
    a, b) so the learned merge list is deterministic.  Returns
    (merges, final symbol table).  The vocabulary is locally
    checkpointed each iteration to keep the plan linear."""
    vocab = to_symbols(word_counts(docs, text_col)).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = merge_pair(vocab, a, b).localCheckpoint()
    return merges, vocab


def _apply_merge_py(sym: list[str], a: str, b: str) -> list[str]:
    """Python twin of ``_merge_expr``'s fold: apply (a, b) → ab
    left-to-right non-overlapping.  Kept in lockstep with the SQL
    lambda (pinned by tests/test_tokenizer.py bit-identity)."""
    out: list[str] = []
    for s in sym:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


#: bpe_learn_fast refuses an uncapped driver collect past this many
#: distinct words (overridable per call).  Sized from the MEASURED
#: footprint: a 1M-distinct-word synthetic vocab costs 1.68 GB of
#: driver RSS in the pair index (SCALING.md round-12 note), so 3M
#: words ≈ 5 GB — inside a 16 GB driver with working headroom.
BPE_VOCAB_DRIVER_BUDGET = 3_000_000


def bpe_learn_fast(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_vocab_words: int | None = None,
    vocab_driver_budget: int = BPE_VOCAB_DRIVER_BUDGET,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Iteration-scalable twin of :func:`bpe_learn` — bit-identical
    merge lists, ~zero Spark jobs per merge.

    ``bpe_learn`` runs one Spark job per merge (pair-count → argmax):
    correct and corpus-safe, but 32k merges = 32k sequential driver
    round-trips — hours of scheduling floor even though the per-job
    work is bounded.  The scale observation: after the ONE corpus
    word-count shuffle, everything BPE touches is the bounded
    distinct-word vocabulary (~10⁵ rows for natural-language text at
    any corpus size — the same bounded-collect contract as codebooks
    and KMV registers).  So this variant collects (word, count) once
    and runs Sennrich's fast algorithm driver-side: a pair→count map
    and pair→words inverted index maintained INCREMENTALLY (only the
    words containing the applied merge update their pair multisets)
    with a lazily-invalidated max-heap for the argmax.  Per merge the
    work is O(occurrences of the merged pair), not O(vocabulary).

    Determinism matches ``bpe_learn`` exactly: argmax ties break
    (count desc, a asc, b asc); Python str comparison is code-point
    order, which equals Spark's UTF-8 binary string order (UTF-8
    preserves code-point ordering).  The fold applying each merge is
    the Python twin of the Catalyst lambda.  Bit-identical merge
    lists on the Sennrich toy corpus and the sf corpora are pinned by
    tests/test_tokenizer.py.

    ``max_vocab_words`` caps the collected vocabulary to the top-N
    words by (count desc, word) for corpora whose distinct-word tail
    (URLs, typos, binary junk) outgrows the driver — standard
    tokenizer-training practice, but counts then differ from the
    uncapped run, so leave it None when comparing against
    ``bpe_learn``.  Returns (merges, final symbol table) like
    ``bpe_learn``; the symbol table is rebuilt as a DataFrame from
    the driver state."""
    import heapq
    from collections import Counter, defaultdict

    spark = docs.sparkSession
    wc = word_counts(docs, text_col)
    guarded = max_vocab_words is None
    if not guarded:
        wc = wc.orderBy(F.desc("c"), "word").limit(max_vocab_words)
    else:
        # the collected vocabulary is bounded for natural-language
        # text (~10⁵ words) but a web crawl's whitespace-token tail
        # (URLs, base64 junk) is 10⁸+ — an uncapped collect there
        # OOMs the DRIVER, the worst failure mode.  The pre-check
        # fails with guidance instead.  wc is PERSISTED so the check
        # and the collect share one corpus scan (executor storage,
        # spill-safe — even an over-budget vocab materializes
        # distributed, never on the driver).
        wc = wc.persist()
        approx = wc.agg(
            F.approx_count_distinct("word").alias("n")
        ).first()["n"]
        if approx > vocab_driver_budget:
            wc.unpersist()
            raise ValueError(
                f"bpe_learn_fast: ~{approx:,} distinct words exceed "
                f"the driver vocab budget ({vocab_driver_budget:,}). "
                "This corpus has a junk-token tail (URLs/base64/IDs); "
                "pass max_vocab_words=<N> to train on the top-N words "
                "(standard tokenizer practice), pre-normalize the "
                "text, or raise vocab_driver_budget if the driver "
                "really has the memory (measured: 1.68 GB RSS per "
                "1M distinct words)."
            )
    rows = wc.collect()
    if guarded:
        wc.unpersist()
    words: list[tuple[list[str], int]] = [
        (list(r["word"]), int(r["c"])) for r in rows
    ]

    pair_cnt: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (sym, c) in enumerate(words):
        for p in zip(sym, sym[1:]):
            pair_cnt[p] += c
            pair_words[p].add(wi)
    heap = [(-cnt, a, b) for (a, b), cnt in pair_cnt.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        # lazy invalidation: pop until the top entry's count is current
        best = None
        while heap:
            negc, a, b = heap[0]
            cur = pair_cnt.get((a, b), 0)
            if cur == -negc:
                best = (a, b)
                heapq.heappop(heap)
                break
            heapq.heappop(heap)
            if cur > 0:
                heapq.heappush(heap, (-cur, a, b))
        if best is None:
            break
        a, b = best
        merges.append((a, b))
        for wi in sorted(pair_words.get((a, b), ())):
            sym, c = words[wi]
            old_pairs = Counter(zip(sym, sym[1:]))
            new_sym = _apply_merge_py(sym, a, b)
            new_pairs = Counter(zip(new_sym, new_sym[1:]))
            words[wi] = (new_sym, c)
            for p, k in (old_pairs - new_pairs).items():
                pair_cnt[p] -= k * c
                if pair_cnt[p] <= 0:
                    pair_cnt.pop(p, None)
                if p not in new_pairs:
                    pair_words[p].discard(wi)
            for p, k in (new_pairs - old_pairs).items():
                pair_cnt[p] += k * c
                pair_words[p].add(wi)
                heapq.heappush(heap, (-pair_cnt[p], p[0], p[1]))
        pair_words.pop((a, b), None)

    vocab = spark.createDataFrame(
        [(sym, c) for sym, c in words], "sym array<string>, c long"
    )
    return merges, vocab


def bpe_encode_words(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply a learned merge list to (word, c) rows → (word, sym, c):
    the deterministic replay that tokenizes NEW text with a trained
    vocabulary (merges apply in learned order)."""
    out = words.select(
        "word",
        F.filter(F.split("word", ""), lambda s: s != "").alias("sym"),
        "c",
    )
    for i, (a, b) in enumerate(merges):
        out = out.withColumn("sym", _merge_expr(a, b))
        if (i + 1) % 16 == 0:  # keep the expression tree bounded
            out = out.localCheckpoint()
    return out


def bpe_encode_fast(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Vocabulary-scale twin of :func:`bpe_encode_words` — identical
    (word, sym, c) output, usable at real merge counts.

    ``bpe_encode_words`` chains one Catalyst fold per merge: correct,
    but a 32k-merge tokenizer means 32k expression applications (and
    2k localCheckpoints) per encode — unusable.  This twin ships the
    merge table to the executors once (rank dict in the closure) and
    encodes each word with the classic rank-based algorithm inside
    ``mapInPandas``: repeatedly find the present pair with the
    smallest learned rank and apply it left-to-right non-overlapping.

    Rank-based encode ≡ sequential merge replay FOR LEARNED LISTS:
    the two can only diverge if applying a later-rank merge CREATES an
    occurrence of an earlier-rank pair (sequential would skip it,
    rank-based merges it).  A new adjacency always involves the newly
    created symbol, so that requires an earlier merge (a, s) whose
    component ``s`` is first assembled by a LATER merge — impossible
    in a learned list, where a pair can only be learned after both
    its components exist.  ``bpe_learn``/``bpe_learn_fast`` outputs
    therefore guarantee equivalence (pinned by
    tests/test_tokenizer.py); hand-crafted lists violating the
    creation order are outside the contract.

    Per-word cost is O(tokens_out · word_len) with no corpus shuffle:
    the encode is map-only, exactly like the arrow PQ/SimHash
    kernels."""
    import pandas as pd

    from pyspark.sql import types as T

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    out_schema = T.StructType(
        [
            T.StructField("word", T.StringType(), False),
            T.StructField(
                "sym", T.ArrayType(T.StringType(), False), False
            ),
            T.StructField("c", T.LongType(), False),
        ]
    )

    def encode_word(word: str) -> list[str]:
        sym = list(word)
        while len(sym) > 1:
            best = None
            best_rank = None
            for p in zip(sym, sym[1:]):
                r = ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = p, r
            if best is None:
                break
            sym = _apply_merge_py(sym, best[0], best[1])
        return sym

    def enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "sym": [encode_word(w) for w in pdf["word"]],
                    "c": pdf["c"],
                }
            )

    return words.select("word", "c").mapInPandas(enc, out_schema)


def save_tokenizer(
    spark, merges: list[tuple[str, str]], path: str
) -> None:
    """Persist a learned merge list as (rank, a, b) parquet — the
    train → persist → load → encode lifecycle's storage half.  Order
    IS the tokenizer (merges apply by rank), so rank is explicit
    data, never an implied file order."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, a string, b string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_tokenizer(spark, path: str) -> list[tuple[str, str]]:
    """Load a persisted merge list, rank order restored."""
    rows = spark.read.parquet(path).collect()
    rows.sort(key=lambda r: r["rank"])
    return [(r["a"], r["b"]) for r in rows]
