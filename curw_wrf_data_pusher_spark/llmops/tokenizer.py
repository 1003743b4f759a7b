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
