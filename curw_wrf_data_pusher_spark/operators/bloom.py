"""Bloom-filter semi-join: prune a huge fact table against a key set
too large to broadcast as a hash relation, using a bitset small enough
to broadcast as ONE row.

Beyond-reference surface (the reference engine — wrf_data_pusher.py —
joins row-by-row over MySQL lookups; it has no scan-pruning tier).

Why at 100 TB: a plain semi-join shuffles BOTH sides on the key; a
broadcast semi-join needs the build side to fit as a per-task hash
relation.  Between those regimes sits the classic bloom pre-filter
(what Spark's runtime row-level filtering injects when
``bloom_filter_agg`` fires): the key side compresses to an m-bit
bitset (~1.2 bytes/key at 1% fpp), the fact side probes it MAP-SIDE,
and only the ≈|matches| + fpp·|fact| surviving rows enter the exact
verify join.  The fact table's shuffle volume drops from |fact| to
roughly |matches| — usually orders of magnitude at web scale.

This build's Spark does not expose ``bloom_filter_agg`` to SQL, so the
filter is built from first principles in pure Catalyst (zero UDFs):

- positions: Kirsch-Mitzenmacher double hashing — ``p_i = pmod(h1 +
  i·h2, m)`` with ``h1 = xxhash64(key)`` and ``h2 = xxhash64(key, 1)``
  gives k independent-enough probes from two hash evaluations
  (Kirsch & Mitzenmacher, ESA'06);
- build: explode each key to its k (word, bit) pairs, ``bit_or``
  aggregate per 64-bit word (partial map-side combine reduces each
  partition to ≤ m/64 rows before the one tiny shuffle), then fold
  the sparse words into ONE row holding a ``map<int,bigint>``;
- probe: broadcast that row, and a ``forall`` over the k positions
  checks ``element_at(words, p div 64) >> (p mod 64) & 1`` — absent
  word ⇒ bit 0 ⇒ miss.  All JVM-side expressions inside whole-stage
  codegen.

``bloom_semi_join`` restores EXACT semantics (recall 1.0 — a bloom
filter has no false negatives) by following the probe with a normal
semi-join on the survivors; the bloom only prunes the shuffle input.
``bloom_might_contain`` exposes the raw approximate membership column
for pipelines that tolerate the documented fpp.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def optimal_parameters(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """(n_bits, n_hashes) minimizing space for ``n_keys`` at ``fpp``:
    m = -n·ln(p)/ln(2)², k = (m/n)·ln(2) — the textbook sizing."""
    if n_keys <= 0:
        return 64, 1
    m = int(math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, ((m + 63) // 64) * 64)  # whole words
    k = max(1, int(round(m / n_keys * math.log(2))))
    return m, k


def build_bloom(
    keys: DataFrame, key_col: str, n_bits: int, n_hashes: int
) -> DataFrame:
    """ONE-row DataFrame ``(words: map<int,bigint>)`` — the bloom
    bitset over ``keys[key_col]``, sparse words only (an absent word
    is all-zero).  Deterministic: xxhash64 with Spark's fixed seed, so
    the same key set always yields the same bitset."""
    # reduce both hashes mod m BEFORE the linear combination — same
    # positions as (h1 + i·h2) mod m, but i·h2m can't overflow a long
    # under ANSI arithmetic (i ≤ k, h2m < m)
    h1m = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_bits))
    h2m = F.pmod(F.xxhash64(F.col(key_col), F.lit(1)), F.lit(n_bits))
    # k probe positions per key, exploded JVM-side
    pos = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            lambda i: F.pmod(h1m + i * h2m, F.lit(n_bits)),
        )
    ).alias("p")
    # F.shiftleft's python wrapper only takes a literal shift count —
    # call_function reaches the SQL form that shifts by a column
    bits = keys.select(pos).select(
        (F.col("p") / 64).cast("int").alias("word_idx"),
        F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (F.col("p") % 64).cast("int")
        ).alias("mask"),
    )
    words = bits.groupBy("word_idx").agg(F.bit_or("mask").alias("word"))
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("words")
    )


def bloom_might_contain(
    fact: DataFrame,
    bloom_row: DataFrame,
    key_col: str,
    n_bits: int,
    n_hashes: int,
    out_col: str = "might_match",
) -> DataFrame:
    """``fact`` plus a boolean ``out_col``: bloom membership of
    ``key_col``.  False ⇒ definitely absent; True ⇒ present with
    probability ≥ 1 − fpp.  The one-row bitset rides a broadcast
    nested-loop join (1-row build side by construction) and the probe
    is pure codegen expressions — map-side, no fact shuffle."""
    h1m = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_bits))
    h2m = F.pmod(F.xxhash64(F.col(key_col), F.lit(1)), F.lit(n_bits))

    def bit_set(i: Column) -> Column:
        p = F.pmod(h1m + i * h2m, F.lit(n_bits))
        word = F.coalesce(
            F.element_at(F.col("words"), (p / 64).cast("int")),
            F.lit(0).cast("bigint"),
        )
        return F.call_function(
            "shiftright", word, (p % 64).cast("int")
        ).bitwiseAND(F.lit(1).cast("bigint")) == F.lit(1).cast("bigint")

    probe = F.forall(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)), bit_set
    ).alias(out_col)
    return fact.crossJoin(F.broadcast(bloom_row)).select(
        *[F.col(c) for c in fact.columns], probe
    )


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str | None = None,
    fpp: float = 0.01,
    expected_keys: int | None = None,
) -> DataFrame:
    """EXACT semi-join of ``fact`` against ``keys`` with a bloom
    pre-filter pruning the fact side before the verify join shuffles.

    Result ≡ ``fact.join(keys, fact_key == keys_key, 'left_semi')``
    (bloom filters have no false negatives; false positives are
    removed by the verify join).  What changes at scale is the plan:
    the fact side's shuffle input is the bloom survivors — |matches|
    plus ≈ fpp·|fact| — instead of the whole table.

    ``expected_keys`` sizes the filter (default: an exact distinct
    count of the keys side — one tiny extra job; pass it when known
    to keep the build single-pass)."""
    kk = keys_key or fact_key
    key_side = keys.select(F.col(kk).alias("__bk")).dropDuplicates(["__bk"])
    if expected_keys is None:
        expected_keys = key_side.count()
    n_bits, n_hashes = optimal_parameters(expected_keys, fpp)
    bloom_row = build_bloom(key_side, "__bk", n_bits, n_hashes)
    candidates = bloom_might_contain(
        fact, bloom_row, fact_key, n_bits, n_hashes, out_col="__might"
    ).filter(F.col("__might")).drop("__might")
    return candidates.join(
        key_side, candidates[fact_key] == key_side["__bk"], "left_semi"
    )
