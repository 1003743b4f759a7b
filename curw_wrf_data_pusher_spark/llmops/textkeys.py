"""Shared cross-engine text-key primitives: the portable 32-bit gram
hash and the whitespace tokenizer.

These two expressions ARE the contract between the Spark queries and
their DuckDB oracles (`('0x' || substr(md5(g), 1, 8))::BIGINT` /
`string_split(trim(text), ' ')` on the SQL side), so every family
that hashes grams (LM count tables, DSIR buckets, n-gram frequency
scoring) must share ONE definition — a portability fix applied to a
private copy would silently desync that family's oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: SQL-string form of the portable hash, for use inside higher-order
#: function lambdas (format with the gram expression).
GRAM_HASH_SQL = "cast(conv(substring(md5({expr}), 1, 8), 16, 10) as bigint)"


def gram_hash_sql(expr: str) -> str:
    """The portable hash around an arbitrary SQL string expression."""
    return GRAM_HASH_SQL.format(expr=expr)


#: 64-bit variant: two 32-bit md5 halves, (hi << 32) | lo.  Two
#: conv() calls because a single 16-hex conv's unsigned decimal
#: string overflows the signed bigint cast.  The hi half IS the
#: shared 32-bit hash, so a portability fix to GRAM_HASH_SQL keeps
#: both widths in sync.
GRAM_HASH64_SQL = (
    "(shiftleft(" + GRAM_HASH_SQL + ", 32)"
    " | cast(conv(substring(md5({expr}), 9, 8), 16, 10) as bigint))"
)


def gram_hash64_sql(expr: str) -> str:
    """The portable 64-bit hash around an arbitrary SQL expression."""
    return GRAM_HASH64_SQL.format(expr=expr)


def gram_hash(*cols: str) -> Column:
    """Portable 32-bit gram hash of the space-joined columns: first 8
    md5 hex chars as BIGINT (mirrored in DuckDB as
    ``('0x' || substr(md5(g), 1, 8))::BIGINT``)."""
    parts = " || ' ' || ".join(cols)
    return F.expr(gram_hash_sql(parts))


def tokenize(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, __t) token-array frame: whitespace split of the trimmed
    text — the corpus-standard tokenization every oracle mirrors as
    ``string_split(trim(text), ' ')``."""
    return docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), " ").alias("__t")
    )
