"""Snapshot diff: keyed change detection between two table versions.

The batch analogue of CDC — given two snapshots of the same keyed
table (yesterday's lake partition vs today's, a pre- and post-upsert
store, two corpus versions), classify every key as
added / removed / changed / unchanged.  The reference's pipeline
re-pushes whole forecast runs and relies on the MySQL upsert to sort
out what actually changed (wrf_data_pusher.py:103-140); a diff
operator makes "what changed" a first-class, auditable answer and
feeds incremental downstream work (only re-process 'added'+'changed').

Plan shape / 100 TB: ONE full-outer shuffle join on the key columns —
the minimum possible for an unordered diff.  The change test compares
md5 row-hashes computed MAP-SIDE on each input (null-aware sentinel
concat), so the join carries one 32-char hash per side instead of the
full row payload; with both snapshots bucketed/partitioned on the key
the join co-locates and the shuffle disappears.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Field/null sentinels for the row hash: unit separator keeps
#: ("ab","c") ≠ ("a","bc"); the null marker keeps NULL ≠ ''.
_SEP = "\x1f"
_NULL = "\x1e<null>\x1e"


def row_digest(cols: Sequence[str]) -> F.Column:
    """md5 over the named columns, null-aware, order-significant."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Diff two snapshots on ``keys``: returns one row per key present
    in either side with ``status`` ∈ added | removed | changed |
    unchanged.  ``compare_cols`` defaults to all non-key columns the
    two sides share (order: as in ``old``)."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    o = old.select(
        *[F.col(k) for k in keys], row_digest(compare_cols).alias("__old_h")
    )
    n = new.select(
        *[F.col(k) for k in keys], row_digest(compare_cols).alias("__new_h")
    )
    joined = o.join(n, on=list(keys), how="full_outer")
    status = (
        F.when(F.col("__old_h").isNull(), F.lit("added"))
        .when(F.col("__new_h").isNull(), F.lit("removed"))
        .when(F.col("__old_h") != F.col("__new_h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(*keys, status.alias("status"))
