"""Slowly-changing-dimension (SCD type-2) history: versioned
dimension rows with validity intervals.

Two forms:

- ``scd2_from_events``: derive the full SCD2 history from an event
  log in one pass — per key, keep only rows where the tracked
  attributes CHANGED vs the previous event (lag), then close each
  version with the next change's timestamp (lead).  The batch
  rebuild / backfill path: one shuffle on the key, two window
  functions, no joins.

- ``scd2_apply``: incremental merge of a new batch of observations
  into an existing history — closes open versions whose attributes
  changed and appends the new open versions.  The per-ingest path;
  composes with ``sinks.upsert.upsert_parquet`` for persistence.
  Re-applying the same batch is a no-op (idempotent), because an
  unchanged attribute tuple never opens a new version.

The reference engine versions forecasts by ``fgt`` (latest-pointer
semantics, `wrf_data_pusher.py:103-140`); SCD2 is the general form a
warehouse needs for any dimension whose attributes drift.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _attrs_struct(attr_cols: Sequence[str]) -> F.Column:
    return F.struct(*[F.col(c) for c in attr_cols])


def scd2_from_events(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """The SCD2 history an event log implies: one row per (key,
    attribute-version) with ``valid_from`` (the first event carrying
    these attributes after a change), ``valid_to`` (the next change's
    timestamp; NULL while current) and ``is_current``.

    Consecutive events with identical tracked attributes collapse
    into one version.  ``tiebreak_col`` orders same-timestamp events
    deterministically.

    Scale: one shuffle on the key; change detection is a lag() and
    version closing a lead() over the same partitioning — Catalyst
    plans both in a single Window exchange."""
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col is not None else []
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    cur, prev = _attrs_struct(attr_cols), F.lag(_attrs_struct(attr_cols)).over(w)
    changes = df.withColumn(
        "__chg", prev.isNull() | (cur != prev)
    ).filter(F.col("__chg"))
    wc = Window.partitionBy(*key_cols).orderBy(*order)
    return changes.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(wc).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Merge one batch of observations (key, attrs, ts) into an SCD2
    ``history`` (same schema as ``scd2_from_events`` output).  For
    each key: if the batch's latest attributes differ from the open
    version's, the open version closes at the observation time and a
    new open version appends; identical attributes change nothing.
    Keys new to the history open their first version.

    Multiple updates for one key within the batch are resolved to the
    latest observation first (earlier intra-batch flips are invisible
    to the history, matching per-batch ingest semantics).  Returns
    the new history frame; persist it with the upsert sink.

    Scale: the open-version slice joins the (deduped) batch on the
    key — one shuffle each side; closed history rows pass through
    untouched (union, no rewrite)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).desc())
    latest = (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    open_rows = history.filter(F.col("is_current"))
    closed_rows = history.filter(~F.col("is_current"))

    j = open_rows.alias("h").join(
        latest.alias("u"), on=list(key_cols), how="full_outer"
    )
    h_attrs = F.struct(*[F.col(f"h.{c}") for c in attr_cols])
    u_attrs = F.struct(*[F.col(f"u.{c}") for c in attr_cols])
    has_h = F.col("h.valid_from").isNotNull()
    has_u = F.col(f"u.{ts_col}").isNotNull()
    changed = has_h & has_u & (h_attrs != u_attrs)

    # surviving open versions: untouched keys, or unchanged attributes
    keep_open = j.filter(has_h & (~has_u | ~changed)).select(
        *[F.col(c) for c in key_cols],
        *[F.col(f"h.{c}").alias(c) for c in attr_cols],
        F.col("h.valid_from").alias("valid_from"),
        F.col("h.valid_to").alias("valid_to"),
        F.col("h.is_current").alias("is_current"),
    )
    # closed by this batch
    newly_closed = j.filter(changed).select(
        *[F.col(c) for c in key_cols],
        *[F.col(f"h.{c}").alias(c) for c in attr_cols],
        F.col("h.valid_from").alias("valid_from"),
        F.col(f"u.{ts_col}").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    # opened by this batch: changed attributes or brand-new key
    newly_open = j.filter(has_u & (changed | ~has_h)).select(
        *[F.col(c) for c in key_cols],
        *[F.col(f"u.{c}").alias(c) for c in attr_cols],
        F.col(f"u.{ts_col}").alias("valid_from"),
        F.lit(None).cast(history.schema["valid_to"].dataType)
        .alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return (
        closed_rows.select(*keep_open.columns)
        .unionByName(keep_open)
        .unionByName(newly_closed)
        .unionByName(newly_open)
    )


def scd2_lookup(
    facts: DataFrame,
    history: DataFrame,
    key_cols: Sequence[str],
    fact_ts: str = "ts",
    how: str = "left",
) -> DataFrame:
    """Temporal dimension lookup — join each fact to the SCD2 version
    that was valid AT the fact's timestamp:
    ``valid_from <= ts AND (valid_to IS NULL OR ts < valid_to)``.
    The half-open intervals partition each key's timeline, so at most
    one version matches; facts before a key's first version keep NULL
    attributes under the default left join.

    Plan / 100 TB: a shuffled equi-join on the key columns with the
    interval predicate evaluated inside the join — both sides are
    key-partitioned, the per-key fan-out is the (small) version count
    before the predicate filters it to ≤ 1, and nothing is broadcast
    by hint (dim histories grow with key cardinality; AQE decides).

    Output: every fact column, then the history's non-key columns
    (attributes + valid_from / valid_to / is_current).  A history
    attribute that shares its name with a fact column would produce a
    duplicate output column (breaking every downstream by-name select
    or write), so that collision raises up front with the offending
    names."""
    f = facts.alias("f")
    h = history.alias("h")
    on = None
    for k in key_cols:
        term = F.col(f"f.{k}") == F.col(f"h.{k}")
        on = term if on is None else on & term
    ts = F.col(f"f.{fact_ts}")
    pred = (ts >= F.col("h.valid_from")) & (
        F.col("h.valid_to").isNull() | (ts < F.col("h.valid_to"))
    )
    hist_cols = [c for c in history.columns if c not in key_cols]
    clash = sorted(set(hist_cols) & set(facts.columns))
    if clash:
        raise ValueError(
            "scd2_lookup: history attribute column(s) "
            f"{clash} collide with fact columns; rename one side "
            "before the lookup"
        )
    return f.join(h, on & pred, how).select(
        *[F.col(f"f.{c}") for c in facts.columns],
        *[F.col(f"h.{c}") for c in hist_cols],
    )
