"""Parquet lake scans.

The reference's "lake" is a date-partitioned NetCDF directory tree
(wrf_data_pusher.py:321-327); the generic engine reads Hive-partitioned
parquet.  Catalyst gives predicate pushdown / column pruning / partition
pruning for free on these scans — the per-query ``.explain`` tests in
tests/test_plans.py assert PushedFilters reach the scan.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Per-session memo of lake-table DataFrames.  Building a scan costs a
#: file listing + parquet footer schema read (75-260 ms measured) and
#: every query build repeats it; DataFrames are immutable plan handles,
#: so reusing one is free.  The 100 TB analogue is catalog/file-index
#: metadata caching — re-listing a million-file table per query build
#: is the same waste at larger stakes.  WeakKeyDictionary: entries die
#: with their SparkSession, so a stopped-and-rebuilt session (tests)
#: can never serve a stale plan handle.
_TABLE_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = None  # type: ignore[assignment]

#: Per-session memo of spread()'s wide-plan verdicts, keyed on
#: (semanticHash, target) — see spread() for why.
_SPREAD_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = None  # type: ignore[assignment]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one lake table. Single parquet file per table in testdata;
    at 100 TB this is a directory of many files + partition columns —
    same call."""
    global _TABLE_MEMO
    if _TABLE_MEMO is None:
        import weakref

        _TABLE_MEMO = weakref.WeakKeyDictionary()
    per_session = _TABLE_MEMO.setdefault(spark, {})
    # freshness token: a cached scan's file-index snapshot goes stale
    # if the files at the path are rewritten within one session
    # (regenerated testdata) — keying on (mtime, size) makes a rewrite
    # a cache miss instead of a FileNotFoundException / stale read.
    # One os.stat per build vs 75-260 ms of file listing: still free.
    path = os.path.join(os.path.abspath(sf_dir), f"{name}.parquet")
    try:
        st = os.stat(path)
        token = (st.st_mtime_ns, st.st_size)
    except OSError:
        token = None
    key = (path, token)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    # Self-sufficient on ANY session (the external harness builds its
    # own vanilla SparkSession): nanosAsLong is runtime-settable and
    # required to scan events.parquet's TIMESTAMP(NANOS,false) column
    # at all — without it the read throws PARQUET_TYPE_ILLEGAL.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # TIMESTAMP(NANOS) columns surface as long under
    # spark.sql.legacy.parquet.nanosAsLong; convert to timestamps by
    # ns→µs floor-division — the same truncation DuckDB applies, so
    # oracle comparisons stay exact.
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer DIV, not /: ns values (~1.7e18) exceed double's 2^53
        # exact-integer range.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif name == "events" and isinstance(
        df.schema["ts"].dataType, T.TimestampNTZType
    ):
        # Newer Spark reads TIMESTAMP(NANOS) natively as TIMESTAMP_NTZ
        # (micro-truncated) instead of honouring nanosAsLong.  Cast to
        # the session type under the pinned UTC zone — wall-clock
        # identical to the ns→µs long path above, and restores the
        # TIMESTAMP type that unix_micros/window functions expect.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    per_session[key] = df
    return df


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure a DataFrame has at least the cluster's default parallelism.

    Small single-file scans arrive as ONE partition; any explode-heavy
    operator downstream (shingling, tokenization) would then serialize
    on a single core.  The repartition shuffles only the small input
    rows — cheap — and the exploded work parallelizes.  No-op when the
    input is already wide (the 100 TB case: thousands of file splits).

    Wide-input checks: ``inputFiles()`` (pure plan metadata) catches
    the many-files case.  For plans that already contain a wide node
    (repartition/join/aggregate/window/sort), the JVM-side
    ``rdd().getNumPartitions()`` (physical planning only, no job, no
    Python RDD lineage) is trustworthy — those partitions hold real
    rows — so an already-wide plan is never re-shuffled.

    A PURE few-file scan is always repartitioned even though Spark
    reports ~defaultParallelism byte-range splits for it: parquet only
    splits at row-group boundaries, so a single-row-group file yields
    one non-empty split and N-1 empty ones — trusting the split count
    serialized the explode-heavy operators on one core (measured 2.6×
    on llm_simhash at sf0.1)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass
    # per-plan verdict memo: the wide-node probe costs a toJSON parse
    # and — for already-wide plans — a physical-planning pass; the
    # verdict is a pure function of the (logical plan, target) pair, so
    # repeated builds of the same query (bench reps, compound rows that
    # reuse a subtree) pay it once.  semanticHash is one cheap py4j
    # round trip and equates semantically-equal plans.
    global _SPREAD_MEMO
    if _SPREAD_MEMO is None:
        import weakref

        _SPREAD_MEMO = weakref.WeakKeyDictionary()
    memo_key = None
    try:
        per_session = _SPREAD_MEMO.setdefault(df.sparkSession, {})
        memo_key = (df.semanticHash(), target)
        cached = per_session.get(memo_key)
        if cached is not None:
            return df if cached else df.repartition(target)
    except Exception:
        per_session = None
    try:
        # walk the logical node CLASSES, not the rendered plan string: a
        # file path, relation name, or literal containing "Join"/"Sort"
        # must not classify a narrow scan as wide (which would skip the
        # repartition and serialize explode-heavy downstream work)
        wide = {
            "Join", "Aggregate", "Window", "Sort", "Deduplicate",
            "DeduplicateWithinWatermark", "Repartition",
            "RepartitionByExpression", "RebalancePartitions",
            "Intersect", "Except",
        }
        # ONE py4j round trip: toJSON() flattens the whole tree to a
        # JSON array with a "class" field per node — vs a
        # getClass()/children() JVM call pair per node, which showed up
        # as driver-side build latency on every spread-using query
        plan_nodes = json.loads(
            df._jdf.queryExecution().optimizedPlan().toJSON()
        )
        has_wide_node = any(
            node.get("class", "").rsplit(".", 1)[-1] in wide
            for node in plan_nodes
        )
        if has_wide_node and df._jdf.rdd().getNumPartitions() >= target:
            if per_session is not None and memo_key is not None:
                per_session[memo_key] = True
            return df
    except Exception:
        pass
    if per_session is not None and memo_key is not None:
        per_session[memo_key] = False
    return df.repartition(target)


#: The reference's filesystem layout as Hive partition columns
#: (SURVEY §1.4: {version}/{gfs_run}/{gfs_data_hour}/{date}/{wrf_type}/
#: {wrf_system}) — filters on any prefix prune at planning time.
WRF_PARTITION_COLS = (
    "version", "gfs_run", "gfs_data_hour", "run_date", "wrf_type",
    "wrf_system",
)


def write_lake_table(
    df: DataFrame,
    path: str,
    partition_cols=WRF_PARTITION_COLS,
    mode: str = "append",
) -> None:
    """Write a lake table in the §1.4 partition layout.  At 100 TB the
    daily append touches only its own partition directories; readers
    filtering on run metadata never list the rest."""
    present = [c for c in partition_cols if c in df.columns]
    df.write.mode(mode).partitionBy(*present).parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register lake tables as temp views so queries can use spark.sql."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


#: Safe widening chains for schema evolution: a file written with a
#: narrower type may be read under the wider one losslessly.  Anything
#: not on a chain (string→number, double→long, …) is an incompatible
#: drift and must fail loudly, not coerce.
_WIDENING_RANK = {
    T.ByteType(): 0, T.ShortType(): 1, T.IntegerType(): 2,
    T.LongType(): 3, T.FloatType(): 10, T.DoubleType(): 11,
}


def _can_widen(src: T.DataType, dst: T.DataType) -> bool:
    if src == dst:
        return True
    rs, rd = _WIDENING_RANK.get(src), _WIDENING_RANK.get(dst)
    if rs is None or rd is None:
        return False
    # integral chain (0-3) may widen within itself or into DoubleType
    # (11).  NOTE this is an align_schema-level (cast) promotion set,
    # wider than what the parquet READER's type widening accepts —
    # Spark 4's reader widens within the integral chain and
    # int→double, but NOT long→double, so read_evolving(target) fails
    # at read time on a long→double evolution where align_schema
    # succeeds (read_evolving(..., reconcile="cast") routes through
    # align_schema for exactly that window).  FloatType is NOT a valid destination for integrals
    # (int 2**60+1 → float loses 36 bits silently); long→double is
    # likewise lossy above 2**53, which we accept deliberately at the
    # cast level: it is the conventional SQL promotion and rejecting
    # it would break every count→ratio evolution; the exactness loss
    # is bounded to 1 ulp at 2**53+. float→double stays within the
    # float chain.
    if rs <= 3:
        return (rd <= 3 and rd >= rs) or rd == 11
    return rd >= rs


def align_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Reconcile an evolving-lake scan onto ``target``: columns the
    files don't have yet appear as typed NULLs, safely-widenable
    columns (int→long, float/int→double, …) are cast, and
    incompatible drift (string where a number is expected, narrowing)
    raises with the offending column named.  Output column order is
    the target's — stable for downstream unions and sinks."""
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for field in target.fields:
        if field.name not in have:
            cols.append(
                F.lit(None).cast(field.dataType).alias(field.name)
            )
            continue
        src = have[field.name]
        if not _can_widen(src, field.dataType):
            raise ValueError(
                f"align_schema: column '{field.name}' has incompatible "
                f"type {src.simpleString()} (expected "
                f"{field.dataType.simpleString()}; only lossless "
                "widening is allowed)"
            )
        cols.append(
            F.col(field.name).cast(field.dataType).alias(field.name)
        )
    return df.select(*cols)


def read_evolving(
    spark: SparkSession,
    path: str,
    target: T.StructType | None = None,
    reconcile: str = "reader",
) -> DataFrame:
    """Scan a parquet directory whose files were written under several
    schema versions (columns added over time, types widened).

    With a ``target`` contract and ``reconcile="reader"`` (default),
    the scan reads under that explicit schema: Spark 4's parquet
    reader fills columns a vintage lacks with NULLs and performs its
    supported type widening (within the integral chain, int→double,
    float→double) per file — AND no footer merging happens, so the
    plan cost is independent of file count (the 100 TB path).
    Incompatible drift (e.g. a string file column under a numeric
    target) fails at read time per offending file.

    The reader's widening set is NARROWER than ``align_schema``'s cast
    promotions — notably long→double is a valid cast promotion but NOT
    a reader widening (and mergeSchema refuses the long/double footer
    merge outright), so a lake holding long-vintage files under a
    double target fails the fast path at execution time.  For that
    window use ``reconcile="cast"``: footers are walked driver-side
    (pyarrow), files GROUP by their physical schema, each homogeneous
    group reads under its own schema and ``align_schema`` casts it
    onto the target before a unionByName.  Always correct, but plans
    in O(footers) and lists files on the driver — a transition-window
    tool for a driver-visible filesystem; compact/rewrite the lake to
    retire it and return to the O(1)-planning reader path.

    Without a target, falls back to plain ``mergeSchema`` footer
    reconciliation — ADDED columns only (Spark refuses float/double
    merges), every footer read at planning time; acceptable over
    thousands of files, not millions.  For DataFrame-level
    reconciliation of already-loaded mixed-vintage frames (before a
    union), use ``align_schema``."""
    if target is not None:
        if reconcile == "cast":
            return _read_cast_reconciled(spark, path, target)
        if reconcile != "reader":
            raise ValueError(
                f"reconcile must be 'reader' or 'cast': {reconcile!r}"
            )
        return spark.read.schema(target).parquet(path)
    return spark.read.option("mergeSchema", "true").parquet(path)


def _read_cast_reconciled(
    spark: SparkSession, path: str, target: T.StructType
) -> DataFrame:
    """Per-vintage scan for type drift the reader cannot widen: group
    files by footer schema, read each group homogeneously (basePath
    keeps partition columns derivable), align_schema onto the target,
    union."""
    from pathlib import Path

    import pyarrow.parquet as papq

    files = sorted(str(p) for p in Path(path).rglob("*.parquet"))
    if not files:
        raise ValueError(f"read_evolving: no parquet files under {path}")
    groups: dict[tuple, list[str]] = {}
    for f in files:
        sch = papq.read_schema(f)
        key = tuple((n, str(t)) for n, t in zip(sch.names, sch.types))
        groups.setdefault(key, []).append(f)
    out = None
    for grp in groups.values():
        part = align_schema(
            spark.read.option("basePath", path).parquet(*grp), target
        )
        out = part if out is None else out.unionByName(part)
    return out
