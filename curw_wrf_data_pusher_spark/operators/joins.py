"""Join-shaped operators — get-or-create dims and spatial NN mapping
(SURVEY §2.3 J4/J5, §2.5 W3).

J5 get-or-create: the reference looks up station/source/tms ids and
INSERTs on miss, row by row over MySQL (wrf_data_pusher.py:222-260).
Cluster-safe Spark form: left-anti join incoming keys against the dim,
assign new ids deterministically, union — an idempotent MERGE.

J4/W3 spatial nearest-neighbour: the reference consumes a precomputed
obs→d03 grid mapping (gen_active_stations_rfields.py:141-154).  The
engine can *produce* that mapping: bounded cross join + row_number over
distance.  At scale, the small side (obs stations, ~10²-10⁴ rows) is
broadcast so the cross join never shuffles the big grid side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def get_or_create(
    dim: DataFrame,
    incoming_keys: DataFrame,
    key_cols: Sequence[str],
    id_col: str = "id",
    id_offset: int | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Idempotent dim MERGE: rows of ``incoming_keys`` missing from
    ``dim`` get appended with new dense ids above the current max.

    New ids are assigned by a SALTED TWO-PHASE dense rank (the
    ``operators/sketch.py`` two-phase pattern), so a fact-scale first
    load never funnels through a single partition:

    1. each missing key gets a deterministic bucket — the first 8 hex
       digits of ``md5(concat_ws(':', keys))`` mod ``n_buckets`` (the
       engine-portable hash the oracle re-derives);
    2. ``row_number`` ranks WITHIN each bucket in parallel
       (``partitionBy(bucket)`` — no global sort of the data);
    3. per-bucket offsets come from a cumulative sum over the bucket
       COUNTS — a ≤ ``n_buckets``-row metadata frame (the only global
       window; bounded by construction) broadcast back onto the ranks.

    The resulting ids are dense above ``max(existing id)`` in the
    deterministic total order ``(bucket, key)`` — equal to
    ``row_number() OVER (ORDER BY bucket, key)``, which is what the
    SQL oracle computes.  Only the *missing* keys (usually ≈0 rows)
    ever shuffle; the dim and fact sides never globally sort.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1: {n_buckets}")
    missing = incoming_keys.select(*key_cols).dropDuplicates(list(key_cols)).join(
        dim.select(*key_cols), on=list(key_cols), how="left_anti"
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", *[F.col(c).cast("string") for c in key_cols]
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % n_buckets
    )
    bucketed = missing.withColumn("__b", bucket)
    w_local = Window.partitionBy("__b").orderBy(*key_cols)
    ranked = bucketed.withColumn("__r", F.row_number().over(w_local))
    counts = bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    # bounded: ≤ n_buckets rows (bucket metadata, never data-scale) —
    # CI-gated allowlist entry in test_plans_quality
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
    ).select("__b", "__off")
    ranked = ranked.join(F.broadcast(offsets), "__b")
    # the max-id base attaches ONCE, after the rank/offset join — it
    # must not sit upstream of the bucketed frame, or the single-row
    # cross join (and the anti-join feeding it) duplicates into both
    # the rank and the count branches of the plan
    if id_offset is None:
        base = dim.agg(F.coalesce(F.max(id_col), F.lit(0)).alias("m"))
        ranked = ranked.crossJoin(F.broadcast(base))
    else:
        ranked = ranked.withColumn("m", F.lit(id_offset))
    created = ranked.withColumn(
        id_col,
        (F.col("m") + F.col("__off") + F.col("__r")).cast("long"),
    ).drop("m", "__b", "__r", "__off")
    return dim.select(id_col, *key_cols).unionByName(
        created.select(id_col, *key_cols)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the value columns of the
    LATEST right row with ``right_time <= left_time`` (``direction=
    'backward'``, the default — inclusive) or the EARLIEST right row
    with ``right_time >= left_time`` (``'forward'``), matched on the
    ``on`` equi-keys — the two directions of pandas ``merge_asof``.
    ('nearest' is the composition: run both and pick the smaller
    |asof_time − time| per row.)

    Spark has no native as-of join; the classic implementations are a
    range cross-join (quadratic blowup) or per-group ``merge_asof`` in
    pandas (Python in the hot path).  This uses the union-tag-window
    form instead: tag both sides, union, one window sorted by (time,
    side) per key carrying ``last(value, ignorenulls)`` forward, keep
    left rows.  Exactly ONE shuffle + sort on the join key, all
    JVM-side — survives any scale the key distribution allows.

    ``tolerance`` (e.g. ``'INTERVAL 1 HOUR'``): matches farther than
    tolerance from left_time are nulled, like pandas merge_asof.
    Right-side (key, time) pairs should be unique (pre-dedupe) for
    deterministic results.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    lt, rt = F.col(left_time), F.col(right_time)
    l_tag = left.withColumn("__t", lt).withColumn("__side", F.lit(1))
    for c in value_cols:
        l_tag = l_tag.withColumn(f"__v_{c}", F.lit(None))
    r_tag = right.select(
        *[F.col(c) for c in on],
        rt.alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    l_cols = [c for c in l_tag.columns if c in left.columns]
    unioned = l_tag.select(
        *l_cols, "__t", "__side", *[f"__v_{c}" for c in value_cols]
    ).unionByName(r_tag, allowMissingColumns=True)

    # forward = the same carry-last walk over time DESC: at equal
    # times the right row (side 0) still precedes the left row, so
    # >= stays inclusive in both directions
    order = (
        [F.col("__t").asc(), F.col("__side").asc()]
        if direction == "backward"
        else [F.col("__t").desc(), F.col("__side").asc()]
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned
    for c in value_cols:
        carried = carried.withColumn(
            f"__c_{c}", F.last(f"__v_{c}", ignorenulls=True).over(w)
        )
    carried = carried.withColumn(
        "__c_t", F.last(F.when(F.col("__side") == 0, F.col("__t")),
                        ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        in_window = (
            F.col("__c_t") >= F.col("__t") - F.expr(tolerance)
            if direction == "backward"
            else F.col("__c_t") <= F.col("__t") + F.expr(tolerance)
        )
        for c in value_cols:
            out = out.withColumn(
                f"__c_{c}", F.when(in_window, F.col(f"__c_{c}"))
            )
        out = out.withColumn("__c_t", F.when(in_window, F.col("__c_t")))
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        *[F.col(f"__c_{c}").alias(f"asof_{c}") for c in value_cols],
        F.col("__c_t").alias("asof_time"),
    )


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lower_col: str,
    upper_col: str,
    on: Sequence[str] | None = None,
    bucket_width: int | None = None,
) -> DataFrame:
    """Interval join: pair each ``ranges`` row with every ``points`` row
    whose ``point_col`` lies in [lower, upper] (inclusive).

    With ``on`` equi-keys, Catalyst already plans an equi-join with the
    range as a post-filter — cheap.  WITHOUT equi-keys a naive join is
    a cross product; pass ``bucket_width`` (same units as the columns,
    ≥ max interval length) to bucketize: each range lands in the
    buckets its interval overlaps, each point in exactly one, and the
    join runs on the bucket key — the standard bucketized interval-join
    that keeps the fan-out proportional to matches, not |P|×|R|."""
    if bucket_width is None:
        cond = [
            *([points[c] == ranges[c] for c in on] if on else []),
            points[point_col] >= ranges[lower_col],
            points[point_col] <= ranges[upper_col],
        ]
        out = points.join(ranges, cond)
        if on:
            for c in on:
                out = out.drop(ranges[c])
        return out

    # integer DIV, not float division: epoch-microsecond longs exceed
    # double's 2^53 exact range
    p = points.withColumn(
        "__bucket", F.expr(f"`{point_col}` div {int(bucket_width)}")
    )
    r = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"`{lower_col}` div {int(bucket_width)}"),
                F.expr(f"`{upper_col}` div {int(bucket_width)}"),
            )
        ),
    )
    cond = [p["__bucket"] == r["__bucket"]]
    if on:
        cond += [p[c] == r[c] for c in on]
    out = (
        p.join(r, cond)
        .filter(
            (p[point_col] >= r[lower_col]) & (p[point_col] <= r[upper_col])
        )
        .drop(p["__bucket"])
        .drop(r["__bucket"])
    )
    if on:
        for c in on:
            out = out.drop(r[c])
    return out


def nearest_neighbor_map(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    distance: Column,
    k: int = 1,
    partition_cols: Sequence[str] | None = None,
    tie_break: Sequence[str] | None = None,
) -> DataFrame:
    """Top-k nearest ``right`` rows per ``left`` row.

    ``partition_cols`` (e.g. a shared coarse spatial cell or nation key)
    bounds the cross join; ``right`` is broadcast when small.  Output:
    (left_key, right_key, rank, dist).
    """
    on = list(partition_cols) if partition_cols else None
    joined = (
        left.join(F.broadcast(right), on=on, how="inner")
        if on
        else left.crossJoin(F.broadcast(right))
    )
    order = [distance.asc(), *[F.col(c).asc() for c in (tie_break or [right_key])]]
    w = Window.partitionBy(left_key).orderBy(*order)
    return (
        joined.withColumn("dist", distance)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(left_key, right_key, "rank", "dist")
    )
