"""Generic relational operators from SURVEY §2, exercised on the
driver's TPC-H-ish testdata with DuckDB oracles.

Each query name carries its SURVEY §2 operator id.  Numeric-stability
rules (see registry.py): double aggregates go through DECIMAL and back
to DOUBLE so both engines produce bit-identical values regardless of
summation order; ratios divide two already-identical values; window
ranks always carry a unique tie-break column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.keys import parse_grid_key, series_hash_id, station_name
from ..functions.timeutils import format_minute, truncate_minute, utc_to_lk
from ..operators.dedup import latest_per_series, latest_per_series_join
from ..operators.diff import adjacent_diff
from ..operators.joins import get_or_create, nearest_neighbor_map
from ..operators.pivot import pivot_by_source, unpivot
from ..sources.lake import load_table, spread
from .registry import register

DEC = "decimal(18,2)"


def _dsum(col: str):
    """Order-insensitive exact double sum: sum in DECIMAL, cast back."""
    return F.sum(F.col(col).cast(DEC)).cast("double")


# ---------------------------------------------------------------------------
# P2/P3 — conjunctive range predicate (bounding box form)
# Reference: np.where bbox slice wrf_data_pusher.py:181-189;
# Kelani extent filter gen_rfields.py:188-194.
@register(
    "p2_bbox_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
    FROM lineitem
    WHERE l_quantity >= 10 AND l_quantity <= 20
      AND l_discount >= 0.05 AND l_discount <= 0.07
    """,
)
def p2_bbox_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20) & F.col("l_discount").between(0.05, 0.07)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")


# P4 — SQL-string-expression filter (pandas .query analogue,
# gen_active_stations_rfields.py:97-102).
@register(
    "p4_sql_string_filter",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE value >= 100.0 AND event_type = 'purchase'
    """,
)
def p4_sql_string_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter("value >= 100.0 AND event_type = 'purchase'").select(
        "event_id", "user_id", "event_type", "value"
    )


# P5/P6/P8 — projection + numeric formatting + key construction
# (to_csv column projection gen_rfields.py:198-208; 6-dp coords
# wrf_data_pusher.py:214-215; 'wrf_{lat}_{lon}' names :220).
@register(
    "p6_station_names",
    oracle="""
    SELECT c_custkey,
           concat_ws('_', 'wrf', printf('%.6f', c_acctbal),
                     printf('%.6f', CAST(c_custkey AS DOUBLE))) AS station,
           printf('%.3f', c_acctbal) AS val_3dp
    FROM customer
    """,
)
def p6_station_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        station_name(F.col("c_acctbal"), F.col("c_custkey").cast("double")).alias(
            "station"
        ),
        F.format_string("%.3f", F.col("c_acctbal")).alias("val_3dp"),
    )


# P7 — timestamp decode/shift/truncate pipeline (UTC → +05:30 LK,
# minute truncation; wrf_data_pusher.py:75-76,268).
@register(
    "p7_timestamp_shift",
    oracle="""
    SELECT event_id,
           strftime(date_trunc('minute', ts + INTERVAL '5 hours 30 minutes'),
                    '%Y-%m-%d %H:%M:%S') AS time_lk
    FROM events
    """,
)
def p7_timestamp_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format(
            truncate_minute(utc_to_lk(F.col("ts"))), "yyyy-MM-dd HH:mm:ss"
        ).alias("time_lk"),
    )


# P9 — grid-key parse: split('_'), arity guard, extract obs id
# (gen_active_stations_rfields.py:149-154).
@register(
    "p9_key_parse",
    oracle="""
    WITH keyed AS (
      SELECT concat_ws('_', 'rainfall', CAST(c_custkey AS VARCHAR),
                       'MDPA', c_mktsegment) AS grid_key
      FROM customer
    )
    SELECT grid_key, split_part(grid_key, '_', 2) AS obs_id
    FROM keyed
    WHERE len(string_split(grid_key, '_')) = 4
    """,
)
def p9_key_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    keyed = c.select(
        F.concat_ws(
            "_", F.lit("rainfall"), F.col("c_custkey").cast("string"),
            F.lit("MDPA"), F.col("c_mktsegment"),
        ).alias("grid_key")
    )
    return keyed.select(
        "grid_key", parse_grid_key(F.col("grid_key")).alias("obs_id")
    ).filter(F.col("obs_id").isNotNull())


# series-id hashing (§1.1): sha256 over ':'-joined tms metadata
# (generate_timeseries_id semantics, wrf_data_pusher.py:230-248).
# Driver-gated through p8_p12_hash_strings (compound row).
def hash_series_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        series_hash_id(
            F.lit("evening_18:00"),
            F.format_string("%.6f", F.col("c_acctbal")),
            F.format_string("%.6f", F.col("c_custkey").cast("double")),
            F.lit("WRF_A"), F.lit("v4"), F.lit("Precipitation"),
            F.lit("mm"), F.lit("Accumulative"),
        ).alias("tms_id"),
    )


# ---------------------------------------------------------------------------
# A1/W1 — adjacent difference over time per series (wrf_data_pusher.py:63-65).
@register(
    "w1_lag_diff",
    oracle="""
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS t,
           value - lag(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS diff
    FROM events
    QUALIFY diff IS NOT NULL
    """,
)
def w1_lag_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = adjacent_diff(
        ev.withColumn("__ord", F.struct("ts", "event_id")),
        series_cols=["user_id"],
        order_col="__ord",
        value_col="value",
        out_col="diff",
    )
    return out.select(
        "user_id", "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t"), "diff",
    )


# A6/W2 — latest row per series, window form
# (get_latest_timeseries, gen_active_stations_rfields.py:191-193).
# Driver-gated through w2_latest_topk (compound row).
def w2_latest_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return latest_per_series(
        ev, series_cols=["user_id"], version_cols=["ts", "event_id"]
    ).select(
        "user_id", "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t"), "value",
    )


# A6 join-form — semi-join against max(version) per series.
@register(
    "a6_latest_fgt_join",
    oracle="""
    SELECT e.user_id, e.event_type, e.event_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS t, e.value
    FROM events e
    JOIN (SELECT user_id, event_type, max(ts) AS ts
          FROM events GROUP BY user_id, event_type) m
      ON e.user_id = m.user_id AND e.event_type = m.event_type
         AND e.ts = m.ts
    """,
)
def a6_latest_fgt_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return latest_per_series_join(
        ev, series_cols=["user_id", "event_type"], version_col="ts"
    ).select(
        "user_id", "event_type", "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t"), "value",
    )


# W2 top-k per group — top 3 orders by totalprice per customer.
# Driver-gated through w2_latest_topk (compound row).
def w2_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


# W2 compound driver row: BOTH window-rank forms in one hash — the
# latest-per-series top-1 (events) and the top-k-per-group rank
# (orders), union-tagged.  One row per (op, grp, item).
@register(
    "w2_latest_topk",
    oracle="""
    SELECT 'latest' AS op, user_id AS grp, event_id AS item,
           value AS val, CAST(1 AS BIGINT) AS rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    UNION ALL
    SELECT 'topk', o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def w2_latest_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    latest = w2_latest_per_series(spark, sf_dir).select(
        F.lit("latest").alias("op"),
        F.col("user_id").alias("grp"),
        F.col("event_id").alias("item"),
        F.col("value").alias("val"),
        F.lit(1).cast("long").alias("rnk"),
    )
    topk = w2_topk_per_group(spark, sf_dir).select(
        F.lit("topk").alias("op"),
        F.col("o_custkey").alias("grp"),
        F.col("o_orderkey").alias("item"),
        F.col("o_totalprice").alias("val"),
        F.col("rank").alias("rnk"),
    )
    return latest.unionByName(topk)


# W3/J4 — nearest-neighbour mapping by rank-over-distance
# (obs→d03 grid mapping, gen_active_stations_rfields.py:141-154).
# Generic form: nearest supplier per customer within the same nation,
# distance = |acctbal delta|.
@register(
    "w3_nearest_neighbor",
    oracle="""
    SELECT c_custkey, s_suppkey, rank, dist
    FROM (
      SELECT c.c_custkey, s.s_suppkey,
             abs(c.c_acctbal - s.s_acctbal) AS dist,
             row_number() OVER (PARTITION BY c.c_custkey
                                ORDER BY abs(c.c_acctbal - s.s_acctbal),
                                         s.s_suppkey) AS rank
      FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
    ) WHERE rank <= 2
    """,
)
def w3_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_nationkey", "nationkey"
    )
    s = load_table(spark, sf_dir, "supplier").withColumnRenamed(
        "s_nationkey", "nationkey"
    )
    return nearest_neighbor_map(
        c, s,
        left_key="c_custkey", right_key="s_suppkey",
        distance=F.abs(F.col("c_acctbal") - F.col("s_acctbal")),
        k=2, partition_cols=["nationkey"], tie_break=["s_suppkey"],
    )


# ---------------------------------------------------------------------------
# A2..A5 — grouped aggregation surface (TPC-H Q1 shape). The reference's
# only aggregations are mean/min/count (SURVEY §2.4); the engine exposes
# the full built-in agg surface. DECIMAL-summed for cross-engine
# bit-stability.
@register(
    "a1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount").cast(DEC)
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            (_dsum("l_quantity") / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


# A3 — min-reduction then interval shift: obs window start =
# min(time) - 10 minutes (gen_active_stations_rfields.py:203).
@register(
    "a3_obs_window_start",
    oracle="""
    SELECT user_id,
           strftime(min(ts) - INTERVAL '10 minutes',
                    '%Y-%m-%d %H:%M:%S') AS obs_start,
           count(*) AS n
    FROM events GROUP BY user_id
    """,
)
def a3_obs_window_start(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.date_format(
            F.min("ts") - F.expr("INTERVAL 10 MINUTES"), "yyyy-MM-dd HH:mm:ss"
        ).alias("obs_start"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# J1/R2 — iterated outer-merge becomes a single pivot: per (user, day),
# one column per event_type (gen_active_stations_rfields.py:195-213).
@register(
    "j1_pivot_sources",
    oracle="""
    SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(sum(CASE WHEN event_type = 'click'
                    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
           CAST(sum(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
           CAST(sum(CASE WHEN event_type = 'view'
                    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS "view"
    FROM events
    GROUP BY user_id, day
    """,
)
def j1_pivot_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
        F.col("value").cast(DEC).alias("value"),
    )
    wide = pivot_by_source(
        ev,
        key_cols=["user_id", "day"],
        pivot_col="event_type",
        pivot_values=["click", "purchase", "view"],
        value_col="value",
        agg="sum",
    )
    return wide.select(
        "user_id", "day",
        F.col("click").cast("double").alias("click"),
        F.col("purchase").cast("double").alias("purchase"),
        F.col("view").cast("double").alias("view"),
    )


# J2 — left outer equi-join (forecast ⟕ obs on time,
# gen_active_stations_rfields.py:209).
@register(
    "j2_left_join",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def j2_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


# J3 — broadcast map-side lookup join (16k station dict,
# wrf_data_pusher.py:222,447): dim explicitly broadcast.
@register(
    "j3_broadcast_lookup",
    oracle="""
    SELECT p.p_brand,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def j3_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# J5 — get-or-create dim MERGE: left-anti missing keys + deterministic
# dense id assignment (wrf_data_pusher.py:222-260).
@register(
    "j5_get_or_create",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS id,
             s_nationkey AS nationkey FROM supplier
    ),
    incoming AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
    missing AS (
      SELECT nationkey FROM incoming
      WHERE nationkey NOT IN (SELECT nationkey FROM dim)
    ),
    mx AS (SELECT coalesce(max(id), 0) AS m FROM dim),
    /* salted two-phase id order: bucket = md5-prefix hash of the key
       mod 64 (joins.get_or_create n_buckets default); global rank
       over (bucket, key) == the engine's per-bucket rank + cumulative
       bucket offsets */
    bkt AS (
      SELECT nationkey,
             ('0x' || substr(md5(CAST(nationkey AS VARCHAR)), 1, 8))::BIGINT
               % 64 AS bk
      FROM missing
    ),
    created AS (
      SELECT CAST(m + row_number() OVER (ORDER BY bk, nationkey)
                  AS BIGINT) AS id,
             nationkey
      FROM bkt, mx
    )
    SELECT id, nationkey FROM dim
    UNION ALL SELECT id, nationkey FROM created
    """,
)
def j5_get_or_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    dim = s.select(
        F.col("s_nationkey").cast("long").alias("id"),
        F.col("s_nationkey").alias("nationkey"),
    ).dropDuplicates(["nationkey"])
    incoming = c.select(F.col("c_nationkey").alias("nationkey"))
    return get_or_create(dim, incoming, key_cols=["nationkey"], id_col="id")


# full-outer join path (J1's physical form before the pivot rewrite).
# Driver-gated through u2_j1_outer_dropna (compound row).
def j1_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id").agg(_dsum("value").alias("click_v"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id").agg(_dsum("value").alias("purchase_v"))
    )
    return a.join(b, "user_id", "full_outer").select(
        F.coalesce(a.user_id, b.user_id).alias("user_id"), "click_v", "purchase_v"
    )


# U2 — dropna after outer join ≡ "instants covered by every source"
# (gen_active_stations_rfields.py:214). Kept literal, not rewritten to
# inner join, to preserve reference semantics.
# Driver-gated through u2_j1_outer_dropna (compound row).
def u2_dropna_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return j1_full_outer_join(spark, sf_dir).na.drop("any")


# J1-outer + U2 compound driver row: the full-outer join result (nulls
# preserved) and its dropna projection union-tagged — one hash checks
# both the outer-join null semantics and the reference's dropna
# contract.
@register(
    "u2_j1_outer_dropna",
    oracle="""
    WITH a AS (SELECT user_id,
                      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS click_v
               FROM events WHERE event_type = 'click' GROUP BY user_id),
         b AS (SELECT user_id,
                      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS purchase_v
               FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    fo AS (
      SELECT coalesce(a.user_id, b.user_id) AS user_id, a.click_v, b.purchase_v
      FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
    )
    SELECT 'full' AS stage, user_id, click_v, purchase_v FROM fo
    UNION ALL
    SELECT 'dropna', user_id, click_v, purchase_v FROM fo
    WHERE click_v IS NOT NULL AND purchase_v IS NOT NULL
    """,
)
def u2_j1_outer_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    fo = j1_full_outer_join(spark, sf_dir)
    full = fo.select(F.lit("full").alias("stage"), "*")
    dropped = fo.na.drop("any").select(F.lit("dropna").alias("stage"), "*")
    return full.unionByName(dropped)


# U1 — union-all of per-slice frames (dataframe.append loop,
# gen_active_stations_rfields.py:216-220).
# Driver-gated through u1_u5_union_forms (compound row).
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") >= 200000).select(
        "o_orderkey", "o_totalprice", F.lit("high").alias("bucket")
    )
    lo = o.filter(F.col("o_totalprice") < 50000).select(
        "o_orderkey", "o_totalprice", F.lit("low").alias("bucket")
    )
    return hi.unionByName(lo)


# U1+U5 compound driver row: UNION ALL (bag) next to UNION DISTINCT
# (set) in one hash — the 'nation' branch deduplicates across two
# source tables, the high/low branches preserve duplicates.
@register(
    "u1_u5_union_forms",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS key, o_totalprice AS val, 'high' AS bucket
    FROM orders WHERE o_totalprice >= 200000
    UNION ALL
    SELECT CAST(o_orderkey AS BIGINT), o_totalprice, 'low'
    FROM orders WHERE o_totalprice < 50000
    UNION ALL
    SELECT CAST(nationkey AS BIGINT), CAST(NULL AS DOUBLE), 'nation' FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey FROM supplier
    )
    """,
)
def u1_u5_union_forms(spark: SparkSession, sf_dir: str) -> DataFrame:
    slices = u1_union_all(spark, sf_dir).select(
        F.col("o_orderkey").cast("long").alias("key"),
        F.col("o_totalprice").alias("val"),
        "bucket",
    )
    nations = u5_union_distinct(spark, sf_dir).select(
        F.col("nationkey").cast("long").alias("key"),
        F.lit(None).cast("double").alias("val"),
        F.lit("nation").alias("bucket"),
    )
    return slices.unionByName(nations)


# R1 — unpivot/melt via stack (grid wide→long, wrf_data_pusher.py:211-268).
@register(
    "r1_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
    FROM lineitem WHERE l_orderkey <= 1000
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
    FROM lineitem WHERE l_orderkey <= 1000
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_orderkey <= 1000
    """,
)
def r1_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return unpivot(
        li,
        id_cols=["l_orderkey", "l_linenumber"],
        value_cols=["l_quantity", "l_extendedprice", "l_discount"],
        var_name="measure",
        value_name="value",
    ).withColumn(
        "measure", F.regexp_replace("measure", "^l_", "")
    )


# O1/O2 — total-order contract: global row_number encodes the sort so
# the hash actually checks ordering (xy.csv alignment, gen_rfields.py:186).
# Driver-gated through a9_o1_percentiles_ranked (compound row).
def o1_total_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    # bounded: total-order contract IS the semantics; gated by
    # tests/test_plans_quality.py::test_no_unbounded_global_windows...
    w = Window.orderBy("p_retailprice", "p_partkey")
    return p.select(
        F.row_number().over(w).cast("long").alias("rn"), "p_partkey", "p_retailprice"
    )


# Q3-style join+agg+rank (exercises join reordering & partial aggs).
@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # no hint on customer: it scales with SF (unbounded at 100 TB);
        # AQE broadcasts the filtered segment when measured-small
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "l_orderkey", "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join — the canonical timeseries operator Spark lacks natively
# (see operators.joins.asof_join: union-tag-window form, one shuffle).
# For each purchase, the user's latest click at-or-before it.
# Driver-gated through j6_j7_asof_range (compound row).
def j6_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import asof_join
    from ..operators.dedup import latest_per_series

    ev = load_table(spark, sf_dir, "events")
    clicks = latest_per_series(
        ev.filter(F.col("event_type") == "click"),
        series_cols=["user_id", "ts"], version_cols=["event_id"],
    ).select("user_id", "ts", "value")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        purchases, clicks, on=["user_id"], left_time="ts",
        right_time="ts", value_cols=["value"],
    )
    return out.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t"),
        "value", "asof_value",
        F.date_format("asof_time", "yyyy-MM-dd HH:mm:ss").alias("asof_t"),
    )


# Rollup / grouping sets (absent in the reference; engine exposes
# Spark's built-ins — SURVEY §2.4 note).
# Driver-gated through a7_a8_distinct_rollup (compound row).
def a8_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        _dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n")
    )


# Distinct aggregation surface.
# Driver-gated through a7_a8_distinct_rollup (compound row).
def a7_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


# A7+A8 compound driver row: distinct aggregates INSIDE a rollup — one
# query exercising both the multi-distinct rewrite (Expand) and the
# rollup grouping expansion at once.
@register(
    "a7_a8_distinct_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def a7_a8_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        _dsum("l_quantity").alias("sum_qty"),
        F.count("*").alias("n"),
    )


# Set ops beyond union (absent in reference; exposed anyway).  Both
# INTERSECT and EXCEPT verified through one driver row (a `setop` tag
# column distinguishes them) to stay inside the driver's query budget.
@register(
    "u3_u4_intersect_except",
    oracle="""
    SELECT 'intersect' AS setop, custkey FROM (
      SELECT o_custkey AS custkey FROM orders
      INTERSECT
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    UNION ALL
    SELECT 'except' AS setop, custkey FROM (
      SELECT c_custkey AS custkey FROM customer
      EXCEPT
      SELECT o_custkey FROM orders)
    """,
)
def u3_u4_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    c_rich = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    c_all = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    inter = o.intersect(c_rich).select(
        F.lit("intersect").alias("setop"), "custkey"
    )
    exc = c_all.exceptAll(o).distinct().select(
        F.lit("except").alias("setop"), "custkey"
    )
    return inter.unionByName(exc)


# §2.10 windows — tumbling 15-minute resample (the obs 15-min cadence,
# extract_obs_rain_15_min_ts): same plan batch or streaming.
@register(
    "s10_window_resample",
    oracle="""
    SELECT user_id,
           strftime(time_bucket(INTERVAL '15 minutes', ts)
                    + INTERVAL '15 minutes', '%Y-%m-%d %H:%M:%S') AS wend,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v,
           count(*) AS n
    FROM events GROUP BY user_id, wend
    """,
)
def s10_window_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.window("ts", "15 minutes").alias("w"))
        .agg(
            F.sum(F.col("value").cast(DEC)).cast("double").alias("v"),
            F.count("*").alias("n"),
        )
        .select(
            "user_id",
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("wend"),
            "v", "n",
        )
    )


# P10 — file-metadata scalar (fgt from file mtime,
# wrf_data_pusher.py:68-72): genuinely not expressible through the
# oracle's pre-registered views → rows-only check.
@register("p10_file_metadata")
def p10_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.select(
            F.col("_metadata.file_name").alias("file_name"),
            F.col("_metadata.file_modification_time").alias("mtime"),
        )
        .groupBy("file_name")
        .agg(
            F.count("*").alias("n_rows"),
            F.date_format(
                F.from_utc_timestamp(F.max("mtime"), "Asia/Colombo"),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("fgt_lk"),
        )
    )


# Exact interpolated quantiles (engine exposes both exact percentile
# and approx_percentile; only the exact form is oracle-comparable —
# both engines use the standard (n-1)*p linear interpolation).
# Driver-gated through a9_o1_percentiles_ranked (compound row).
def a9_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


# A9+O1 compound driver row: exact per-group percentiles (events,
# per user_id for a meaningful group count) with an O1-style global
# row_number over (p50, user_id) — the hash checks both interpolation
# and the total-order contract.  The global window runs over the
# |user_id| aggregate rows (bounded), not the fact table — same
# confinement argument as the original o1_total_order.
@register(
    "a9_o1_percentiles_ranked",
    oracle="""
    WITH pct AS (
      SELECT user_id,
             quantile_cont(value, 0.5) AS p50,
             quantile_cont(value, 0.9) AS p90,
             min(value) AS vmin, max(value) AS vmax
      FROM events GROUP BY user_id
    )
    SELECT row_number() OVER (ORDER BY p50, user_id) AS rn,
           user_id, p50, p90, vmin, vmax
    FROM pct
    """,
)
def a9_o1_percentiles_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pct = ev.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    # bounded: one row per user AFTER aggregation; global rank is the
    # query's total-order contract (CI-gated allowlist entry)
    w = Window.orderBy("p50", "user_id")
    return pct.select(
        F.row_number().over(w).cast("long").alias("rn"),
        "user_id", "p50", "p90", "vmin", "vmax",
    )


# Sessionization: split each user's event stream into sessions at
# >30-minute gaps (lag + flag + running count), then aggregate per
# session — the canonical event-analytics window composition.  The gap
# condition is an integer microsecond comparison in BOTH engines
# (events carry sub-second precision; a seconds-floor on one side and
# an exact interval on the other could split a session differently
# within ~1 s of the boundary).
@register(
    "w4_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts::TIMESTAMP)
                    - lag(epoch_us(ts::TIMESTAMP)) OVER w
                    <= 1800 * 1000000
                  THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, event_id, value,
             CAST(sum(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_no
      FROM flagged
    )
    SELECT user_id, session_no,
           count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
    FROM sessions GROUP BY user_id, session_no
    """,
)
def w4_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.unix_micros("ts")
            - F.lag(F.unix_micros("ts")).over(w) <= 1800 * 1_000_000,
            0,
        ).otherwise(1),
    )
    sessions = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("session_value"),
    )


# Approximate aggregates (HLL / t-digest sketches). Sketch internals
# differ across engines, so the sketch VALUES cannot be hash-compared;
# instead each sketch is verified against its accuracy contract: the
# exact twin is computed alongside (hash-gated against DuckDB) and the
# sketch must land within tolerance of it — emitted as a boolean whose
# oracle form is literal TRUE. HLL merge is commutative max-of-registers
# (partition-order independent), and the within-tolerance predicate
# absorbs approx_percentile's merge-order sensitivity, so the booleans
# are stable across plans.
@register(
    "a10_approx_aggs",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           round(quantile_cont(l_extendedprice, 0.5), 2) AS exact_p50,
           TRUE AS approx_parts_ok,
           TRUE AS approx_p50_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a10_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # The distinct aggregates and the percentile sketches deliberately
    # run as TWO aggregations joined on the 3-row group key: mixing a
    # DISTINCT aggregate (which plans an Expand) with
    # TypedImperativeAggregates (percentile / approx_percentile) in
    # one groupBy forces the whole aggregation onto the sort-based
    # fallback path — measured 7.3 s warm at sf0.1 for the combined
    # form vs ~0.3 s per piece; the split runs each family on its fast
    # path (hash-with-expand / ObjectHashAggregate) and rejoins 3 rows.
    dist = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )
    pct = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 2).alias("exact_p50"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias(
            "approx_p50"
        ),
    )
    agg = dist.join(pct, "l_returnflag")
    return agg.select(
        "l_returnflag", "exact_parts", "exact_p50",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 0.10 * F.col("exact_parts")
        ).alias("approx_parts_ok"),
        (
            F.abs(F.col("approx_p50") - F.col("exact_p50"))
            <= 0.05 * F.abs(F.col("exact_p50"))
        ).alias("approx_p50_ok"),
    )


# Range/interval join (bucketized form — no equi-key needed at scale):
# for each purchase, clicks by ANY user in the preceding hour.
# Driver-gated through j6_j7_asof_range (compound row).
def j7_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import range_join

    ev = load_table(spark, sf_dir, "events")
    # microsecond precision: the event timestamps carry sub-second
    # parts, so boundary membership must not truncate to seconds
    us = lambda c: F.unix_micros(F.col(c))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        us("ts").alias("t_end"),
        (us("ts") - 3600 * 1_000_000).alias("t_start"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        us("ts").alias("click_ts"),
        F.col("value").cast(DEC).alias("click_v"),
    )
    joined = range_join(
        clicks, purchases,
        point_col="click_ts", lower_col="t_start", upper_col="t_end",
        bucket_width=3600 * 1_000_000,
    )
    counts = joined.groupBy("event_id", "t").agg(
        F.count("click_ts").alias("n_clicks"),
        F.sum("click_v").cast("double").alias("click_value"),
    )
    # left semantics: purchases with zero clicks in window still appear
    return (
        purchases.select("event_id", "t")
        .join(counts, ["event_id", "t"], "left")
        .select(
            "event_id", "t",
            F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
            "click_value",
        )
    )


# J6+J7 compound driver row: both custom timeseries joins keyed by the
# same purchase rows — the as-of columns and the preceding-hour range
# aggregate joined on (event_id, t) into one hash.
@register(
    "j6_j7_asof_range",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
      ) WHERE rn = 1
    ),
    purchases AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    aj AS (
      SELECT p.event_id, p.user_id,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS t, p.value,
             c.value AS asof_value,
             strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS asof_t
      FROM purchases p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.ts
    ),
    all_clicks AS (SELECT ts, value FROM events WHERE event_type = 'click'),
    rng AS (
      SELECT p.event_id,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS t,
             count(c.ts) AS n_clicks,
             CAST(sum(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
      FROM purchases p
      LEFT JOIN all_clicks c
        ON c.ts >= p.ts - INTERVAL '1 hour' AND c.ts <= p.ts
      GROUP BY p.event_id, t
    )
    SELECT a.event_id, a.user_id, a.t, a.value, a.asof_value, a.asof_t,
           r.n_clicks, r.click_value
    FROM aj a JOIN rng r ON a.event_id = r.event_id AND a.t = r.t
    """,
)
def j6_j7_asof_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    asof = j6_asof_join(spark, sf_dir)
    rng = j7_range_join(spark, sf_dir)
    return asof.join(rng, ["event_id", "t"]).select(
        "event_id", "user_id", "t", "value", "asof_value", "asof_t",
        "n_clicks", "click_value",
    )


# Cube + GROUPING() ids — the full grouping-sets surface next to
# a8_rollup. grouping_id bit order matches CUBE column order in both
# engines.  Driver-gated through a11_a12_cube_gsets (compound row).
def a11_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_rf"),
        F.grouping("l_linestatus").cast("long").alias("g_ls"),
        _dsum("l_quantity").alias("sum_qty"),
        F.count("*").alias("n"),
    )


# Explicit GROUPING SETS (the general form rollup/cube specialize) with
# GROUPING() ids — the set list here is NOT a rollup prefix chain:
# {(rf,ls), (ls), ()} skips the (rf) level, which only GROUPING SETS
# can express.  One shuffle: Spark expands the sets map-side (Expand
# node) and aggregates once.
# Driver-gated through a11_a12_cube_gsets (compound row).
def a12_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
        "l_returnflag", "l_linestatus",
    ).agg(
        F.grouping("l_returnflag").cast("long").alias("g_rf"),
        F.grouping("l_linestatus").cast("long").alias("g_ls"),
        _dsum("l_quantity").alias("sum_qty"),
        F.count("*").alias("n"),
    )


# A11+A12 compound driver row: CUBE and explicit GROUPING SETS results
# union-tagged into one hash (each side keeps its GROUPING() ids).
@register(
    "a11_a12_cube_gsets",
    oracle="""
    SELECT 'cube' AS form, l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'gsets', l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS BIGINT),
           CAST(grouping(l_linestatus) AS BIGINT),
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE),
           count(*)
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
    """,
)
def a11_a12_cube_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cube = a11_cube(spark, sf_dir).select(F.lit("cube").alias("form"), "*")
    gsets = a12_grouping_sets(spark, sf_dir).select(
        F.lit("gsets").alias("form"), "*"
    )
    return cube.unionByName(gsets)


# Q5-shape: 6-table join chain — the join-reordering workout. Catalyst
# reorders + broadcasts the dims; only lineitem⋈orders shuffles.
@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# Q18-shape: aggregate subquery driving a semi-join filter.
@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
          )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg(_dsum("l_quantity").alias("total_qty"))
    )


# Null-safe equality (<=> / IS NOT DISTINCT FROM) — null-handling
# semantics the outer-join pipelines depend on.
@register(
    "p11_null_safe_eq",
    oracle="""
    WITH a AS (
      SELECT user_id,
             CASE WHEN user_id % 10 = 0 THEN NULL
                  ELSE user_id % 3 END AS grp
      FROM events WHERE event_type = 'signup'
    ),
    b AS (SELECT DISTINCT
             CASE WHEN user_id % 10 = 0 THEN NULL
                  ELSE user_id % 3 END AS grp
          FROM events WHERE event_type = 'error')
    SELECT a.user_id, a.grp
    FROM a JOIN b ON a.grp IS NOT DISTINCT FROM b.grp
    """,
)
def p11_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    grp = F.when(F.col("user_id") % 10 == 0, F.lit(None)).otherwise(
        F.col("user_id") % 3
    )
    a = ev.filter(F.col("event_type") == "signup").select(
        "user_id", grp.alias("grp")
    )
    b = (
        ev.filter(F.col("event_type") == "error")
        .select(grp.alias("grp"))
        .distinct()
        .withColumnRenamed("grp", "bgrp")
    )
    return a.join(b, a.grp.eqNullSafe(b.bgrp)).select("user_id", "grp")


# String-function surface (P8-adjacent): case, substring, pad,
# replace, edit distance.
# Driver-gated through p8_p12_hash_strings (compound row).
def p12_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.substring("c_name", 3, 8).alias("mid"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("repl"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).cast("long").alias("lev"),
        F.length("c_name").cast("long").alias("nlen"),
    )


# P8+P12 compound driver row: the sha256 series-id hash (§1.1,
# wrf_data_pusher.py:230-248) and the string-function surface in one
# per-customer projection (join on c_custkey collapses to one scan —
# both sides are projections of the same table).
@register(
    "p8_p12_hash_strings",
    oracle="""
    SELECT c_custkey,
           sha256(concat_ws(':', 'evening_18:00', printf('%.6f', c_acctbal),
                            printf('%.6f', CAST(c_custkey AS DOUBLE)),
                            'WRF_A', 'v4', 'Precipitation', 'mm',
                            'Accumulative')) AS tms_id,
           upper(c_name) AS uname,
           substring(c_name, 3, 8) AS mid,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
           replace(c_name, '#', '-') AS repl,
           levenshtein(c_mktsegment, 'BUILDING') AS lev,
           length(c_name) AS nlen
    FROM customer
    """,
)
def p8_p12_hash_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        series_hash_id(
            F.lit("evening_18:00"),
            F.format_string("%.6f", F.col("c_acctbal")),
            F.format_string("%.6f", F.col("c_custkey").cast("double")),
            F.lit("WRF_A"), F.lit("v4"), F.lit("Precipitation"),
            F.lit("mm"), F.lit("Accumulative"),
        ).alias("tms_id"),
        F.upper("c_name").alias("uname"),
        F.substring("c_name", 3, 8).alias("mid"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("repl"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).cast("long").alias("lev"),
        F.length("c_name").cast("long").alias("nlen"),
    )


# Semi-structured JSON extraction + datetime-part surface (one driver
# row for both, to stay inside the driver's query budget; both operate
# per-event on events).  Day-of-week conventions differ (Spark:
# 1=Sunday; DuckDB: 0=Sunday) — normalized to ISO (1=Monday) on both
# sides.
@register(
    "p14_p15_json_datetime",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')::BIGINT AS k,
           count(*) OVER (PARTITION BY json_extract_string(props, '$.k')::BIGINT)
             AS k_freq,
           year(ts) AS y, month(ts) AS m, day(ts) AS d,
           hour(ts) AS h, minute(ts) AS mi,
           isodow(ts) AS iso_dow,
           week(ts) AS iso_week,
           dayofyear(ts) AS doy
    FROM events
    """,
)
def p14_p15_json_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("k"),
        F.count("*").over(Window.partitionBy(k)).alias("k_freq"),
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.minute("ts").cast("long").alias("mi"),
        F.expr("extract(DAYOFWEEK_ISO FROM ts)").cast("long").alias("iso_dow"),
        F.weekofyear("ts").cast("long").alias("iso_week"),
        F.dayofyear("ts").cast("long").alias("doy"),
    )


# UNION with distinct semantics (vs u1's UNION ALL).
# Driver-gated through u1_u5_union_forms (compound row).
def u5_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).distinct()


# Conditional-expression surface: CASE, nullif, coalesce, least,
# greatest — the scalar kernel the NULL-heavy pipelines lean on.
@register(
    "p16_conditional_exprs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS bucket,
           nullif(o_orderstatus, 'O') AS status_or_null,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
           least(o_totalprice, 150000.0) AS capped,
           greatest(o_totalprice - 100000.0, 0.0) AS excess
    FROM orders
    """,
)
def p16_conditional_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("bucket"),
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("OPEN")).alias("status_label"),
        F.least(F.col("o_totalprice"), F.lit(150000.0)).alias("capped"),
        F.greatest(F.col("o_totalprice") - 100000.0, F.lit(0.0)).alias("excess"),
    )


# Skew-salted aggregation (operators/skew.py): the two-phase
# groupBy(keys+salt) → groupBy(keys) plan must be value-identical to
# the plain one-phase GROUP BY — the oracle IS the plain form.  The
# event_type key is genuinely low-cardinality/hot (5 values over the
# whole fact table), exactly the shape salting exists for; DECIMAL
# sums make the two-phase recombination order-insensitive.
@register(
    "a13_salted_agg",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
           count(event_id) AS count_event_id,
           max(user_id) AS max_user_id
    FROM events GROUP BY event_type
    """,
)
def a13_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast(DEC).alias("v"),
        "event_id", "user_id",
    )
    out = salted_aggregate(
        ev, keys=["event_type"],
        aggs={"v": "sum", "event_id": "count", "user_id": "max"},
        n_salts=16,
    )
    return out.select(
        "event_type",
        F.col("sum_v").cast("double").alias("sum_v"),
        "count_event_id", "max_user_id",
    )


# ---------------------------------------------------------------------------
# ANALYZE-style table profiling (one-scan column statistics) — tail
# row, oracle-gated locally by tests/test_oracle_parity.  Registered
# with exact_distinct=True (the cross-engine-comparable twin; the op's
# default is HLL approx_count_distinct for the 100 TB path, covered by
# unit tests against the exact form).
_PROFILE_COLS = [
    "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
    "l_shipdate",
]
_PROFILE_UNION = " UNION ALL ".join(
    f"""SELECT '{c}' AS "column", count(*) AS n_rows,
        count(*) - count({c}) AS n_nulls,
        (count(*) - count({c})) / count(*) AS null_frac,
        count(DISTINCT {c}) AS n_distinct,
        CAST(min({c}) AS VARCHAR) AS min_value,
        CAST(max({c}) AS VARCHAR) AS max_value
        FROM lineitem"""
    for c in _PROFILE_COLS
)


@register("a14_profile_table", oracle=_PROFILE_UNION)
def a14_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_table

    li = load_table(spark, sf_dir, "lineitem").select(*_PROFILE_COLS)
    return profile_table(li, exact_distinct=True)


# ---------------------------------------------------------------------------
# Bounded-frame rolling statistics (ROWS BETWEEN k PRECEDING AND
# CURRENT ROW) — the sliding-window class distinct from lag/rank
# (unbounded-history) windows: partitioned by series, so it scales
# with the key distribution and passes the global-window CI gate by
# construction.  Tail row; tests/test_oracle_parity gates it locally.
@register(
    "w5_rolling_stats",
    oracle="""
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS t,
           round(avg(value) OVER w, 9) AS roll_avg,
           round(sum(value) OVER w, 9) AS roll_sum,
           min(value) OVER w AS roll_min,
           max(value) OVER w AS roll_max,
           count(*) OVER w AS roll_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def w5_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spread(load_table(spark, sf_dir, "events"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t"),
        F.round(F.avg("value").over(w), 9).alias("roll_avg"),
        F.round(F.sum("value").over(w), 9).alias("roll_sum"),
        F.min("value").over(w).alias("roll_min"),
        F.max("value").over(w).alias("roll_max"),
        F.count("*").over(w).alias("roll_n"),
    )


# ---------------------------------------------------------------------------
# Edit-distance fuzzy self-join (entity resolution) — q-gram blocking
# + Levenshtein verify vs DuckDB's O(n²) levenshtein cross product.
# TPC-H customer names ("Customer#000000123") are the classic near-
# identical-key corpus: single-digit differences are distance-1 pairs.
# Tail row (oracle is quadratic by design; the engine side is the
# blocked form whose recall-1.0 argument lives in operators/fuzzy.py).
@register(
    "j8_fuzzy_pairs",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           levenshtein(a.c_name, b.c_name) AS distance
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def j8_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fuzzy import fuzzy_self_pairs

    c = spread(load_table(spark, sf_dir, "customer")).select(
        "c_custkey", "c_name"
    )
    # n=4: digit 4-grams are ~10x rarer than trigrams on ID-like
    # names, shrinking prefix postings (blocking choice is invisible
    # to the oracle — recall stays 1.0 at any n)
    return fuzzy_self_pairs(
        c, id_col="c_custkey", text_col="c_name", max_distance=1, n=4
    )


# ---------------------------------------------------------------------------
# SCD type-2 history derivation from the event log: per user, the
# versioned history of event_type with validity intervals — change
# detection (lag) + version closing (lead) share ONE window exchange.
# Tail row; tests/test_oracle_parity gates it locally.
@register(
    "k10_scd2_history",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    ch AS (
      SELECT user_id, event_type, ts, event_id FROM c
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id),
                    '%Y-%m-%d %H:%M:%S') AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) IS NULL)
             AS is_current
    FROM ch
    """,
)
def k10_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd import scd2_from_events

    ev = spread(load_table(spark, sf_dir, "events")).select(
        "user_id", "event_type", "ts", "event_id"
    )
    hist = scd2_from_events(
        ev, ["user_id"], ["event_type"], "ts", tiebreak_col="event_id"
    )
    return hist.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss")
        .alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss")
        .alias("valid_to"),
        "is_current",
    )


# W6 — dense-grid gap filling with linear interpolation (the missing-
# timestep repair the reference's obs feed needs; pandas
# resample().interpolate() as distributed ops).  Hourly resample of the
# event log per user, then every missing hour between each user's first
# and last active hour is interpolated from its bracketing
# observations.  DECIMAL-sum resample makes the observed doubles
# bit-identical across engines, so the interpolation arithmetic agrees
# bit-for-bit UNROUNDED — round(6) would actually BREAK parity here:
# 2-decimal inputs x dyadic gap fractions land exactly on .5 rounding
# boundaries where the engines' double rounding differs by 1 ulp.
@register(
    "w6_gap_fill",
    oracle="""
    WITH r AS (
      SELECT user_id,
             floor(epoch(ts))::BIGINT // 3600 AS slot,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ),
    s AS (SELECT user_id, min(slot) AS mn, max(slot) AS mx
          FROM r GROUP BY 1),
    g AS (SELECT user_id, unnest(generate_series(mn, mx, 1)) AS slot
          FROM s),
    j AS (SELECT g.user_id, g.slot, r.v
          FROM g LEFT JOIN r USING (user_id, slot)),
    f AS (
      SELECT user_id, slot, v,
        last_value(CASE WHEN v IS NOT NULL
                        THEN struct_pack(t := slot, x := v) END
                   IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY slot
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
        first_value(CASE WHEN v IS NOT NULL
                         THEN struct_pack(t := slot, x := v) END
                    IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY slot
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
      FROM j
    )
    SELECT user_id,
           strftime(make_timestamp(slot * 3600 * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS hour_start,
           CASE WHEN v IS NOT NULL THEN v
                /* parenthesized to mirror the Spark expression tree
                   exactly: a * (b / c), NOT SQL's default (a*b)/c —
                   the association changes the last ulp */
                ELSE p.x + (n.x - p.x)
                       * ((slot - p.t)::DOUBLE / (n.t - p.t)::DOUBLE)
           END AS value_filled,
           (v IS NULL) AS is_gap
    FROM f
    """,
)
def w6_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import gap_fill

    ev = spread(load_table(spark, sf_dir, "events"))
    hourly = ev.groupBy(
        "user_id",
        (F.floor(F.unix_timestamp("ts") / 3600)).cast("long").alias("slot"),
    ).agg(F.sum(F.col("value").cast(DEC)).cast("double").alias("v"))
    filled = gap_fill(
        hourly, ["user_id"], slot_col="slot", value_col="v",
        method="linear",
    )
    return filled.select(
        "user_id",
        F.date_format(
            F.timestamp_seconds(F.col("slot") * 3600),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("hour_start"),
        "value_filled",
        "is_gap",
    )


# P13 — Morton (Z-order) key computation, the layout primitive behind
# bbox-prunable spatial parquet (operators/layout.py; the write-side
# clustering + file-stats pruning effect is pytest-gated in
# tests/test_layout.py with real parquet metadata).  Cells derive from
# exact integer columns so the interleave is hash-pinnable; the oracle
# re-derives the bit arithmetic term by term.
def _morton_sql(qx: str, qy: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({qx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({qy} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@register(
    "p13_morton_zorder",
    oracle=f"""
    WITH cells AS (
      SELECT c_custkey,
             c_custkey % 1024 AS qx,
             (c_custkey // 7 + c_nationkey * 41) % 1024 AS qy
      FROM customer
    )
    SELECT c_custkey, qx, qy,
           {_morton_sql('qx', 'qy', 10)} AS zkey
    FROM cells
    """,
)
def p13_morton_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import morton_interleave

    c = load_table(spark, sf_dir, "customer")
    cells = c.select(
        "c_custkey",
        (F.col("c_custkey") % 1024).alias("qx"),
        (
            (F.expr("c_custkey div 7") + F.col("c_nationkey") * 41) % 1024
        ).alias("qy"),
    )
    return cells.withColumn(
        "zkey", morton_interleave(F.col("qx"), F.col("qy"), bits=10)
    )


# A15 — exact heavy hitters over the token stream (stopword/boilerplate
# detection threshold form; the bounded-memory Misra-Gries sketch twin
# is pytest-gated in tests/test_heavy.py since its output membership is
# partitioning-dependent by design).  freq_ratio is one division of
# exact integers — bit-identical across engines unrounded.
@register(
    "a15_heavy_hitters",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(trim(text), ' ')) AS item
                 FROM documents),
    c AS (SELECT item, count(*) AS n_occurrences FROM tok GROUP BY item),
    t AS (SELECT count(*)::BIGINT AS total FROM tok)
    SELECT item, n_occurrences,
           n_occurrences::DOUBLE / total::DOUBLE AS freq_ratio
    FROM c CROSS JOIN t
    WHERE n_occurrences > 0.004 * total::DOUBLE
    """,
)
def a15_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.heavy import heavy_hitters_exact

    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("token")
    )
    return heavy_hitters_exact(tok, "token", min_fraction=0.004)


# J9 — bloom-filter semi-join: the scan-pruning join tier between
# "broadcast the dim" and "shuffle both sides" (what Spark's runtime
# row-level filtering injects; built in pure Catalyst here since this
# build doesn't expose bloom_filter_agg).  Result is EXACT — the bloom
# only prunes the fact side's shuffle input; a verify semi-join removes
# the false positives — so the oracle is the plain semi-join.
@register(
    "j9_bloom_semi_join",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    """,
)
def j9_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloom import bloom_semi_join

    orders = spread(load_table(spark, sf_dir, "orders")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    return bloom_semi_join(orders, cust, "o_custkey", "c_custkey", fpp=0.01)


# ---------------------------------------------------------------------------
# A16 — count-min sketch frequency estimation over the document word-
# BIGRAM stream (with multiplicity; the unigram vocabulary is 31 words
# — too small to collide), point-queried for the exact top-50 bigrams
# at width 64 so collisions genuinely occur and the min-over-rows
# estimate does real work.  The oracle rebuilds the SKETCH CELLS
# themselves in DuckDB (same md5-mod hashing), so the row pins the
# full estimate path — cell hashing, cell counting, min-over-rows —
# not just the exact counts; cms_est ≥ exact_cnt by construction
# (asserted in pytest).
_CMS_ROWS = "(SELECT unnest(range(4)) AS i)"
@register(
    "a16_countmin_freq",
    oracle=f"""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    tok AS (
      SELECT unnest(list_transform(range(1, len(t)),
                    i -> concat_ws(' ', t[i], t[i+1]))) AS token
      FROM toks WHERE len(t) >= 2
    ),
    cells AS (
      SELECT i.i AS row,
             ('0x' || substr(md5(i.i::VARCHAR || ':' || token), 1, 8))::BIGINT
               % 64 AS col,
             count(*) AS cnt
      FROM tok CROSS JOIN {_CMS_ROWS} i
      GROUP BY 1, 2
    ),
    q AS (
      SELECT token, count(*) AS exact_cnt FROM tok
      GROUP BY token ORDER BY exact_cnt DESC, token LIMIT 50
    ),
    probe AS (
      SELECT q.token, q.exact_cnt, i.i AS row,
             ('0x' || substr(md5(i.i::VARCHAR || ':' || q.token), 1, 8))::BIGINT
               % 64 AS col
      FROM q CROSS JOIN {_CMS_ROWS} i
    )
    SELECT p.token, p.exact_cnt, min(coalesce(c.cnt, 0)) AS cms_est
    FROM probe p LEFT JOIN cells c ON c.row = p.row AND c.col = p.col
    GROUP BY p.token, p.exact_cnt
    """,
)
def a16_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import countmin_build, countmin_lookup

    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = (
        docs.select(F.split(F.col("text"), " ").alias("__t"))
        .filter(F.size("__t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(__t) - 2),"
                    " i -> __t[i] || ' ' || __t[i + 1])"
                )
            ).alias("token")
        )
    )
    sketch = countmin_build(tok, "token", width=64)
    top = (
        tok.groupBy("token")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "token")
        .limit(50)
    )
    return countmin_lookup(sketch, top, "token", width=64)


# ---------------------------------------------------------------------------
# A17 — robust per-group outlier detection (median / MAD / modified
# z-score, Iglewicz–Hoaglin).  Emits only the flagged rows; the stat
# columns ride along so the row also pins the exact grouped medians.
@register(
    "a17_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT user_id, median(value) AS group_median
      FROM events GROUP BY user_id
    ),
    mad AS (
      SELECT e.user_id, median(abs(e.value - m.group_median)) AS group_mad
      FROM events e JOIN med m ON e.user_id = m.user_id
      GROUP BY e.user_id
    )
    SELECT e.user_id, e.event_id, e.value,
           round(m.group_median, 9) AS group_median,
           round(d.group_mad, 9) AS group_mad,
           round(abs(e.value - m.group_median) / (1.4826 * d.group_mad), 9)
             AS robust_z
    FROM events e
    JOIN med m ON e.user_id = m.user_id
    JOIN mad d ON e.user_id = d.user_id
    WHERE d.group_mad > 0
      AND abs(e.value - m.group_median) > 3.0 * (1.4826 * d.group_mad)
    """,
)
def a17_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import mad_outliers

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    out = mad_outliers(ev, ["user_id"], "value", k=3.0)
    return out.filter(F.col("is_outlier") & (F.col("group_mad") > 0)).select(
        "user_id", "event_id", "value",
        F.round("group_median", 9).alias("group_median"),
        F.round("group_mad", 9).alias("group_mad"),
        F.round("robust_z", 9).alias("robust_z"),
    )


# ---------------------------------------------------------------------------
# K11 — snapshot diff between two keyed table versions.  The two
# "versions" are deterministic derivations of orders (key-mod membership
# + a price bump), exercising every status class; the oracle re-derives
# the classification with a FULL OUTER JOIN and null-safe comparison —
# semantically the operator's md5-row-hash test, expressed directly.
@register(
    "k11_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 5 <> 0
    ),
    new AS (
      SELECT o_orderkey, o_orderstatus,
             o_totalprice + CASE WHEN o_orderkey % 2 = 0
                                 THEN 1.50 ELSE 0.00 END AS o_totalprice
      FROM orders WHERE o_orderkey % 3 <> 0
    )
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                  OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                  THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE CASE WHEN o.o_orderkey IS NULL THEN 'added'
               WHEN n.o_orderkey IS NULL THEN 'removed'
               WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                 OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                 THEN 'changed'
               ELSE 'unchanged' END <> 'unchanged'
    """,
)
def k11_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.snapshot import snapshot_diff

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = orders.filter(F.col("o_orderkey") % 5 != 0)
    # cast back to the source decimal scale: a double bump would turn
    # "4576.80" into "4576.8" in the row digest and flag unchanged
    # trailing-zero prices as changed
    new = orders.filter(F.col("o_orderkey") % 3 != 0).withColumn(
        "o_totalprice",
        (
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 2 == 0, F.lit(1.50)).otherwise(
                F.lit(0.00)
            )
        ).cast(orders.schema["o_totalprice"].dataType.simpleString()),
    )
    diff = snapshot_diff(old, new, keys=["o_orderkey"])
    return diff.filter(F.col("status") != "unchanged")


# ---------------------------------------------------------------------------
# A18 — mergeable-partial rollup algebra (incremental aggregate
# maintenance).  The event log is sliced into 3 synthetic ingest
# batches (event_id % 3); per-(key, batch) partials are merged into
# per-key statistics, and the oracle re-derives the same two-level
# aggregation — pinning that the partial algebra (n/sum/min/max/sum_sq
# + derived mean/variance) reproduces the direct aggregation under ANY
# batch slicing.  Values are floor-quantized to integer milliunits
# map-side so every partial is EXACT (bigint) and the derived doubles
# come from identical IEEE ops in both engines — no rounding fudge in
# the hash.  The store lifecycle (commit / merge-on-read / replay /
# compaction) is pytest-gated in tests/test_rollup.py.
@register(
    "a18_mergeable_rollup",
    oracle="""
    WITH q AS (
      SELECT user_id, event_id % 3 AS b,
             CAST(floor(value * 1000) AS BIGINT) AS vq
      FROM events
    ),
    p AS (
      SELECT user_id, b, count(vq) AS n, CAST(sum(vq) AS BIGINT) AS sum_v,
             min(vq) AS min_v, max(vq) AS max_v,
             CAST(sum(vq * vq) AS BIGINT) AS sum_sq
      FROM q GROUP BY user_id, b
    ),
    m AS (
      SELECT user_id, CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(sum_v) AS BIGINT) AS sum_v,
             min(min_v) AS min_v, max(max_v) AS max_v,
             CAST(sum(sum_sq) AS BIGINT) AS sum_sq
      FROM p GROUP BY user_id
    )
    SELECT user_id, n, sum_v, min_v, max_v,
           sum_v / n AS avg_v,
           sum_sq / n - (sum_v / n) * (sum_v / n) AS var_pop
    FROM m
    """,
)
def a18_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rollup import merge_partials, rollup_partials

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.col("event_id") % 3).alias("b"),
        F.floor(F.col("value") * 1000).cast("long").alias("vq"),
    )
    partials = rollup_partials(ev, ["user_id", "b"], "vq")
    return merge_partials(partials, ["user_id"])


# ---------------------------------------------------------------------------
# A19 — histograms over events.value, both shapes in one union-tagged
# row: equi-WIDTH (k equal spans from a single-row min/max broadcast)
# and equi-DEPTH (k equal frequencies from one exact interpolated
# percentile-boundary row — Spark percentile ≡ DuckDB quantile_cont
# bit-for-bit, the llm_ngram_logfreq precedent).  No global sort or
# window in either branch; counts combine map-side.
_H_PCTS = ", ".join(str(i / 8) for i in range(9))
@register(
    "a19_histograms",
    oracle=f"""
    WITH s AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
    wb AS (
      SELECT least(CAST(floor((value - s.mn) / ((s.mx - s.mn) / 8))
                        AS INT), 7) AS bucket, s.mn, s.mx
      FROM events, s WHERE value IS NOT NULL
    ),
    width AS (
      SELECT 'width' AS form, bucket,
             mn + bucket * ((mx - mn) / 8) AS lo,
             mn + (bucket + 1) * ((mx - mn) / 8) AS hi,
             count(*) AS n
      FROM wb GROUP BY bucket, mn, mx
    ),
    dc AS (SELECT quantile_cont(value, [{_H_PCTS}]) AS cuts FROM events),
    db AS (
      SELECT least(CAST(len(list_filter(cuts[2:8], c -> value >= c))
                        AS INT), 7) AS bucket, cuts
      FROM events, dc WHERE value IS NOT NULL
    ),
    depth AS (
      SELECT 'depth' AS form, bucket,
             cuts[bucket + 1] AS lo, cuts[bucket + 2] AS hi,
             count(*) AS n
      FROM db GROUP BY bucket, cuts
    )
    SELECT form, bucket, lo, hi, n FROM width
    UNION ALL
    SELECT form, bucket, lo, hi, n FROM depth
    """,
)
def a19_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import equi_depth_histogram, equi_width_histogram

    ev = load_table(spark, sf_dir, "events").select("value")
    width = equi_width_histogram(ev, "value", k=8).select(
        F.lit("width").alias("form"),
        F.col("bucket").cast("long").alias("bucket"), "lo", "hi", "n",
    )
    depth = equi_depth_histogram(ev, "value", k=8).select(
        F.lit("depth").alias("form"),
        F.col("bucket").cast("long").alias("bucket"), "lo", "hi", "n",
    )
    return width.unionByName(depth)


# ---------------------------------------------------------------------------
# A20 — per-group feature scaling (winsorize / min-max / robust-z) on
# exact order statistics only — every derived column is a closed-form
# function of interpolated percentiles and min/max, so the hash pins
# all three scalers bit-for-bit (no sum-order float fudge anywhere).
@register(
    "a20_feature_scaling",
    oracle="""
    WITH s AS (
      SELECT user_id, quantile_cont(value, [0.05, 0.5, 0.95]) AS q,
             min(value) AS mn, max(value) AS mx
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT e.user_id, median(abs(e.value - s.q[2])) AS mad
      FROM events e JOIN s USING (user_id) GROUP BY e.user_id
    )
    SELECT e.user_id, e.event_id, e.value,
           round(least(greatest(e.value, s.q[1]), s.q[3]), 9) AS v_winsor,
           round(CASE WHEN s.mx - s.mn > 0
                      THEN (e.value - s.mn) / (s.mx - s.mn) END, 9)
             AS v_minmax,
           round(CASE WHEN 1.4826 * m.mad > 0
                      THEN (e.value - s.q[2]) / (1.4826 * m.mad) END, 9)
             AS v_robust_z
    FROM events e JOIN s USING (user_id) JOIN m USING (user_id)
    """,
)
def a20_feature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import robust_scale

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    out = robust_scale(ev, ["user_id"], "value")
    return out.select(
        "user_id", "event_id", "value",
        F.round("v_winsor", 9).alias("v_winsor"),
        F.round("v_minmax", 9).alias("v_minmax"),
        F.round("v_robust_z", 9).alias("v_robust_z"),
    )


# ---------------------------------------------------------------------------
# W8 — ranking/distribution window-function suite in one compound row:
# ntile, percent_rank, cume_dist, dense_rank, lead/lag with offsets,
# first_value — per-user ordered windows (partitioned, CI-gated like
# every window in the registry).  percent_rank/cume_dist are exact
# rank ratios (rational / double — engine-identical; rounded anyway
# for belt and braces).
@register(
    "w8_window_suite",
    oracle="""
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS t,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 9) AS pr,
           round(cume_dist() OVER w, 9) AS cd,
           CAST(dense_rank() OVER w AS BIGINT) AS drank,
           lead(value, 2) OVER w AS lead2,
           lag(value, 2) OVER w AS lag2,
           first_value(value) OVER w AS first_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w8_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spread(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pr"),
        F.round(F.cume_dist().over(w), 9).alias("cd"),
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.lead("value", 2).over(w).alias("lead2"),
        F.lag("value", 2).over(w).alias("lag2"),
        F.first("value").over(w).alias("first_v"),
    )


# ---------------------------------------------------------------------------
# W9 — ordered funnel (signup → view → click → purchase).  The engine
# side is ONE shuffle (per-user sorted event array + a Catalyst
# aggregate walk); the oracle is the classical min-based CTE chain —
# provably the same answer (each step is the earliest event of its
# type strictly after the previous step; the walk enforces strict
# inequality so timestamp ties cannot diverge the two forms).
_FUNNEL_FMT = "%Y-%m-%d %H:%M:%S.%f"
@register(
    "w9_funnel",
    oracle=f"""
    WITH u AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type IN ('signup', 'view', 'click', 'purchase')
    ),
    f1 AS (SELECT user_id, min(ts) AS t FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
    f2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
           JOIN f1 ON e.user_id = f1.user_id AND e.ts > f1.t
           WHERE e.event_type = 'view' GROUP BY e.user_id),
    f3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
           JOIN f2 ON e.user_id = f2.user_id AND e.ts > f2.t
           WHERE e.event_type = 'click' GROUP BY e.user_id),
    f4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
           JOIN f3 ON e.user_id = f3.user_id AND e.ts > f3.t
           WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT u.user_id,
           strftime(f1.t, '{_FUNNEL_FMT}') AS step_1,
           strftime(f2.t, '{_FUNNEL_FMT}') AS step_2,
           strftime(f3.t, '{_FUNNEL_FMT}') AS step_3,
           strftime(f4.t, '{_FUNNEL_FMT}') AS step_4,
           CAST((f1.t IS NOT NULL)::INT + (f2.t IS NOT NULL)::INT
              + (f3.t IS NOT NULL)::INT + (f4.t IS NOT NULL)::INT
              AS BIGINT) AS n_steps
    FROM u LEFT JOIN f1 USING (user_id) LEFT JOIN f2 USING (user_id)
           LEFT JOIN f3 USING (user_id) LEFT JOIN f4 USING (user_id)
    """,
)
def w9_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import funnel_steps

    ev = load_table(spark, sf_dir, "events")
    out = funnel_steps(ev, ["signup", "view", "click", "purchase"])
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "user_id",
        *[
            F.date_format(f"step_{i}", fmt).alias(f"step_{i}")
            for i in (1, 2, 3, 4)
        ],
        "n_steps",
    )


# ---------------------------------------------------------------------------
# A21 — weekly cohort retention matrix: cohort = the week of a user's
# first event; n_users active per (cohort, whole-week offset).
# Offsets are calendar-day arithmetic (date_diff days / 7) on BOTH
# sides — DST-safe (a 167/169-hour week never truncates off-by-one)
# and engine-portable.
@register(
    "a21_cohort_retention",
    oracle="""
    WITH fi AS (
      SELECT user_id, date_trunc('week', min(ts)) AS c
      FROM events GROUP BY user_id
    ),
    ac AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS p FROM events
    )
    SELECT strftime(fi.c, '%Y-%m-%d %H:%M:%S') AS cohort_week,
           CAST(floor(date_diff('day', CAST(fi.c AS DATE),
                                CAST(ac.p AS DATE)) / 7.0) AS BIGINT)
             AS period_offset,
           count(*) AS n_users
    FROM ac JOIN fi USING (user_id)
    GROUP BY 1, 2
    """,
)
def a21_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import cohort_retention

    ev = load_table(spark, sf_dir, "events")
    out = cohort_retention(ev, period="week")
    return out.select(
        F.date_format("cohort_period", "yyyy-MM-dd HH:mm:ss").alias(
            "cohort_week"
        ),
        "period_offset",
        "n_users",
    )


# ---------------------------------------------------------------------------
# W10 — last-touch attribution: each purchase credits the user's most
# recent click at-or-before it, but only within a 1-hour window — the
# as-of join (union-tag-window, one shuffle) composed with its
# tolerance nulling, mirrored by DuckDB's native ASOF LEFT JOIN plus
# the same inclusive window test.
_ATTR_FMT = "%Y-%m-%d %H:%M:%S.%f"
@register(
    "w10_attribution",
    oracle=f"""
    WITH c0 AS (
      SELECT user_id, ts, event_id,
             row_number() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'click'
    ),
    c AS (SELECT user_id, ts AS cts, event_id AS click_id
          FROM c0 WHERE rn = 1),
    p AS (SELECT user_id, event_id, ts, value FROM events
          WHERE event_type = 'purchase')
    SELECT p.user_id, p.event_id,
           strftime(p.ts, '{_ATTR_FMT}') AS t, p.value,
           CASE WHEN c.cts IS NOT NULL
                 AND p.ts - c.cts <= INTERVAL 1 HOUR
                THEN c.click_id END AS click_id,
           CASE WHEN c.cts IS NOT NULL
                 AND p.ts - c.cts <= INTERVAL 1 HOUR
                THEN strftime(c.cts, '{_ATTR_FMT}') END AS click_t
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.cts
    """,
)
def w10_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import latest_per_series
    from ..operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = latest_per_series(
        ev.filter(F.col("event_type") == "click"),
        series_cols=["user_id", "ts"], version_cols=["event_id"],
    ).select("user_id", "ts", F.col("event_id").alias("click_id"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    out = asof_join(
        purchases, clicks, on=["user_id"], left_time="ts",
        right_time="ts", value_cols=["click_id"],
        tolerance="INTERVAL 1 HOUR",
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "user_id", "event_id",
        F.date_format("ts", fmt).alias("t"), "value",
        F.col("asof_click_id").alias("click_id"),
        F.date_format("asof_time", fmt).alias("click_t"),
    )


# ---------------------------------------------------------------------------
# A22 — HyperLogLog registers over the document word-bigram stream.
# The oracle rebuilds every register bit-for-bit (md5 hash, bucket
# mod, integer first-set-bit rank) — no floats anywhere, so the row
# pins the full mergeable distinct-count STATE; the estimate +
# merge-by-max law are pytest-gated (tests/test_sketch_snapshot.py).
@register(
    "a22_hll_registers",
    oracle="""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    tok AS (
      SELECT unnest(list_transform(range(1, len(t)),
                    i -> concat_ws(' ', t[i], t[i+1]))) AS token
      FROM toks WHERE len(t) >= 2
    ),
    hx AS (SELECT ('0x' || substr(md5(token), 1, 8))::BIGINT AS h
           FROM tok),
    rk AS (
      SELECT h % 64 AS bucket,
             coalesce(list_position(list_transform(range(0, 26),
                        i -> ((h >> 6) >> i) & 1), 1), 27) AS rank
      FROM hx
    )
    SELECT bucket, CAST(max(rank) AS INT) AS max_rank
    FROM rk GROUP BY bucket
    """,
)
def a22_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import hll_build

    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = (
        docs.select(F.split(F.col("text"), " ").alias("__t"))
        .filter(F.size("__t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(__t) - 2),"
                    " i -> __t[i] || ' ' || __t[i + 1])"
                )
            ).alias("token")
        )
    )
    return hll_build(tok, "token")


# ---------------------------------------------------------------------------
# A23 — KMV (k-minimum-values) distinct sketch over events:
# per-event-type sketch ROWS (rank + hash — the mergeable state,
# compared bit-for-bit like the HLL register gate), the KMV
# distinct-count estimate, and the exact distinct count side by side.
# operators/sketch.py::kmv_sketch / kmv_estimate.
_KMV_K = 32


@register(
    "a23_kmv_distinct",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h
      FROM events
    ),
    kept AS (
      SELECT event_type, h, rank FROM (
        SELECT event_type, h, row_number() OVER (
                 PARTITION BY event_type ORDER BY h) AS rank
        FROM d) WHERE rank <= {_KMV_K}
    ),
    agg AS (
      SELECT event_type, count(*) AS n, max(h) AS hk
      FROM kept GROUP BY 1
    ),
    est AS (
      SELECT event_type,
             CASE WHEN n < {_KMV_K} THEN CAST(n AS DOUBLE)
                  ELSE {float(_KMV_K - 1)} /
                       (CAST(('0x' || substr(hk, 1, 12))::BIGINT AS DOUBLE)
                        / 281474976710656.0)
             END AS v
      FROM agg
    ),
    ex AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS DOUBLE) AS v
      FROM events GROUP BY 1
    )
    SELECT 'sketch' AS part, event_type,
           CAST(rank AS BIGINT) AS rank, h, CAST(NULL AS DOUBLE) AS value
    FROM kept
    UNION ALL
    SELECT 'estimate', event_type, NULL, NULL, v FROM est
    UNION ALL
    SELECT 'exact', event_type, NULL, NULL, v FROM ex
    """,
)
def a23_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import kmv_estimate, kmv_sketch

    ev = load_table(spark, sf_dir, "events")
    sk = kmv_sketch(ev, ["event_type"], "user_id", k=_KMV_K)
    est = kmv_estimate(sk, ["event_type"], k=_KMV_K)
    nul_l = F.lit(None).cast("long")
    nul_s = F.lit(None).cast("string")
    return (
        sk.select(
            F.lit("sketch").alias("part"), "event_type", "rank", "h",
            F.lit(None).cast("double").alias("value"),
        )
        .unionByName(
            est.select(
                F.lit("estimate").alias("part"), "event_type",
                nul_l.alias("rank"), nul_s.alias("h"),
                F.col("est_distinct").alias("value"),
            )
        )
        .unionByName(
            ev.groupBy("event_type")
            .agg(F.count_distinct("user_id").cast("double").alias("value"))
            .select(
                F.lit("exact").alias("part"), "event_type",
                nul_l.alias("rank"), nul_s.alias("h"), "value",
            )
        )
    )


# ---------------------------------------------------------------------------
# W11 — multi-touch attribution (operators/funnel.py): every click in
# the hour before a purchase shares the purchase value under linear
# and U-shaped (40/20/40) credit models; one user-key join + one
# window partitioning.  Literal credit fractions parse to the same
# doubles in both engines and the arithmetic is association-matched.
@register(
    "w11_multi_touch",
    oracle=f"""
    WITH t AS (
      SELECT user_id, ts AS tts, event_id AS touch_id
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id AS conversion_id, ts AS cts, value
      FROM events WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT p.user_id, p.conversion_id, p.cts, p.value,
             t.tts, t.touch_id
      FROM p JOIN t ON p.user_id = t.user_id
        AND t.tts <= p.cts AND t.tts >= p.cts - INTERVAL 1 HOUR
    ),
    r AS (
      SELECT *,
             count(*) OVER (PARTITION BY user_id, conversion_id) AS n,
             row_number() OVER (PARTITION BY user_id, conversion_id
                                ORDER BY tts, touch_id) AS touch_rank
      FROM j
    )
    SELECT user_id, conversion_id, touch_id,
           strftime(tts, '{_ATTR_FMT}') AS touch_t,
           CAST(n AS BIGINT) AS n_touches,
           CAST(touch_rank AS BIGINT) AS touch_rank,
           value,
           value / n AS credit_linear,
           CASE WHEN n = 1 THEN value
                WHEN n = 2 THEN value * 0.5
                ELSE CASE WHEN touch_rank = 1 THEN value * 0.4
                          WHEN touch_rank = n THEN value * 0.4
                          ELSE value * 0.2 / (n - 2) END
           END AS credit_u
    FROM r
    """,
)
def w11_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import multi_touch_attribution

    ev = load_table(spark, sf_dir, "events")
    out = multi_touch_attribution(ev)
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "user_id", "conversion_id", "touch_id",
        F.date_format("touch_t", fmt).alias("touch_t"),
        "n_touches", "touch_rank", "value",
        "credit_linear", "credit_u",
    )


# ---------------------------------------------------------------------------
# K12 — distribution-drift monitor (operators/profile.py::
# distribution_drift): purchase-value distribution vs the view-value
# reference on the reference's equi-depth cuts; per-bucket chi²/TVD
# terms plus nano-quantized (order-independent, engine-exact) scalar
# summaries.  Deliberately log-free — see the operator docstring.
@register(
    "k12_distribution_drift",
    oracle="""
    WITH ref AS (SELECT value AS v FROM events
                 WHERE event_type = 'view' AND value IS NOT NULL),
    cur AS (SELECT value AS v FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL),
    cuts AS (
      SELECT quantile_cont(v, [0.0, 0.1, 0.2, 0.3, 0.4, 0.5,
                               0.6, 0.7, 0.8, 0.9, 1.0]) AS c
      FROM ref
    ),
    rb AS (SELECT least(len(list_filter(c[2:10], x -> v >= x)), 9)
             AS bucket FROM ref CROSS JOIN cuts),
    cb AS (SELECT least(len(list_filter(c[2:10], x -> v >= x)), 9)
             AS bucket FROM cur CROSS JOIN cuts),
    rc AS (SELECT bucket, count(*) AS ref_n FROM rb GROUP BY 1),
    cc AS (SELECT bucket, count(*) AS cur_n FROM cb GROUP BY 1),
    b AS (
      SELECT bucket, coalesce(ref_n, 0) AS ref_n,
             coalesce(cur_n, 0) AS cur_n
      FROM rc FULL JOIN cc USING (bucket)
    ),
    t AS (SELECT CAST(sum(ref_n) AS DOUBLE) AS rt,
                 CAST(sum(cur_n) AS DOUBLE) AS ct FROM b),
    pb AS (
      SELECT part, bucket, ref_n, cur_n,
             CASE WHEN ref_n > 0 THEN d * d / e END AS chi_term,
             tvd AS tvd_term
      FROM (
        SELECT 'bucket' AS part, CAST(bucket AS BIGINT) AS bucket,
               ref_n, cur_n,
               CAST(ref_n AS DOUBLE) * ct / rt AS e,
               CAST(cur_n AS DOUBLE)
                 - CAST(ref_n AS DOUBLE) * ct / rt AS d,
               abs(CAST(cur_n AS DOUBLE) / ct
                   - CAST(ref_n AS DOUBLE) / rt) AS tvd
        FROM b CROSS JOIN t)
    )
    SELECT part, bucket, ref_n, cur_n, chi_term, tvd_term FROM pb
    UNION ALL
    SELECT 'summary', NULL,
           CAST(sum(ref_n) AS BIGINT), CAST(sum(cur_n) AS BIGINT),
           CAST(sum(CAST(floor(coalesce(chi_term, 0) * 1000000000.0
                               + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000000.0,
           CAST(sum(CAST(floor(tvd_term * 1000000000.0 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 2000000000.0
    FROM pb
    """,
)
def k12_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import distribution_drift

    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.col("event_type") == "view")
    cur = ev.filter(F.col("event_type") == "purchase")
    return distribution_drift(ref, cur, "value", k=10)


# ---------------------------------------------------------------------------
# J10 — SCD2 as-of dimension lookup (operators/scd.py::scd2_lookup):
# each purchase joined to the user's event_type version valid AT the
# purchase timestamp — the warehouse temporal-dim join, composed from
# the k10 history.  Key-shuffled equi-join with the interval predicate
# in the join; half-open intervals guarantee ≤ 1 match.
@register(
    "j10_scd2_lookup",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    ch AS (
      SELECT user_id, event_type, ts, event_id FROM c
      WHERE prev_type IS NULL OR event_type <> prev_type
    ),
    hist AS (
      SELECT user_id, event_type AS state, ts AS vf,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS vt
      FROM ch
    ),
    p AS (
      SELECT user_id, event_id, ts, value FROM events
      WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.event_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS t, p.value,
           h.state,
           strftime(h.vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(h.vt, '%Y-%m-%d %H:%M:%S') AS valid_to
    FROM p LEFT JOIN hist h
      ON p.user_id = h.user_id
     AND h.vf <= p.ts AND (h.vt IS NULL OR p.ts < h.vt)
    """,
)
def j10_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd import scd2_from_events, scd2_lookup

    ev = spread(load_table(spark, sf_dir, "events")).select(
        "user_id", "event_type", "ts", "event_id"
    )
    hist = scd2_from_events(
        ev, ["user_id"], ["event_type"], "ts", tiebreak_col="event_id"
    ).select(
        "user_id", F.col("event_type").alias("state"),
        "valid_from", "valid_to",
    )
    facts = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "event_id", "ts", "value")
    out = scd2_lookup(facts, hist, ["user_id"], "ts")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return out.select(
        "user_id", "event_id",
        F.date_format("ts", fmt).alias("t"), "value", "state",
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
    )


# ---------------------------------------------------------------------------
# W12 — interval concurrency (operators/timeseries.py::
# interval_concurrency): how many 30-minute event sessions are open
# at every boundary instant — the sweep-line occupancy profile, run
# as the bucketed three-phase prefix sum (the oracle is the naive
# single global window the operator deliberately avoids at scale).
@register(
    "w12_concurrency",
    oracle="""
    WITH iv AS (
      SELECT ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events
    ),
    d AS (
      SELECT s AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT e, -1 FROM iv
    ),
    g AS (SELECT t, sum(delta) AS d FROM d GROUP BY t)
    SELECT strftime(t, '%Y-%m-%d %H:%M:%S.%f') AS t,
           CAST(sum(d) OVER (ORDER BY t) AS BIGINT) AS n_active
    FROM g
    """,
)
def w12_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import interval_concurrency

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    out = interval_concurrency(ev, "s", "e")
    return out.select(
        F.date_format("t", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("t"),
        "n_active",
    )


# ---------------------------------------------------------------------------
# A24 — mergeable quantile sketch (operators/sketch.py::
# quantile_sketch*): the quantile member of the sketch family.  The
# compound row pins the STATE (bin counts — exact integers, the
# mergeable part), the p50/p95 estimates interpolated from the state
# alone, and the exact interpolated percentiles beside them.
_QS_LO, _QS_HI, _QS_BINS = 0.0, 1000.0, 100


@register(
    "a24_quantile_sketch",
    oracle=f"""
    WITH v AS (
      SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
      WHERE value IS NOT NULL
    ),
    st AS (
      SELECT event_type,
             least(greatest(CAST(floor(v / 10.0) AS INT), 0),
                   {_QS_BINS - 1}) AS bin,
             count(*) AS n
      FROM v GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, bin, n,
             sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(n) OVER (PARTITION BY event_type) AS tot
      FROM st
    ),
    est AS (
      SELECT part, event_type,
             0.0 + (CAST(bin AS DOUBLE)
                    + CAST(rank - (cum - n) AS DOUBLE)
                      / CAST(n AS DOUBLE)) * 10.0 AS value
      FROM (
        SELECT 'est_p50' AS part, event_type, bin, n, cum,
               greatest((tot * 1 + 1) // 2, 1) AS rank
        FROM r
        UNION ALL
        SELECT 'est_p95', event_type, bin, n, cum,
               greatest((tot * 19 + 19) // 20, 1)
        FROM r)
      WHERE cum >= rank AND (cum - n) < rank
    ),
    ex AS (
      SELECT 'exact_p50' AS part, event_type,
             quantile_cont(v, 0.5) AS value
      FROM v GROUP BY 2
      UNION ALL
      SELECT 'exact_p95', event_type, quantile_cont(v, 0.95)
      FROM v GROUP BY 2
    )
    SELECT 'state' AS part, event_type, CAST(bin AS INT) AS bin,
           CAST(n AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS value
    FROM st
    UNION ALL
    SELECT part, event_type, NULL, NULL, value FROM est
    UNION ALL
    SELECT part, event_type, NULL, NULL, value FROM ex
    """,
)
def a24_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import quantile_sketch, quantile_sketch_estimate

    ev = load_table(spark, sf_dir, "events")
    sk = quantile_sketch(
        ev, ["event_type"], "value", _QS_LO, _QS_HI, _QS_BINS
    ).localCheckpoint(eager=False)  # state feeds 3 consumers once
    nul_i = F.lit(None).cast("int")
    nul_l = F.lit(None).cast("long")
    parts = sk.select(
        F.lit("state").alias("part"), "event_type", "bin", "n",
        F.lit(None).cast("double").alias("value"),
    )
    for label, q in (("est_p50", 0.5), ("est_p95", 0.95)):
        est = quantile_sketch_estimate(
            sk, ["event_type"], q, _QS_LO, _QS_HI, _QS_BINS
        )
        parts = parts.unionByName(
            est.select(
                F.lit(label).alias("part"), "event_type",
                nul_i.alias("bin"), nul_l.alias("n"),
                F.col("q_est").alias("value"),
            )
        )
    v = F.col("value").cast("double")
    for label, q in (("exact_p50", 0.5), ("exact_p95", 0.95)):
        ex = (
            ev.filter(v.isNotNull())
            .groupBy("event_type")
            .agg(F.percentile(v, F.lit(q)).alias("value"))
        )
        parts = parts.unionByName(
            ex.select(
                F.lit(label).alias("part"), "event_type",
                nul_i.alias("bin"), nul_l.alias("n"), "value",
            )
        )
    return parts


# ---------------------------------------------------------------------------
# A25 — KMV set-overlap estimation (operators/sketch.py::kmv_jaccard):
# the Jaccard similarity of two user sets — high spenders (any
# purchase with value > 200) vs error-affected users — estimated from
# the two KMV sketches alone, with the exact Jaccard beside it.  The
# oracle re-derives both sketches, the union's k smallest, the
# membership count, and the exact set arithmetic.
_KMV_J_K = 64


@register(
    "a25_kmv_overlap",
    oracle=f"""
    WITH a AS (
      SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h FROM events
      WHERE event_type = 'purchase' AND value > 200
    ),
    b AS (
      SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h FROM events
      WHERE event_type = 'error'
    ),
    ka AS (SELECT h FROM a ORDER BY h LIMIT {_KMV_J_K}),
    kb AS (SELECT h FROM b ORDER BY h LIMIT {_KMV_J_K}),
    uk AS (
      SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
      ORDER BY h LIMIT {_KMV_J_K}
    ),
    est AS (
      SELECT CAST(count(*) FILTER (
               WHERE h IN (SELECT h FROM ka)
                 AND h IN (SELECT h FROM kb)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS v
      FROM uk
    ),
    exact AS (
      SELECT CAST((SELECT count(*) FROM
                    (SELECT h FROM a INTERSECT SELECT h FROM b))
                  AS DOUBLE)
             / CAST((SELECT count(*) FROM
                      (SELECT h FROM a UNION SELECT h FROM b))
                    AS DOUBLE) AS v
    )
    SELECT 'est_jaccard' AS part, v AS value FROM est
    UNION ALL
    SELECT 'exact_jaccard', v FROM exact
    """,
)
def a25_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import kmv_jaccard, kmv_sketch

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 200)
    ).withColumn("__g", F.lit("g"))
    b = ev.filter(F.col("event_type") == "error").withColumn(
        "__g", F.lit("g")
    )
    sa = kmv_sketch(a, ["__g"], "user_id", k=_KMV_J_K)
    sb = kmv_sketch(b, ["__g"], "user_id", k=_KMV_J_K)
    est = kmv_jaccard(sa, sb, ["__g"], k=_KMV_J_K).select(
        F.lit("est_jaccard").alias("part"),
        F.col("est_jaccard").alias("value"),
    )
    ua = a.select(F.md5(F.col("user_id").cast("string")).alias("h")).distinct()
    ub = b.select(F.md5(F.col("user_id").cast("string")).alias("h")).distinct()
    exact = (
        ua.intersect(ub).agg(F.count("*").alias("__i"))
        .crossJoin(
            F.broadcast(
                ua.union(ub).distinct().agg(F.count("*").alias("__u"))
            )
        )
        .select(
            F.lit("exact_jaccard").alias("part"),
            (
                F.col("__i").cast("double") / F.col("__u").cast("double")
            ).alias("value"),
        )
    )
    return est.unionByName(exact)


# W13 — seasonal anomaly detection (round 9, beyond ref): per
# (event_type, hour-of-day) seasonal profile → per-event z-score →
# |z| > 2 flag.  The profile is a tiny (|types|×24-row) aggregate the
# fact side joins (AQE broadcasts it on stats, unhinted), so the
# fact table never shuffles — the 100 TB shape for seasonal scoring.
# Float parity: mean/variance from EXACT decimal sums (Σx, Σx²) cast
# to double, with the identical expression shape in both engines
# (two-pass textbook form, NOT stddev_samp whose accumulation order
# differs across engines); variance clamped at 0 before sqrt so float
# error cannot produce NaN.
@register(
    "w13_seasonal_anomaly",
    oracle="""
    WITH prof AS (
      SELECT event_type, extract(hour FROM ts) AS hr,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
             CAST(sum(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
      FROM events GROUP BY event_type, hr
    ),
    scored AS (
      SELECT e.event_id, e.event_type, p.hr,
             CASE WHEN p.n > 1
                       AND greatest((p.s2 - p.s * p.s / p.n)
                                    / (p.n - 1), 0.0) > 0.0
                  THEN round((CAST(e.value AS DOUBLE) - p.s / p.n)
                             / sqrt(greatest((p.s2 - p.s * p.s / p.n)
                                             / (p.n - 1), 0.0)), 6)
             END AS z
      FROM events e
      JOIN prof p ON p.event_type = e.event_type
                 AND p.hr = extract(hour FROM e.ts)
    )
    SELECT event_id, event_type, CAST(hr AS BIGINT) AS hr, z,
           coalesce(abs(z) > 2.0, FALSE) AS anomaly
    FROM scored
    """,
)
def w13_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dv = F.col("value").cast(DEC)
    prof = (
        ev.groupBy("event_type", F.hour("ts").alias("hr"))
        .agg(
            F.count("*").alias("n"),
            F.sum(dv).cast("double").alias("s"),
            F.sum(dv * dv).cast("double").alias("s2"),
        )
    )
    var = F.greatest(
        (F.col("s2") - F.col("s") * F.col("s") / F.col("n"))
        / (F.col("n") - 1),
        F.lit(0.0),
    )
    z = F.when(
        (F.col("n") > 1) & (var > 0.0),
        F.round(
            (F.col("value").cast("double") - F.col("s") / F.col("n"))
            / F.sqrt(var),
            6,
        ),
    )
    return (
        ev.withColumn("hr", F.hour("ts"))
        .join(prof, ["event_type", "hr"])
        .select(
            "event_id",
            "event_type",
            F.col("hr").cast("long").alias("hr"),
            z.alias("z"),
            F.coalesce(F.abs(z) > 2.0, F.lit(False)).alias("anomaly"),
        )
    )


# W14 — CUSUM change-point detection (round 9, beyond ref): per-user
# cumulative sum of deviations from the corpus mean; the change point
# is the timestamp maximizing |CUSUM| (Page's classic statistic, the
# offline max-|S_k| form).  Float discipline: cusum_k = S_k − k·μ
# with μ = S_total/N multiplies through to N·cusum_k = N·S_k −
# k·S_total — an EXACT BIGINT in centi-units (values are
# DECIMAL(18,2)), so the |CUSUM| argmax compares exact integers and
# the reported value is one identical IEEE division away; no
# round(double) anywhere (the first draft's round(…, 6) diverged
# between engines on two sf0.1 representation boundaries).  The
# single-row total crosses onto the fact scan
# (BroadcastNestedLoopJoin — reviewed in the test_plans_quality
# allowlist); the per-user windows partition by user, so nothing
# global touches the fact table.
@register(
    "w14_cusum_changepoint",
    oracle="""
    WITH tot AS (
      SELECT CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS sc, count(*) AS n
      FROM events
    ),
    walk AS (
      SELECT user_id, event_id, ts, n,
             n * CAST(sum(CAST(value AS DECIMAL(18,2)))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) * 100 AS BIGINT)
             - (row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id)) * sc
               AS num
      FROM events, tot
    )
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS change_time,
           CAST(num AS DOUBLE) / (100.0 * n) AS max_cusum
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY user_id
               ORDER BY abs(num) DESC, ts, event_id) AS rn
      FROM walk)
    WHERE rn = 1
    """,
)
def w14_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tot = ev.agg(
        (F.sum(F.col("value").cast(DEC)) * 100).cast("long").alias("sc"),
        F.count("*").alias("n"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rank = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run_c = (
        F.sum(F.col("value").cast(DEC)).over(w_run) * 100
    ).cast("long")
    walk = ev.crossJoin(F.broadcast(tot)).withColumn(
        "num",
        F.col("n") * run_c - F.row_number().over(w_rank) * F.col("sc"),
    )
    w_pick = Window.partitionBy("user_id").orderBy(
        F.abs(F.col("num")).desc(), "ts", "event_id"
    )
    return (
        walk.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("change_time"),
            (F.col("num").cast("double") / (F.lit(100.0) * F.col("n")))
            .alias("max_cusum"),
        )
    )


# Q17-shape: correlated scalar subquery (per-part average driving a
# row filter) in its DECORRELATED form — the per-partkey aggregate
# joins back to the fact rows (AQE broadcasts the tiny brand-filtered
# agg on stats, unhinted).  Float discipline: the 0.2·avg threshold
# comparison multiplies through to exact BIGINT centi-units
# (5·q_c·n < s_c ⟺ q < 0.2·(s/n)) so row selection never compares
# doubles; only the final revenue sum divides once, identically, in
# both engines.
@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pl AS (
      SELECT l.l_partkey,
             CAST(CAST(l.l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS q_c,
             CAST(l.l_extendedprice AS DECIMAL(18,2)) AS price
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#23'
    ),
    stats AS (
      SELECT l_partkey, count(*) AS n,
             CAST(sum(q_c) AS BIGINT) AS s_c
      FROM pl GROUP BY l_partkey
    )
    SELECT CAST(sum(pl.price) AS DOUBLE) / 7.0 AS avg_yearly,
           count(*) AS n_rows
    FROM pl JOIN stats USING (l_partkey)
    WHERE 5 * pl.q_c * stats.n < stats.s_c
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pl = (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(F.col("p_brand") == "Brand#23")
        .select(
            "l_partkey",
            (F.col("l_quantity").cast(DEC) * 100)
            .cast("long").alias("q_c"),
            F.col("l_extendedprice").cast(DEC).alias("price"),
        )
    )
    stats = pl.groupBy("l_partkey").agg(
        F.count("*").alias("n"),
        F.sum("q_c").cast("long").alias("s_c"),
    )
    return (
        pl.join(stats, "l_partkey")
        .filter(F.lit(5) * F.col("q_c") * F.col("n") < F.col("s_c"))
        .agg(
            (F.sum("price").cast("double") / F.lit(7.0))
            .alias("avg_yearly"),
            F.count("*").alias("n_rows"),
        )
    )


# P17 — file-level statistics: Spark counts rows per file through the
# `_metadata` hidden column; tests/test_file_stats.py verifies the
# same numbers against the parquet FOOTERS via DuckDB's
# parquet_file_metadata — two independent sources (data scan vs
# footer metadata) that must agree file-for-file.  Driver-side the
# row is rows-only like P10 (the oracle needs a filesystem path,
# which the driver's view-only contract cannot carry); the
# path-parameterized oracle runs in the local suite.  The at-scale
# use is lake health: per-file row counts drive the compaction
# planner (sinks/maintenance.py) without a data scan.
@register("p17_file_stats")
def p17_file_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for tbl in ("lineitem", "orders", "events"):
        part = (
            spark.read.parquet(f"{sf_dir}/{tbl}.parquet")
            .groupBy(F.col("_metadata.file_name").alias("file_name"))
            .agg(F.count("*").alias("num_rows"))
            .select("file_name", F.lit(tbl).alias("tbl"), "num_rows")
        )
        out = part if out is None else out.unionByName(part)
    return out


# Q4 shape — correlated-inequality EXISTS decorrelated to a semi-join
# (TPC-H Q4's "orders with any late lineitem", adapted to this
# dataset's columns: a lineitem shipped more than 60 days after its
# order date).  The optimizer lesson: the EXISTS subquery carries BOTH
# an equi-key (orderkey) and a correlated inequality (shipdate vs
# orderdate); Spark plans the left-semi join with the inequality as a
# join residual — one shuffle pair, no per-row subquery execution.
@register(
    "q4_order_priority_check",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1995-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"]
           > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


# W15 — time-based sliding window via a RANGE frame: per user, the
# trailing-hour count/sum/avg and the leading-hour count at every
# event, WITHOUT resampling to a dense grid (the window key is the
# event's own epoch second; Spark requires a numeric orderBy for
# rangeBetween, so ts is projected to a long first).  The RANGE frame
# is the one frame class no other registered row exercises (w5 = ROWS,
# s10 = tumbling resample, w12 = sweep line).
#
# Float discipline: a 1-hour RANGE frame holds many rows and DuckDB
# aggregates frames via segment trees — a DIFFERENT addition order
# than Spark's running accumulation, so round(sum(double), 9) diverged
# at sf0.1 representation boundaries (the first draft; caught by the
# both-SF verify drive).  The sum therefore runs in exact centi-units:
# floor(value*100) is bit-deterministic (one IEEE multiply + floor on
# identical doubles), BIGINT sums are order-free, and the avg is ONE
# division of two exact integers — bit-identical without any rounding.
@register(
    "w15_range_frame",
    oracle="""
    /* whole-second order key: Spark's unix_timestamp truncates
       sub-second precision, DuckDB's epoch() keeps it — without the
       floor, two events .06 s apart stop being RANGE peers */
    WITH e AS (SELECT event_id, user_id, ts,
                      CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                      CAST(floor(value * 100) AS BIGINT) AS cents
               FROM events)
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS t,
           count(*) OVER wb AS n_trail_1h,
           CAST(sum(cents) OVER wb AS BIGINT) AS sum_trail_cents,
           CAST(sum(cents) OVER wb AS DOUBLE) / (count(*) OVER wb)
             AS avg_trail_cents,
           count(*) OVER wf AS n_lead_1h
    FROM e
    WINDOW
      wb AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW),
      wf AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN CURRENT ROW AND 3600 FOLLOWING)
    """,
)
def w15_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        spread(load_table(spark, sf_dir, "events"))
        .withColumn("__sec", F.unix_timestamp("ts"))
        .withColumn("cents", F.floor(F.col("value") * 100))
    )
    wb = (
        Window.partitionBy("user_id").orderBy("__sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id").orderBy("__sec")
        .rangeBetween(Window.currentRow, 3600)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t"),
        F.count("*").over(wb).alias("n_trail_1h"),
        F.sum("cents").over(wb).alias("sum_trail_cents"),
        (
            F.sum("cents").over(wb).cast("double")
            / F.count("*").over(wb)
        ).alias("avg_trail_cents"),
        F.count("*").over(wf).alias("n_lead_1h"),
    )


# A26 — approximate aggregates over a DETERMINISTIC hash sample
# (operators/sampling.py): Horvitz-Thompson per-group sum/count
# estimates from the 10% md5-keyed sample of lineitem.  Unlike
# df.sample() the membership is a pure hash predicate, so the oracle
# re-derives the exact same sample rows and the estimates hash-match
# bit-for-bit (DECIMAL sum, one final double division by p).
@register(
    "a26_approx_sample_aggs",
    oracle="""
    WITH s AS (
      SELECT l_returnflag, l_extendedprice
      FROM lineitem
      WHERE ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-'
                            || CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT
            < 429496729
    )
    SELECT l_returnflag,
           count(*) AS n_sampled,
           count(*) / 0.1 AS est_count,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) / 0.1
             AS est_sum
    FROM s GROUP BY l_returnflag
    """,
)
def a26_approx_sample_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import approx_sum_count

    li = load_table(spark, sf_dir, "lineitem")
    return approx_sum_count(
        li,
        key=F.concat_ws("-", "l_orderkey", "l_linenumber"),
        value_col="l_extendedprice",
        fraction=0.1,
        group_cols=["l_returnflag"],
    )


# Q21/Q22 shape — correlated NOT EXISTS decorrelated to a LEFT ANTI
# join (the complement of q4's EXISTS → semi): orders in the window
# with NO lineitem shipped within 30 days of the order date — every
# shipment late, or none recorded.  Same optimizer lesson, opposite
# polarity: equi-key + correlated inequality as the anti-join
# residual, no per-row subquery; the exact-decimal sum keeps the
# money column cross-engine-stable.
@register(
    "q21_fully_late_orders",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
             AS sum_totalprice
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1995-07-01'
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q21_fully_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    slow = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"]
           <= o["o_orderdate"] + F.expr("INTERVAL 30 DAYS")),
        "left_anti",
    )
    return slow.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,2)"))
        .cast("double").alias("sum_totalprice"),
    )


# W16 — sliding DISTINCT counts: per user, how many distinct event
# types appeared in the trailing hour / trailing day at every event —
# the windowed-uniques primitive behind "breadth of activity" features
# (fraud scoring, engagement) that a tumbling resample can't express.
# Spark has no count(DISTINCT) over a window; size(collect_set(...))
# over the RANGE frame is the idiomatic equivalent — integer-exact, so
# the DuckDB mirror (native windowed count(DISTINCT)) hash-matches.
# Same whole-second order key as w15 (the epoch()/unix_timestamp
# sub-second trap).  Scale note: collect_set state is bounded by the
# event-type cardinality (small by construction), NOT the frame row
# count.
@register(
    "w16_sliding_distinct",
    oracle="""
    WITH e AS (SELECT event_id, user_id, ts, event_type,
                      CAST(floor(epoch(ts)) AS BIGINT) AS sec
               FROM events)
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS t,
           CAST(count(DISTINCT event_type) OVER wh AS BIGINT)
             AS n_types_1h,
           CAST(count(DISTINCT event_type) OVER wd AS BIGINT)
             AS n_types_24h
    FROM e
    WINDOW
      wh AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW),
      wd AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
    """,
)
def w16_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spread(load_table(spark, sf_dir, "events")).withColumn(
        "__sec", F.unix_timestamp("ts")
    )
    wh = (
        Window.partitionBy("user_id").orderBy("__sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    wd = (
        Window.partitionBy("user_id").orderBy("__sec")
        .rangeBetween(-86400, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t"),
        F.size(F.collect_set("event_type").over(wh))
        .cast("long").alias("n_types_1h"),
        F.size(F.collect_set("event_type").over(wd))
        .cast("long").alias("n_types_24h"),
    )


# SQL1 — the spark.sql() front door: every other registered row builds
# its plan through the DataFrame API; this one hands Catalyst an ANSI
# SQL string (CTE + aggregate + join + partitioned window) over temp
# views — pinning that a user of the reference can bring plain SQL and
# get the same engine-exact answers.  The oracle is near-verbatim the
# same text (view names aside): one query, two engines, one hash.
_SQL1 = """
    WITH stats AS (
      SELECT o_custkey,
             count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
               AS spend
      FROM {orders} GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_name, c.c_nationkey, s.n_orders, s.spend,
           CAST(row_number() OVER (
             PARTITION BY c.c_nationkey
             ORDER BY s.spend DESC, c.c_custkey) AS BIGINT)
             AS nation_spend_rank
    FROM {customer} c JOIN stats s ON s.o_custkey = c.c_custkey
    WHERE s.n_orders >= 5
"""


@register(
    "sql1_cte_window_join",
    oracle=_SQL1.format(orders="orders", customer="customer"),
)
def sql1_cte_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "v_sql1_orders"
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "v_sql1_customer"
    )
    return spark.sql(
        _SQL1.format(orders="v_sql1_orders", customer="v_sql1_customer")
    )


# W17 — sliding distinct at HIGH cardinality: w16's exact
# collect_set-over-RANGE-frame materializes every row's full window
# set, which dies when a window holds millions of distinct values.
# This is the sketch twin (operators/sketch.sliding_distinct_kmv):
# per-bucket KMV partials (≤ k rows/bucket) → map-side explode to the
# trailing-window targets → bounded re-rank merge → estimate.  The
# estimator is a pure hash expression, so the oracle re-derives the
# EXACT same sketch and the estimates hash-match bit-for-bit — the
# same portability trick as a26's deterministic sample.  Semantics:
# estimated distinct visitors (user_id) over the trailing 24 h as of
# each populated hourly bucket.
@register(
    "w17_sliding_distinct_kmv",
    oracle="""
    WITH pts AS (
      SELECT DISTINCT
             (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS b,
             md5(CAST(user_id AS VARCHAR)) AS h
      FROM events
    ),
    targets AS (SELECT DISTINCT b FROM pts),
    contrib AS (
      SELECT DISTINCT t.b AS tb, p.h
      FROM targets t
      JOIN pts p ON p.b BETWEEN t.b - 82800 AND t.b
    ),
    kept AS (
      SELECT tb, h,
             row_number() OVER (PARTITION BY tb ORDER BY h) AS r
      FROM contrib
      QUALIFY r <= 64
    )
    SELECT strftime(make_timestamp(tb * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS bucket_t,
           CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                ELSE 63.0 / ((('0x' || substr(max(h), 1, 12))::BIGINT)
                             / 281474976710656.0)
           END AS est_distinct
    FROM kept GROUP BY tb
    """,
)
def w17_sliding_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import sliding_distinct_kmv

    ev = spread(load_table(spark, sf_dir, "events"))
    return sliding_distinct_kmv(
        ev, "ts", "user_id", window_seconds=86400,
        bucket_seconds=3600, k=64,
    )


# ---------------------------------------------------------------------------
# Observation QC flags (operators/qc.py): the WMO persistence + step
# tests over per-user event series.  Float discipline: values quantize
# to exact BIGINT centi-units first; the persistence level is
# floor(centi/2000) (a 20.00-unit level — the sf stream repeats levels
# often enough for real runs: ~12% of rows flag at min_run=3) and the
# step threshold is integer centi (150.00), so NO comparison anywhere
# touches a float.  One Exchange: every window shares the
# (user_id) × (ts, event_id) series ordering.
@register(
    "w18_obs_qc",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS t,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
      FROM events
    ),
    m AS (
      SELECT *, floor(vc / 2000.0)::BIGINT AS vq
      FROM e
    ),
    c AS (
      SELECT *,
             CASE WHEN lag(vq) OVER w IS NOT DISTINCT FROM vq
                  THEN 0 ELSE 1 END AS chg,
             abs(vc - lag(vc) OVER w) AS jump
      FROM m
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    r AS (
      SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
                               ROWS UNBOUNDED PRECEDING) AS rid
      FROM c
    ),
    l AS (
      SELECT *, count(*) OVER (PARTITION BY user_id, rid) AS run_len
      FROM r
    )
    SELECT user_id, event_id, t,
           run_len >= 3 AS flatline_flag,
           coalesce(jump > 15000, FALSE) AS spike_flag
    FROM l
    """,
)
def w18_obs_qc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.qc import qc_flags

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("__vc"),
    )
    out = qc_flags(
        ev,
        series_cols=["user_id"],
        order_cols=["t", "event_id"],
        value_col="__vc",
        min_run=3,
        max_jump=F.lit(15000),
        level_col=F.floor(F.col("__vc") / F.lit(2000.0)).cast("long"),
    )
    return out.select(
        "user_id", "event_id", "t", "flatline_flag", "spike_flag"
    )
