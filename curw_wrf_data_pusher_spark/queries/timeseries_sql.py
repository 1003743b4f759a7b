"""Seasonal/streaming-shaped time-series scoring and late TPC-H
forms (split from the former queries/generic.py monolith): seasonal
anomaly (W13), CUSUM changepoints (W14), Q17/Q4/Q21 demos, file
stats (P17), range frames (W15), approx-sample aggs (A26), sliding
distinct exact + KMV (W16/W17), CTE window join (SQL1), and the obs
QC gate (W18).  Registration order is load-bearing
(queries/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.lake import load_table, spread
from .registry import register
from .relational import DEC


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
