"""WRF-pipeline-shaped queries — the reference's end-to-end dataflows
(SURVEY §3 E1/E2/E3) exercised generically on the driver's `events`
table, with DuckDB oracles.

Mapping of the WRF domain onto `events`:
- grid cell / station  → user_id
- XTIME instant        → ts
- cumulative RAINNC    → running sum of value per user (synthesised
  cumulative series; the lag-diff then recovers per-interval values,
  the A1 ∘ cumsum = identity property)
- ensemble member      → event_type
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.keys import series_hash_id
from ..functions.numeric import round_value
from ..functions.timeutils import format_minute, utc_to_lk
from ..operators.diff import adjacent_diff
from ..sources.lake import load_table
from .registry import register

DEC = "decimal(18,2)"


# E1 — the flagship: cumulative grid → lag-diff → long upsert rows
# [tms_id, time_lk, value] (wrf_data_pusher.py:143-279 re-expressed).
# The running sum is computed in DECIMAL so both engines accumulate
# exactly; the diff then recovers each interval's rainfall.
@register(
    "wrf_e1_push_rows",
    oracle="""
    WITH cum AS (
      SELECT user_id, event_id, ts,
             CAST(sum(CAST(value AS DECIMAL(18,2)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS cum_value
      FROM events
    ),
    diffed AS (
      SELECT user_id, event_id, ts,
             round(cum_value - lag(cum_value)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id), 3) AS value
      FROM cum
      QUALIFY lag(cum_value) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NOT NULL
    )
    SELECT sha256(concat_ws(':', 'evening_18:00',
                            CAST(user_id AS VARCHAR), 'WRF_A', 'v4',
                            'Precipitation', 'mm', 'Accumulative')) AS tms_id,
           strftime(date_trunc('minute', ts + INTERVAL '5 hours 30 minutes'),
                    '%Y-%m-%d %H:%M:00') AS time_lk,
           value
    FROM diffed
    """,
)
def wrf_e1_push_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = ev.select(
        "user_id", "event_id", "ts",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("cum_value"),
    )
    diffed = adjacent_diff(
        cum.withColumn("__ord", F.struct("ts", "event_id")),
        series_cols=["user_id"],
        order_col="__ord",
        value_col="cum_value",
        out_col="diff",
    ).withColumn("value", round_value(F.col("diff")))
    return diffed.select(
        series_hash_id(
            F.lit("evening_18:00"), F.col("user_id").cast("string"),
            F.lit("WRF_A"), F.lit("v4"), F.lit("Precipitation"),
            F.lit("mm"), F.lit("Accumulative"),
        ).alias("tms_id"),
        format_minute(utc_to_lk(F.col("ts"))).alias("time_lk"),
        "value",
    )


# E3 — hybrid obs+forecast comparison frame: long (station, source,
# time, value) → per-source mean → pivot → dropna
# (gen_active_stations_rfields.py:161-251 + mean variant
# gen_active_stations_mean_rfields.py:196-216, loop-free).
@register(
    "wrf_e3_hybrid_frame",
    oracle="""
    WITH long AS (
      SELECT user_id % 5 AS station_id,
             date_trunc('hour', ts) AS t,
             event_type AS source,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS mean_v
      FROM events
      WHERE event_type IN ('click', 'view', 'purchase')
      GROUP BY station_id, t, source
    ),
    wide AS (
      SELECT station_id, strftime(t, '%Y-%m-%d %H:%M:%S') AS time_h,
             max(CASE WHEN source = 'click' THEN mean_v END) AS wrf_a,
             max(CASE WHEN source = 'view' THEN mean_v END) AS wrf_c,
             max(CASE WHEN source = 'purchase' THEN mean_v END) AS obs
      FROM long GROUP BY station_id, time_h
    )
    SELECT * FROM wide
    WHERE wrf_a IS NOT NULL AND wrf_c IS NOT NULL AND obs IS NOT NULL
    """,
)
def wrf_e3_hybrid_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SINGLE-shuffle form: the per-source mean + pivot collapse into one
    # groupBy with conditional partial aggregates (sum, count per
    # source), so the plan is scan → partial agg → exchange → final agg
    # — no second exchange for the pivot. (The generic two-step
    # pivot_by_source path is exercised by j1_pivot_sources.)
    ev = load_table(spark, sf_dir, "events")

    def mean_of(source: str):
        m = F.col("event_type") == source
        s = F.sum(F.when(m, F.col("value").cast(DEC))).cast("double")
        n = F.count(F.when(m, F.lit(1)))
        return (s / n)

    wide = (
        ev.filter(F.col("event_type").isin("click", "view", "purchase"))
        .groupBy(
            (F.col("user_id") % 5).alias("station_id"),
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
            .alias("time_h"),
        )
        .agg(
            mean_of("click").alias("wrf_a"),
            mean_of("view").alias("wrf_c"),
            mean_of("purchase").alias("obs"),
        )
    )
    return wide.na.drop("any", subset=["wrf_a", "wrf_c", "obs"])


# E2 — the rfield FILE contract as data (gen_rfields.py:177-208): one
# values file per timestep, every file sharing the exact (lon, lat)
# row order of the single xy.csv manifest, so line N of any file is
# the value at coordinate line N.  Encoded row-wise as
# (file_key, line_no, longitude, latitude, value) where line_no is the
# per-file rank AND xy_line is the manifest rank — the hash gate then
# checks ordering, density (every file carries the full grid) and
# alignment (line_no == xy_line for every row) in one query.  The
# byte-level file emission itself stays pytest-verified
# (tests/test_rfield_files.py); this is its in-gate logical twin.
@register(
    "e2_rfield_contract",
    oracle="""
    WITH cells AS (
      SELECT DISTINCT user_id % 100 AS cell,
             CAST(79.5 AS DOUBLE) + CAST(0.1 AS DOUBLE)
               * CAST(user_id % 100 % 10 AS DOUBLE) AS longitude,
             CAST(6.5 AS DOUBLE) + CAST(0.1 AS DOUBLE)
               * CAST((user_id % 100) // 10 AS DOUBLE) AS latitude
      FROM events
    ),
    hours AS (
      SELECT DISTINCT date_trunc('hour', ts) AS t FROM events
    ),
    vals AS (
      /* 3-dp HALF-UP of the mean via EXACT integer milli-units:
         round(double, 3) diverges between engines on representation
         boundaries (Spark rounds the shortest-string BigDecimal,
         DuckDB the binary double — 11 rows differed at sf0.1).
         values are DECIMAL(18,2) and non-negative, so sum*1000 is an
         exact integer and floor((2*s + n) / (2*n)) is the exact
         half-up milli-mean in both engines. */
      SELECT user_id % 100 AS cell, date_trunc('hour', ts) AS t,
             CAST(floor((2 * CAST(sum(CAST(value AS DECIMAL(18,2)))
                                  * 1000 AS BIGINT) + count(*))
                        / (2 * count(*))) AS DOUBLE) / 1000.0 AS mean_v
      FROM events GROUP BY cell, t
    ),
    dense AS (
      SELECT strftime(h.t, '%Y-%m-%d %H:%M:%S') AS file_key,
             c.longitude, c.latitude,
             coalesce(v.mean_v, 0.0) AS value
      FROM hours h CROSS JOIN cells c
      LEFT JOIN vals v ON v.t = h.t AND v.cell = c.cell
    )
    SELECT file_key,
           row_number() OVER (PARTITION BY file_key
                              ORDER BY longitude, latitude) AS line_no,
           dense_rank() OVER (ORDER BY longitude, latitude) AS xy_line,
           longitude, latitude, value
    FROM dense
    """,
)
def e2_rfield_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # synthetic 10×10 grid from user_id — both engines evaluate the
    # identical IEEE-double expressions, so coordinates are bit-equal
    cell = (F.col("user_id") % 100).alias("cell")
    lon = (F.lit(79.5) + F.lit(0.1) * (F.col("cell") % 10)).alias("longitude")
    lat = (
        F.lit(6.5) + F.lit(0.1) * F.floor(F.col("cell") / 10).cast("long")
    ).alias("latitude")
    cells = ev.select(cell).distinct().select("cell", lon, lat)
    hours = ev.select(F.date_trunc("hour", "ts").alias("t")).distinct()
    # exact half-up 3-dp mean in integer milli-units — see the oracle's
    # vals CTE comment for why round(double, 3) is NOT engine-portable
    # on a rational quotient
    s_milli = (F.sum(F.col("value").cast(DEC)) * 1000).cast("long")
    n = F.count("*")
    vals = (
        ev.groupBy(
            (F.col("user_id") % 100).alias("cell"),
            F.date_trunc("hour", "ts").alias("t"),
        )
        .agg(
            (
                F.floor(
                    (F.lit(2) * s_milli + n) / (F.lit(2) * n)
                ).cast("double")
                / F.lit(1000.0)
            ).alias("mean_v")
        )
    )
    # dense frame: timesteps × full grid (the reference emits every grid
    # point per file).  The grid manifest is tiny (16k rows for d03) →
    # broadcast.  The per-timestep values are FACT-scale (cell ×
    # timestep — 4.6M rows per d03 run, growing with the span), so no
    # broadcast hint there: the (t, cell) equi-join shuffles, or AQE
    # auto-broadcasts when the aggregate turns out small at runtime.
    dense = (
        hours.crossJoin(F.broadcast(cells))
        .join(vals, ["t", "cell"], "left")
        .select(
            F.date_format("t", "yyyy-MM-dd HH:mm:ss").alias("file_key"),
            "longitude", "latitude",
            F.coalesce(F.col("mean_v"), F.lit(0.0)).alias("value"),
        )
    )
    # per-file rank partitions by file_key (parallel across files); the
    # manifest rank is computed on the TINY cells dim and broadcast back
    # — no global window over the dense frame (which would single-thread
    # the whole fact-scale sort).
    w_file = Window.partitionBy("file_key").orderBy("longitude", "latitude")
    # bounded: cells is the fixed grid dim (~10^4 rows) — CI-gated
    # allowlist entry in test_plans_quality
    w_manifest = Window.orderBy("longitude", "latitude")
    xy = cells.select(
        "longitude", "latitude",
        F.row_number().over(w_manifest).cast("long").alias("xy_line"),
    )
    return (
        dense.join(F.broadcast(xy), ["longitude", "latitude"])
        .select(
            "file_key",
            F.row_number().over(w_file).cast("long").alias("line_no"),
            "xy_line", "longitude", "latitude", "value",
        )
    )


def _dsum_value():
    return F.sum(F.col("value").cast(DEC)).cast("double")


# E4 — forecast-verification skill scores (round 9, beyond ref but
# squarely the reference's domain: the hybrid frame E3 builds —
# gen_active_stations_rfields.py:161-251 — exists to compare forecast
# against gauge observation; this scores that comparison).  Per
# station over the hours where BOTH sides report: bias, MAE, RMSE of
# the hourly forecast total vs the observed total.
#
# Float discipline: hourly totals, their differences, |diff| and
# diff² all stay EXACT BIGINT centi-units; each metric is then one
# identical chain of IEEE ops (a division; a division+sqrt) in both
# engines — no round(double) anywhere.
@register(
    "wrf_e4_skill_scores",
    oracle="""
    WITH hourly AS (
      SELECT user_id % 5 AS station_id, date_trunc('hour', ts) AS t,
             CAST(sum(CASE WHEN event_type = 'click'
                           THEN CAST(value AS DECIMAL(18,2)) END)
                  * 100 AS BIGINT) AS fc_c,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(18,2)) END)
                  * 100 AS BIGINT) AS obs_c
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY station_id, t
    ),
    err AS (
      SELECT station_id, fc_c - obs_c AS e
      FROM hourly WHERE fc_c IS NOT NULL AND obs_c IS NOT NULL
    )
    SELECT station_id, count(*) AS n_hours,
           CAST(sum(e) AS DOUBLE) / (100.0 * count(*)) AS bias,
           CAST(sum(abs(e)) AS DOUBLE) / (100.0 * count(*)) AS mae,
           sqrt(CAST(sum(e * e) AS DOUBLE) / count(*)) / 100.0 AS rmse
    FROM err GROUP BY station_id
    """,
)
def wrf_e4_skill_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def side_c(source: str):
        return (
            F.sum(
                F.when(
                    F.col("event_type") == source,
                    F.col("value").cast(DEC),
                )
            )
            * 100
        ).cast("long")

    hourly = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            (F.col("user_id") % 5).alias("station_id"),
            F.date_trunc("hour", "ts").alias("t"),
        )
        .agg(side_c("click").alias("fc_c"), side_c("purchase").alias("obs_c"))
    )
    err = hourly.filter(
        F.col("fc_c").isNotNull() & F.col("obs_c").isNotNull()
    ).select("station_id", (F.col("fc_c") - F.col("obs_c")).alias("e"))
    n = F.count("*")
    return err.groupBy("station_id").agg(
        n.alias("n_hours"),
        (F.sum("e").cast("double") / (F.lit(100.0) * n)).alias("bias"),
        (F.sum(F.abs(F.col("e"))).cast("double") / (F.lit(100.0) * n))
        .alias("mae"),
        (
            F.sqrt(F.sum(F.col("e") * F.col("e")).cast("double") / n)
            / F.lit(100.0)
        ).alias("rmse"),
    )


# E5 — forecast-vs-obs Pearson skill correlation (companion to E4).
# Demonstrates EXACT wide-integer aggregation: the five sufficient
# statistics (Σx, Σy, Σxy, Σx², Σy²) accumulate in DECIMAL(38,0)
# (Spark) / HUGEINT (DuckDB) over centi-unit integers — products
# reach ~10^20, beyond BIGINT but exact in both engines' wide types —
# and r = (nΣxy − ΣxΣy) / (√(nΣx²−Σx²·…) …) is then one fixed chain
# of IEEE double ops.  No float enters any aggregate.
@register(
    "wrf_e5_skill_correlation",
    oracle="""
    WITH hourly AS (
      SELECT user_id % 5 AS station_id, date_trunc('hour', ts) AS t,
             CAST(sum(CASE WHEN event_type = 'click'
                           THEN CAST(value AS DECIMAL(18,2)) END)
                  * 100 AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(18,2)) END)
                  * 100 AS BIGINT) AS y
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY station_id, t
    ),
    stats AS (
      SELECT station_id, count(*) AS n,
             sum(CAST(x AS HUGEINT)) AS sx,
             sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
             sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
      FROM hourly WHERE x IS NOT NULL AND y IS NOT NULL
      GROUP BY station_id
    )
    SELECT station_id, n AS n_hours,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS pearson_r
    FROM stats WHERE n > 1 AND n * sxx > sx * sx AND n * syy > sy * sy
    """,
)
def wrf_e5_skill_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    WIDE = "decimal(38,0)"

    def side_c(source: str):
        return (
            F.sum(
                F.when(
                    F.col("event_type") == source,
                    F.col("value").cast(DEC),
                )
            )
            * 100
        ).cast("long")

    hourly = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            (F.col("user_id") % 5).alias("station_id"),
            F.date_trunc("hour", "ts").alias("t"),
        )
        .agg(side_c("click").alias("x"), side_c("purchase").alias("y"))
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    xw, yw = F.col("x").cast(WIDE), F.col("y").cast(WIDE)
    stats = hourly.groupBy("station_id").agg(
        F.count("*").alias("n"),
        F.sum(xw).alias("sx"),
        F.sum(yw).alias("sy"),
        F.sum(xw * yw).alias("sxy"),
        F.sum(xw * xw).alias("sxx"),
        F.sum(yw * yw).alias("syy"),
    )
    n = F.col("n")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    d1 = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    d2 = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return (
        stats.filter(
            (n > 1)
            & (n * F.col("sxx") > F.col("sx") * F.col("sx"))
            & (n * F.col("syy") > F.col("sy") * F.col("sy"))
        )
        .select(
            "station_id",
            n.alias("n_hours"),
            (num / (F.sqrt(d1) * F.sqrt(d2))).alias("pearson_r"),
        )
    )
