"""Mergeable-sketch state and sessionized behavioral ops (split
from the former queries/generic.py monolith): KMV distinct (A23) and
KMV overlap (A25), multi-touch attribution (W11), distribution drift
(K12), SCD2 as-of lookup (J10), sweep-line concurrency (W12), and
the mergeable quantile sketch (A24).  Registration order is
load-bearing (queries/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lake import load_table, spread
from .registry import register
from .analytics import _ATTR_FMT


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


