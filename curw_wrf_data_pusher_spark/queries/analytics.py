"""Sketch and behavioral analytics (split from the former
queries/generic.py monolith): Morton/Z-order keys (P13), exact heavy
hitters (A15), Bloom semi-join (J9), Count-Min (A16), MAD outliers
(A17), snapshot diff (K11), mergeable rollups (A18), histograms
(A19), feature scaling (A20), the window suite (W8), funnel (W9),
cohort retention (A21), attribution (W10), and HLL register state
(A22).  Registration order is load-bearing (queries/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import latest_per_series
from ..sources.lake import load_table, spread
from .registry import register


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
    # one shared per-token count frame: the exact top-50 needs it
    # anyway, and the sketch is linear, so building weighted from the
    # counts is cell-identical while hashing each DISTINCT bigram once
    # instead of every occurrence (4 md5s per occurrence -> per token);
    # both branches read the identical counts subtree, so its exchange
    # is reused instead of re-exploding the corpus per branch
    counts = tok.groupBy("token").agg(F.count("*").alias("exact_cnt"))
    sketch = countmin_build(counts, "token", width=64,
                            weight_col="exact_cnt")
    top = counts.orderBy(F.desc("exact_cnt"), "token").limit(50)
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


