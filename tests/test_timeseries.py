"""gap_fill: dense-grid densify + interpolation semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.operators.timeseries import gap_fill


def _series(spark):
    # key A: slots 0,1,4,5 with values 0,10,40,100 (gap 2,3)
    # key B: single observation (degenerate — no gaps)
    rows = [("A", 0, 0.0), ("A", 1, 10.0), ("A", 4, 40.0),
            ("A", 5, 100.0), ("B", 7, 3.5)]
    return spark.createDataFrame(rows, "k string, slot long, v double")


def test_linear_interpolation_brackets_gaps(spark):
    out = gap_fill(_series(spark), ["k"], slot_col="slot", value_col="v")
    got = {(r.k, r.slot): (r.value_filled, r.is_gap) for r in out.collect()}
    assert got[("A", 2)] == (20.0, True)   # 10 + (40-10)*(1/3)
    assert got[("A", 3)] == (30.0, True)
    assert got[("A", 0)] == (0.0, False)
    assert got[("A", 5)] == (100.0, False)
    assert got[("B", 7)] == (3.5, False)
    assert len(got) == 7  # A: 6 grid slots, B: 1


def test_ffill_and_none_methods(spark):
    s = _series(spark)
    ff = {(r.k, r.slot): r.value_filled
          for r in gap_fill(s, ["k"], slot_col="slot", value_col="v",
                            method="ffill").collect()}
    assert ff[("A", 2)] == 10.0 and ff[("A", 3)] == 10.0
    nn = {(r.k, r.slot): r.value_filled
          for r in gap_fill(s, ["k"], slot_col="slot", value_col="v",
                            method="none").collect()}
    assert nn[("A", 2)] is None and nn[("A", 4)] == 40.0
    with pytest.raises(ValueError, match="unknown fill method"):
        gap_fill(s, ["k"], method="cubic")


def test_non_numeric_shuffle_conf_falls_back(spark, monkeypatch):
    """Platforms that report spark.sql.shuffle.partitions as a
    non-numeric value (e.g. 'auto' under Databricks AQE autotune)
    must not break the partition pin — it falls back to
    defaultParallelism (ADVICE round 11).  Vanilla Spark refuses to
    SET a non-int here, so the getter is patched instead."""
    from pyspark._globals import _NoValue

    conf_cls = type(spark.conf)
    real_get = conf_cls.get

    def fake_get(self, key, default=_NoValue):
        if key == "spark.sql.shuffle.partitions":
            return "auto"
        return real_get(self, key, default)

    monkeypatch.setattr(conf_cls, "get", fake_get)
    out = gap_fill(_series(spark), ["k"], slot_col="slot", value_col="v")
    got = {(r.k, r.slot): r.value_filled for r in out.collect()}
    assert got[("A", 2)] == 20.0


def test_step_respects_stride(spark):
    rows = [("A", 0, 1.0), ("A", 6, 7.0)]
    s = spark.createDataFrame(rows, "k string, slot long, v double")
    out = gap_fill(s, ["k"], slot_col="slot", value_col="v", step=3)
    got = {r.slot: (r.value_filled, r.is_gap) for r in out.collect()}
    assert got == {0: (1.0, False), 3: (4.0, True), 6: (7.0, False)}


def test_no_global_window_and_keyed_exchanges(spark):
    out = gap_fill(_series(spark), ["k"], slot_col="slot", value_col="v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every Window node must be partitioned (no partition-less scan)
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "k#" in line, line
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_robust_scale_degenerate_groups(spark):
    from curw_wrf_data_pusher_spark.operators.timeseries import robust_scale

    rows = [("c", i, 5.0) for i in range(4)] + [
        ("g", 0, 1.0), ("g", 1, 2.0), ("g", 2, 3.0), ("g", 3, 100.0),
    ]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = {(r.k, r.i): r for r in robust_scale(df, ["k"], "v").collect()}
    # constant group: min-max and robust-z are NULL, winsor = value
    for i in range(4):
        r = out[("c", i)]
        assert r.v_minmax is None and r.v_robust_z is None
        assert r.v_winsor == 5.0
    # normal group: min-max endpoints and winsor clipping behave
    assert out[("g", 0)].v_minmax == 0.0
    assert out[("g", 3)].v_minmax == 1.0
    assert out[("g", 3)].v_winsor < 100.0  # clipped at p95
    # robust-z is signed
    assert out[("g", 0)].v_robust_z < 0 < out[("g", 3)].v_robust_z


# ---------------------------------------------------------------------------
# multi-touch attribution credit models (the registered w11 row only
# sees single-touch paths at sf0.01 — the corpus rarely has two clicks
# within an hour of a purchase — so the fractional models are pinned
# here on synthetic paths)


def test_multi_touch_credit_models(spark):
    from datetime import datetime

    from curw_wrf_data_pusher_spark.operators.funnel import (
        multi_touch_attribution,
    )

    def t(minute):
        return datetime(2024, 6, 1, 12, minute)

    rows = [
        # user 1: four clicks in-window, one outside (11:00 + 1h < 13:00)
        (1, t(0).replace(hour=10), "click", 100, 0.0),
        (1, t(5), "click", 101, 0.0),
        (1, t(10), "click", 102, 0.0),
        (1, t(20), "click", 103, 0.0),
        (1, t(30), "click", 104, 0.0),
        (1, t(40), "purchase", 110, 100.0),
        # user 2: two clicks
        (2, t(1), "click", 200, 0.0),
        (2, t(2), "click", 201, 0.0),
        (2, t(3), "purchase", 210, 80.0),
        # user 3: one click
        (3, t(1), "click", 300, 0.0),
        (3, t(2), "purchase", 310, 60.0),
        # user 4: no click in window
        (4, t(2), "purchase", 410, 40.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, "
        "event_id long, value double"
    )
    out = multi_touch_attribution(ev).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)

    u1 = sorted(by_user[1], key=lambda r: r.touch_rank)
    assert [r.touch_id for r in u1] == [101, 102, 103, 104]  # 100 outside
    assert all(r.n_touches == 4 for r in u1)
    assert [round(r.credit_linear, 10) for r in u1] == [25.0] * 4
    # U-shape at n=4: 40 / 10 / 10 / 40
    assert [round(r.credit_u, 10) for r in u1] == [40.0, 10.0, 10.0, 40.0]
    assert abs(sum(r.credit_u for r in u1) - 100.0) < 1e-9

    u2 = sorted(by_user[2], key=lambda r: r.touch_rank)
    assert [round(r.credit_u, 10) for r in u2] == [40.0, 40.0]

    u3 = by_user[3]
    assert len(u3) == 1 and u3[0].credit_u == 60.0 and \
        u3[0].credit_linear == 60.0

    assert 4 not in by_user  # conversions without touches emit nothing


# ---------------------------------------------------------------------------
# interval concurrency (sweep line as bucketed three-phase prefix sum)


def test_interval_concurrency_matches_naive_and_properties(spark):
    from datetime import datetime, timedelta

    from pyspark.sql import Window

    from curw_wrf_data_pusher_spark.operators.timeseries import (
        interval_concurrency,
    )

    base = datetime(2024, 6, 1, 0, 0)
    rows = []
    # staircase: intervals overlapping across HOUR boundaries (the
    # carry-in path), plus a zero-length interval that must vanish
    for i in range(50):
        start = base + timedelta(minutes=7 * i)
        rows.append((i, start, start + timedelta(minutes=45)))
    rows.append((100, base, base))  # zero-length
    df = spark.createDataFrame(rows, "id long, s timestamp, e timestamp")

    out = {r.t: r.n_active
           for r in interval_concurrency(df, "s", "e").collect()}

    # naive single-global-window reference
    d = df.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionByName(
        df.select(F.col("e").alias("t"), F.lit(-1).alias("d"))
    ).groupBy("t").agg(F.sum("d").alias("d"))
    naive = {
        r.t: r.run
        for r in d.withColumn(
            "run", F.sum("d").over(Window.orderBy("t"))
        ).collect()
    }
    assert out == naive
    # 45-min intervals every 7 min → 7 concurrently open at steady state
    assert max(out.values()) == 7
    # after the last end, everything is closed
    assert out[max(out)] == 0
    # zero-length interval contributes nothing anywhere
    assert all(v >= 0 for v in out.values())
