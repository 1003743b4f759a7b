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
