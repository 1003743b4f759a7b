"""Observation QC flags (operators/qc.py): hand-computed persistence
runs and step jumps, null handling, and the one-Exchange plan
contract.  The registered w18_obs_qc row is the DuckDB-gated twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.operators.qc import (
    flatline_flags,
    qc_flags,
    spike_flags,
)


def _series(spark, vals, key="g1"):
    return spark.createDataFrame(
        [(key, i, v) for i, v in enumerate(vals)],
        "k string, t long, v long",
    )


def test_flatline_hand_computed(spark):
    # run of 3 sevens flags all three; pairs below min_run don't
    df = _series(spark, [1, 7, 7, 7, 2, 2, 9])
    got = {
        r.t: (r.flatline_flag, r.run_len)
        for r in flatline_flags(
            df, ["k"], ["t"], "v", min_run=3
        ).collect()
    }
    assert got == {
        0: (False, 1), 1: (True, 3), 2: (True, 3), 3: (True, 3),
        4: (False, 2), 5: (False, 2), 6: (False, 1),
    }


def test_flatline_null_runs_flag(spark):
    """A dead feed reporting NULLs is a run too (null-safe equality)."""
    df = spark.createDataFrame(
        [("g", 0, 5), ("g", 1, None), ("g", 2, None), ("g", 3, None),
         ("g", 4, 5)],
        "k string, t long, v long",
    )
    got = {
        r.t: r.flatline_flag
        for r in flatline_flags(
            df, ["k"], ["t"], "v", min_run=3
        ).collect()
    }
    assert got == {0: False, 1: True, 2: True, 3: True, 4: False}


def test_spike_hand_computed_first_row_never_flags(spark):
    df = _series(spark, [100, 104, 300, 302, 100])
    got = {
        r.t: r.spike_flag
        for r in spike_flags(
            df, ["k"], ["t"], "v", max_jump=F.lit(50)
        ).collect()
    }
    # jumps: -, 4, 196, 2, 202 → flags at t=2 and t=4 only
    assert got == {0: False, 1: False, 2: True, 3: False, 4: True}


def test_qc_flags_one_exchange_and_level_column(spark):
    """Composed pass: quantized persistence level + raw-value step
    test; all windows share the series partitioning → ONE Exchange."""
    df = spark.createDataFrame(
        [("a", i, 1000 + (i // 3) * 7) for i in range(9)]
        + [("b", 0, 5), ("b", 1, 900)],
        "k string, t long, v long",
    )
    out = qc_flags(
        df, ["k"], ["t"], "v", min_run=3, max_jump=F.lit(500),
        level_col=F.floor(F.col("v") / F.lit(7.0)).cast("long"),
    )
    # plan BEFORE execution: post-collect AQE finalization wraps the
    # exchange in ShuffleQueryStage text that mentions it twice
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    rows = {(r.k, r.t): (r.flatline_flag, r.spike_flag)
            for r in out.collect()}
    assert rows[("a", 0)][0] and rows[("a", 8)][0]  # 3-long levels
    assert rows[("b", 1)] == (False, True)          # 895 jump
