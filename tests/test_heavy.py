"""Heavy hitters: Misra-Gries sketch guarantees + exact twin."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.operators.heavy import (
    _mg_compress,
    heavy_hitters_exact,
    heavy_hitters_mg,
)


def test_exact_matches_brute_force(spark):
    items = ["a"] * 50 + ["b"] * 30 + ["c"] * 15 + ["d"] * 5
    df = spark.createDataFrame([(x,) for x in items], "v string")
    got = {
        r.item: (r.n_occurrences, r.freq_ratio)
        for r in heavy_hitters_exact(df, "v", 0.10).collect()
    }
    assert got == {"a": (50, 0.5), "b": (30, 0.3), "c": (15, 0.15)}


def test_mg_finds_all_guaranteed_items(spark):
    # stream of 10_000 with two true heavies and a long tail
    items = (
        ["hot1"] * 3000 + ["hot2"] * 1500
        + [f"tail{i}" for i in range(5500)]
    )
    df = spark.createDataFrame(
        [(x,) for x in items], "v string"
    ).repartition(8)
    k = 20
    out = {r.item: r.est for r in heavy_hitters_mg(df, "v", k=k).collect()}
    n = len(items)
    for item, true in (("hot1", 3000), ("hot2", 1500)):
        assert item in out
        assert true - n / (k + 1) <= out[item] <= true


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.integers(min_value=2, max_value=12),
)
def test_mg_compress_preserves_summary_invariants(stream, k):
    """Driver-level property on the compression kernel itself: feed the
    stream through batch-merge + compress and check the MG bound."""
    counters: Counter = Counter()
    # emulate arbitrary batching
    for i in range(0, len(stream), 37):
        counters.update(Counter(stream[i : i + 37]))
        _mg_compress(counters, k)
    n = len(stream)
    truth = Counter(stream)
    assert len(counters) <= k
    for item, true in truth.items():
        est = counters.get(item, 0)
        assert est <= true
        assert true - est <= n / (k + 1) + 1e-9
        if true > n / (k + 1):
            assert item in counters


def test_mg_plan_is_one_pass_plus_tiny_agg(spark):
    df = spark.createDataFrame([("x",)] * 10, "v string")
    plan = (
        heavy_hitters_mg(df, "v", k=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "TakeOrderedAndProject" in plan  # k-bounded, no global sort


def test_exact_plan_broadcasts_total(spark):
    df = spark.createDataFrame([("x",)] * 10, "v string")
    plan = (
        heavy_hitters_exact(df, "v", 0.1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the one-row total rides a broadcast nested-loop (1-row build side
    # by construction), never a shuffled cartesian
    assert "CartesianProduct" not in plan
