"""Hypothesis property tests (SURVEY §5): algebraic invariants that
must hold for arbitrary inputs, not just fixtures.

- diff ∘ cumsum = identity (A1 inverse)
- upsert idempotence / last-writer-wins (K1 semantics)
- pivot ∘ unpivot round-trip (R1/R2)
- as-of join ≡ pandas merge_asof (J6)
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.operators.diff import adjacent_diff
from curw_wrf_data_pusher_spark.operators.joins import asof_join
from curw_wrf_data_pusher_spark.operators.pivot import pivot_by_source, unpivot

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# integer-cent values: float algebra stays exact
cents = st.integers(min_value=0, max_value=10_000)


@given(
    data=st.lists(
        st.tuples(st.integers(0, 3), cents), min_size=1, max_size=60
    )
)
@SETTINGS
def test_diff_of_cumsum_recovers_increments(spark, data):
    pdf = pd.DataFrame(
        [(k, t, v / 100.0) for t, (k, v) in enumerate(data)],
        columns=["k", "t", "inc"],
    )
    sdf = spark.createDataFrame(pdf)
    cum = sdf.withColumn(
        "cum",
        F.sum("inc").over(
            Window.partitionBy("k").orderBy("t")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    rec = adjacent_diff(
        cum, series_cols=["k"], order_col="t", value_col="cum", out_col="r"
    ).toPandas()
    assert (abs(rec["r"] - rec["inc"]) < 1e-9).all()
    per_key = pdf.groupby("k").size()
    assert len(rec) == int((per_key - 1).sum())


@given(
    batch1=st.dictionaries(st.integers(0, 8), cents, min_size=1, max_size=9),
    batch2=st.dictionaries(st.integers(0, 8), cents, min_size=1, max_size=9),
)
@SETTINGS
def test_upsert_last_writer_wins(spark, tmp_path_factory, batch1, batch2):
    from curw_wrf_data_pusher_spark.sinks.upsert import upsert_parquet

    store = str(tmp_path_factory.mktemp("store") / "t")
    to_df = lambda d, tag: spark.createDataFrame(
        [(k, v / 100.0, tag) for k, v in d.items()],
        "k long, v double, tag string",
    )
    upsert_parquet(spark, to_df(batch1, "b1"), store, keys=["k"])
    upsert_parquet(spark, to_df(batch2, "b2"), store, keys=["k"])
    got = {
        r.k: (r.v, r.tag) for r in spark.read.parquet(store).collect()
    }
    want = {k: (v / 100.0, "b1") for k, v in batch1.items()}
    want.update({k: (v / 100.0, "b2") for k, v in batch2.items()})
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), cents, cents), min_size=1, max_size=30
    )
)
@SETTINGS
def test_unpivot_pivot_roundtrip(spark, rows):
    pdf = pd.DataFrame(
        [(i, k, a / 100.0, b / 100.0) for i, (k, a, b) in enumerate(rows)],
        columns=["id", "k", "m_a", "m_b"],
    )
    sdf = spark.createDataFrame(pdf)
    long = unpivot(
        sdf, id_cols=["id", "k"], value_cols=["m_a", "m_b"],
        var_name="m", value_name="v",
    )
    back = pivot_by_source(
        long, key_cols=["id", "k"], pivot_col="m",
        pivot_values=["m_a", "m_b"], value_col="v", agg="first",
    ).toPandas().sort_values("id").reset_index(drop=True)
    orig = pdf.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        back[["id", "k", "m_a", "m_b"]], orig, check_dtype=False
    )


@given(
    left=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100)),
                  min_size=1, max_size=25, unique=True),
    right=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100), cents),
                   min_size=1, max_size=25,
                   unique_by=lambda r: (r[0], r[1])),
)
@SETTINGS
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    lpdf = pd.DataFrame(left, columns=["k", "t"]).sort_values(["k", "t"])
    rpdf = pd.DataFrame(
        [(k, t, v / 100.0) for k, t, v in right], columns=["k", "t", "v"]
    ).sort_values(["k", "t"])
    got = (
        asof_join(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rpdf),
            on=["k"], left_time="t", right_time="t", value_cols=["v"],
        )
        .toPandas().sort_values(["k", "t"]).reset_index(drop=True)
    )
    want = pd.merge_asof(
        lpdf.sort_values("t"), rpdf.sort_values("t"),
        on="t", by="k", direction="backward",
    ).sort_values(["k", "t"]).reset_index(drop=True)
    assert list(got["asof_v"].fillna(-1)) == list(want["v"].fillna(-1))
