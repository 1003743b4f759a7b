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


@given(
    toks=st.lists(st.integers(1, 400), min_size=1, max_size=40),
    capacity=st.integers(min_value=8, max_value=512),
)
@SETTINGS
def test_pack_sequences_invariants(spark, toks, capacity):
    """Concat-and-chunk packing invariants for arbitrary token counts:
    offsets tile the group's token stream with no gaps or overlaps, and
    every doc's bin range is exactly the chunks its span touches."""
    from curw_wrf_data_pusher_spark.llmops.curation import pack_sequences

    docs = spark.createDataFrame(
        [(i, "g", " ".join(["w"] * n)) for i, n in enumerate(toks)],
        "doc_id long, source string, text string",
    )
    out = (
        pack_sequences(docs, capacity=capacity)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["n_tokens"]) == toks
    # offsets are the exclusive prefix sums — contiguous, no overlap
    expect_off = [sum(toks[:i]) for i in range(len(toks))]
    assert list(out["start_offset"]) == expect_off
    for _, r in out.iterrows():
        assert r["bin_start"] == r["start_offset"] // capacity
        assert r["bin_end"] == (r["start_offset"] + r["n_tokens"] - 1) // capacity
        assert r["bin_start"] <= r["bin_end"]


@given(rate_pct=st.integers(0, 100))
@SETTINGS
def test_stratified_sample_deterministic_and_monotone(spark, rate_pct):
    """Hash-threshold sampling: the kept set at rate r is EXACTLY the
    docs whose hash clears the threshold (re-running gives the same
    set), and raising the rate only ever ADDS documents."""
    from curw_wrf_data_pusher_spark.llmops.curation import stratified_sample

    docs = spark.createDataFrame(
        [(i, "s", "t") for i in range(200)],
        "doc_id long, source string, text string",
    )
    r = rate_pct / 100.0
    kept1 = {x["doc_id"] for x in stratified_sample(
        docs, rates={"s": r}).select("doc_id").collect()}
    kept2 = {x["doc_id"] for x in stratified_sample(
        docs, rates={"s": r}).select("doc_id").collect()}
    assert kept1 == kept2  # deterministic
    bigger = {x["doc_id"] for x in stratified_sample(
        docs, rates={"s": min(1.0, r + 0.25)}).select("doc_id").collect()}
    assert kept1 <= bigger  # monotone in the rate
    if rate_pct == 0:
        assert kept1 == set()
    if rate_pct == 100:
        assert len(kept1) == 200


# --- round 6: substring-dedup invariants ---------------------------------

_token = st.text(alphabet="abcdefg", min_size=1, max_size=3)


@given(
    docs=st.lists(
        st.lists(_token, min_size=1, max_size=25), min_size=1, max_size=6
    )
)
@SETTINGS
def test_winnow_matches_python_mirror_property(spark, docs):
    """Arbitrary corpora: the Spark winnowing selection equals the
    reference Python implementation doc-for-doc."""
    from curw_wrf_data_pusher_spark.llmops.substrings import (
        winnow_fingerprints,
    )
    from tests.test_substrings import _winnow_py

    texts = [" ".join(toks) for toks in docs]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, k=2, window=3).collect():
        got.setdefault(r.doc_id, set()).add((r.fp_pos, r.fp))
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _winnow_py(t.split(" "), 2, 3), t


@given(
    base=st.lists(_token, min_size=8, max_size=20),
    pre=st.lists(_token, min_size=0, max_size=6),
    post=st.lists(_token, min_size=0, max_size=6),
)
@SETTINGS
def test_span_removal_kills_planted_duplicates_property(
    spark, base, pre, post
):
    """A run of >= l_tokens planted into two contexts is removed from
    both, and a removal pass never changes a corpus with no repeated
    window."""
    from curw_wrf_data_pusher_spark.llmops.substrings import (
        remove_duplicate_spans,
    )

    run = " ".join(base)
    texts = [
        " ".join(pre + base + ["u1"]),
        " ".join(["u2"] + base + post),
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {r.doc_id: r.text for r in
           remove_duplicate_spans(df, l_tokens=8).collect()}
    # every token position of the shared run is covered in both docs;
    # the planted unique markers survive unless they're also tokens of
    # a repeated window (possible when pre/post overlap base)
    for i in (0, 1):
        assert f" {run} " not in f" {out[i]} "
    assert "u1" in out[0].split(" ") or "u1" in run.split(" ")


@given(
    left=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100)),
                  min_size=1, max_size=25),
    right=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100), cents),
                   min_size=1, max_size=25,
                   unique_by=lambda r: (r[0], r[1])),
)
@SETTINGS
def test_asof_join_forward_matches_pandas(spark, left, right):
    lpdf = pd.DataFrame(left, columns=["k", "t"]).sort_values(["k", "t"])
    rpdf = pd.DataFrame(
        [(k, t, v / 100.0) for k, t, v in right], columns=["k", "t", "v"]
    ).sort_values(["k", "t"])
    got = (
        asof_join(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rpdf),
            on=["k"], left_time="t", right_time="t", value_cols=["v"],
            direction="forward",
        )
        .toPandas().sort_values(["k", "t"]).reset_index(drop=True)
    )
    want = pd.merge_asof(
        lpdf.sort_values("t"), rpdf.sort_values("t"),
        on="t", by="k", direction="forward",
    ).sort_values(["k", "t"]).reset_index(drop=True)
    assert list(got["asof_v"].fillna(-1)) == list(want["v"].fillna(-1))


# ---------------------------------------------------------------------------
# mergeable-rollup algebra (operators/rollup.py): any batch slicing of
# any input merges to the direct aggregation

from curw_wrf_data_pusher_spark.operators.rollup import (  # noqa: E402
    merge_partials,
    rollup_partials,
)


@given(
    data=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 4), cents),
        min_size=1,
        max_size=60,
    )
)
@SETTINGS
def test_rollup_merge_equals_direct_any_slicing(spark, data):
    pdf = pd.DataFrame(data, columns=["k", "b", "v"])
    pdf["v"] = pdf["v"].astype("float64")
    df = spark.createDataFrame(pdf)
    merged = {
        r.k: r
        for r in merge_partials(
            rollup_partials(df, ["k", "b"], "v"), ["k"]
        ).collect()
    }
    direct = pdf.groupby("k")["v"]
    for k, g in direct:
        m = merged[k]
        assert m.n == len(g)
        assert m.sum_v == pytest.approx(g.sum())
        assert m.min_v == g.min() and m.max_v == g.max()
        assert m.avg_v == pytest.approx(g.mean())
        assert m.var_pop == pytest.approx(g.var(ddof=0), abs=1e-6)
    assert set(merged) == set(direct.groups)


# ---------------------------------------------------------------------------
# snapshot diff (operators/snapshot.py) ≡ a pandas outer-merge mirror

from curw_wrf_data_pusher_spark.operators.snapshot import (  # noqa: E402
    snapshot_diff,
)


@given(
    old=st.dictionaries(
        st.integers(0, 9),
        st.one_of(st.none(), st.text(alphabet="ab\x1f", max_size=3)),
        max_size=8,
    ),
    new=st.dictionaries(
        st.integers(0, 9),
        st.one_of(st.none(), st.text(alphabet="ab\x1f", max_size=3)),
        max_size=8,
    ),
)
@SETTINGS
def test_snapshot_diff_matches_dict_mirror(spark, old, new):
    # \x1f in the alphabet deliberately attacks the digest separator;
    # single-column compare means it cannot cause false equality
    o = spark.createDataFrame(
        [(k, v) for k, v in old.items()] or [(None, None)], "k int, v string"
    ).filter(F.col("k").isNotNull())
    n = spark.createDataFrame(
        [(k, v) for k, v in new.items()] or [(None, None)], "k int, v string"
    ).filter(F.col("k").isNotNull())
    got = {r.k: r.status for r in snapshot_diff(o, n, ["k"]).collect()}
    want = {}
    for k in set(old) | set(new):
        if k not in old:
            want[k] = "added"
        elif k not in new:
            want[k] = "removed"
        elif old[k] != new[k]:
            want[k] = "changed"
        else:
            want[k] = "unchanged"
    assert got == want
