"""Round-6 batch operators: count-min sketch, snapshot diff, MAD
outliers, per-group cap, and the flat-CaseWhen regression guard."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.llmops.curation import (
    cap_per_group,
    match_case,
    upsample_by_group,
)
from curw_wrf_data_pusher_spark.operators.sketch import (
    countmin_build,
    countmin_lookup,
    countmin_merge,
)
from curw_wrf_data_pusher_spark.operators.snapshot import snapshot_diff
from curw_wrf_data_pusher_spark.operators.timeseries import mad_outliers


# ---------------------------------------------------------------------------
# count-min sketch


@pytest.fixture(scope="module")
def stream(spark):
    # zipf-ish multiplicities over a small vocabulary
    rows = [(f"tok{i % 17}",) for i in range(600)] + [
        (f"rare{i}",) for i in range(40)
    ]
    return spark.createDataFrame(rows, ["item"]).cache()


def test_cms_never_undercounts_and_is_tight_without_collisions(
    spark, stream
):
    exact = {
        r.item: r.cnt
        for r in stream.groupBy("item").agg(F.count("*").alias("cnt")).collect()
    }
    items = stream.select("item").distinct()
    # wide sketch: 57 distinct items over 4×4096 cells — collisions
    # are possible in principle, so assert the one-sided guarantee
    # plus near-exactness in aggregate
    sk = countmin_build(stream, "item", depth=4, width=4096)
    est = {
        r.item: r.cms_est
        for r in countmin_lookup(sk, items, "item", depth=4, width=4096).collect()
    }
    assert set(est) == set(exact)
    assert all(est[i] >= exact[i] for i in exact)
    # narrow sketch: collisions guaranteed (57 items, 16 columns) —
    # still never undercounts
    sk16 = countmin_build(stream, "item", depth=4, width=16)
    est16 = {
        r.item: r.cms_est
        for r in countmin_lookup(sk16, items, "item", depth=4, width=16).collect()
    }
    assert all(est16[i] >= exact[i] for i in exact)
    assert sum(est16.values()) > sum(exact.values())  # collisions occurred


def test_cms_weighted_build_equals_occurrence_build(spark, stream):
    """Linearity: building from a pre-aggregated (item, count) frame
    with weight_col is cell-for-cell identical to hashing every
    occurrence (the a16 shared-counts restructure relies on this)."""
    counts = stream.groupBy("item").agg(F.count("*").alias("n"))
    weighted = countmin_build(counts, "item", width=16, weight_col="n")
    plain = countmin_build(stream, "item", width=16)
    w = {(r.row, r.col): r.cnt for r in weighted.collect()}
    p = {(r.row, r.col): r.cnt for r in plain.collect()}
    assert w == p and w
    assert dict(weighted.dtypes)["cnt"] == "bigint"


def test_cms_merge_equals_single_build(spark, stream):
    a = stream.filter(F.crc32(F.col("item")) % 2 == 0)
    b = stream.filter(F.crc32(F.col("item")) % 2 == 1)
    merged = countmin_merge(
        countmin_build(a, "item", width=64), countmin_build(b, "item", width=64)
    )
    full = countmin_build(stream, "item", width=64)
    m = {(r.row, r.col): r.cnt for r in merged.collect()}
    f = {(r.row, r.col): r.cnt for r in full.collect()}
    assert m == f


def test_cms_build_is_bounded_and_one_shuffle(spark, stream):
    sk = countmin_build(stream, "item", depth=4, width=32)
    assert sk.count() <= 4 * 32
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan  # map-side combine before the shuffle


# ---------------------------------------------------------------------------
# snapshot diff


def test_snapshot_diff_classifies_all_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 25.0), (3, "c", None), (5, "e", 50.0)],
        ["k", "s", "v"],
    )
    got = {r.k: r.status for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",  # NULL == NULL under the sentinel digest
        4: "removed",
        5: "added",
    }


def test_snapshot_diff_null_vs_empty_and_boundary_concat(spark):
    old = spark.createDataFrame([(1, None, "bc"), (2, "ab", "c")], ["k", "x", "y"])
    new = spark.createDataFrame([(1, "", "bc"), (2, "a", "bc")], ["k", "x", "y"])
    got = {r.k: r.status for r in snapshot_diff(old, new, ["k"]).collect()}
    # NULL ≠ '' and ("ab","c") ≠ ("a","bc") — the sentinel separators
    assert got == {1: "changed", 2: "changed"}


def test_snapshot_diff_single_join_plan(spark):
    old = spark.range(100).select(F.col("id").alias("k"), F.col("id").alias("v"))
    new = spark.range(100).select(F.col("id").alias("k"), (F.col("id") + 1).alias("v"))
    plan = (
        snapshot_diff(old, new, ["k"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Join FullOuter") == 1


# ---------------------------------------------------------------------------
# MAD outliers


def test_mad_outliers_matches_pandas(spark):
    import numpy as np

    vals = [float(v) for v in [1, 2, 2, 3, 2, 2, 1, 2, 3, 50]]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["g", "i", "v"])
    out = mad_outliers(df, ["g"], "v", k=3.5).collect()
    med = float(np.median(vals))
    mad = float(np.median(np.abs(np.array(vals) - med)))
    for r in out:
        assert r.group_median == pytest.approx(med)
        assert r.group_mad == pytest.approx(mad)
        expected = abs(r.v - med) > 3.5 * 1.4826 * mad
        assert r.is_outlier == expected
    assert sum(r.is_outlier for r in out) == 1  # only the 50


def test_mad_outliers_constant_group(spark):
    df = spark.createDataFrame(
        [("c", i, 5.0) for i in range(6)] + [("c", 99, 7.0)], ["g", "i", "v"]
    )
    out = {r.i: r for r in mad_outliers(df, ["g"], "v").collect()}
    # median 5, MAD 0: robust_z NULL everywhere, nonzero deviation flags
    assert all(r.robust_z is None for r in out.values())
    assert out[99].is_outlier and not out[0].is_outlier


# ---------------------------------------------------------------------------
# per-group cap


def test_cap_per_group_bounds_and_determinism(spark):
    rows = [(i, "s%d" % (i % 3)) for i in range(90)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    capped = cap_per_group(docs, 10)
    sizes = {
        r.source: r.n
        for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert all(n == 10 for n in sizes.values())
    ids = {r.doc_id for r in capped.collect()}
    # repartition-proof: same kept set on a reshuffled input
    ids2 = {r.doc_id for r in cap_per_group(docs.repartition(7), 10).collect()}
    assert ids == ids2
    # independent draw under a different salt
    ids3 = {r.doc_id for r in cap_per_group(docs, 10, salt="cap:v2").collect()}
    assert ids3 != ids
    # groups smaller than the cap pass through whole
    assert cap_per_group(docs, 1000).count() == 90


# ---------------------------------------------------------------------------
# flat CaseWhen (regression: nested when-chains explode TreeNode.toJSON)


def test_match_case_semantics(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), ("zz",)], ["g"]
    ).select("g", match_case(F.col("g"), {"a": 1.0, "b": 2.5}, 0.0).alias("w"))
    got = {r.g: r.w for r in df.collect()}
    assert got == {"a": 1.0, "b": 2.5, "zz": 0.0}
    df2 = spark.createDataFrame([("q",)], ["g"]).select(
        match_case(F.col("g"), {}, None).alias("w")
    )
    assert df2.collect()[0].w is None


def test_wide_weight_chain_plan_json_stays_linear(spark):
    """20+ group weights used to nest CaseWhen 20 deep, and Spark's
    TreeNode.toJSON is exponential in that depth (OOMed the 16 GiB
    driver in the plan-walk CI gate).  Guard: the optimized-plan JSON
    of a 40-group upsample stays linear-sized (measured ~1.1 MB — the
    nested form at depth 40 would be ~2^35 MB) AND parses."""
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 40).cast("string")).alias(
            "source"
        ),
    )
    weights = {f"src{i}": 0.5 + (i % 5) * 0.5 for i in range(40)}
    up = upsample_by_group(docs, weights=weights, default_weight=0.0)
    j = up._jdf.queryExecution().optimizedPlan().toJSON()
    assert len(j) < 4_000_000
    json.loads(j)


# ---------------------------------------------------------------------------
# HyperLogLog registers (distinct-count mergeable state)


def test_hll_merge_equals_single_build_and_estimate_accuracy(spark):
    from curw_wrf_data_pusher_spark.operators.sketch import (
        hll_build,
        hll_estimate,
        hll_merge,
    )

    n_true = 700
    items = spark.range(3000).select(
        F.concat(F.lit("item"), (F.col("id") % n_true).cast("string")).alias(
            "item"
        )
    )
    full = hll_build(items, "item")
    a = hll_build(items.filter(F.col("item").substr(5, 9).cast("long") % 2 == 0), "item")
    b = hll_build(items.filter(F.col("item").substr(5, 9).cast("long") % 2 == 1), "item")
    merged = {
        (r.bucket, r.max_rank) for r in hll_merge(a, b).collect()
    }
    assert merged == {(r.bucket, r.max_rank) for r in full.collect()}
    est = hll_estimate(full)
    # m=64 → σ ≈ 13%; allow 3σ
    assert abs(est - n_true) / n_true < 0.4
    # duplicates never change the registers (set semantics)
    doubled = hll_build(items.unionAll(items), "item")
    assert {(r.bucket, r.max_rank) for r in doubled.collect()} == {
        (r.bucket, r.max_rank) for r in full.collect()
    }


def test_hll_build_is_bounded_one_shuffle(spark):
    from curw_wrf_data_pusher_spark.operators.sketch import hll_build

    items = spark.range(5000).select(F.col("id").cast("string").alias("item"))
    regs = hll_build(items, "item")
    assert regs.count() <= 64
    plan = regs._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "partial_max" in plan


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketch: merge algebra and set-operation
# estimates (the registered a23_kmv_distinct row pins sketch rows +
# estimates vs DuckDB; these pin the parts SQL can't see).


def test_kmv_merge_equals_sketch_of_union(spark):
    from curw_wrf_data_pusher_spark.operators.sketch import (
        kmv_merge,
        kmv_sketch,
    )

    a = spark.createDataFrame(
        [("g", i) for i in range(200)], "grp string, v long"
    )
    b = spark.createDataFrame(
        [("g", i) for i in range(100, 350)], "grp string, v long"
    )
    sa = kmv_sketch(a, ["grp"], "v", k=16)
    sb = kmv_sketch(b, ["grp"], "v", k=16)
    merged = {(r.grp, r.rank, r.h) for r in
              kmv_merge(sa, sb, ["grp"], k=16).collect()}
    direct = {(r.grp, r.rank, r.h) for r in
              kmv_sketch(a.unionByName(b), ["grp"], "v", k=16).collect()}
    assert merged == direct
    # idempotent: merging a sketch with itself is the sketch
    self_m = {(r.grp, r.rank, r.h) for r in
              kmv_merge(sa, sa, ["grp"], k=16).collect()}
    assert self_m == {(r.grp, r.rank, r.h) for r in sa.collect()}


def test_kmv_estimate_exact_below_k_and_close_above(spark):
    from curw_wrf_data_pusher_spark.operators.sketch import (
        kmv_estimate,
        kmv_sketch,
    )

    df = spark.createDataFrame(
        [("small", i) for i in range(10)]
        + [("big", i) for i in range(5000)],
        "grp string, v long",
    )
    sk = kmv_sketch(df, ["grp"], "v", k=64)
    est = {r.grp: r.est_distinct
           for r in kmv_estimate(sk, ["grp"], k=64).collect()}
    assert est["small"] == 10.0          # below k: sketch IS the set
    assert abs(est["big"] / 5000 - 1) < 0.30   # stderr ~ 1/sqrt(k)


def test_kmv_jaccard_estimates_overlap(spark):
    from curw_wrf_data_pusher_spark.operators.sketch import (
        kmv_jaccard,
        kmv_sketch,
    )

    # |A| = |B| = 600, |A∩B| = 300 → J = 300 / 900 = 1/3
    a = spark.createDataFrame(
        [("g", i) for i in range(600)], "grp string, v long"
    )
    b = spark.createDataFrame(
        [("g", i) for i in range(300, 900)], "grp string, v long"
    )
    sa = kmv_sketch(a, ["grp"], "v", k=64)
    sb = kmv_sketch(b, ["grp"], "v", k=64)
    j = kmv_jaccard(sa, sb, ["grp"], k=64).collect()[0].est_jaccard
    assert abs(j - 1 / 3) < 0.15
    # exact when both sides fit in k
    sa2 = kmv_sketch(a.filter("v < 40"), ["grp"], "v", k=64)
    sb2 = kmv_sketch(b.filter("v < 340"), ["grp"], "v", k=64)
    # A' = 0..39, B' = 300..339 → disjoint
    j2 = kmv_jaccard(sa2, sb2, ["grp"], k=64).collect()[0].est_jaccard
    assert j2 == 0.0


# ---------------------------------------------------------------------------
# fixed-grid quantile sketch (the quantile member of the mergeable
# family; a24_quantile_sketch pins the state + estimates vs DuckDB)


def test_quantile_sketch_merge_law_and_error_bound(spark):
    from curw_wrf_data_pusher_spark.operators.sketch import (
        quantile_sketch,
        quantile_sketch_estimate,
        quantile_sketch_merge,
    )

    LO, HI, BINS = 0.0, 100.0, 50  # bin width 2
    a = spark.createDataFrame(
        [("g", float(i % 100)) for i in range(1000)], "grp string, v double"
    )
    b = spark.createDataFrame(
        [("g", float((i * 7) % 100)) for i in range(500)],
        "grp string, v double",
    )
    sa = quantile_sketch(a, ["grp"], "v", LO, HI, BINS)
    sb = quantile_sketch(b, ["grp"], "v", LO, HI, BINS)
    merged = {(r.bin, r.n) for r in
              quantile_sketch_merge(sa, sb, ["grp"]).collect()}
    direct = {(r.bin, r.n) for r in
              quantile_sketch(a.unionByName(b), ["grp"], "v",
                              LO, HI, BINS).collect()}
    assert merged == direct  # merge ≡ sketch of the union, exactly

    # error bound: estimate within one bin width of the true quantile
    import numpy as np

    vals = np.array([r.v for r in a.unionByName(b).collect()])
    sk = quantile_sketch(a.unionByName(b), ["grp"], "v", LO, HI, BINS)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = quantile_sketch_estimate(
            sk, ["grp"], q, LO, HI, BINS
        ).collect()[0].q_est
        true = np.quantile(vals, q)
        assert abs(est - true) <= 2.0 + 1e-9, (q, est, true)

    # out-of-domain values land in edge bins, never dropped
    c = spark.createDataFrame(
        [("g", -50.0), ("g", 500.0)], "grp string, v double"
    )
    sc = quantile_sketch(c, ["grp"], "v", LO, HI, BINS)
    rows = {r.bin: r.n for r in sc.collect()}
    assert rows == {0: 1, BINS - 1: 1}


def test_sliding_distinct_kmv_accuracy_bounds(spark):
    """Judge r9 task 5: the KMV sliding-distinct estimate vs the exact
    trailing-window distinct count, pinned: EXACT whenever the true
    count is below k (the sketch then IS the set), and within 25%
    relative error at k=64 on a high-cardinality synthetic (theory:
    ~1/sqrt(k-2) ≈ 13% expected)."""
    import numpy as np
    import pandas as pd

    from curw_wrf_data_pusher_spark.operators.sketch import (
        sliding_distinct_kmv,
    )

    rng = np.random.RandomState(7)
    # 6 hourly buckets: low-cardinality head (exact path), then
    # thousands of distinct values (estimator path)
    rows = []
    base = pd.Timestamp("2024-06-01 00:00:00")
    per_bucket = [20, 30, 800, 900, 1000, 1200]
    uid = 0
    for i, n in enumerate(per_bucket):
        for _ in range(n):
            uid += 1
            rows.append((base + pd.Timedelta(hours=i, seconds=int(
                rng.randint(0, 3600))), f"u{uid}"))
    pdf = pd.DataFrame(rows, columns=["ts", "visitor"])
    df = spark.createDataFrame(pdf)

    got = {
        r["bucket_t"]: r["est_distinct"]
        for r in sliding_distinct_kmv(
            df, "ts", "visitor", window_seconds=3 * 3600,
            bucket_seconds=3600, k=64,
        ).collect()
    }
    # exact trailing-3h distinct per bucket (all visitors unique →
    # sum of the window's bucket sizes)
    for i in range(len(per_bucket)):
        lo = max(0, i - 2)
        exact = sum(per_bucket[lo:i + 1])
        t = (base + pd.Timedelta(hours=i)).strftime("%Y-%m-%d %H:%M:%S")
        est = got[t]
        if exact < 64:
            assert est == exact, (t, est, exact)
        else:
            assert abs(est - exact) / exact <= 0.25, (t, est, exact)
