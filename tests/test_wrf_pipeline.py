"""E1 golden test vs the independent pandas oracle + property tests
(SURVEY §5): diff∘cumsum identity, upsert idempotence, get-or-create
stability."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.operators.diff import adjacent_diff
from curw_wrf_data_pusher_spark.operators.joins import get_or_create
from curw_wrf_data_pusher_spark.plans.config import WrfConfig
from curw_wrf_data_pusher_spark.plans.wrf_push import push_wrf_grid
from curw_wrf_data_pusher_spark.sinks.upsert import upsert_parquet

from .wrf_fixture import EPOCH_STR, FGT_UTC, SYSTEMS, make_grid_pdf, oracle_push_rows

CFG = WrfConfig.from_dict(
    {
        "model": "WRF", "version": "v4", "wrf_type": "dwrf",
        "gfs_run": "d0", "gfs_data_hour": "18",
        "wrf_systems": "A,C", "unit": "mm",
        "unit_type": "Accumulative", "variable": "Precipitation",
        "sim_tag": "evening_18:00",
    }
)


@pytest.fixture(scope="module")
def grid(spark):
    pdf = make_grid_pdf()
    sdf = spark.createDataFrame(pdf)
    return (
        sdf.withColumn("source_file", F.lit("fixture.nc"))
        .withColumn("fgt_utc", F.lit(FGT_UTC).cast("timestamp"))
        .withColumn("epoch_str", F.lit(EPOCH_STR))
    )


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    return (
        pdf[cols].sort_values(cols).reset_index(drop=True)
    )


def test_e1_fact_rows_match_pandas_oracle(spark, grid):
    fact, _ = push_wrf_grid(grid, CFG)
    got = _canon(fact.toPandas())
    want = _canon(
        oracle_push_rows(
            make_grid_pdf(), CFG.effective_sim_tag, CFG.model,
            CFG.version, CFG.variable, CFG.unit, CFG.unit_type,
        )
    )
    assert len(got) == len(want) == 2 * 12 * 6 * 5
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_e1_run_metadata(spark, grid):
    _, runs = push_wrf_grid(grid, CFG)
    rpdf = runs.toPandas()
    assert len(rpdf) == 2 * 6 * 5  # one run per (system, cell)
    assert set(rpdf["source"]) == {f"WRF_{s}" for s in SYSTEMS}
    assert (rpdf["sim_tag"] == "evening_18:00").all()
    assert rpdf["tms_id"].is_unique
    # fgt = file mtime + 5:30, minute-truncated
    assert (rpdf["fgt"] == "2024-06-02 08:47:00").all()


def test_diff_cumsum_identity(spark):
    # A1 inverse property: diff of a running sum recovers the increments
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 50 + ["b"] * 50,
            "t": list(range(50)) * 2,
            "inc": [round(0.001 * i, 3) for i in range(100)],
        }
    )
    sdf = spark.createDataFrame(pdf)
    from pyspark.sql import Window

    cum = sdf.withColumn(
        "cum",
        F.sum("inc").over(
            Window.partitionBy("k").orderBy("t")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    back = adjacent_diff(
        cum, series_cols=["k"], order_col="t", value_col="cum",
        out_col="rec",
    ).withColumn("rec", F.round("rec", 3))
    bad = back.filter(F.abs(F.col("rec") - F.col("inc")) > 1e-9).count()
    assert bad == 0
    assert back.count() == 98  # first row of each series consumed


def test_upsert_idempotent(spark, grid, tmp_path):
    fact, _ = push_wrf_grid(grid, CFG)
    store = str(tmp_path / "fcst_store")
    n1 = upsert_parquet(spark, fact, store, keys=["tms_id", "time"])
    n2 = upsert_parquet(spark, fact, store, keys=["tms_id", "time"])
    assert n1 == n2 == fact.count()
    # re-push with a newer fgt: same rows, fgt advances (reference
    # semantics: whole file re-pushed ⇒ upsert with new fgt)
    fact2 = fact.withColumn("fgt", F.lit("2024-06-03 08:47:00"))
    n3 = upsert_parquet(spark, fact2, store, keys=["tms_id", "time"])
    assert n3 == n1
    fgts = (
        spark.read.parquet(store).select("fgt").distinct().toPandas()["fgt"]
    )
    assert list(fgts) == ["2024-06-03 08:47:00"]


def test_get_or_create_idempotent_and_dense(spark):
    dim = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, k string"
    )
    incoming = spark.createDataFrame(
        [("b",), ("c",), ("d",), ("c",)], "k string"
    )
    out1 = get_or_create(dim, incoming, key_cols=["k"], id_col="id")
    pdf = out1.toPandas().sort_values("k").reset_index(drop=True)
    assert list(pdf["k"]) == ["a", "b", "c", "d"]
    # new ids are dense above max(id) in (md5-bucket, key) order — the
    # salted two-phase assigner's deterministic total order
    import hashlib

    def bucket(k: str) -> int:
        return int(hashlib.md5(k.encode()).hexdigest()[:8], 16) % 64

    new = sorted(["c", "d"], key=lambda k: (bucket(k), k))
    want = {"a": 1, "b": 2, new[0]: 3, new[1]: 4}
    assert {r.k: r.id for _, r in pdf.iterrows()} == want
    # idempotent: re-merging the same keys changes nothing
    out2 = get_or_create(out1, incoming, key_cols=["k"], id_col="id")
    assert _canon(out2.toPandas()).equals(_canon(pdf))


def test_get_or_create_fact_scale_load_avoids_global_sort(spark):
    """Scale gate for the salted two-phase id assigner: on a large
    first load, the data-scale row_number must be BUCKET-partitioned;
    the only partition-less Window allowed in the plan is the bucket-
    offset cumulation whose input is the <= n_buckets-row count frame
    (bounded metadata, never data)."""
    import json

    dim = spark.createDataFrame([], "id long, k string")
    incoming = spark.range(0, 100_000).select(
        F.concat(F.lit("key_"), F.col("id").cast("string")).alias("k")
    )
    out = get_or_create(dim, incoming, key_cols=["k"], id_col="id")
    nodes = json.loads(
        out._jdf.queryExecution().optimizedPlan().toJSON()
    )
    windows = [
        n for n in nodes if n.get("class", "").endswith(".Window")
    ]
    global_w = [n for n in windows if not n.get("partitionSpec")]
    partitioned_w = [n for n in windows if n.get("partitionSpec")]
    # exactly one global window (the bounded offset cumulation) and at
    # least one bucket-partitioned window (the data-scale rank)
    assert len(global_w) == 1
    assert len(partitioned_w) >= 1
    # the ids are still a dense 1..N permutation
    got = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
        F.countDistinct("id").alias("d"),
    ).collect()[0]
    assert (got.n, got.lo, got.hi, got.d) == (100_000, 1, 100_000, 100_000)


def test_get_or_create_ids_invariant_to_input_order(spark):
    """The salted two-phase assigner's ids must depend only on the KEY
    SET, not on input row order or partitioning — the property that
    makes concurrent loaders and replays deterministic."""
    keys = [f"k{i:03d}" for i in range(57)]
    dim = spark.createDataFrame([(10, "seed")], "id long, k string")
    fwd = spark.createDataFrame([(k,) for k in keys], "k string")
    rev = spark.createDataFrame(
        [(k,) for k in reversed(keys)], "k string"
    ).repartition(7)
    out_f = {r.k: r.id for r in
             get_or_create(dim, fwd, key_cols=["k"], id_col="id").collect()}
    out_r = {r.k: r.id for r in
             get_or_create(dim, rev, key_cols=["k"], id_col="id").collect()}
    assert out_f == out_r
    new_ids = sorted(v for k, v in out_f.items() if k != "seed")
    assert new_ids == list(range(11, 11 + len(keys)))  # dense above max
