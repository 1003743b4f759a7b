"""Z-order layout: interleave correctness, roundtrip, and the actual
row-group-pruning payoff measured from real parquet file statistics."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.operators.layout import (
    morton_deinterleave_sql,
    morton_interleave,
    quantize,
    zorder_keys,
    zorder_write,
)


def _ref_morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_reference_bits(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 1023) for y in (0, 2, 7, 512)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.withColumn(
        "z", morton_interleave(F.col("x"), F.col("y"), bits=10)
    ).collect()
    for r in out:
        assert r.z == _ref_morton(r.x, r.y, 10), (r.x, r.y)


def test_deinterleave_roundtrip(spark):
    rows = [(x, (x * 37) % 1024) for x in range(0, 1024, 13)]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", morton_interleave(F.col("x"), F.col("y"), bits=10)
    )
    xs, ys = morton_deinterleave_sql("z", bits=10)
    back = df.selectExpr("x", "y", f"({xs}) AS rx", f"({ys}) AS ry")
    assert back.filter("rx != x OR ry != y").count() == 0


def test_quantize_clamps_and_grids(spark):
    df = spark.createDataFrame(
        [(-1.0,), (0.0,), (0.5,), (1.0,), (2.0,)], "v double"
    )
    got = [
        r.q
        for r in df.select(
            quantize(F.col("v"), 0.0, 1.0, bits=8).alias("q")
        ).collect()
    ]
    assert got == [0, 0, 127, 255, 255]


def test_morton_bits_bounds():
    with pytest.raises(ValueError):
        morton_interleave(F.lit(1), F.lit(1), bits=0)
    with pytest.raises(ValueError):
        morton_interleave(F.lit(1), F.lit(1), bits=32)


def _files_intersecting(path: str, box: dict[str, tuple[float, float]]) -> int:
    """Count parquet files whose column min/max stats intersect the box
    — exactly the skipping decision a stats-pruning reader makes."""
    n = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        mins: dict[str, float] = {}
        maxs: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            for ci, name in enumerate(schema_names):
                st = md.row_group(rg).column(ci).statistics
                if st is None or name not in box:
                    continue
                mins[name] = min(mins.get(name, st.min), st.min)
                maxs[name] = max(maxs.get(name, st.max), st.max)
        hit = all(
            mins[c] <= hi and maxs[c] >= lo
            for c, (lo, hi) in box.items()
        )
        n += hit
    return n


def test_zorder_layout_prunes_bbox_files(spark, tmp_path):
    # deterministic pseudo-random points in [0,1)^2
    pts = spark.range(50_000).select(
        (F.conv(F.substring(F.md5(F.concat(F.lit("x"), F.col("id"))), 1, 8),
                16, 10).cast("double") / F.lit(float(2**32))).alias("x"),
        (F.conv(F.substring(F.md5(F.concat(F.lit("y"), F.col("id"))), 1, 8),
                16, 10).cast("double") / F.lit(float(2**32))).alias("y"),
    )
    flat = str(tmp_path / "flat")
    zord = str(tmp_path / "zord")
    pts.repartition(16).write.parquet(flat)
    zorder_write(pts, zord, "x", "y", (0.0, 1.0), (0.0, 1.0),
                 bits=12, n_files=16)
    box = {"x": (0.40, 0.45), "y": (0.40, 0.45)}
    n_flat = _files_intersecting(flat, box)
    n_z = _files_intersecting(zord, box)
    # random layout: every file spans ~[0,1]^2 → all files intersect;
    # z-clustered: the 0.05^2 box touches a handful of tiles
    assert n_flat >= 15
    assert n_z <= n_flat // 3, (n_z, n_flat)
    # the data survives the reroute intact
    assert spark.read.parquet(zord).count() == 50_000


def test_zorder_keys_single_shuffle_plan(spark):
    pts = spark.range(1000).select(
        (F.col("id") % 97 / 97.0).alias("x"),
        (F.col("id") % 89 / 89.0).alias("y"),
    )
    keyed = zorder_keys(pts, "x", "y", (0.0, 1.0), (0.0, 1.0), bits=10)
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # key computation is map-side only
