"""Ordered rain-field file emission (SURVEY §2.9 K4/K5/K6; §4 custom
work #3).

Reference contract (gen_rfields.py:186-208): one values file per
timestep plus a single ``xy.csv`` coordinate manifest, with EVERY file
sharing the exact row order (sorted by longitude, latitude) so line N
of any values file corresponds to line N of xy.csv.

Spark shape: ``repartition(time)`` + ``sortWithinPartitions`` +
``partitionBy(time)`` write — each timestep lands in exactly one file
(hash partitioning puts each key in one task; partitionBy splits that
task's output per key), rows ordered inside.  The driver then renames
part-files to the reference naming.  This scales to any number of
timesteps; only the per-timestep grid (16k rows for d03) must fit a
task, which it does by orders of magnitude.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_ordered_csv(
    df: DataFrame,
    dest: str,
    order_cols: list[str],
    header: bool = True,
) -> None:
    """K5/K6: single CSV with a total row order → one-partition ordered
    write, then rename the part file to ``dest``."""
    tmp = dest + ".spark-tmp"
    (
        df.coalesce(1)
        .sortWithinPartitions(*order_cols)
        .write.mode("overwrite")
        .option("header", str(header).lower())
        .csv(tmp)
    )
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    shutil.move(part, dest)
    shutil.rmtree(tmp)


def write_rfield_files(
    df: DataFrame,
    out_dir: str,
    group_cols: list[str] | None = None,
    value_col: str = "value",
    lon_col: str = "longitude",
    lat_col: str = "latitude",
    file_prefix: str = "rfield",
) -> list[str]:
    """K4+K5: one value file per group (default: per timestep; pass
    ['wrf_system', 'time'] for the reference's per-system outputs) +
    xy.csv, byte-stable order.

    Returns the list of written value-file paths.  File naming follows
    the reference's ``{prefix}_{group}.txt`` with ':'/' ' made
    filesystem-safe (gen_rfields.py:204)."""
    group_cols = group_cols or ["time"]
    os.makedirs(out_dir, exist_ok=True)

    # xy.csv once per run — the coordinate manifest (gen_rfields.py:196-202)
    xy = df.select(lon_col, lat_col).dropDuplicates([lon_col, lat_col])
    write_ordered_csv(
        xy, os.path.join(out_dir, "xy.csv"), [lon_col, lat_col], header=True
    )

    tmp = os.path.join(out_dir, ".values-tmp")
    key = F.concat_ws("_", *[F.col(c).cast("string") for c in group_cols])
    (
        df.withColumn("__t", F.regexp_replace(key, "[: ]", "_"))
        .repartition("__t")
        .sortWithinPartitions("__t", lon_col, lat_col)
        .select("__t", F.col(value_col))
        .write.mode("overwrite")
        .partitionBy("__t")
        .csv(tmp)
    )
    written = []
    for d in sorted(glob.glob(os.path.join(tmp, "__t=*"))):
        t_val = d.split("__t=")[-1]
        parts = sorted(glob.glob(os.path.join(d, "part-*.csv")))
        target = os.path.join(out_dir, f"{file_prefix}_{t_val}.txt")
        with open(target, "w") as out:
            for p in parts:
                with open(p) as f:
                    shutil.copyfileobj(f, out)
        written.append(target)
    shutil.rmtree(tmp)
    return written
