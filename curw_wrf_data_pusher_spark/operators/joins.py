"""Join-shaped operators — get-or-create dims and spatial NN mapping
(SURVEY §2.3 J4/J5, §2.5 W3).

J5 get-or-create: the reference looks up station/source/tms ids and
INSERTs on miss, row by row over MySQL (wrf_data_pusher.py:222-260).
Cluster-safe Spark form: left-anti join incoming keys against the dim,
assign new ids deterministically, union — an idempotent MERGE.

J4/W3 spatial nearest-neighbour: the reference consumes a precomputed
obs→d03 grid mapping (gen_active_stations_rfields.py:141-154).  The
engine can *produce* that mapping: bounded cross join + row_number over
distance.  At scale, the small side (obs stations, ~10²-10⁴ rows) is
broadcast so the cross join never shuffles the big grid side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def get_or_create(
    dim: DataFrame,
    incoming_keys: DataFrame,
    key_cols: Sequence[str],
    id_col: str = "id",
    id_offset: int | None = None,
) -> DataFrame:
    """Idempotent dim MERGE: rows of ``incoming_keys`` missing from
    ``dim`` get appended with new dense ids above the current max.

    New ids are assigned with row_number over a deterministic key order,
    offset by max(existing id) — one tiny agg + one window over only the
    *missing* keys (usually ≈0 rows), so the big side never shuffles.
    """
    missing = incoming_keys.select(*key_cols).dropDuplicates(list(key_cols)).join(
        dim.select(*key_cols), on=list(key_cols), how="left_anti"
    )
    if id_offset is None:
        base = dim.agg(F.coalesce(F.max(id_col), F.lit(0)).alias("m"))
        missing = missing.crossJoin(F.broadcast(base))
    else:
        missing = missing.withColumn("m", F.lit(id_offset))
    w = Window.orderBy(*key_cols)
    created = missing.withColumn(
        id_col, (F.col("m") + F.row_number().over(w)).cast("long")
    ).drop("m")
    return dim.select(id_col, *key_cols).unionByName(
        created.select(id_col, *key_cols)
    )


def nearest_neighbor_map(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    distance: Column,
    k: int = 1,
    partition_cols: Sequence[str] | None = None,
    tie_break: Sequence[str] | None = None,
) -> DataFrame:
    """Top-k nearest ``right`` rows per ``left`` row.

    ``partition_cols`` (e.g. a shared coarse spatial cell or nation key)
    bounds the cross join; ``right`` is broadcast when small.  Output:
    (left_key, right_key, rank, dist).
    """
    on = list(partition_cols) if partition_cols else None
    joined = (
        left.join(F.broadcast(right), on=on, how="inner")
        if on
        else left.crossJoin(F.broadcast(right))
    )
    order = [distance.asc(), *[F.col(c).asc() for c in (tie_break or [right_key])]]
    w = Window.partitionBy(left_key).orderBy(*order)
    return (
        joined.withColumn("dist", distance)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(left_key, right_key, "rank", "dist")
    )
