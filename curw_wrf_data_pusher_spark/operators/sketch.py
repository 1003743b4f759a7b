"""Count-min sketch: bounded-memory frequency estimation
(Cormode & Muthukrishnan, J. Algorithms '05).

Complements the frequent-items summary in ``operators/heavy.py``:
Misra-Gries answers "which items are heavy", the count-min sketch
answers "how often does THIS item occur" for arbitrary queried items,
in depth×width cells regardless of stream cardinality.  Guarantees:
estimates never undercount (est ≥ true), and with width w and depth d
the overcount is ≤ e·N/w with probability ≥ 1 − e^{−d}.

Engine-portable by construction: the d row hashes are
``('0x' + md5(i ':' item)[:8]) mod width`` — the same md5-derived
integers the MinHash/SimHash family uses (dedup.py:_shingle_int), so a
DuckDB oracle reproduces every cell bit-for-bit; no RNG, no
partition-order dependence.

Plan shape / 100 TB: the build is ONE map-side explode (d cells per
row) + ONE hash aggregation whose result is AT MOST depth×width rows —
map-side partial aggregation compresses each task's contribution to
≤ d·w cells before the shuffle, so shuffle volume is O(tasks·d·w), not
O(N).  Sketches over different corpora/partitions MERGE by summing
cnt per (row, col) cell — the linearity that makes this the right
shape for incremental / streaming frequency state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_col(item: F.Column, i: int, width: int) -> F.Column:
    """Cell column for hash row i: md5-derived 32-bit int mod width."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(i)), item)), 1, 8),
        16,
        10,
    ).cast("long")
    return h % F.lit(width)


def countmin_build(
    df: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch over a column WITH multiplicity: one stream
    occurrence per input row.  Returns the sparse cell table
    (row int, col long, cnt long), ≤ depth×width rows."""
    item = F.col(col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("r"),
                _cms_col(item, i, width).alias("c"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("cell"))
        .groupBy(
            F.col("cell.r").alias("row"), F.col("cell.c").alias("col")
        )
        .agg(F.count("*").alias("cnt"))
    )


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): sum counts
    per cell.  Linearity of the sketch — union then one ≤ d·w-row
    aggregation."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def countmin_lookup(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query estimates for ``items[col]``: min over the d row
    cells, absent cells counting 0.  Returns the input columns plus
    ``cms_est``.

    Scale: the probe side explodes to d rows per item and left-joins
    the ≤ d·w-cell sketch — broadcast by AQE at any realistic width, so
    the lookup is map-side."""
    item = F.col(col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("r"),
                _cms_col(item, i, width).alias("c"),
            )
            for i in range(depth)
        ]
    )
    probes = items.select("*", F.explode(cells).alias("cell")).select(
        "*", F.col("cell.r").alias("row"), F.col("cell.c").alias("col")
    ).drop("cell")
    joined = probes.join(F.broadcast(sketch), ["row", "col"], "left")
    return (
        joined.groupBy(*items.columns)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(
                "cms_est"
            )
        )
    )


HLL_BUCKETS = 64


def hll_build(
    df: DataFrame, col: str, m: int = HLL_BUCKETS
) -> DataFrame:
    """HyperLogLog registers over a column: (bucket, max_rank), ≤ m
    rows — the distinct-count companion to the count-min frequency
    sketch (Flajolet et al. '07).  Spark's builtin
    ``approx_count_distinct`` answers one-shot queries (a10); THIS
    form exposes the MERGEABLE STATE: registers from different
    corpora/batches/streams combine by per-bucket max, so distinct
    counts compose across stores and time like the rollup partials do
    for sums.

    Engine-portable and float-free by construction: bucket = h mod m,
    and the rank is the first-set-bit position of h div m computed
    with pure integer bit operations (no log2) — a DuckDB oracle
    rebuilds every register bit-for-bit.  Plan: map-side hash + ONE
    grouped max over ≤ m keys (map-side combine caps shuffle volume at
    tasks·m rows)."""
    if m & (m - 1):
        raise ValueError("m must be a power of two")
    shift = m.bit_length() - 1
    item = F.col(col).cast("string")
    h = F.conv(F.substring(F.md5(item), 1, 8), 16, 10).cast("long")
    bucket = h % F.lit(m)
    # integer shift, NOT h/m: DuckDB CASTs doubles to BIGINT by
    # ROUNDING while Spark truncates — bit ops sidestep the class
    w = F.shiftright(h, shift)
    n_bits = 32 - shift
    # rank = 1-based position of the lowest set bit of w; all-zero w
    # (probability 2^-n_bits) takes the max rank n_bits + 1
    first_set = F.expr(
        f"array_position(transform(sequence(0, {n_bits - 1}),"
        f" i -> shiftright({'__w'}, i) & 1), 1)"
    )
    ranked = df.select(
        bucket.alias("bucket"), w.alias("__w")
    ).select(
        "bucket",
        F.when(first_set > 0, first_set)
        .otherwise(F.lit(n_bits + 1))
        .cast("int")
        .alias("rank"),
    )
    return ranked.groupBy("bucket").agg(F.max("rank").alias("max_rank"))


def hll_merge(*registers: DataFrame) -> DataFrame:
    """Merge register tables built with the same m: per-bucket max."""
    merged = registers[0]
    for r in registers[1:]:
        merged = merged.unionByName(r)
    return merged.groupBy("bucket").agg(
        F.max("max_rank").alias("max_rank")
    )


def hll_estimate(registers: DataFrame, m: int = HLL_BUCKETS) -> float:
    """Distinct-count estimate from the registers (driver-side scalar:
    the registers are ≤ m rows — bounded metadata).  Standard HLL
    harmonic mean with the small-range linear-counting correction;
    expected relative error ≈ 1.04/√m."""
    import math

    regs = {r.bucket: r.max_rank for r in registers.collect()}
    alpha = 0.709 if m == 64 else 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -regs.get(b, 0) for b in range(m))
    est = alpha * m * m / s
    zeros = m - len(regs)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est
