"""Space-filling-curve data layout: Morton (Z-order) keys and
Z-clustered parquet writes for multidimensional pruning.

Why this matters at 100 TB: a parquet scan prunes row groups with
column min/max statistics.  Sorting by ONE column makes only that
column's stats tight; a bbox query over (lon, lat) — the reference's
Kelani-basin extract (``gen_rfields.py``, P2/P3) — then still reads
every file.  Interleaving the bits of the quantized coordinates into a
single Morton key and RANGE-partitioning + sorting by it keeps each
file to a small spatial tile, so BOTH dimensions' min/max stats become
tight and the ordinary pushed-down bbox predicate skips most row
groups at the reader — the same device Delta OPTIMIZE ZORDER BY and
Iceberg's sort orders use, done with stock Spark primitives.

Plan shape: key computation is map-side integer bit arithmetic (pure
Catalyst, whole-stage codegen); the clustering write is ONE
repartitionByRange shuffle (range boundaries from Spark's reservoir
sample) + a partition-local sort.  No UDFs, no driver geometry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(qx: Column, qy: Column, bits: int = 16) -> Column:
    """Interleave two ``bits``-wide non-negative integer cell
    coordinates into the 2·bits-wide Morton key (x in even bit
    positions, y in odd).  Pure integer ops — exact and
    engine-portable; 2·bits ≤ 62 keeps everything in a signed 64-bit
    key."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(qx, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(qy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    z = terms[0]
    for t in terms[1:]:
        z = z.bitwiseOR(t)
    return z


def morton_deinterleave_sql(zcol: str, bits: int = 16) -> tuple[str, str]:
    """SQL expression strings recovering (qx, qy) from a Morton key —
    the inverse of ``morton_interleave``, for tests and for mapping a
    query bbox back onto key ranges."""
    xs = " | ".join(
        f"(((`{zcol}` >> {2 * i}) & 1) << {i})" for i in range(bits)
    )
    ys = " | ".join(
        f"(((`{zcol}` >> {2 * i + 1}) & 1) << {i})" for i in range(bits)
    )
    return xs, ys


def quantize(
    col: Column, vmin: float, vmax: float, bits: int = 16
) -> Column:
    """Map a double in [vmin, vmax] onto the [0, 2^bits) integer cell
    grid (clamped; out-of-range values land on the boundary cells).

    Note: double quantization near cell boundaries is subject to the
    usual last-ulp concerns — fine for LAYOUT (a point landing one
    cell over changes nothing about correctness, only marginally about
    clustering), but derive cells from exact integer/decimal sources
    when a cross-engine hash must pin them (see p13_morton_zorder)."""
    n = (1 << bits) - 1
    scaled = (col - F.lit(float(vmin))) / F.lit(float(vmax - vmin)) * F.lit(
        float(n)
    )
    return F.least(
        F.lit(n).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.floor(scaled).cast("long")),
    )


def zorder_keys(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bits: int = 16,
    key_col: str = "zkey",
) -> DataFrame:
    """Append the Morton key of the quantized (x, y) columns."""
    qx = quantize(F.col(x_col), *x_range, bits=bits)
    qy = quantize(F.col(y_col), *y_range, bits=bits)
    return df.withColumn(key_col, morton_interleave(qx, qy, bits=bits))


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bits: int = 16,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered along the Z-curve: range-
    partition on the Morton key into ``n_files`` tasks and sort each
    partition by it, so every output file covers a compact key range
    (= a small spatial tile) and carries tight min/max stats on BOTH
    coordinate columns.  The key itself is not written — readers just
    use ordinary bbox predicates and let stats pruning work."""
    keyed = zorder_keys(
        df, x_col, y_col, x_range, y_range, bits=bits, key_col="__zkey"
    )
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )
