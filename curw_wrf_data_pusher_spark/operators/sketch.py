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

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
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
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch over a column WITH multiplicity: one stream
    occurrence per input row.  Returns the sparse cell table
    (row int, col long, cnt long), ≤ depth×width rows.

    ``weight_col``: treat each row as that many stream occurrences
    (the standard weighted CMS update — the sketch is linear, so
    building from a pre-aggregated (item, count) frame is cell-for-
    cell identical to hashing every occurrence).  A caller that
    already counts items (e.g. for an exact top-k alongside the
    sketch) should pass its count frame here: the depth md5s are then
    computed once per DISTINCT item instead of once per occurrence."""
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
    weight = (
        [F.col(weight_col).alias("__w")] if weight_col is not None else []
    )
    agg = (
        F.sum("__w").cast("long")
        if weight_col is not None
        else F.count("*")
    )
    return (
        df.select(F.explode(cells).alias("cell"), *weight)
        .groupBy(
            F.col("cell.r").alias("row"), F.col("cell.c").alias("col")
        )
        .agg(agg.alias("cnt"))
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
    df: DataFrame,
    col: str,
    m: int = HLL_BUCKETS,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """HyperLogLog registers over a column: (bucket, max_rank), ≤ m
    rows — the distinct-count companion to the count-min frequency
    sketch (Flajolet et al. '07).  Spark's builtin
    ``approx_count_distinct`` answers one-shot queries (a10); THIS
    form exposes the MERGEABLE STATE: registers from different
    corpora/batches/streams combine by per-bucket max, so distinct
    counts compose across stores and time like the rollup partials do
    for sums.  ``group_cols`` keeps one register set PER GROUP (≤ m
    rows each) — the state behind the incremental distinct-count
    rollup in ``operators/rollup.py``.

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
    gcols = list(group_cols)
    ranked = df.select(
        *gcols, bucket.alias("bucket"), w.alias("__w")
    ).select(
        *gcols,
        "bucket",
        F.when(first_set > 0, first_set)
        .otherwise(F.lit(n_bits + 1))
        .cast("int")
        .alias("rank"),
    )
    return ranked.groupBy(*gcols, "bucket").agg(
        F.max("rank").alias("max_rank")
    )


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


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — Bar-Yossef et al. 2002;
# Beyer et al., "On Synopses for Distinct-Value Estimation Under
# Multiset Operations", SIGMOD 2007.  The third mergeable
# distinct-count state next to HLL (registers) and exact distinct:
# keep the k smallest hash values per group; the k-th smallest,
# viewed as a fraction of the hash space, estimates density.  Unlike
# HLL the sketch supports SET OPERATIONS (union/intersection/Jaccard
# between groups) — the overlap tool for corpus shards.
#
# The hash is md5 (engine-portable), ordered as hex text (fixed-width
# lowercase hex orders identically to the integer value), so a SQL
# oracle reproduces the sketch ROWS bit-for-bit — the same
# determinism trick as the HLL register-level gate.
#
# Plan shape / 100 TB: one (group, hash) distinct shuffle, then a
# per-group window bounded to k output rows.  Merge = union + re-rank
# (associative/commutative/idempotent); estimates are driver-free
# column arithmetic.


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 32,
    n_salts: int = 32,
) -> DataFrame:
    """Per-group KMV sketch: the k smallest md5(value) over DISTINCT
    values, as (group…, rank, h) with rank 1..k in hash order.

    Two-phase top-k so no window ever ranks the full distinct set:
    phase 1 keeps each (group, salt)-subgroup's k smallest — the salt
    is carved from the hash itself, so the phase is deterministic and
    adds no shuffle key material — leaving ≤ n_salts·k rows per
    group; phase 2 ranks only those survivors.  A group with billions
    of distinct values therefore never feeds more than n_salts·k rows
    to its final rank — in particular the SINGLE-SET usage (a
    constant group column, as in set-overlap estimation) stays
    bounded where a direct rank would be a corpus-cardinality global
    window.  The result is identical to the direct rank: every
    group-wide k-smallest hash is also among its salt-subgroup's k
    smallest."""
    base = df.select(
        *group_cols,
        F.md5(F.col(value_col).cast("string")).alias("h"),
    ).distinct()
    salt = (
        F.conv(F.substring("h", 29, 4), 16, 10).cast("long")
        % F.lit(n_salts)
    ).alias("__salt")
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy("h")
    survivors = (
        base.select(*group_cols, "h", salt)
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
    )
    w2 = Window.partitionBy(*group_cols).orderBy("h")
    return (
        survivors.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select(*group_cols, "rank", "h")
    )


def kmv_merge(
    a: DataFrame, b: DataFrame, group_cols: Sequence[str], k: int = 32
) -> DataFrame:
    """Merge two KMV sketches (same schema): union of hash sets,
    re-ranked, k smallest kept — equals the sketch of the unioned
    input (idempotent, order-independent)."""
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        a.select(*group_cols, "h")
        .unionByName(b.select(*group_cols, "h"))
        .distinct()
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(*group_cols, "rank", "h")
    )


def _hash_frac(h: F.Column) -> F.Column:
    # first 48 bits of the hash as a fraction of the hash space —
    # enough resolution for the estimator, exact in a double
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("double") / F.lit(
        float(2 ** 48)
    )


def kmv_estimate(
    sketch: DataFrame, group_cols: Sequence[str], k: int = 32
) -> DataFrame:
    """Distinct-count estimates from a KMV sketch: exact group count
    when the group produced fewer than k hashes (the sketch IS the
    distinct set), else (k − 1) / frac(k-th smallest hash)."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").alias("__n"),
        F.max("h").alias("__hk"),  # rank-k == max of the kept k
    )
    est = F.when(
        F.col("__n") < k, F.col("__n").cast("double")
    ).otherwise(F.lit(float(k - 1)) / _hash_frac(F.col("__hk")))
    return agg.select(*group_cols, est.alias("est_distinct"))


def kmv_jaccard(
    a: DataFrame,
    b: DataFrame,
    group_cols: Sequence[str],
    k: int = 32,
) -> DataFrame:
    """Jaccard similarity estimate between two sketched sets per
    group key (Beyer et al. §4): take the k smallest hashes of the
    UNION, count how many are present in BOTH sketches — that
    fraction estimates |A∩B| / |A∪B|.  Exact when both sets had
    < k distinct values (sketches are then the full sets)."""
    w = Window.partitionBy(*group_cols).orderBy("h")
    ka = a.select(*group_cols, "h")
    kb = b.select(*group_cols, "h")
    union_k = (
        ka.unionByName(kb)
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    both = union_k.join(ka, [*group_cols, "h"], "left_semi").join(
        kb, [*group_cols, "h"], "left_semi"
    )
    denom = union_k.groupBy(*group_cols).agg(F.count("*").alias("__u"))
    num = both.groupBy(*group_cols).agg(F.count("*").alias("__i"))
    return denom.join(num, list(group_cols), "left").select(
        *group_cols,
        (
            F.coalesce(F.col("__i"), F.lit(0)).cast("double")
            / F.col("__u").cast("double")
        ).alias("est_jaccard"),
    )


# ---------------------------------------------------------------------------
# Fixed-grid quantile sketch — the quantile member of the mergeable-
# state family (CMS = frequencies, HLL/KMV = distinct counts, this =
# order statistics).  A bounded equi-width histogram over a declared
# [lo, hi) value domain: the state is ≤ n_bins (bin, count) rows per
# group, mergeable by bin-count SUM (associative/commutative — the
# same algebra as rollup partials), and any quantile is answered from
# the state alone by within-bin linear interpolation, with error
# bounded by one bin width.  The deliberate contrast with t-digest /
# KLL: those adapt bins to the data (tighter error, but the state is
# float-laden and merge order leaks into results); the fixed grid
# trades resolution for EXACT integer state that is bit-identical in
# any engine and any merge order — the property every other sketch in
# this module holds and the one that lets a SQL oracle verify the
# state itself.


def quantile_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Per-group quantile-sketch state: (group…, bin, n) where bin =
    clamp(floor((v − lo) / width)) into [0, n_bins − 1] — values at or
    beyond the declared domain land in the edge bins (counted, never
    dropped).  One map-side-combined shuffle; ≤ n_bins rows per
    group."""
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    b = F.least(
        F.greatest(
            F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"), F.lit(0)
        ),
        F.lit(n_bins - 1),
    )
    return (
        df.filter(v.isNotNull())
        .select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").alias("n"))
    )


def quantile_sketch_merge(
    a: DataFrame, b: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Merge two sketch states over the SAME grid: bin-count sums —
    equals the sketch of the concatenated input in any merge order."""
    return (
        a.select(*group_cols, "bin", "n")
        .unionByName(b.select(*group_cols, "bin", "n"))
        .groupBy(*group_cols, "bin")
        .agg(F.sum("n").alias("n"))
    )


def quantile_sketch_estimate(
    sketch: DataFrame,
    group_cols: Sequence[str],
    q: float,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Quantile estimate from the state alone: find the bin where the
    running count crosses q·total, interpolate linearly inside it.
    Exact integer rank arithmetic (ceil via integer identities, no
    float rank), then one fixed-form float expression — identical in
    any engine.  Error ≤ one bin width for in-domain values."""
    width = (hi - lo) / n_bins
    w = Window.partitionBy(*group_cols).orderBy("bin")
    tot = Window.partitionBy(*group_cols)
    ranked = sketch.withColumn("__cum", F.sum("n").over(w)).withColumn(
        "__tot", F.sum("n").over(tot)
    )
    # target rank: ceil(q * total), ≥ 1 — computed in exact integer
    # arithmetic when q is a terminating decimal (q = qn/qd)
    from fractions import Fraction

    fr = Fraction(q).limit_denominator(10**6)
    qn, qd = fr.numerator, fr.denominator
    # `div` is true integral division (Spark's `/` is always double):
    # floor((a + d - 1) / d) = ceil(a / d), exact at any magnitude
    rank = F.greatest(
        F.expr(f"(__tot * {qn} + {qd - 1}) div {qd}"),
        F.lit(1).cast("long"),
    )
    hit = ranked.filter(
        (F.col("__cum") >= rank)
        & ((F.col("__cum") - F.col("n")) < rank)
    )
    frac_in_bin = (
        (rank - (F.col("__cum") - F.col("n"))).cast("double")
        / F.col("n").cast("double")
    )
    est = (
        F.lit(lo)
        + (F.col("bin").cast("double") + frac_in_bin) * F.lit(width)
    )
    return hit.select(*group_cols, est.alias("q_est"))


def sliding_distinct_kmv(
    df: DataFrame,
    time_col: str,
    value_col,
    window_seconds: int,
    bucket_seconds: int,
    k: int = 64,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Sliding distinct-count ESTIMATE from mergeable per-bucket KMV
    sketches — the high-cardinality twin of the exact
    ``collect_set().over(rangeBetween)`` form (w16): that form
    materializes every row's full window set, so a window holding
    millions of distinct values holds millions of entries per output
    row.  Here cardinality never touches a window frame:

    1. per (group, bucket) KMV sketch — ≤ k rows per bucket no matter
       how many distinct values the bucket saw (``kmv_sketch``'s
       salted two-phase rank);
    2. each bucket sketch is exploded to the ``window/bucket`` target
       buckets it contributes to (a map-side constant-factor
       expansion), keeping only target buckets that exist in the
       data;
    3. per target bucket the contributing sketches merge by re-rank
       over ≤ (window/bucket)·k rows — bounded — and estimate via
       ``kmv_estimate`` (exact below k, (k−1)/frac(h_k) above).

    Contract: ``est_distinct`` for the trailing ``window_seconds``
    (inclusive of the current bucket) as of each ``bucket_seconds``
    bucket that has data.  Relative error ≈ 1/sqrt(k−2) (Beyer et
    al., "On Synopses for Distinct-Value Estimation Under Multiset
    Operations", SIGMOD'07); exact whenever the true distinct count
    is below k.  Accuracy is test-pinned in tests/test_sketch_snapshot.py."""
    if window_seconds % bucket_seconds != 0:
        raise ValueError("window_seconds must be a multiple of "
                         "bucket_seconds")
    gcols = list(group_cols)
    bucket = (
        (F.floor(F.unix_timestamp(F.col(time_col)) / bucket_seconds)
         * bucket_seconds).cast("long").alias("__b")
    )
    pts = df.select(*gcols, bucket, F.col(value_col).cast("string")
                    .alias("__v"))
    # localCheckpoint the BOUNDED sketch frame (≤ k rows per
    # populated bucket — metadata scale, the k12 pattern): both the
    # window-explode and the populated-bucket set below reuse it, and
    # without materialization Catalyst would duplicate the whole
    # scan + salted-rank pipeline into each branch (measured: 2
    # relation scans, 6 Window nodes → 1 scan, 3 Windows)
    per_bucket = kmv_sketch(
        pts, [*gcols, "__b"], "__v", k=k
    ).localCheckpoint()
    # contribute each bucket's sketch to every target window it falls
    # in: target t sees buckets in (t − window, t]
    contrib = per_bucket.withColumn(
        "__t",
        F.explode(
            F.sequence(
                F.col("__b"),
                F.col("__b") + F.lit(int(window_seconds - bucket_seconds)),
                F.lit(int(bucket_seconds)),
            )
        ),
    )
    # populated-bucket set from the ALREADY-BOUNDED sketch frame
    # (≤ k rows per bucket) — not a second scan + distinct over the
    # raw input
    existing = per_bucket.select(
        *gcols, F.col("__b").alias("__t")
    ).distinct()
    merged = contrib.join(existing, [*gcols, "__t"], "left_semi")
    # Per target the candidate pool is ≤ (window/bucket)·k hashes —
    # BOUNDED — so the distinct + row_number-rank + sort-aggregate
    # tail (one Exchange per step) collapses into ONE per-target
    # object-hash aggregate: collect_set dedups (map-side partials
    # shrink the shuffle), array_sort ranks the bounded set, and the
    # estimate reads min(|set|, k) and the k-th smallest directly.
    # Bit-identical to the windowed form: least(size, k) == the old
    # count of rank≤k rows, element_at(sorted, n) == max(kept k).
    agg = merged.groupBy(*gcols, "__t").agg(
        F.array_sort(F.collect_set("h")).alias("__hs")
    )
    n = F.least(F.size("__hs"), F.lit(k))
    hk = F.element_at("__hs", n)
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) / _hash_frac(hk)
    )
    return agg.select(
        *gcols,
        F.date_format(
            F.col("__t").cast("timestamp"), "yyyy-MM-dd HH:mm:ss"
        ).alias("bucket_t"),
        est.alias("est_distinct"),
    )
