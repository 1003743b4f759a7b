"""Approximate string matching: edit-distance self-pairs via q-gram
blocking + Levenshtein verification — the entity-resolution /
data-cleaning staple (near-identical names, typo'd keys, OCR drift).

The naive form is the O(n²) Levenshtein cross product.  The scale
path blocks first and verifies only candidates, with EXACT recall:

- **Long tier** (strings long enough that the q-gram lemma applies):
  one edit replaces at most ``n`` of a string's padded q-grams
  (multiset), so a within-distance pair shares at least
  ``T = max(g_a, g_b) − d·n`` grams, ``g = len + n − 1`` (Gravano et
  al., VLDB'01).  Candidate generation uses the PREFIX FILTER on that
  bound (the ED-Join scheme, Xiao et al., VLDB'08): tag gram
  occurrences (``gram#k`` for the k-th occurrence, turning the
  multiset bound into a set bound exactly), order all tagged grams by
  global rarity (document frequency, then gram), and join strings on
  only their ``d·n + 1`` RAREST tagged grams — by the prefix-filter
  principle (|A∩B| ≥ α ⇒ the (|A|−α+1)-prefixes of A and B in any
  consistent total order intersect, and g − T + 1 ≤ d·n + 1), every
  within-distance pair still collides.  On ID-like corpora (a long
  shared prefix makes every string share most grams with every other)
  the ubiquitous prefix grams never enter the join — candidates
  collapse to near the true pair set.  The tier is
  ``len >= L := d·n − n + 2`` (so that ``T >= 1``).
- **Short tier** (``len < L + d``): the lemma gives no guarantee, but
  within-distance pairs differ by at most ``d`` in length, so a
  length-key equi-join (one side exploded to ``len..len+d``) covers
  them exactly.  The ``+ d`` margin makes any pair whose shorter side
  is lemma-less fall entirely inside this tier.

Candidates from both tiers are unioned, deduped, and verified with
exact ``F.levenshtein`` — a false candidate costs one distance
computation, never a wrong answer.  Hot blocking keys (a ubiquitous
q-gram, a crowded short length) take the house-standard cap +
accounting pair (``max_group_size`` / ``fuzzy_dropped_groups``), so a
capped run logs what it skipped instead of straggling silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _prepared(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    pad = "#" * (n - 1)
    return df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__s"),
        F.length(text_col).cast("int").alias("__len"),
        F.concat(F.lit(pad), F.col(text_col), F.lit(pad)).alias("__p"),
    )


def _tagged_grams(s: DataFrame, tier_min_len: int, n: int) -> DataFrame:
    """(id, tagged gram) rows for long-tier strings.  Tagging the k-th
    occurrence of a gram as ``gram#k`` makes multiset intersection of
    grams equal SET intersection of tagged grams, so set-based prefix
    filtering applies exactly.

    Occurrence numbering runs over the SORTED gram array: equal grams
    are then adjacent, so the k-th occurrence index is ``position −
    first position of the value`` — one O(g) equality scan
    (array_position) per element instead of the previous per-element
    ``filter(slice(...))``, which COPIED the prefix array per element
    (O(g²) allocations per string; measured ~2x the stage CPU).  The
    produced multiset {gram#k} is identical — every downstream
    consumer treats the tagged grams as a per-id set (explode →
    count/join), so occurrence ORDER never matters."""
    grams = (
        f"transform(sequence(1, length(__p) - {n - 1}),"
        f" i -> substring(__p, i, {n}))"
    )
    tagged = (
        "transform(sequence(1, size(__ss)), i -> concat(__ss[i - 1], '#',"
        " cast(i + 1 - array_position(__ss, __ss[i - 1]) as string)))"
    )
    return (
        s.filter(F.col("__len") >= tier_min_len)
        .withColumn("__ss", F.array_sort(F.expr(grams)))
        .select(
            "__id",
            F.explode(F.expr(tagged)).alias("__tg"),
        )
    )


def _prefix_grams(
    s: DataFrame, tier_min_len: int, n: int, d: int
) -> DataFrame:
    """Each long-tier string's ``d·n + 1`` globally-rarest tagged
    grams: (id, tagged gram).  Rarity = (document frequency, gram) —
    a consistent total order across strings, as the prefix-filter
    principle requires.

    The document frequency is attached with a count window OVER the
    tagged-gram key instead of a separate count aggregate joined back:
    same two shuffles (gram key, per-id regroup), but the tagging
    explode runs ONCE — the join form re-ran the tag expression on
    both its probe and build sides (Catalyst shares no subplans across
    join inputs).  KNOWN SKEW EXPOSURE at the 100 TB design scale
    (r14 ADVICE): the window has no map-side partial aggregation, so a
    ubiquitous tagged gram (e.g. a shared padded-prefix gram) lands
    its ENTIRE posting list in one window partition — the old
    broadcast-able freq join spread that count.  Accepted deliberately
    for the measured sf0.1 win; the mitigation already in the module
    is ``max_group_size``'s hot-gram accounting (the same grams that
    would skew this window are the ones it identifies and caps before
    the |group|² expansion), and a corpus where ONE gram dominates the
    long tier is precisely the boilerplate case the caller should cap.
    The per-id regroup exchange is pinned at the
    configured shuffle partition count: its byte size is tiny (ids +
    d·n+1 short grams) but the downstream candidate join and verify
    hang off it, and AQE's byte-target coalescing would serialize that
    compute onto 1-2 tasks."""
    tg = _tagged_grams(s, tier_min_len, n)
    k = d * n + 1
    n_shuffle = int(
        s.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    w = Window.partitionBy("__tg")
    return (
        tg.select(
            "__id", "__tg", F.count("*").over(w).alias("__df")
        )
        .repartition(n_shuffle, "__id")
        .groupBy("__id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct("__df", "__tg"))
                ),
                1,
                k,
            ).alias("__pre")
        )
        .select(
            "__id",
            F.explode(F.col("__pre.__tg")).alias("__tg"),
        )
    )


def _length_bucket_counts(s: DataFrame, tier_max_len: int) -> DataFrame:
    return (
        s.filter(F.col("__len") < tier_max_len)
        .groupBy(F.col("__len").alias("__k"))
        .agg(F.count("*").alias("n_members"))
    )


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    max_distance: int = 1,
    n: int = 3,
    max_group_size: int | None = None,
) -> DataFrame:
    """All distinct pairs with Levenshtein(text_a, text_b) <=
    ``max_distance``, as (id_a, id_b, distance) with id_a < id_b.
    Exact (recall 1.0) when ``max_group_size`` is None; see the module
    docstring for the two-tier blocking argument."""
    d, tier_min = max_distance, max_distance * n - n + 2
    s = _prepared(df, id_col, text_col, n)

    # the prefix frame is (d·n+1)·|strings| rows of (id, gram) — tiny
    # relative to the corpus — and feeds BOTH sides of the candidate
    # join; a lazy localCheckpoint computes its 2-shuffle subtree once
    pre = _prefix_grams(s, tier_min, n, d).localCheckpoint(eager=False)
    if max_group_size is not None:
        ok_grams = (
            pre.groupBy("__tg")
            .agg(F.count("*").alias("__m"))
            .filter(F.col("__m") <= max_group_size)
            .select("__tg")
        )
        pre = pre.join(ok_grams, "__tg", "left_semi")
    pa = pre.select(F.col("__tg"), F.col("__id").alias("__ida"))
    pb = pre.select(F.col("__tg"), F.col("__id").alias("__idb"))
    cand_long = (
        pa.join(pb, "__tg")
        .filter(F.col("__ida") < F.col("__idb"))
        .select(
            F.col("__ida").alias("id_a"), F.col("__idb").alias("id_b")
        )
    )

    short = s.filter(F.col("__len") < tier_min + d)
    if max_group_size is not None:
        ok = _length_bucket_counts(s, tier_min + d).filter(
            F.col("n_members") <= max_group_size
        ).select(F.col("__k").alias("__len"))
        short = short.join(ok, "__len", "left_semi")
    a = short.select(
        F.col("__id").alias("__ida"),
        F.explode(F.expr(f"sequence(__len, __len + {d})")).alias("__k"),
    )
    b = short.select(
        F.col("__id").alias("__idb"), F.col("__len").alias("__k")
    )
    cand_short = (
        a.join(b, "__k")
        .filter(F.col("__ida") != F.col("__idb"))
        .select(
            F.least("__ida", "__idb").alias("id_a"),
            F.greatest("__ida", "__idb").alias("id_b"),
        )
    )

    cands = cand_long.unionByName(cand_short).dropDuplicates(
        ["id_a", "id_b"]
    )
    sa = s.select(F.col("__id").alias("id_a"), F.col("__s").alias("__sa"))
    sb = s.select(F.col("__id").alias("id_b"), F.col("__s").alias("__sb"))
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "distance", F.levenshtein("__sa", "__sb").cast("long")
        )
        .filter(F.col("distance") <= d)
        .select("id_a", "id_b", "distance")
    )


def fuzzy_dropped_groups(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    max_distance: int = 1,
    n: int = 3,
    max_group_size: int | None = None,
) -> DataFrame:
    """Accounting companion to ``fuzzy_self_pairs(max_group_size=N)``:
    the blocking groups a capped run skipped, as (tier, key,
    n_members) — tier 'gram' for q-gram posting lists, 'length' for
    short-tier length buckets.  Mirrors ``lsh_dropped_buckets`` etc."""
    d, tier_min = max_distance, max_distance * n - n + 2
    s = _prepared(df, id_col, text_col, n)
    gram_groups = (
        _prefix_grams(s, tier_min, n, d)
        .groupBy("__tg")
        .agg(F.count("*").alias("n_members"))
        .select(
            F.lit("gram").alias("tier"),
            F.col("__tg").alias("key"),
            F.col("n_members"),
        )
    )
    len_groups = _length_bucket_counts(s, tier_min + d).select(
        F.lit("length").alias("tier"),
        F.col("__k").cast("string").alias("key"),
        F.col("n_members"),
    )
    allg = gram_groups.unionByName(len_groups)
    if max_group_size is None:
        return allg.filter(F.lit(False))
    return allg.filter(F.col("n_members") > max_group_size)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "id",
    right_id: str = "id",
    left_text: str = "text",
    right_text: str = "text",
    max_distance: int = 1,
    n: int = 3,
    max_group_size: int | None = None,
) -> DataFrame:
    """Cross-table edit-distance join: (left_id, right_id, distance)
    for every pair with Levenshtein <= ``max_distance`` — linking
    records across two catalogs (the standard entity-resolution
    shape).  Same two-tier blocking as ``fuzzy_self_pairs`` with one
    refinement: gram rarity is computed over the UNION of both sides,
    so the prefix order is consistent across the tables as the
    prefix-filter principle requires.  Exact recall with
    ``max_group_size=None``."""
    d, tier_min = max_distance, max_distance * n - n + 2
    sl = _prepared(left, left_id, left_text, n).withColumn(
        "__side", F.lit("l")
    )
    sr = _prepared(right, right_id, right_text, n).withColumn(
        "__side", F.lit("r")
    )
    both = sl.unionByName(sr)

    pre = (
        _prefix_grams(
            both.withColumn(
                "__id", F.struct(F.col("__side"), F.col("__id"))
            ),
            tier_min, n, d,
        )
        .localCheckpoint(eager=False)
    )
    if max_group_size is not None:
        ok = (
            pre.groupBy("__tg")
            .agg(F.count("*").alias("__m"))
            .filter(F.col("__m") <= max_group_size)
            .select("__tg")
        )
        pre = pre.join(ok, "__tg", "left_semi")
    pa = pre.filter(F.col("__id.__side") == "l").select(
        "__tg", F.col("__id.__id").alias("id_l")
    )
    pb = pre.filter(F.col("__id.__side") == "r").select(
        "__tg", F.col("__id.__id").alias("id_r")
    )
    cand_long = pa.join(pb, "__tg").select("id_l", "id_r")

    shortl = sl.filter(F.col("__len") < tier_min + d)
    shortr = sr.filter(F.col("__len") < tier_min + d)
    if max_group_size is not None:
        okl = _length_bucket_counts(both, tier_min + d).filter(
            F.col("n_members") <= max_group_size
        ).select(F.col("__k").alias("__len"))
        shortl = shortl.join(okl, "__len", "left_semi")
        shortr = shortr.join(okl, "__len", "left_semi")
    a = shortl.select(
        F.col("__id").alias("id_l"),
        F.explode(
            F.expr(f"sequence(greatest(__len - {d}, 0), __len + {d})")
        ).alias("__k"),
    )
    b = shortr.select(F.col("__id").alias("id_r"),
                      F.col("__len").alias("__k"))
    cand_short = a.join(b, "__k").select("id_l", "id_r")

    cands = cand_long.unionByName(cand_short).dropDuplicates(
        ["id_l", "id_r"]
    )
    ta = sl.select(F.col("__id").alias("id_l"), F.col("__s").alias("__sa"))
    tb = sr.select(F.col("__id").alias("id_r"), F.col("__s").alias("__sb"))
    return (
        cands.join(ta, "id_l")
        .join(tb, "id_r")
        .withColumn("distance", F.levenshtein("__sa", "__sb").cast("long"))
        .filter(F.col("distance") <= d)
        .select("id_l", "id_r", "distance")
    )


def resolve_entities(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    max_distance: int = 1,
    n: int = 3,
    score_col: str | None = None,
    max_group_size: int | None = None,
) -> DataFrame:
    """End-to-end entity resolution: fuzzy-match → transitive closure →
    canonical pick, composed from the engine's own operators
    (``fuzzy_self_pairs`` → ``llmops.clusters.resolve_clusters``).

    Every row gains ``entity_id`` (the cluster; transitive — a~b, b~c
    puts a,c in one entity even when lev(a,c) > max_distance),
    ``canonical_id`` (min-id member by default, or the
    ``score_col``-max member, ties to smaller id) and
    ``is_canonical``.  Singletons are their own entity.

    Scale: the pair list is the ED-Join output (sparse by blocking);
    closure is the size-adaptive union-find; the canonical pick is one
    window over the matched rows only — unmatched rows never shuffle
    for it (they are their own canonical by construction)."""
    from ..llmops.clusters import resolve_clusters

    pairs = fuzzy_self_pairs(
        df, id_col=id_col, text_col=text_col,
        max_distance=max_distance, n=n, max_group_size=max_group_size,
    ).select("id_a", "id_b")
    clusters = resolve_clusters(pairs).withColumnsRenamed(
        {"doc_id": "__cid", "cluster_id": "entity_id"}
    )
    matched = df.join(
        clusters, df[id_col] == F.col("__cid"), "inner"
    ).drop("__cid")
    if score_col is None:
        # min-label closure already labels each cluster with its
        # smallest member id — the canonical pick is free
        matched = matched.withColumn("canonical_id", F.col("entity_id"))
    else:
        w = Window.partitionBy("entity_id").orderBy(
            F.col(score_col).desc(), F.col(id_col)
        )
        matched = matched.withColumn(
            "canonical_id",
            F.first(F.col(id_col)).over(
                w.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
            ),
        )
    singletons = df.join(
        clusters.select(F.col("__cid").alias(id_col)), id_col, "left_anti"
    ).select(
        "*",
        F.col(id_col).alias("entity_id"),
        F.col(id_col).alias("canonical_id"),
    )
    out = matched.unionByName(singletons)
    return out.withColumn(
        "is_canonical", F.col(id_col) == F.col("canonical_id")
    )
