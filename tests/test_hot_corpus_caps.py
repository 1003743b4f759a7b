"""Hot-corpus (skewed) cap tests for the round-6 candidate-pair
families (judge task 7): one template dominating the corpus (10×+ the
share of anything else) must have its |group|² pair explosion bounded
by the family's cap, with the skipped work reported by the accounting
companion — never silently.  Mirrors the existing LSH / SimHash /
band-cell hot tests (tests/test_llmops.py).

Contract per family:
  1. uncapped run emits the full quadratic template pair count;
  2. capped run drops the template group but keeps small clusters,
     and its pair set is a subset of the uncapped one;
  3. the accounting companion reports exactly the dropped groups;
  4. cap=None → companion is empty and semantics are exact.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

N_HOT = 30  # template multiplicity — dwarfs every other group


def _hot_text_corpus(spark, template, pair, uniques):
    rows = [(i, template) for i in range(N_HOT)]
    rows += [(100 + i, u) for i, u in enumerate(uniques)]
    rows += [(200, pair[0]), (201, pair[1])]
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# exact set-similarity join (AllPairs/PPJoin prefix filter)


def test_setsim_hot_template_cap(spark):
    from curw_wrf_data_pusher_spark.llmops.setjoin import (
        setsim_dropped_tokens,
        setsim_join,
        token_sets,
    )

    docs = _hot_text_corpus(
        spark,
        "lorem ipsum dolor sit amet consectetur adipiscing elit",
        ("alpha beta gamma delta epsilon zeta",
         "alpha beta gamma delta epsilon eta"),
        [f"unique{i} spectral{i} words{i} only{i} here{i}" for i in range(6)],
    )
    tok = token_sets(docs).localCheckpoint()

    uncapped = setsim_join(tok, threshold=0.5)
    up = {(r.id_a, r.id_b) for r in uncapped.collect()}
    # the 30-doc template block alone is C(30,2) = 435 identical pairs
    assert len(up) >= 435

    capped = setsim_join(tok, threshold=0.5, max_token_group=10)
    cp = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (200, 201) in cp          # small cluster survives the cap
    assert all(p in up for p in cp)  # capped ⊆ uncapped
    assert not any(a < N_HOT and b < N_HOT for a, b in cp)  # template gone

    dropped = setsim_dropped_tokens(
        tok, threshold=0.5, max_token_group=10
    ).collect()
    assert dropped and all(r.n_members >= N_HOT for r in dropped)
    assert (
        setsim_dropped_tokens(tok, threshold=0.5, max_token_group=None)
        .count() == 0
    )


# ---------------------------------------------------------------------------
# winnowing (MOSS) fingerprint posting lists


def test_winnow_hot_fingerprint_cap(spark):
    from curw_wrf_data_pusher_spark.llmops.substrings import (
        winnow_candidate_pairs,
        winnow_dropped_groups,
        winnow_fingerprints,
    )

    docs = _hot_text_corpus(
        spark,
        "standard header boilerplate repeated on every page of the site",
        ("shared rare phrase common to exactly two documents and only "
         "these two with a long identical prefix run then now",
         "shared rare phrase common to exactly two documents and only "
         "these two with a long identical prefix run then today"),
        [f"wholly distinct body {i} nothing in common {i * 7}"
         for i in range(6)],
    )
    fp = winnow_fingerprints(docs).localCheckpoint()

    uncapped = winnow_candidate_pairs(fp, min_shared=2)
    up = {(r.id_a, r.id_b) for r in uncapped.collect()}
    assert len(up) >= 435  # template block pairs

    capped = winnow_candidate_pairs(fp, min_shared=2, max_group_size=10)
    cp = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (200, 201) in cp
    assert all(p in up for p in cp)
    assert not any(a < N_HOT and b < N_HOT for a, b in cp)

    dropped = winnow_dropped_groups(fp, max_group_size=10).collect()
    assert dropped and all(r.n_members >= N_HOT for r in dropped)
    assert winnow_dropped_groups(fp, max_group_size=None).count() == 0


# ---------------------------------------------------------------------------
# fuzzy edit-distance self-join (two-tier q-gram/length blocking)


def test_fuzzy_hot_template_cap(spark):
    from curw_wrf_data_pusher_spark.operators.fuzzy import (
        fuzzy_dropped_groups,
        fuzzy_self_pairs,
    )

    docs = _hot_text_corpus(
        spark,
        "identical-template-string-very-long-enough-for-gram-tier",
        ("abcdefghijkl", "abcdefghijkx"),  # distance 1
        [f"zxqvw{i}rtyuplkj{i}mnbas{i}" for i in range(6)],
    ).withColumnRenamed("doc_id", "id")

    uncapped = fuzzy_self_pairs(docs, max_distance=1)
    up = {(r.id_a, r.id_b) for r in uncapped.collect()}
    assert len(up) >= 435  # template block: all-pairs at distance 0

    capped = fuzzy_self_pairs(docs, max_distance=1, max_group_size=10)
    cp = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (200, 201) in cp
    assert all(p in up for p in cp)
    assert not any(a < N_HOT and b < N_HOT for a, b in cp)

    dropped = fuzzy_dropped_groups(
        docs, max_distance=1, max_group_size=10
    ).collect()
    assert dropped and all(r.n_members >= N_HOT for r in dropped)
    assert (
        fuzzy_dropped_groups(docs, max_distance=1, max_group_size=None)
        .count() == 0
    )


# ---------------------------------------------------------------------------
# SemDeDup cluster cap


def test_semantic_hot_cluster_cap(spark):
    from curw_wrf_data_pusher_spark.llmops.simsearch import (
        semantic_dedup,
        semantic_dropped_clusters,
    )

    # Centroid seeds are the n_clusters ids with the smallest
    # (md5(id), id) — pick ids so seed 1 anchors the SMALL direction
    # and seed 2 the HOT one, making the two cells deterministic.
    by_md5 = sorted(range(100), key=lambda i: (
        hashlib.md5(str(i).encode()).hexdigest(), i
    ))
    small_ids = by_md5[:1] + by_md5[2:4]   # seed + 2 more small-cluster
    hot_ids = [by_md5[1]] + [i for i in by_md5[4:] if i not in small_ids][
        : N_HOT - 1
    ]

    rows = []
    for j, i in enumerate(hot_ids):           # hot direction ~(1, 0, ε)
        rows.append((i, [1.0, 0.0, 0.001 * j]))
    # small cell: two near-dups (cos ≈ 1) + one distinct (cos < .85)
    rows.append((small_ids[0], [0.0, 1.0, 0.0]))
    rows.append((small_ids[1], [0.0, 1.0, 0.02]))
    rows.append((small_ids[2], [0.0, 0.3, 1.0]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    uncapped = {
        r.vec_id: r.is_kept
        for r in semantic_dedup(corpus, n_clusters=2).collect()
    }
    # hot cell: 1 anchor kept, N_HOT - 1 dropped
    assert sum(not uncapped[i] for i in hot_ids) == N_HOT - 1
    # small cell: exactly one of the two near-dups dropped
    assert sum(not uncapped[i] for i in small_ids) == 1

    capped = {
        r.vec_id: r.is_kept
        for r in semantic_dedup(
            corpus, n_clusters=2, max_cluster_size=10
        ).collect()
    }
    assert all(capped[i] for i in hot_ids)       # oversized cell skipped
    assert sum(not capped[i] for i in small_ids) == 1  # small still deduped

    dropped = semantic_dropped_clusters(
        corpus, n_clusters=2, max_cluster_size=10
    ).collect()
    assert len(dropped) == 1 and dropped[0].n_members == N_HOT
    assert (
        semantic_dropped_clusters(
            corpus, n_clusters=2, max_cluster_size=None
        ).count() == 0
    )
