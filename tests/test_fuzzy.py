"""Fuzzy (edit-distance) self-pairs: brute-force equality on random
strings (recall 1.0 across both tiers), short-string coverage the
q-gram lemma can't reach, caps + accounting, and distance values."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from curw_wrf_data_pusher_spark.operators.fuzzy import (
    fuzzy_dropped_groups,
    fuzzy_self_pairs,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(texts, d):
    return {
        (i, j): _lev(texts[i], texts[j])
        for i, j in itertools.combinations(range(len(texts)), 2)
        if _lev(texts[i], texts[j]) <= d
    }


def _df(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "id long, text string"
    )


def test_fuzzy_pairs_hand_cases(spark):
    texts = [
        "customer#0001", "customer#0002",   # distance 1
        "customer#0001",                    # exact dup -> distance 0
        "completely different",
        "a", "b", "",                       # short tier: a~b ed 1; ''~a ed 1
    ]
    got = {(r.id_a, r.id_b): r.distance
           for r in fuzzy_self_pairs(_df(spark, texts),
                                     max_distance=1).collect()}
    assert got == _brute(texts, 1)
    assert got[(0, 1)] == 1 and got[(0, 2)] == 0
    assert got[(4, 5)] == 1 and got[(4, 6)] == 1 and got[(5, 6)] == 1


@given(
    texts=st.lists(st.text(alphabet="abc#", max_size=8), min_size=2,
                   max_size=12),
    d=st.integers(1, 2),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fuzzy_pairs_match_bruteforce_property(spark, texts, d):
    got = {(r.id_a, r.id_b): r.distance
           for r in fuzzy_self_pairs(_df(spark, texts),
                                     max_distance=d).collect()}
    assert got == _brute(texts, d)


def test_fuzzy_cap_and_accounting(spark):
    # 6 identical long strings: every gram group has 6 members
    texts = ["shared long template string here"] * 6 + ["unrelated zz"]
    df = _df(spark, texts)
    capped = fuzzy_self_pairs(df, max_distance=1, max_group_size=5)
    assert capped.count() == 0
    dropped = fuzzy_dropped_groups(df, max_distance=1,
                                   max_group_size=5).collect()
    # every template gram has the 6 duplicates (7 where "unrelated zz"
    # shares a gram, e.g. 'ate')
    assert dropped and all(r.n_members in (6, 7) for r in dropped)
    assert {r.tier for r in dropped} == {"gram"}
    # None cap: exact
    full = fuzzy_self_pairs(df, max_distance=1)
    assert full.count() == 15  # all pairs among the 6 dups


def _brute_cross(lt, rt, d):
    return {
        (i, j): _lev(lt[i], rt[j])
        for i in range(len(lt))
        for j in range(len(rt))
        if _lev(lt[i], rt[j]) <= d
    }


def test_fuzzy_join_hand_cases(spark):
    from curw_wrf_data_pusher_spark.operators.fuzzy import fuzzy_join

    lt = ["customer#001", "wholly unique name", "x", ""]
    rt = ["customer#002", "customer#001", "y", "xz"]
    got = {(r.id_l, r.id_r): r.distance
           for r in fuzzy_join(_df(spark, lt), _df(spark, rt),
                               max_distance=1).collect()}
    assert got == _brute_cross(lt, rt, 1)
    assert got[(0, 1)] == 0 and got[(0, 0)] == 1
    assert got[(2, 2)] == 1 and got[(3, 2)] == 1  # short tier, both dirs


@given(
    lt=st.lists(st.text(alphabet="ab#", max_size=7), min_size=1,
                max_size=8),
    rt=st.lists(st.text(alphabet="ab#", max_size=7), min_size=1,
                max_size=8),
    d=st.integers(1, 2),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fuzzy_join_matches_bruteforce_property(spark, lt, rt, d):
    from curw_wrf_data_pusher_spark.operators.fuzzy import fuzzy_join

    got = {(r.id_l, r.id_r): r.distance
           for r in fuzzy_join(_df(spark, lt), _df(spark, rt),
                               max_distance=d).collect()}
    assert got == _brute_cross(lt, rt, d)


def test_resolve_entities_transitive_and_canonical(spark):
    from curw_wrf_data_pusher_spark.operators.fuzzy import resolve_entities

    rows = [
        (1, "customer alpha", 0.9),
        (2, "customer alphb", 0.5),   # d=1 to alpha
        (3, "customer alphc", 0.99),  # d=1 to alphb, d=1 to alpha... chain
        (4, "totally different", 0.1),
        (5, "customer alpzc", 0.2),   # d=1 to alphc only (chain link)
    ]
    df = spark.createDataFrame(rows, "id long, text string, score double")
    out = {r.id: r for r in resolve_entities(df, max_distance=1).collect()}
    # 1-2-3-5 chain into one entity labeled by min id; 4 singleton
    assert {out[i].entity_id for i in (1, 2, 3, 5)} == {1}
    assert out[4].entity_id == 4 and out[4].is_canonical
    assert all(out[i].canonical_id == 1 for i in (1, 2, 3, 5))
    assert out[1].is_canonical and not out[2].is_canonical
    # score-based pick: highest score (id 3) becomes canonical
    out2 = {
        r.id: r
        for r in resolve_entities(df, max_distance=1,
                                  score_col="score").collect()
    }
    assert all(out2[i].canonical_id == 3 for i in (1, 2, 3, 5))
    assert out2[3].is_canonical and not out2[1].is_canonical
    assert out2[4].canonical_id == 4
