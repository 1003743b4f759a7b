"""SCD2 tests: history derivation from an event log, incremental
apply (close/open/new-key/no-change), replay idempotence, and the
batch-rebuild ≡ sequential-apply agreement."""

from __future__ import annotations

from curw_wrf_data_pusher_spark.operators.scd import (
    scd2_apply,
    scd2_from_events,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "k long, attr string, ts long, eid long"
    )


def test_scd2_from_events_runs(spark):
    rows = [
        (1, "A", 10, 0), (1, "A", 20, 1), (1, "B", 30, 2),
        (1, "A", 40, 3),
        (2, "X", 15, 4),
    ]
    hist = scd2_from_events(
        _events(spark, rows), ["k"], ["attr"], "ts", tiebreak_col="eid"
    )
    got = sorted(
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in hist.collect()
    )
    assert got == [
        (1, "A", 10, 30, False),   # A run collapses 10+20
        (1, "A", 40, None, True),  # A again after B: new version
        (1, "B", 30, 40, False),
        (2, "X", 15, None, True),
    ]


def test_scd2_apply_lifecycle_and_idempotence(spark):
    hist = scd2_from_events(
        _events(spark, [(1, "A", 10, 0), (2, "X", 10, 1)]),
        ["k"], ["attr"], "ts", tiebreak_col="eid",
    ).select("k", "attr", "valid_from", "valid_to", "is_current")
    batch = spark.createDataFrame(
        # key 1 changes; key 2 unchanged; key 3 new; key 4 intra-batch
        # flip resolves to the latest (Q at 26)
        [(1, "B", 25), (2, "X", 25), (3, "N", 25), (4, "P", 25),
         (4, "Q", 26)],
        "k long, attr string, ts long",
    )
    h2 = scd2_apply(hist, batch, ["k"], ["attr"], "ts")
    got = sorted((r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
                 for r in h2.collect())
    assert got == [
        (1, "A", 10, 25, False),
        (1, "B", 25, None, True),
        (2, "X", 10, None, True),   # unchanged: version NOT churned
        (3, "N", 25, None, True),
        (4, "Q", 26, None, True),
    ]
    # replaying the same batch is a no-op
    h3 = scd2_apply(h2, batch, ["k"], ["attr"], "ts")
    assert sorted(map(tuple, h3.collect())) == sorted(
        map(tuple, h2.collect())
    )


def test_scd2_sequential_apply_matches_rebuild(spark):
    # one observation per key per batch, increasing timestamps: the
    # incremental path must converge to the batch rebuild
    all_rows = [
        (1, "A", 10, 0), (2, "X", 10, 1),
        (1, "B", 20, 2), (2, "X", 20, 3),
        (1, "B", 30, 4), (2, "Y", 30, 5),
    ]
    rebuilt = scd2_from_events(
        _events(spark, all_rows), ["k"], ["attr"], "ts",
        tiebreak_col="eid",
    ).select("k", "attr", "valid_from", "valid_to", "is_current")

    hist = scd2_from_events(
        _events(spark, all_rows[:2]), ["k"], ["attr"], "ts",
        tiebreak_col="eid",
    ).select("k", "attr", "valid_from", "valid_to", "is_current")
    for t in (20, 30):
        batch = spark.createDataFrame(
            [(k, a, ts) for k, a, ts, _ in all_rows if ts == t],
            "k long, attr string, ts long",
        )
        hist = scd2_apply(hist, batch, ["k"], ["attr"], "ts")
    assert sorted(map(tuple, hist.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )


def test_scd2_lookup_picks_version_valid_at_fact_time(spark):
    from datetime import datetime

    from curw_wrf_data_pusher_spark.operators.scd import scd2_lookup

    def t(h):
        return datetime(2024, 6, 1, h)

    hist = spark.createDataFrame(
        [
            (1, "bronze", t(0), t(10), False),
            (1, "silver", t(10), t(20), False),
            (1, "gold", t(20), None, True),
            (2, "bronze", t(5), None, True),
        ],
        "user_id long, tier string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean",
    )
    facts = spark.createDataFrame(
        [
            (1, 100, t(9)),    # inside bronze
            (1, 101, t(10)),   # boundary: belongs to silver (half-open)
            (1, 102, t(23)),   # open current version
            (2, 200, t(4)),    # BEFORE user 2's first version → NULL
            (3, 300, t(1)),    # unknown key → NULL
        ],
        "user_id long, event_id long, ts timestamp",
    )
    out = {r.event_id: r for r in
           scd2_lookup(facts, hist, ["user_id"], "ts").collect()}
    assert out[100].tier == "bronze"
    assert out[101].tier == "silver"      # valid_to is exclusive
    assert out[102].tier == "gold" and out[102].is_current
    assert out[200].tier is None
    assert out[300].tier is None
    assert len(out) == 5                  # ≤1 version per fact


def test_scd2_lookup_raises_on_attribute_name_collision(spark):
    """Round-8 advisor fix: a history attribute named like a fact
    column would emit duplicate output columns; raise up front."""
    from datetime import datetime

    import pytest as _pytest

    from curw_wrf_data_pusher_spark.operators.scd import scd2_lookup

    hist = spark.createDataFrame(
        [(1, "gold", datetime(2024, 1, 1), None, True)],
        "user_id long, ts string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean",
    )
    facts = spark.createDataFrame(
        [(1, datetime(2024, 6, 1))], "user_id long, ts timestamp"
    )
    with _pytest.raises(ValueError, match=r"\['ts'\]"):
        scd2_lookup(facts, hist, ["user_id"], "ts")
