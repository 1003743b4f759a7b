"""applyInPandasWithState: state must persist across micro-batches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.streaming.stateful import running_gauge_totals


def _drop(spark, rows, path):
    (
        spark.createDataFrame(rows, "hash_id string, time string, value double")
        .withColumn("time", F.col("time").cast("timestamp"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path)
    )


def test_running_totals_across_batches(spark, tmp_path):
    watch = str(tmp_path / "watch")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    out_dir = str(tmp_path / "out")

    def run_backlog(name):
        stream = (
            spark.readStream.schema("hash_id string, time timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(watch)
        )
        q = (
            running_gauge_totals(stream)
            .writeStream.foreachBatch(
                lambda df, _eid: df.write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r.hash_id, str(r.time)): (r.cum_value, r.n_readings)
            for r in spark.read.parquet(out_dir).collect()
        }

    _drop(
        spark,
        [("g1", "2024-06-01 00:00:00", 1.0), ("g1", "2024-06-01 00:15:00", 2.0),
         ("g2", "2024-06-01 00:00:00", 10.0)],
        os.path.join(watch, "b1"),
    )
    got1 = run_backlog("totals1")
    assert got1[("g1", "2024-06-01 00:15:00")] == (3.0, 2)
    assert got1[("g2", "2024-06-01 00:00:00")] == (10.0, 1)

    # second batch: state must carry the g1 total (3.0) forward
    _drop(
        spark,
        [("g1", "2024-06-01 00:30:00", 4.0), ("g3", "2024-06-01 00:30:00", 7.0)],
        os.path.join(watch, "b2"),
    )
    got2 = run_backlog("totals2")
    assert got2[("g1", "2024-06-01 00:30:00")] == (7.0, 3)  # 3.0 + 4.0
    assert got2[("g3", "2024-06-01 00:30:00")] == (7.0, 1)


# --- transformWithStateInPandas storm episodes ---------------------------

import pytest  # noqa: E402

from curw_wrf_data_pusher_spark.streaming.stateful import (  # noqa: E402
    EPISODE_OUTPUT_SCHEMA,
    StormEpisodeProcessor,
    storm_episodes,
    tws_available,
)

_R_SCHEMA = "hash_id string, time timestamp, value double"


def _push(spark, path, rows):
    from pyspark.sql import functions as F

    (
        spark.createDataFrame(
            rows, "hash_id string, time string, value double"
        )
        .select("hash_id", F.to_timestamp("time").alias("time"), "value")
        .coalesce(1)
        .write.mode("append")
        .parquet(path)
    )


def _run_episodes(spark, watch, out, ckpt):
    stream = spark.readStream.schema(_R_SCHEMA).parquet(watch)
    q = (
        storm_episodes(stream, gap_seconds=3600, watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


@pytest.mark.skipif(
    not tws_available(),
    reason="transformWithState worker protocol needs protobuf "
           "(absent from this container — env-gated like netCDF4)",
)
def test_storm_episodes_close_on_event_time_gap(spark, tmp_path):
    import os

    watch = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    os.makedirs(watch)

    # batch 1: gauge g1 rains 10:00-10:30; g2 rains at 10:15 only
    _push(spark, watch, [
        ("g1", "2024-01-01 10:00:00", 1.5),
        ("g1", "2024-01-01 10:15:00", 2.0),
        ("g1", "2024-01-01 10:30:00", 0.5),
        ("g2", "2024-01-01 10:15:00", 3.0),
    ])
    _run_episodes(spark, watch, out, ckpt)
    # watermark hasn't passed last+gap yet: nothing closed
    import glob
    n0 = (spark.read.schema(EPISODE_OUTPUT_SCHEMA).parquet(out).count()
          if glob.glob(f"{out}/*.parquet") else 0)
    assert n0 == 0

    # batch 2: a reading at 13:00 pushes the watermark past both
    # episodes' last+1h, closing them; g1 also starts a NEW episode
    _push(spark, watch, [("g1", "2024-01-01 13:00:00", 4.0)])
    _run_episodes(spark, watch, out, ckpt)

    eps = {
        (r.hash_id, str(r.episode_start), str(r.episode_end)):
        (r.total, r.n_readings)
        for r in spark.read.parquet(out).collect()
    }
    assert eps[("g1", "2024-01-01 10:00:00", "2024-01-01 10:30:00")] \
        == (4.0, 3)
    assert eps[("g2", "2024-01-01 10:15:00", "2024-01-01 10:15:00")] \
        == (3.0, 1)
    assert len(eps) == 2  # the 13:00 episode is still open

    # batch 3: advance far again — the 13:00 episode closes too
    _push(spark, watch, [("g2", "2024-01-01 16:00:00", 0.1)])
    _run_episodes(spark, watch, out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3
    new = [r for r in rows if str(r.episode_start) == "2024-01-01 13:00:00"]
    assert len(new) == 1 and new[0].total == 4.0 and new[0].n_readings == 1


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()
        self.timers = []

    def getValueState(self, name, schema):
        return self.state

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, t):
        self.timers.remove(t)

    def registerTimer(self, t):
        self.timers.append(t)


def test_storm_episode_processor_logic_with_fake_handle():
    """The protobuf env gate blocks the e2e run in this container;
    the episode semantics (accumulate → re-arm timer → emit-on-expiry
    → clear) are pinned against a faithful fake handle instead."""
    import pandas as pd

    proc = StormEpisodeProcessor(gap_seconds=3600)
    h = _FakeHandle()
    proc.init(h)

    pdf = pd.DataFrame({
        "hash_id": ["g1"] * 3,
        "time": pd.to_datetime([
            "2024-01-01 10:15:00", "2024-01-01 10:00:00",
            "2024-01-01 10:30:00",
        ]),
        "value": [2.0, 1.5, 0.5],
    })
    out = list(proc.handleInputRows(("g1",), iter([pdf]), None))
    assert out == []                      # nothing emits while raining
    start, last, total, n = h.state.get()
    assert total == 4.0 and n == 3
    assert h.timers == [last + 3_600_000]  # one live timer at last+gap

    # a second batch re-arms (old timer deleted, new one registered)
    pdf2 = pd.DataFrame({
        "hash_id": ["g1"], "time": pd.to_datetime(["2024-01-01 11:00:00"]),
        "value": [1.0],
    })
    list(proc.handleInputRows(("g1",), iter([pdf2]), None))
    _, last2, total2, n2 = h.state.get()
    assert (total2, n2) == (5.0, 4)
    assert h.timers == [last2 + 3_600_000]

    # expiry: one summary row, state cleared
    rows = list(proc.handleExpiredTimer(("g1",), None, None))
    assert len(rows) == 1
    r = rows[0].iloc[0]
    assert r.hash_id == "g1" and r.total == 5.0 and r.n_readings == 4
    assert str(r.episode_start) == "2024-01-01 10:00:00"
    assert str(r.episode_end) == "2024-01-01 11:00:00"
    assert not h.state.exists()
    # firing on an already-cleared key emits nothing
    assert list(proc.handleExpiredTimer(("g1",), None, None)) == []
