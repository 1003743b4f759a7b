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
