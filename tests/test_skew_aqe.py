"""AQE skew-join handling: the engine's AUTOMATIC answer to skewed
join keys (SURVEY §4 / SCALING.md), complementing the manual salted
two-phase aggregation (a13 pattern).

At 100 TB a single hot key turns a sort-merge join into one straggler
task.  With adaptive execution, Spark measures the shuffle at runtime
and SPLITS the skewed partition across tasks (duplicating the matching
build side), no code change required.  This test pins that the
mechanism actually engages on this engine's session configuration —
if a future config change disabled AQE or skew join, the straggler
regression would land silently; here it fails loudly instead.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_conf(spark):
    keep = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # thresholds scaled down so a local fixture skews "hugely"
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in keep}
    for k, v in keep.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_conf):
    # 200k rows on ONE key + a uniform tail vs a small-but-not-
    # broadcastable right side: the hot key's partition dwarfs the
    # advisory size, so AQE must mark the SMJ skew=true and split
    hot = spark.range(200_000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    tail = spark.range(5_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("payload")
    )
    left = hot.unionAll(tail)
    right = spark.range(300).select(
        (F.col("id") % 150).alias("k"), F.col("id").alias("attr")
    )
    joined = left.join(right, "k")
    # collect() executes THIS DataFrame's own QueryExecution (count()
    # would plan a separate aggregate and leave `joined`'s adaptive
    # plan unfinalized) — right holds ids 0..299 under k = id % 150 →
    # every k in 0..149 appears exactly twice, so each left row
    # matches two right rows
    assert len(joined.collect()) == (200_000 + 5_000) * 2
    final = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert "skew=true" in final, final
