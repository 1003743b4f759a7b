#!/usr/bin/env python
"""100x scale probe for the two round-12 streaming operators (judge
r12 task 4) — the only streaming additions without an at-scale
measurement:

- ``stream_gauge_qc``: the docstring claims per-batch work is
  O(touched series x their history), NOT O(store).  The probe builds
  a standing gauge store of S series x T points through the stream
  itself (bootstrap batch), then drops a correction batch touching a
  FIXED 24 series and times that micro-batch at S=100 vs S=10,000
  (100x the store).  A flat correction-batch wall proves the
  partition-pruned recompute; an O(store) regression shows up as
  ~100x growth.

- ``stream_lm_gate``: the self-training loop's cost drivers are the
  per-batch store merge (reads all prior batches' count partials) and
  the type-level scoring joins.  The probe feeds 4 equal micro-batches
  at 1x (sf0.1 documents, ~1.25k docs/batch) and 100x (the
  token-renamed x100 replica, ~125k docs/batch — the WORST case for
  vocabulary growth, same as the batch LM probe), timing every batch.
  Two ratios matter: batch-wall growth at 100x data (should track the
  batch operator's ~22x, not 100x+), and within-run batch-4/batch-1
  (store-merge cost as the store accumulates — should stay near 1
  because count partials are type-scale).

Usage:
    python scripts/stream_probe.py                # both probes, 1x+100x
    STREAM_PROBE_SCALES=1 python scripts/stream_probe.py
    STREAM_PROBE_ROWS=gauge_qc python scripts/stream_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from curw_wrf_data_pusher_spark.session import get_spark  # noqa: E402
from scale_probe import last_stage_id, stage_skew  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/stream_probe"
SCALES = [
    int(s)
    for s in os.environ.get("STREAM_PROBE_SCALES", "1,100").split(",")
]
ROWS = os.environ.get("STREAM_PROBE_ROWS", "gauge_qc,lm_gate").split(",")
DOC_REPLICAS = "/tmp/scale_probe"  # built by scripts/scale_probe.py


def _fresh(*names: str) -> dict[str, str]:
    d = {}
    for n in names:
        p = os.path.join(WORK, n)
        shutil.rmtree(p, ignore_errors=True)
        os.makedirs(p, exist_ok=True)
        d[n] = p
    return d


def _await(q, timeout: int) -> None:
    assert q.awaitTermination(timeout), (
        f"stream did not finish within {timeout}s — the probe number "
        "would silently measure a timeout, not the batch"
    )


def probe_gauge_qc(spark, factor: int) -> dict:
    from curw_wrf_data_pusher_spark.streaming.quality_monitor import (
        stream_gauge_qc,
    )

    n_series, t_points, touched = 100 * factor, 200, 24
    # the scale layout (round-13 finding): per-series partition dirs
    # hit the local-FS metadata wall at 10k series — 3 partitioned
    # writes of 10k dirs per bootstrap batch ran >20 min each; the
    # bucketed store bounds any batch at <= 256 directories.  Buckets
    # at BOTH scales so the growth ratio measures the design.
    buckets = 256
    tag = f"gq{factor}"
    d = _fresh(f"{tag}/in", f"{tag}/store", f"{tag}/qc", f"{tag}/ckpt")
    inc, store, qc, ckpt = (
        d[f"{tag}/in"], d[f"{tag}/store"], d[f"{tag}/qc"], d[f"{tag}/ckpt"]
    )
    # bootstrap batch: the full standing store (S series x T points,
    # 15-min grid, deterministic centi-unit values with flatline +
    # spike structure so qc_flags does real work)
    full = (
        spark.range(n_series * t_points)
        .select(
            F.format_string(
                "g%05d", (F.col("id") / t_points).cast("long")
            ).alias("hash_id"),
            F.date_format(
                F.timestamp_seconds(
                    F.lit(1717200000) + (F.col("id") % t_points) * 900
                ),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("time"),
            F.when(
                (F.col("id") % t_points).between(40, 60), F.lit(250.0)
            )
            .otherwise(((F.col("id") * 37) % 1900).cast("double"))
            .alias("value"),
        )
    )
    full.coalesce(max(1, factor)).write.mode("append").parquet(inc)
    t0 = time.perf_counter()
    q = stream_gauge_qc(spark, inc, store, qc, ckpt, store_buckets=buckets)
    _await(q, 3600)
    boot_sec = time.perf_counter() - t0
    # correction batch: 24 series get one late rewrite each (splits
    # the flatline run -> flags retract) — the O(touched) claim
    corr = (
        spark.range(touched)
        .select(
            F.format_string("g%05d", F.col("id")).alias("hash_id"),
            F.date_format(
                F.timestamp_seconds(F.lit(1717200000) + 50 * 900),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("time"),
            F.lit(777.0).alias("value"),
        )
    )
    corr.coalesce(1).write.mode("append").parquet(inc)
    mark = last_stage_id(spark)
    t0 = time.perf_counter()
    q = stream_gauge_qc(spark, inc, store, qc, ckpt, store_buckets=buckets)
    _await(q, 3600)
    corr_sec = time.perf_counter() - t0
    corr_skew = stage_skew(spark, mark)
    n_qc = spark.read.parquet(qc).count()
    return {
        "n_series": n_series,
        "store_buckets": buckets,
        "store_rows": n_series * t_points,
        "bootstrap_sec": round(boot_sec, 2),
        "correction_batch_sec": round(corr_sec, 2),
        "correction_skew": corr_skew,
        "touched_series": touched,
        "qc_rows": n_qc,
    }


def probe_lm_gate(spark, factor: int) -> dict:
    from curw_wrf_data_pusher_spark.streaming.quality_monitor import (
        stream_lm_gate,
    )

    docs_dir = (
        BASE if factor == 1 else os.path.join(DOC_REPLICAS, f"x{factor}")
    )
    src = os.path.join(docs_dir, "documents.parquet")
    if not os.path.exists(src):
        raise SystemExit(
            f"missing {src}: build replicas first via scripts/scale_probe.py"
        )
    tag = f"lm{factor}"
    d = _fresh(
        f"{tag}/in", f"{tag}/store", f"{tag}/clean",
        f"{tag}/quar", f"{tag}/metrics", f"{tag}/ckpt",
    )
    inc = d[f"{tag}/in"]
    docs = spark.read.parquet(src).select("doc_id", "text")
    n_batches = 4
    walls = []
    skews = []
    for b in range(n_batches):
        batch = docs.filter(F.col("doc_id") % n_batches == b)
        batch.coalesce(max(1, factor // 8)).write.mode("append").parquet(inc)
        mark = last_stage_id(spark)
        t0 = time.perf_counter()
        q = stream_lm_gate(
            spark, inc, d[f"{tag}/store"], d[f"{tag}/clean"],
            d[f"{tag}/quar"], d[f"{tag}/metrics"], d[f"{tag}/ckpt"],
            "doc_id long, text string", min_avg_q=1,
        )
        _await(q, 3600)
        walls.append(round(time.perf_counter() - t0, 2))
        skews.append(stage_skew(spark, mark))
    store_rows = spark.read.parquet(d[f"{tag}/store"]).count()
    clean = spark.read.parquet(d[f"{tag}/clean"]).count()
    quar = spark.read.parquet(d[f"{tag}/quar"]).count()
    return {
        "docs_per_batch": docs.count() // n_batches,
        "batch_walls_sec": walls,
        "batch_skews": skews,
        "batch4_over_batch1": (
            round(walls[-1] / walls[1], 2) if walls[1] else None
        ),  # vs batch 1 (first JUDGED batch; batch 0 is bootstrap)
        "store_partial_rows": store_rows,
        "clean_docs": clean,
        "quarantined_docs": quar,
    }


PROBES = {"gauge_qc": probe_gauge_qc, "lm_gate": probe_lm_gate}


def main() -> None:
    os.makedirs(WORK, exist_ok=True)
    spark = get_spark("stream-probe", extra_conf={"spark.ui.enabled": "true"})
    results: dict[str, dict] = {}
    for name in ROWS:
        for factor in SCALES:
            key = f"{name}@x{factor}"
            results[key] = PROBES[name](spark, factor)
            print(f"{key}: {results[key]}", file=sys.stderr)
    for name in ROWS:
        a, b = f"{name}@x{SCALES[0]}", f"{name}@x{SCALES[-1]}"
        if a in results and b in results and a != b:
            if name == "gauge_qc":
                results[f"{name}@growth"] = round(
                    results[b]["correction_batch_sec"]
                    / results[a]["correction_batch_sec"], 2,
                )
            else:
                results[f"{name}@growth"] = round(
                    sum(results[b]["batch_walls_sec"])
                    / sum(results[a]["batch_walls_sec"]), 2,
                )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
