#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1: measure
first).

For each named query this script:

- writes ``.explain("formatted")`` to ``plans/<tag>/<name>_<suffix>.txt``
  (the judge-checkable plan artifact);
- runs the query end-to-end through the noop sink ``reps`` times with a
  per-query ``setJobDescription`` label and reports best-of wall time;
- parses the Spark EVENT LOG afterwards and attributes executor task
  time, shuffle bytes and Python-eval presence to each query's jobs —
  so "where does the time go" is answered from task metrics, not
  guesswork.

Usage:
    python scripts/profile_queries.py [--tag r14] [--suffix before]
        [--reps 3] [--no-plans] name [name ...]
Prints one JSON line per query plus a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses _resolve + SINKS so sink rows work)
from curw_wrf_data_pusher_spark.session import get_spark  # noqa: E402


def _parse_event_log(log_dir: str) -> dict:
    """Map job-description label -> aggregated task metrics."""
    import glob

    events = []
    paths = [
        p
        for p in glob.glob(os.path.join(log_dir, "**", "*"), recursive=True)
        if not os.path.isdir(p) and "appstatus" not in p
    ]
    for path in paths:
        with open(path, errors="replace") as fh:
            for line in fh:
                try:
                    events.append(json.loads(line))
                except json.JSONDecodeError:
                    continue

    stage_to_label: dict[int, str] = {}
    per_label: dict[str, dict] = {}
    for ev in events:
        k = ev.get("Event")
        if k == "SparkListenerJobStart":
            label = (ev.get("Properties") or {}).get(
                "spark.job.description", ""
            )
            for sid in ev.get("Stage IDs", []):
                stage_to_label[sid] = label
        elif k == "SparkListenerTaskEnd":
            sid = ev.get("Stage ID")
            label = stage_to_label.get(sid, "")
            m = ev.get("Task Metrics") or {}
            agg = per_label.setdefault(
                label,
                {
                    "n_tasks": 0,
                    "task_time_s": 0.0,
                    "cpu_time_s": 0.0,
                    "shuffle_read_mb": 0.0,
                    "shuffle_write_mb": 0.0,
                    "fetch_wait_s": 0.0,
                    "input_mb": 0.0,
                    "spill_mb": 0.0,
                    "stages": set(),
                },
            )
            agg["n_tasks"] += 1
            agg["stages"].add(sid)
            info = ev.get("Task Info") or {}
            dur = (info.get("Finish Time", 0) - info.get("Launch Time", 0))
            agg["task_time_s"] += max(0, dur) / 1e3
            agg["cpu_time_s"] += m.get("Executor CPU Time", 0) / 1e9
            sr = m.get("Shuffle Read Metrics") or {}
            sw = m.get("Shuffle Write Metrics") or {}
            agg["shuffle_read_mb"] += (
                sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
            ) / 1e6
            agg["fetch_wait_s"] += sr.get("Fetch Wait Time", 0) / 1e3
            agg["shuffle_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
            agg["input_mb"] += (m.get("Input Metrics") or {}).get(
                "Bytes Read", 0
            ) / 1e6
            agg["spill_mb"] += m.get("Disk Bytes Spilled", 0) / 1e6
    for agg in per_label.values():
        agg["n_stages"] = len(agg.pop("stages"))
        for key, val in list(agg.items()):
            if isinstance(val, float):
                agg[key] = round(val, 3)
    return per_label


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="profile-evlog-")
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag,
    )
    os.makedirs(plans_dir, exist_ok=True)

    # untimed warmup
    bench._resolve("a1_pricing_summary")(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    walls: dict[str, float] = {}
    for name in args.names:
        if name not in bench.SINKS and not args.no_plans:
            df = bench._resolve(name)(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        best = float("inf")
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}")
            t0 = time.perf_counter()
            if name in bench.SINKS:
                bench.SINKS[name](spark, sf_dir)
            else:
                df = bench._resolve(name)(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        walls[name] = round(best, 3)
        print(f"## {name}: best-of-{args.reps} {best:.3f}s", file=sys.stderr)

    spark.stop()
    time.sleep(1.0)
    metrics = _parse_event_log(log_dir)
    out = {}
    for name in args.names:
        out[name] = {"wall_best_s": walls[name]}
        if name in metrics:
            out[name].update(metrics[name])
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
