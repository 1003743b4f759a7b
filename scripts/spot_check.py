#!/usr/bin/env python
"""Subset parity + warm timing spot-check — the optimization round's
inner loop.  For each named query: hash-compare Spark vs the DuckDB
oracle (when one is registered), then time warm best-of-N with the
noop sink (guide §1.4).  Names not in the registry fall back to
bench._resolve (bench-only rows have no oracle; timing only).

    python scripts/spot_check.py name1 name2 ... [--reps N] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from curw_wrf_data_pusher_spark.queries import ORACLES, QUERIES  # noqa: E402
from curw_wrf_data_pusher_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    import bench  # noqa: E402  (repo-root module; resolves bench-only rows)
    from tests.oracle_harness import canonical_hash, duckdb_connection  # noqa: E402

    spark = get_spark("spot-check")
    # untimed warmup (JVM/codegen/reader init)
    QUERIES["a1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    con = None
    out = {}
    for name in names:
        fn = QUERIES.get(name) or bench._resolve(name)
        row = {}
        if name in ORACLES:
            if con is None:
                con = duckdb_connection(sf_dir)
            sp_df = fn(spark, sf_dir).toPandas()
            du_df = con.execute(ORACLES[name]).df()
            row["match"] = bool(
                canonical_hash(sp_df) == canonical_hash(du_df))
            row["rows"] = len(sp_df)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            if name in bench.SINKS:
                bench.SINKS[name](spark, sf_dir)
            else:
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
            best = min(best, time.perf_counter() - t0)
        row["best_sec"] = round(best, 3)
        row["load1"] = round(os.getloadavg()[0], 2)
        out[name] = row
        print(f"{name}: {row}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
