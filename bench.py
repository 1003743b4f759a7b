#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation,
no driver collect). The headline set spans the engine's surface: scans
+filters, shuffle aggs, broadcast joins, window functions, pivots, the
WRF pipelines, and the LLM data-pipeline operators.

NOISE FLOOR (measured round 5, identical code, consecutive runs):
totals spanned 11.9-15.4 s before the load_table memo and 9.1-12.3 s
after it — i.e. shared-machine load swings single-run totals by ±20%
and individual sub-second queries by 2x. Round 4's broad "+2.6% drift"
(15 of 21 queries slower with no code change) was this noise, not a
regression. Compare rounds on the best of several runs, and treat
per-query deltas under ~25% as unresolvable without n >= 6.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from curw_wrf_data_pusher_spark.queries import QUERIES, generic, llm  # noqa: E402
from curw_wrf_data_pusher_spark.session import get_spark  # noqa: E402

# Per-query repetitions; the reported time is the MINIMUM across reps,
# so the scoreboard is noise-robust by construction (see NOISE FLOOR
# above — single-run totals swing ±20% on a shared machine).
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

HEADLINE = [
    "a1_pricing_summary",
    "q3_shipping_priority",
    "j3_broadcast_lookup",
    "j1_pivot_sources",
    "w1_lag_diff",
    "w2_latest_per_series",
    "w3_nearest_neighbor",
    "o1_total_order",
    "wrf_e1_push_rows",
    "wrf_e3_hybrid_frame",
    "llm_dedup_exact",
    "llm_quality_features",
    "llm_simhash",
    "llm_minhash_lsh_pairs",
    "llm_cosine_topk",
    "j6_asof_join",
    "s10_window_resample",
    "llm_dedup_clusters",
    "e2_rfield_contract",
    "llm_contamination",
    "llm_seq_packing",
    # added round 6 (NEW vs the r1-r5 21-query set — compare totals
    # accordingly): the composed 5-stage curation pipeline row, plus
    # the substring-granular and embedding-cluster dedup modalities
    "llm_curate_corpus",
    "llm_winnow_pairs",
    "llm_substring_dedup",
    "llm_semantic_dedup",
    "llm_ngram_logfreq",
    "w5_rolling_stats",
    "llm_vocab_topk",
    # added round 6 session 2 (NEW rows — compare totals accordingly):
    # the exact prefix-filtered set-similarity join, plus the sketch /
    # incremental / diff analytics tier
    "llm_setsim_pairs",
    "a16_countmin_freq",
    "a18_mergeable_rollup",
    "a19_histograms",
    "k11_snapshot_diff",
]


def _resolve(name):
    """Headline entries stay name-stable across rounds even when a
    query is registry-gated through a compound row: fall back to the
    plain (unregistered) module function."""
    if name in QUERIES:
        return QUERIES[name]
    for mod in (generic, llm):
        fn = getattr(mod, name, None)
        if fn is not None:
            return fn
    raise KeyError(name)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # untimed warmup: JVM/codegen/parquet-reader init shouldn't be
    # attributed to whichever query happens to run first.
    QUERIES["a1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # best-of-REPS with PASS-LEVEL repetition: the whole headline list
    # runs REPS times and each query keeps its minimum across passes.
    # Consecutive per-query reps share a transient-contention window (a
    # one-off 42 s total was traced to exactly that); spreading a
    # query's reps minutes apart decorrelates them at identical total
    # cost.  Each run times construction + execution — iterative
    # operators (e.g. connected components) do real work eagerly while
    # building.  Local scheduler noise dominates sub-second queries
    # (round-2 showed ±15% swings at n=2 with unchanged plans).
    best: dict[str, float] = {}
    for _ in range(REPS):
        for name in HEADLINE:
            fn = _resolve(name)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if name not in best or dt < best[name]:
                best[name] = dt
    timings = {name: round(best[name], 3) for name in HEADLINE}

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline-query wall time (noop sink, local)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
