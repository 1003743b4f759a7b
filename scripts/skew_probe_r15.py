#!/usr/bin/env python
"""Targeted 10x SKEW probes for the round-14/15 rewrites (VERDICT r14
item 7): each case builds the adversarial shape its rewrite could
mishandle, runs it at 1x and 10x, and records (a) wall + the heaviest
stage's max/median task time (straggler signal), (b) a
PARTITION-INVARIANCE hash — the same query executed under a 4x-smaller
``spark.sql.shuffle.partitions`` must produce an identical
order-insensitive result hash (bit_xor of per-row xxhash64), so a
skew-split or partitioning change can never silently change values.

Cases:

- ``gap_fill_giant_span`` — w6's round-14 span form generates each
  gap's grid from ONE row (`sequence(t0, t1)`); a series with one
  enormous sparse gap puts that whole span's array in a single task
  (the VERDICT r14 "What's wrong" #6 watch item).  Shape: 256 regular
  1-slot-step series + ONE series whose only observations are slot 0
  and slot G (G = 500k at 1x, 5M at 10x), so one task explodes a
  G-row span while every other span is 1 row.
- ``setsim_hot_token`` — a template corpus (12 boilerplate tokens in
  EVERY doc + 12 unique per doc) lands one boilerplate token inside
  every document's prefix: that token's group holds ALL N docs, so
  the in-group pair expansion evaluates ~N^2/2 candidate CASEs inside
  ONE task (groups are rows).  t=0.5; true Jaccard is 12/36 = 1/3, so
  the exact answer is EMPTY — every candidate the hot group emits is
  a false positive the PPJoin positional filter (r14/r15) prunes
  in-expression.  The UNCAPPED run is probed at 1x and ~10x PAIR
  work (N and N·sqrt(10): the hot group is quadratic BY DESIGN, so
  scaling docs 10x would be 100x pair evals — the first probe run did
  exactly that and its single hot-group task also exposed the
  decimal-literal interpreted-eval cost this round then fixed); the
  CAPPED run (``max_token_group`` + ``setsim_dropped_tokens``, the
  documented mitigation) is probed at a true 10x docs, where it must
  scale ~linearly and the dropped-token row must name the hot group.
- ``repetition_20k_docs`` — llm_repetition_signals' round-14 sorted
  neighbor/run-gap form replaced an O(distinct x n) per-doc rescan;
  the adversarial shape is long highly-repetitive documents (the very
  docs the filter targets).  Shape: 20k-token docs, half repetitive
  (vocab 64, heavy runs) and half diverse (all-unique tokens), 64
  docs at 1x / 640 at 10x.

Usage:  python scripts/skew_probe_r15.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from curw_wrf_data_pusher_spark.session import get_spark  # noqa: E402
from scripts.scale_probe import last_stage_id, stage_skew  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "skew_probe_r15.json"


def _result_hash(df: DataFrame) -> tuple[int, int]:
    """Order-insensitive (bit_xor of xxhash64(all cols), count) pair —
    partition-count-proof by construction, computed JVM-side."""
    row = df.select(
        F.expr(
            "bit_xor(xxhash64(%s))"
            % ", ".join(f"`{c}`" for c in df.columns)
        ).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    return (row["h"], row["n"])


def _timed(spark, label: str, df: DataFrame) -> tuple[float, dict | None]:
    """Noop-sink wall (best of 2 to shave scheduler jitter) + heaviest
    stage skew for the final rep."""
    spark.sparkContext.setJobDescription(label)
    best = float("inf")
    skew = None
    for _ in range(2):
        since = last_stage_id(spark)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        skew = stage_skew(spark, since)
    spark.sparkContext.setJobDescription(None)
    return round(best, 3), skew


def _invariance(spark, build, partitions=(200, 48)) -> dict:
    """Build + hash the same frame under two shuffle-partition counts."""
    hashes = {}
    for p in partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
        hashes[p] = _result_hash(build())
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions[0]))
    vals = list(hashes.values())
    return {
        "hashes": {str(k): list(v) for k, v in hashes.items()},
        "match": all(v == vals[0] for v in vals),
    }


# ---------------------------------------------------------------- gap_fill
def gap_series(spark, gap: int) -> DataFrame:
    """256 dense 2000-slot series + one series observed ONLY at slots
    0 and ``gap`` — the one-giant-sparse-span shape."""
    dense = spark.range(0, 256 * 2000, 1, 32).select(
        (F.col("id") % 256).cast("string").alias("k"),
        (F.col("id") / 256).cast("long").alias("slot"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)) / 10.0).alias("value"),
    )
    giant = spark.createDataFrame(
        [("giant", 0, 1.0), ("giant", gap, 2.0)], "k string, slot long, value double"
    )
    return dense.unionByName(giant)


def probe_gap_fill(spark) -> dict:
    from curw_wrf_data_pusher_spark.operators.timeseries import gap_fill

    out: dict = {}
    for tag, gap in (("1x", 500_000), ("10x", 5_000_000)):
        series = gap_series(spark, gap)
        filled = gap_fill(series, ["k"], "slot", "value", step=1,
                          method="linear")
        wall, skew = _timed(spark, f"skewprobe:gap_fill:{tag}", filled)
        inv = _invariance(
            spark,
            lambda g=gap: gap_fill(gap_series(spark, g), ["k"], "slot",
                                   "value", step=1, method="linear"),
        )
        n_rows = 256 * 2000 + (gap + 1)
        out[tag] = {
            "gap_slots": gap,
            "expected_rows": n_rows,
            "wall_s": wall,
            "heaviest_stage": skew,
            "partition_invariance": inv,
        }
    out["wall_ratio_10x_over_1x"] = round(
        out["10x"]["wall_s"] / out["1x"]["wall_s"], 2
    )
    return out


# ----------------------------------------------------------------- setsim
def hot_corpus(spark, n_docs: int) -> DataFrame:
    """Template corpus: every doc carries the same 12 boilerplate
    tokens + 12 doc-unique tokens (n=24, t=0.5 -> prefix length 13 =
    12 unique + the first boilerplate token: ONE group of ALL docs)."""
    boiler = " ".join(f"zzboiler{i:02d}" for i in range(12))
    return spark.range(0, n_docs, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(boiler + " "),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(11)),
                    lambda j: F.concat(
                        F.lit("u"), F.col("id").cast("string"),
                        F.lit("x"), j.cast("string"),
                    ),
                ),
            ),
        ).alias("text"),
    )


def probe_setsim(spark) -> dict:
    from curw_wrf_data_pusher_spark.llmops.setjoin import (
        setsim_dropped_tokens,
        setsim_join,
        token_sets,
    )

    out: dict = {}
    # uncapped: scale PAIR work 10x (docs x sqrt(10)); capped: docs 10x
    for tag, n_unc, n_cap in (("1x", 1500, 3000), ("10x", 4750, 30000)):
        toks_unc = token_sets(hot_corpus(spark, n_unc))
        res = setsim_join(toks_unc, threshold=0.5)
        wall, skew = _timed(spark, f"skewprobe:setsim_hot:{tag}", res)
        inv = _invariance(
            spark,
            lambda n=n_unc: setsim_join(
                token_sets(hot_corpus(spark, n)), threshold=0.5
            ),
        )
        # the documented mitigation: cap the hot group, account for it
        toks_cap = token_sets(hot_corpus(spark, n_cap))
        capped = setsim_join(toks_cap, threshold=0.5, max_token_group=64)
        wall_capped, _ = _timed(
            spark, f"skewprobe:setsim_hot_capped:{tag}", capped
        )
        dropped = (
            setsim_dropped_tokens(
                toks_cap, threshold=0.5, max_token_group=64
            ).collect()
        )
        out[tag] = {
            "n_docs_uncapped": n_unc,
            "n_docs_capped": n_cap,
            "hot_group_pair_evals": n_unc * (n_unc - 1) // 2,
            "n_pairs": res.count(),
            "wall_uncapped_s": wall,
            "wall_capped_s": wall_capped,
            "dropped_groups": [
                {"token": r["token"], "n_members": r["n_members"]}
                for r in dropped
            ],
            "heaviest_stage": skew,
            "partition_invariance": inv,
        }
    out["uncapped_wall_ratio_at_10x_pair_work"] = round(
        out["10x"]["wall_uncapped_s"] / out["1x"]["wall_uncapped_s"], 2
    )
    out["capped_wall_ratio_at_10x_docs"] = round(
        out["10x"]["wall_capped_s"] / out["1x"]["wall_capped_s"], 2
    )
    return out


# -------------------------------------------------------- repetition_20k
def long_docs(spark, n_docs: int) -> DataFrame:
    """20k-token docs: even ids repetitive (vocab 64 -> heavy duplicate
    lines and gram runs), odd ids diverse (all-unique tokens)."""
    rep_text = F.concat_ws(
        "\n",
        F.transform(
            F.sequence(F.lit(0), F.lit(999)),  # 1000 lines x 20 tokens
            lambda i: F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(19)),
                    lambda j: F.concat(
                        F.lit("w"),
                        F.pmod(
                            F.xxhash64(F.col("id"), i, j), F.lit(64)
                        ).cast("string"),
                    ),
                ),
            ),
        ),
    )
    div_text = F.concat_ws(
        "\n",
        F.transform(
            F.sequence(F.lit(0), F.lit(999)),
            lambda i: F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(19)),
                    lambda j: F.concat(
                        F.lit("q"), F.col("id").cast("string"),
                        F.lit("_"), i.cast("string"),
                        F.lit("_"), j.cast("string"),
                    ),
                ),
            ),
        ),
    )
    return spark.range(0, n_docs, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, rep_text).otherwise(div_text)
        .alias("text"),
    )


def probe_repetition(spark) -> dict:
    from curw_wrf_data_pusher_spark.llmops.textstats import (
        repetition_signals,
    )

    out: dict = {}
    for tag, n_docs in (("1x", 64), ("10x", 640)):
        docs = long_docs(spark, n_docs)
        res = repetition_signals(docs)
        wall, skew = _timed(spark, f"skewprobe:repetition:{tag}", res)
        inv = _invariance(
            spark,
            lambda n=n_docs: repetition_signals(long_docs(spark, n)),
        )
        out[tag] = {
            "n_docs": n_docs,
            "tokens_per_doc": 20000,
            "wall_s": wall,
            "heaviest_stage": skew,
            "partition_invariance": inv,
        }
    out["wall_ratio_10x_over_1x"] = round(
        out["10x"]["wall_s"] / out["1x"]["wall_s"], 2
    )
    return out


def main() -> None:
    spark = get_spark(
        "skew-probe-r15",
        # the stage-skew REST probe needs the UI (off in get_spark)
        extra_conf={"spark.ui.enabled": "true"},
    )
    # untimed warmup
    spark.range(0, 1_000_000, 1, 32).selectExpr(
        "bit_xor(xxhash64(id))"
    ).write.format("noop").mode("overwrite").save()
    result = {
        "round": 15,
        "cpus": spark.sparkContext.defaultParallelism,
        "load1_at_start": round(os.getloadavg()[0], 2),
        "gap_fill_giant_span": probe_gap_fill(spark),
        "setsim_hot_token": probe_setsim(spark),
        "repetition_20k_docs": probe_repetition(spark),
    }
    result["load1_at_end"] = round(os.getloadavg()[0], 2)
    spark.stop()
    with open(OUT, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
