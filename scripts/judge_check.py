#!/usr/bin/env python
"""Judge-reproducibility one-pager (judge r13 task 7): re-runs the
four checks rounds 12 and 13 each re-derived by hand and prints a
one-screen summary.

    python scripts/judge_check.py [--fast]

Sections:
  1. pytest        — the full suite (tests/, -q).  --fast runs the
                     contract-critical subset instead (registry
                     window, coverage anchors, oracle parity smoke).
  2. warm spot set — the 10 historically load-polluted / most
                     expensive query families at sf0.1, one untimed
                     warm-up + best-of-3, with the 1-min loadavg each
                     best rep saw (the r12/r13 adjudication method).
  3. copycheck     — difflib full-ratio of the 10 largest repo .py
                     files against every reference .py (threshold
                     0.6, same as the driver's detector).
  4. leak grep     — the proprietary-marker sweep over repo source
                     (URLs/buckets/hosts/credentials that a public
                     repo must not carry).

Exit 0 = all four sections green."""

from __future__ import annotations

import difflib
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

SPOT_SET = [
    "llm_cosine_topk_neardup",
    "llm_pq_rerank",
    "llm_quality_classifier",
    "llm_bm25_tfidf",
    "llm_simhash_neighbors",
    "llm_setsim_pairs",
    "a16_countmin_freq",
    "llm_semantic_dedup",
    "llm_dsir_weights",
    "llm_stupid_backoff",
]

FAST_TESTS = [
    "tests/test_registry_window.py",
    "tests/test_coverage_anchors.py",
    "tests/test_vanilla_session.py",
]


def _load1() -> float:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:
        return -1.0


def section_pytest(fast: bool) -> dict:
    args = [sys.executable, "-m", "pytest", "-q"]
    args += FAST_TESTS if fast else ["tests/"]
    t0 = time.time()
    proc = subprocess.run(args, cwd=REPO, capture_output=True, text=True)
    tail = (proc.stdout.strip().splitlines() or [""])[-1]
    return {
        "ok": proc.returncode == 0,
        "summary_line": tail,
        "wall_s": round(time.time() - t0, 1),
    }


def section_spot_set(sf_dir: str) -> dict:
    sys.path.insert(0, REPO)
    from curw_wrf_data_pusher_spark.queries import QUERIES
    from curw_wrf_data_pusher_spark.session import get_spark

    def resolve(name):
        return QUERIES[name]  # every spot-set row is registered

    spark = get_spark("judge-check")
    rows = {}
    for name in SPOT_SET:
        fn = resolve(name)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best, load = float("inf"), -1.0
        for _ in range(3):
            l1 = _load1()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if dt < best:
                best, load = dt, l1
        rows[name] = {"sec": round(best, 2), "load1": load}
    spark.stop()
    return {"ok": True, "sf_dir": sf_dir, "rows": rows}


def section_copycheck(threshold: float = 0.6, top_n: int = 10) -> dict:
    repo_py = [
        p for p in glob.glob(
            os.path.join(REPO, "curw_wrf_data_pusher_spark", "**", "*.py"),
            recursive=True,
        )
    ] + [os.path.join(REPO, "bench.py"), os.path.join(REPO, "__spark_entry__.py")]
    repo_py.sort(key=os.path.getsize, reverse=True)
    ref_py = glob.glob(os.path.join(REFERENCE, "**", "*.py"), recursive=True)
    worst = ("", "", 0.0)
    for rp in repo_py[:top_n]:
        a = open(rp, errors="replace").read()
        for fp in ref_py:
            b = open(fp, errors="replace").read()
            r = difflib.SequenceMatcher(None, a, b).ratio()
            if r > worst[2]:
                worst = (os.path.relpath(rp, REPO),
                         os.path.relpath(fp, REFERENCE), round(r, 3))
    return {
        "ok": worst[2] < threshold,
        "threshold": threshold,
        "worst_pair": worst,
    }


#: markers a public repo must not carry: cloud buckets/hosts with
#: embedded names, credentials, and private-infra hostnames
LEAK_PATTERNS = [
    r"s3://[a-z0-9][a-z0-9.-]+",
    r"gs://[a-z0-9][a-z0-9.-]+",
    r"(?i)(password|passwd|secret|api[_-]?key)\s*[:=]\s*['\"][^'\"]{4,}",
    r"(?i)BEGIN (RSA|OPENSSH|EC) PRIVATE KEY",
    r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}:\d{2,5}\b",  # host:port literals
    # placeholder hosts (host/example.*/localhost) are fine; a real
    # dotted production hostname is not
    r"(?i)jdbc:mysql://(?!localhost|host[/:]|example\.|127\.0\.0\.1)"
    r"[a-z0-9-]+\.[a-z0-9.-]+",
]


def section_leakgrep() -> dict:
    hits = []
    for root, dirs, files in os.walk(REPO):
        dirs[:] = [d for d in dirs
                   if d not in {".git", "spark-warehouse", "__pycache__"}]
        for f in files:
            if not f.endswith((".py", ".md", ".json", ".sh")):
                continue
            p = os.path.join(root, f)
            try:
                text = open(p, errors="replace").read()
            except OSError:
                continue
            for pat in LEAK_PATTERNS:
                for m in re.finditer(pat, text):
                    hits.append(
                        (os.path.relpath(p, REPO), m.group(0)[:60])
                    )
    return {"ok": not hits, "n_hits": len(hits), "hits": hits[:20]}


def main() -> None:
    fast = "--fast" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = {"fast": fast, "load1_at_start": _load1()}
    print("== judge_check: 1/4 pytest ==", file=sys.stderr)
    out["pytest"] = section_pytest(fast)
    print("== judge_check: 2/4 warm spot set ==", file=sys.stderr)
    out["spot_set"] = section_spot_set(sf_dir)
    print("== judge_check: 3/4 copycheck ==", file=sys.stderr)
    out["copycheck"] = section_copycheck()
    print("== judge_check: 4/4 leak grep ==", file=sys.stderr)
    out["leakgrep"] = section_leakgrep()
    ok = all(out[k]["ok"] for k in
             ("pytest", "spot_set", "copycheck", "leakgrep"))
    out["all_green"] = ok

    # one-screen summary
    print(json.dumps(out))
    print("-" * 60, file=sys.stderr)
    print(f"pytest    : {'OK ' if out['pytest']['ok'] else 'FAIL'} "
          f"({out['pytest']['summary_line']}, "
          f"{out['pytest']['wall_s']}s)", file=sys.stderr)
    spot = ", ".join(f"{n}={r['sec']}s"
                     for n, r in out["spot_set"]["rows"].items())
    print(f"spot set  : {spot}", file=sys.stderr)
    print(f"copycheck : {'OK ' if out['copycheck']['ok'] else 'FAIL'} "
          f"worst={out['copycheck']['worst_pair']}", file=sys.stderr)
    print(f"leak grep : {'OK ' if out['leakgrep']['ok'] else 'FAIL'} "
          f"hits={out['leakgrep']['n_hits']}", file=sys.stderr)
    print(f"ALL GREEN : {ok}", file=sys.stderr)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
