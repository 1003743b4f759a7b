"""Regenerate queries/_opq_pinned.py — the frozen OPQ index behind
the registered ``llm_opq_serve`` row.

Trains opq_train(m=8, k_sub=8, n_iters=2, lloyd_iters=1) on the
sf0.01 embeddings table and writes the learned (rotation, codebooks)
as full-precision repr literals.  Run after any trainer change, then
re-verify llm_opq_serve vs DuckDB at sf0.01 AND sf0.1 (the oracle SQL
is generated from the same literals, so the pair can never drift —
but the HASH can if the trainer's numerics changed for the worse).

Usage:  python scripts/pin_opq.py  (from the repo root)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from curw_wrf_data_pusher_spark.llmops.opq import opq_train  # noqa: E402
from curw_wrf_data_pusher_spark.session import get_spark  # noqa: E402
from curw_wrf_data_pusher_spark.sources.lake import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_PIN_SF", "/root/testdata/sf0.01")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "curw_wrf_data_pusher_spark", "queries", "_opq_pinned.py",
)


def _fmt_floats(xs, indent: str) -> str:
    out, line = [], indent
    for x in xs:
        tok = repr(float(x)) + ", "
        if len(line) + len(tok) > 78:
            out.append(line.rstrip())
            line = indent
        line += tok
    out.append(line.rstrip())
    return "\n".join(out)


def main() -> None:
    spark = get_spark("opq-pin")
    emb = load_table(spark, SF_DIR, "embeddings")
    R, books = opq_train(emb, m=8, k_sub=8, n_iters=2, lloyd_iters=1)
    with open(OUT, "w") as f:
        f.write(
            '"""Pinned OPQ index for the registered llm_opq_serve row.\n'
            "\n"
            "Trained ONCE by opq_train(m=8, k_sub=8, n_iters=2,\n"
            "lloyd_iters=1) on the sf0.01 embeddings table and frozen as\n"
            "literals, so the registered query exercises the SERVING path\n"
            "(exact rotate -> arrow encode -> ADC) against a DuckDB mirror\n"
            "that uses the same literals; training itself is pinned by\n"
            "tests/test_opq.py.  Regenerate with scripts/pin_opq.py if the\n"
            'trainer changes.\n"""\n\n'
        )
        f.write("# 64 x 64 learned rotation, row i = input dim i\n")
        f.write("OPQ_R = [\n")
        for row in R:
            f.write("    [\n" + _fmt_floats(row, "        ") + "\n    ],\n")
        f.write("]\n\n")
        f.write("# m=8 subspaces x k_sub=8 centroids x d_sub=8 dims\n")
        f.write("OPQ_BOOKS = [\n")
        for b in books:
            f.write("    [\n")
            for c in b:
                f.write(
                    "        [\n"
                    + _fmt_floats(c, "            ")
                    + "\n        ],\n"
                )
            f.write("    ],\n")
        f.write("]\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
