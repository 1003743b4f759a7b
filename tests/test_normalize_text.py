"""normalize_text: tier semantics and the pandas_udf NFC path."""

from __future__ import annotations

import unicodedata

import pytest

from curw_wrf_data_pusher_spark.llmops.curation import normalize_text


def _one(spark, raw, **kw):
    df = spark.createDataFrame([(raw,)], "text string")
    return normalize_text(df, **kw).first()["text"]


def test_control_strip_and_whitespace_collapse(spark):
    assert _one(spark, "a\x00b\x07c   d\t\ne ") == "abc d e"


def test_lowercase_optional(spark):
    assert _one(spark, "AbC", lowercase=True) == "abc"
    assert _one(spark, "AbC") == "AbC"


def test_nfc_composes_combining_sequences(spark):
    decomposed = "cafe\u0301"  # e + combining acute (5 codepoints)
    out = _one(spark, decomposed, form="NFC")
    assert out == "caf\u00e9" and len(out) == 4
    assert out == unicodedata.normalize("NFC", decomposed)


def test_nfkc_folds_compatibility_chars(spark):
    # fullwidth digits + ligature fold under NFKC, survive NFC
    assert _one(spark, "１ﬁ", form="NFKC") == "1fi"
    assert _one(spark, "１ﬁ", form="NFC") == "１ﬁ"


def test_preserve_newlines_when_not_collapsing(spark):
    assert _one(spark, "a\nb", collapse_whitespace=False) == "a\nb"


def test_null_text_stays_null(spark):
    df = spark.createDataFrame([(None,)], "text string")
    assert normalize_text(df, form="NFC").first()["text"] is None


def test_invalid_form_raises(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="normalization form"):
        normalize_text(df, form="NFX")


def test_catalyst_tier_has_no_python_udf(spark):
    df = spark.createDataFrame([("x",)], "text string")
    plan = (
        normalize_text(df, lowercase=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# Gopher repetition signals (llmops/textstats.repetition_signals) —
# the registered row pins the 2-gram path on real data; the corpus
# never repeats a wrapped line, so the line-duplication signals are
# pinned here on a synthetic doc.


def test_repetition_signals_on_synthetic_doc(spark):
    from curw_wrf_data_pusher_spark.llmops.textstats import (
        repetition_signals,
    )

    docs = spark.createDataFrame(
        [
            # 4 lines, "spam spam" twice → dup_line_frac = 1 - 3/4;
            # dup chars = 2 * len("spam spam") = 18 of 9+9+5+3 = 26
            (1, "spam spam\nspam spam\nhello\nend"),
            # top 2-gram: "a b" occurs 3x in "a b a b a b" (overlap
            # counts), covering 3*3=9 chars of 11
            (2, "a b a b a b"),
            (3, "single"),       # no 2-gram → NULL top columns
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_signals(docs).collect()}
    r1 = out[1]
    assert r1.n_lines == 4
    assert abs(r1.dup_line_frac - 0.25) < 1e-12
    assert abs(r1.dup_line_char_frac - 18 / 26) < 1e-12
    r2 = out[2]
    assert r2.top_2gram == "a b"
    assert abs(r2.top_2gram_char_frac - 9 / 11) < 1e-12
    r3 = out[3]
    assert r3.top_2gram is None and r3.top_2gram_char_frac is None
    assert r3.dup_line_frac == 0.0


def test_repetition_signals_matches_python_mirror(spark):
    """Randomized corpora: the sorted-run formulation (neighbor-test
    dup chars, run-gap top gram) equals a brute-force Python mirror —
    including the array_min tie rule (highest count, then smallest
    gram) the rescanning form pinned."""
    import random

    from curw_wrf_data_pusher_spark.llmops.textstats import (
        repetition_signals,
    )

    rng = random.Random(1414)
    texts = []
    for _ in range(40):
        n_ln = rng.randint(1, 6)
        lines = [
            " ".join(
                rng.choice("aa bb cc dd".split())
                for _ in range(rng.randint(1, 12))
            )
            for _ in range(n_ln)
        ]
        # force some exact duplicate lines
        if n_ln >= 2 and rng.random() < 0.5:
            lines[-1] = lines[0]
        texts.append("\n".join(lines))
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: r for r in repetition_signals(docs).collect()}
    for i, t in enumerate(texts):
        lines = t.split("\n")
        from collections import Counter

        lc = Counter(lines)
        dup_chars = sum(c * len(x) for x, c in lc.items() if c >= 2)
        n_line_chars = sum(len(x) for x in lines)
        toks = t.strip().split()
        grams = [
            f"{toks[j]} {toks[j + 1]}" for j in range(len(toks) - 1)
        ] if len(toks) >= 2 else []
        r = got[i]
        assert r.n_lines == len(lines)
        assert abs(r.dup_line_frac - (1 - len(lc) / len(lines))) < 1e-12
        if n_line_chars:
            assert abs(r.dup_line_char_frac - dup_chars / n_line_chars) < 1e-12
        if grams:
            gc = Counter(grams)
            best = min((-c, g) for g, c in gc.items())
            assert r.top_2gram == best[1]
            exp = (-best[0]) * len(best[1]) / len(t)
            assert abs(r.top_2gram_char_frac - exp) < 1e-12
        else:
            assert r.top_2gram is None


def test_cooccurrence_window_and_symmetry(spark):
    """Hand-computed ±2 window: pairs count once per unordered
    occurrence, never beyond the window, case/whitespace-normalized."""
    from curw_wrf_data_pusher_spark.llmops.textstats import (
        cooccurrence_counts,
    )

    docs = spark.createDataFrame(
        [(1, "A b  a c"), (2, "b a")],
        "doc_id long, text string",
    )
    got = {
        (r.a, r.b): r.cnt
        for r in cooccurrence_counts(docs, window=2).collect()
    }
    # doc1 tokens: a b a c — window 2 pairs: (a,b)(a,a)(a,b)... wait:
    # i=0: (a,b),(a,a); i=1: (a,b),(b,c); i=2: (a,c).  doc2: (a,b).
    assert got == {
        ("a", "b"): 3, ("a", "a"): 1, ("b", "c"): 1, ("a", "c"): 1,
    }
    # single-token docs contribute nothing
    one = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    assert cooccurrence_counts(one).count() == 0
    # tab/newline-prefixed text must not leak "" tokens into pairs
    # (trim() strips only spaces; the \s+ split yields a leading "")
    tabbed = spark.createDataFrame(
        [(1, "\tfoo bar")], "doc_id long, text string"
    )
    got_t = {(r.a, r.b): r.cnt
             for r in cooccurrence_counts(tabbed, window=4).collect()}
    assert got_t == {("bar", "foo"): 1}
    # window < 1 would generate a DESCENDING sequence (silent
    # self-pairs + inverted offsets) — must error at entry instead
    import pytest

    with pytest.raises(ValueError, match="window"):
        cooccurrence_counts(docs, window=0)
    with pytest.raises(ValueError, match="window"):
        cooccurrence_counts(docs, window=-3)


def test_k_anonymity_audit_flags(spark):
    from curw_wrf_data_pusher_spark.llmops.textstats import (
        k_anonymity_audit,
    )
    from pyspark.sql import functions as F

    rows = (
        [("en", "w", i) for i in range(5)]        # n=5, 5 distinct
        + [("en", "x", 7), ("en", "x", 7)]        # n=2, 1 distinct
    )
    df = spark.createDataFrame(rows, "lang string, source string, s long")
    got = {
        (r.lang, r.source): (r.n, r.n_sensitive, r.k_ok, r.l_ok)
        for r in k_anonymity_audit(
            df, ["lang", "source"], F.col("s"), k=3, l=2
        ).collect()
    }
    assert got[("en", "w")] == (5, 5, True, True)
    assert got[("en", "x")] == (2, 1, False, False)
