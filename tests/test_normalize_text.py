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
