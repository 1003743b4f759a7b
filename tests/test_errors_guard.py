"""The AnalysisException-narrowing guard (ADVICE round 11).

``load_pq_rotation`` / ``start_doc_ingest`` probe paths THROUGH Spark
and must map ONLY the benign no-input-yet conditions to "absent";
every other analysis error re-raises (a swallowed auth/read failure
would silently serve an OPQ index unrotated or skip the legacy-layout
guard).
"""

from pyspark.errors import AnalysisException

from curw_wrf_data_pusher_spark.functions.errors import is_missing_input


class _FakeExc(AnalysisException):
    """AnalysisException with a pinned condition (the real ctor
    validates against the JVM error-class registry, so conditions
    not in this build — e.g. cloud-store auth classes — need a stub)."""

    def __init__(self, cond):
        self._cond = cond

    def getCondition(self):
        return self._cond

    def __str__(self):
        return f"[{self._cond}] stub"


def test_real_missing_path_is_benign(spark, tmp_path):
    try:
        spark.read.parquet(str(tmp_path / "definitely_missing"))
        raise AssertionError("expected AnalysisException")
    except AnalysisException as e:
        assert is_missing_input(e)
        assert is_missing_input(e, allow_empty=True)


def test_real_empty_dir_only_benign_when_allowed(spark, tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    try:
        spark.read.parquet(str(d))
        raise AssertionError("expected AnalysisException")
    except AnalysisException as e:
        assert not is_missing_input(e)  # schema'd probes: empty=error
        assert is_missing_input(e, allow_empty=True)


def test_other_conditions_reraise():
    for cond in (
        "UNSUPPORTED_DATASOURCE_FOR_DIRECT_QUERY",
        "FAILED_READ_FILE",
        "INVALID_PARAMETER_VALUE",
    ):
        exc = _FakeExc(cond)
        assert not is_missing_input(exc)
        assert not is_missing_input(exc, allow_empty=True)


def test_no_condition_falls_back_to_message():
    assert is_missing_input(_FakeExc(None).__class__(None)) is False
    # legacy spelling without an error-class tag
    class _Legacy(_FakeExc):
        def getCondition(self):
            return None

        def __str__(self):
            return "Path does not exist: /x"

    assert is_missing_input(_Legacy(None))


def test_load_pq_rotation_missing_vs_garbage(spark, tmp_path):
    """Missing index dir → None; present-but-unreadable → raises."""
    import pytest

    from curw_wrf_data_pusher_spark.llmops.annindex import load_pq_rotation

    assert load_pq_rotation(spark, str(tmp_path / "no_such_index")) is None
    bad = tmp_path / "bad_index" / "rotation"
    bad.mkdir(parents=True)
    (bad / "part-00000.parquet").write_bytes(b"not a parquet file")
    with pytest.raises(Exception):
        load_pq_rotation(spark, str(tmp_path / "bad_index"))


def test_doc_ingest_guard_empty_dir_is_no_corpus(spark, tmp_path):
    """An empty (mkdir'd but never written) out_dir must behave like a
    missing one — UNABLE_TO_INFER_SCHEMA maps to 'no corpus yet'."""
    from curw_wrf_data_pusher_spark.streaming.doc_ingest import (
        stream_ingest_documents,
    )

    watch = tmp_path / "watch"
    watch.mkdir()
    out = tmp_path / "out"
    out.mkdir()  # present but empty: the pre-fix code also passed
    # this, but only because it swallowed EVERY AnalysisException
    spark.createDataFrame(
        [(1, "hello world", "en", "web", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("append").parquet(str(watch))
    q = stream_ingest_documents(
        spark,
        str(watch),
        str(tmp_path / "store"),
        str(out),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert spark.read.parquet(str(out)).count() == 1
