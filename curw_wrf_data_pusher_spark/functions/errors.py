"""Error-class inspection for AnalysisException guards.

Several readers probe a path THROUGH Spark ("does this input exist
yet?") and want to treat only the benign no-input-yet outcomes as
"absent" while re-raising everything else (unreadable dir, auth
failure, mixed formats): mapping every ``AnalysisException`` to the
benign case silently skips the very guard the probe implements.

Spark ≥3.4 tags exceptions with stable error conditions; the two
no-input-yet conditions for file sources are ``PATH_NOT_FOUND``
(the dir is missing) and ``UNABLE_TO_INFER_SCHEMA`` (the dir exists
but holds no files to infer from — only reachable when no explicit
schema was passed).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException

#: dir missing entirely (raised even when an explicit schema is set)
PATH_NOT_FOUND = "PATH_NOT_FOUND"
#: dir present but empty / nothing to infer from (schema-less reads)
UNABLE_TO_INFER_SCHEMA = "UNABLE_TO_INFER_SCHEMA"


def _condition(exc: AnalysisException) -> str | None:
    """The stable error condition, tolerating older pyspark spellings."""
    for attr in ("getCondition", "getErrorClass"):
        getter = getattr(exc, attr, None)
        if getter is not None:
            try:
                return getter()
            except Exception:  # pragma: no cover - defensive
                continue
    return None


def is_missing_input(
    exc: AnalysisException, *, allow_empty: bool = False
) -> bool:
    """True iff ``exc`` is the benign "input does not exist yet" case.

    ``allow_empty=True`` additionally accepts the empty-dir
    ``UNABLE_TO_INFER_SCHEMA`` condition (for schema-less probes where
    "present but empty" is equivalent to "absent").  Any OTHER
    analysis error — unreadable location, corrupt footer surfaced at
    analysis, bad configuration — returns False so callers re-raise.
    """
    cond = _condition(exc)
    if cond is None:
        # no condition tag at all (very old Spark / wrapped error):
        # fall back to the message so behaviour degrades to the old
        # string-match rather than swallowing everything
        msg = str(exc)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return True
        return allow_empty and (
            "UNABLE_TO_INFER_SCHEMA" in msg or "Unable to infer schema" in msg
        )
    if cond == PATH_NOT_FOUND:
        return True
    return allow_empty and cond == UNABLE_TO_INFER_SCHEMA
