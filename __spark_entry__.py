"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``curw_wrf_data_pusher_spark``; this module just
re-exports its correctness-gated query registry (one entry per
implemented operator from SURVEY.md §2, plus the LLM-data-pipeline
operators) and the matching DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# self-locate: the driver may import this file by path from any CWD.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from curw_wrf_data_pusher_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the E1-shaped
    cumulative-grid → lag-diff → long upsert-row pipeline."""
    return QUERIES["wrf_e1_push_rows"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (same column aliases)."""
    return dict(ORACLES)
