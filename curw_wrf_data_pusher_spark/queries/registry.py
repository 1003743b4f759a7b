"""Registry wiring SURVEY §2 operators to (Spark query, DuckDB oracle)
pairs.

Design rules that keep the driver's order-insensitive value-hash stable
across engines:
- every computed column is aliased identically in Spark and SQL;
- double aggregates are rounded to a fixed scale on BOTH sides (sum
  order differs between engines; rounding absorbs the ~1e-10 float
  noise);
- timestamps are emitted as formatted strings (Spark session tz is
  pinned UTC; DuckDB timestamps are naive — strings sidestep the
  tz-awareness mismatch);
- window ranks always carry a unique-id tie-break so row selection is
  deterministic in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the
    registry, optionally with its DuckDB oracle SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco
