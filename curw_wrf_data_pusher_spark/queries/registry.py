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

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

#: Runtime-settable SQL confs every query needs regardless of which
#: SparkSession the caller hands us.  The external harness builds its
#: own vanilla session, so nothing here may live only in our factory
#: (session.py): nanosAsLong lets the TIMESTAMP(NANOS) events.parquet
#: scan succeed (load_table then converts ns→µs), and the UTC session
#: timezone keeps date_format/timestamp-string output byte-identical
#: to the DuckDB oracle on any host JVM timezone.
SESSION_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}


def pin_session(spark: SparkSession) -> None:
    """Make an arbitrary (possibly vanilla) SparkSession safe for the
    registered queries.  Idempotent; all confs are runtime-settable."""
    for k, v in SESSION_CONFS.items():
        spark.conf.set(k, v)


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the
    registry, optionally with its DuckDB oracle SQL.

    The registered callable pins session confs first, so every entry
    point is self-sufficient on a driver-provided session.  The
    original function is returned unwrapped for intra-module reuse."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str, *a, **k):
            pin_session(spark)
            return fn(spark, sf_dir, *a, **k)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco
