"""JDBC dimension sources (SURVEY §2.1 S3/S4/S5).

Reference: per-row keyed SELECTs against MySQL dims (source, variable,
unit, station — wrf_data_pusher.py:292,449-450,227-228) and a full
16k-station scan into a dict (:447).  At scale, point lookups become a
broadcast dim join; the stored-proc "active stations" becomes a pushed
WHERE clause.

No MySQL server or driver exists in this container, so connectivity is
exercised in production only; option construction and the
query-pushdown SQL are pure and unit-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_options(
    url: str,
    table_or_query: str,
    user: str,
    password: str,
    is_query: bool = False,
    fetchsize: int = 10_000,
    partition: dict | None = None,
) -> dict[str, str]:
    """Build spark.read.format('jdbc') options.

    ``partition``: {'column', 'lowerBound', 'upperBound',
    'numPartitions'} for parallel scans of big tables — without it a
    JDBC scan is a single task, which is only acceptable for dims."""
    opts = {
        "url": url,
        ("query" if is_query else "dbtable"): table_or_query,
        "user": user,
        "password": password,
        "fetchsize": str(fetchsize),
    }
    if partition:
        opts.update(
            {
                "partitionColumn": str(partition["column"]),
                "lowerBound": str(partition["lowerBound"]),
                "upperBound": str(partition["upperBound"]),
                "numPartitions": str(partition["numPartitions"]),
            }
        )
    return opts


def active_stations_query(days: int = 7) -> str:
    """S5 as plain SQL pushed to the database — replaces the
    getActiveRainfallObsStations stored procedure
    (gen_active_stations_rfields.py:117-123)."""
    return (
        "SELECT station_id, hash_id, station_name, latitude, longitude "
        "FROM obs_station "
        f"WHERE last_active >= NOW() - INTERVAL {int(days)} DAY"
    )


def read_dim(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    partition: dict | None = None,
) -> DataFrame:
    """Scan a dimension table; callers wrap in F.broadcast at the join
    (S3/S4 pattern: one scan per run, never per-row lookups).

    ``partition`` (see ``jdbc_options``) splits the scan into
    ``numPartitions`` range-predicate queries — required for any table
    too big for a single-task scan.  Integration-tested against an
    embedded Derby database (tests/test_sources_sinks.py)."""
    return (
        spark.read.format("jdbc")
        .options(**jdbc_options(url, table, user, password,
                                partition=partition))
        .load()
    )
