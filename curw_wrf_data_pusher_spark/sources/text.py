"""Delimited-text sources (CSV/TSV) with explicit schemas.

The reference EMITS CSVs (gen_active_stations_rfields.py's hybrid
frames); real deployments also ingest them — gauge exports, station
registries, vendor drops.  Two non-negotiables at scale, both the
opposite of `spark.read.csv(path)` defaults:

- EXPLICIT schema: inference is a full extra pass over the data and
  yields environment-dependent types (a column of ids that happens to
  be all-numeric in one drop infers long, then breaks on the next) —
  the JSONL reader in sinks/export.py applies the same rule.
- PERMISSIVE + captured corrupt records: a bad row in a 10-TB drop
  must not kill the job (FAILFAST) or silently vanish (DROPMALFORMED);
  it lands in ``_corrupt_record`` for the caller to count, quarantine
  and re-request.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """Scan a CSV directory/file with an explicit schema; malformed
    rows survive with their raw text in ``_corrupt_record`` and NULL
    data columns.  Filter/route on ``is_corrupt_row`` downstream.

    Built as ``from_csv`` over a text scan rather than
    ``spark.read.csv``: the CSV source forbids queries that touch its
    internal corrupt-record column without caching the whole frame
    first (AnalysisException) — caching a 10-TB raw scan to quarantine
    bad rows is exactly backwards.  As an expression, ``from_csv``
    carries the corrupt column like any other and the quarantine split
    stays a plain map-side filter.  Header rows are dropped by literal
    match against the schema's column names (the machine-written-CSV
    contract; per-file, so multi-file directories work)."""
    full_schema = f"{schema}, {CORRUPT_COL} string"
    lines = spark.read.text(path)
    if header:
        names = spark.createDataFrame([], schema).columns
        lines = lines.filter(F.col("value") != delimiter.join(names))
    parsed = lines.select(
        F.from_csv(
            F.col("value"),
            full_schema,
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": CORRUPT_COL,
                "sep": delimiter,
            },
        ).alias("__r")
    )
    return parsed.select("__r.*")


def is_corrupt_row() -> F.Column:
    return F.col(CORRUPT_COL).isNotNull()


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_the_corrupt_column, corrupt_rows) — the
    quarantine split a production ingest applies before anything
    else."""
    clean = df.filter(~is_corrupt_row()).drop(CORRUPT_COL)
    bad = df.filter(is_corrupt_row()).select(CORRUPT_COL)
    return clean, bad
