"""Spark-vs-DuckDB differential harness mirroring the driver's t2 gate:
row-count + schema + order-insensitive value-hash per query.

Canonicalization: columns sorted by name, every value rendered to a
canonical string (floats via repr → shortest round-trip, so a match
means bit-identical doubles), rows sorted, md5 over the whole block.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_value(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        if v == int(v) and abs(v) < 1e15:
            return repr(v)
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canonical_hash(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(
        "\x1f".join(_canon_value(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.md5("\x1e".join(rows).encode()).hexdigest()
    return len(df), cols, h


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    sp = spark_df.toPandas()
    du = con.execute(sql).df()
    n_sp, cols_sp, h_sp = canonical_hash(sp)
    n_du, cols_du, h_du = canonical_hash(du)
    dtype_mismatches = [
        (c, str(sp[c].dtype), str(du[c].dtype))
        for c in cols_sp
        if c in du.columns and str(sp[c].dtype) != str(du[c].dtype)
    ]
    return {
        "rows": (n_sp, n_du),
        "cols": (cols_sp, cols_du),
        "hash": (h_sp, h_du),
        "rows_match": n_sp == n_du,
        "cols_match": cols_sp == cols_du,
        "hash_match": h_sp == h_du,
        "dtype_mismatches": dtype_mismatches,
        "spark_pdf": sp,
        "duck_pdf": du,
    }
