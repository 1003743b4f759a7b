"""P17 file statistics: the Spark `_metadata`-column row counts must
equal the parquet FOOTER counts DuckDB reads via
parquet_file_metadata — independent sources (data scan vs footer)
agreeing file-for-file.  This is the oracle the driver's view-only
contract cannot carry (it needs a filesystem path), run locally."""

from __future__ import annotations

import os

import duckdb

from curw_wrf_data_pusher_spark.queries.timeseries_sql import p17_file_stats


def test_file_stats_match_parquet_footers(spark, sf_dir):
    got = {
        (os.path.basename(r.file_name), r.tbl): r.num_rows
        for r in p17_file_stats(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    want = {}
    for tbl in ("lineitem", "orders", "events"):
        for r in con.execute(
            "SELECT file_name, num_rows FROM "
            f"parquet_file_metadata('{sf_dir}/{tbl}.parquet')"
        ).fetchall():
            want[(os.path.basename(r[0]), tbl)] = r[1]
    assert got == want and len(got) >= 3
