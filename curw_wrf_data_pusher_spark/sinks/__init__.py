from .bucketed import drop_bucketed, write_bucketed
from .rfield_files import write_ordered_csv, write_rfield_files
from .upsert import build_mysql_upsert_sql, upsert_jdbc, upsert_parquet

__all__ = [
    "drop_bucketed",
    "write_bucketed",
    "write_ordered_csv",
    "write_rfield_files",
    "build_mysql_upsert_sql",
    "upsert_jdbc",
    "upsert_parquet",
]
