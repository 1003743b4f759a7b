from .bucketed import drop_bucketed, write_bucketed
from .maintenance import (
    archive_dir,
    compact_small_files,
    plan_compaction,
    retention_delete,
)
from .rfield_files import write_ordered_csv, write_rfield_files
from .upsert import build_mysql_upsert_sql, upsert_jdbc, upsert_parquet

__all__ = [
    "archive_dir",
    "build_mysql_upsert_sql",
    "compact_small_files",
    "drop_bucketed",
    "plan_compaction",
    "retention_delete",
    "upsert_jdbc",
    "upsert_parquet",
    "write_bucketed",
    "write_ordered_csv",
    "write_rfield_files",
]
