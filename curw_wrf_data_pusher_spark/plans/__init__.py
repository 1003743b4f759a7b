from .bucketed_lake import (
    append_fact_rows,
    compact_fact_store,
    create_fact_store,
    latest_fgt_per_series,
    read_fact_latest,
)
from .config import WrfConfig
from .hybrid import build_hybrid_rfield
from .rfields import build_rfields
from .wrf_push import push_wrf_grid

__all__ = [
    "WrfConfig",
    "append_fact_rows",
    "build_hybrid_rfield",
    "build_rfields",
    "compact_fact_store",
    "create_fact_store",
    "latest_fgt_per_series",
    "push_wrf_grid",
    "read_fact_latest",
]
