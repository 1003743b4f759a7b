from .diff import adjacent_diff
from .dedup import latest_per_series, latest_per_series_join
from .joins import get_or_create, nearest_neighbor_map
from .pivot import pivot_by_source, unpivot
from .rfield import hybrid_wide_frame

__all__ = [
    "adjacent_diff",
    "latest_per_series",
    "latest_per_series_join",
    "get_or_create",
    "nearest_neighbor_map",
    "pivot_by_source",
    "unpivot",
    "hybrid_wide_frame",
]
