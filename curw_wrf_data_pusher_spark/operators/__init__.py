from .bloom import bloom_semi_join
from .dedup import latest_per_series, latest_per_series_join
from .diff import adjacent_diff
from .expectations import check_expectations, expect
from .funnel import cohort_retention, funnel_steps, multi_touch_attribution
from .fuzzy import fuzzy_self_pairs, resolve_entities
from .graph import canonical_by_centrality, pagerank
from .heavy import heavy_hitters_exact, heavy_hitters_mg
from .joins import asof_join, get_or_create, nearest_neighbor_map, range_join
from .layout import zorder_keys, zorder_write
from .pivot import pivot_by_source, unpivot
from .profile import (
    distribution_drift,
    equi_depth_histogram,
    equi_width_histogram,
    profile_table,
)
from .rfield import hybrid_wide_frame
from .rollup import (
    commit_hll_rollup,
    commit_rollup,
    compact_hll_rollup,
    compact_rollup,
    hll_rollup_estimates,
    merge_partials,
    read_hll_rollup,
    read_rollup,
    rollup_partials,
)
from .sampling import approx_sum_count, hash_sample
from .scd import scd2_apply, scd2_from_events, scd2_lookup
from .sketch import (
    countmin_build,
    countmin_lookup,
    countmin_merge,
    kmv_estimate,
    kmv_jaccard,
    kmv_merge,
    kmv_sketch,
    quantile_sketch,
    quantile_sketch_estimate,
    quantile_sketch_merge,
)
from .snapshot import row_digest, snapshot_diff
from .timeseries import (
    gap_fill,
    interval_concurrency,
    mad_outliers,
    robust_scale,
)

__all__ = [
    "adjacent_diff",
    "asof_join",
    "bloom_semi_join",
    "canonical_by_centrality",
    "check_expectations",
    "cohort_retention",
    "distribution_drift",
    "interval_concurrency",
    "kmv_estimate",
    "kmv_jaccard",
    "kmv_merge",
    "kmv_sketch",
    "multi_touch_attribution",
    "commit_hll_rollup",
    "commit_rollup",
    "compact_hll_rollup",
    "hll_rollup_estimates",
    "read_hll_rollup",
    "hash_sample",
    "approx_sum_count",
    "compact_rollup",
    "countmin_build",
    "countmin_lookup",
    "countmin_merge",
    "equi_depth_histogram",
    "equi_width_histogram",
    "expect",
    "funnel_steps",
    "fuzzy_self_pairs",
    "gap_fill",
    "get_or_create",
    "heavy_hitters_exact",
    "heavy_hitters_mg",
    "hybrid_wide_frame",
    "latest_per_series",
    "latest_per_series_join",
    "mad_outliers",
    "merge_partials",
    "nearest_neighbor_map",
    "pagerank",
    "quantile_sketch",
    "quantile_sketch_estimate",
    "quantile_sketch_merge",
    "pivot_by_source",
    "profile_table",
    "range_join",
    "read_rollup",
    "resolve_entities",
    "robust_scale",
    "rollup_partials",
    "row_digest",
    "scd2_apply",
    "scd2_from_events",
    "scd2_lookup",
    "snapshot_diff",
    "unpivot",
    "zorder_keys",
    "zorder_write",
]
