from .keys import (
    parse_grid_key,
    series_hash_id,
    sim_tag,
    source_name,
    station_name,
)
from .numeric import round_coord, round_value
from .timeutils import (
    LK_OFFSET,
    decode_xtime,
    format_minute,
    truncate_minute,
    utc_to_lk,
)

__all__ = [
    "parse_grid_key",
    "series_hash_id",
    "sim_tag",
    "source_name",
    "station_name",
    "round_coord",
    "round_value",
    "LK_OFFSET",
    "decode_xtime",
    "format_minute",
    "truncate_minute",
    "utc_to_lk",
]
