"""Key construction, parsing, and content-addressed series ids
(SURVEY §2.2 P8/P9; §1.1 series-identity row).

Reference semantics reproduced:
- station name  ``wrf_{lat}_{lon}``             (wrf_data_pusher.py:220)
- source name   ``{model}_{system}``            (wrf_data_pusher.py:287)
- sim tag       ``[{wrf_type}_]gfs_{run}_{hr}`` (wrf_data_pusher_seq.py:433-437)
- grid-key parse: split('_'), keep len==4, take part 1
  (gen_active_stations_rfields.py:149-154)
- series id: deterministic hash over tms metadata
  (sim_tag, lat, lon, model, version, variable, unit, unit_type)
  (wrf_data_pusher.py:230-248).  The reference delegates to an external
  adapter's id generator; this engine standardizes on sha256 of the
  ':'-joined metadata — deterministic, race-free, cluster-safe (no
  get-then-create round-trip needed; see operators/joins.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def station_name(lat: Column, lon: Column) -> Column:
    """``wrf_{lat:.6f}_{lon:.6f}`` — 6-dp string coords, as the
    reference stores them (wrf_data_pusher.py:214-220)."""
    return F.concat_ws(
        "_",
        F.lit("wrf"),
        F.format_string("%.6f", lat),
        F.format_string("%.6f", lon),
    )


def source_name(model: Column | str, wrf_system: Column | str) -> Column:
    model = model if isinstance(model, Column) else F.lit(model)
    wrf_system = wrf_system if isinstance(wrf_system, Column) else F.lit(wrf_system)
    return F.concat_ws("_", model, wrf_system)


def sim_tag(gfs_run: Column, gfs_data_hour: Column, wrf_type: Column | None = None) -> Column:
    """``[{wrf_type}_]gfs_{run}_{hour}`` (wrf_data_pusher_seq.py:433-437)."""
    base = F.concat_ws("_", F.lit("gfs"), gfs_run, gfs_data_hour)
    if wrf_type is None:
        return base
    return F.concat_ws("_", wrf_type, base)


def parse_grid_key(key: Column, expected_parts: int = 4, part: int = 2) -> Column:
    """Split a ``rainfall_{obsId}_{...}_{...}`` key on '_' and extract one
    part; keys with the wrong arity yield NULL (callers filter), matching
    the reference's ``len(...)==4`` guard."""
    parts = F.split(key, "_")
    return F.when(F.size(parts) == expected_parts, F.element_at(parts, part))


def series_hash_id(*meta: Column) -> Column:
    """Content-addressed timeseries id: sha256 over ':'-joined metadata.

    Deterministic across executors ⇒ the get-or-create existence check of
    the reference (wrf_data_pusher.py:230-248) degenerates to a pure
    projection + idempotent dim upsert — no coordination at 100 TB scale.
    """
    return F.sha2(F.concat_ws(":", *meta), 256)
