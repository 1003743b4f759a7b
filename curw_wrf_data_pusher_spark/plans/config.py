"""Run-configuration document (SURVEY §2.1 S9, FIXTURES §F7).

Mirrors the reference's config JSON schema
(config/wrf_d0_18_config.json:1-17; field list documented at
wrf_data_pusher.py:345-369) with the same fail-fast semantics as
``read_attribute_from_config_file`` (wrf_data_pusher.py:47-60): a
missing or empty required key aborts the run before any data moves.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


REQUIRED_KEYS = (
    "model", "version", "wrf_type", "gfs_run", "gfs_data_hour",
    "wrf_systems", "unit", "unit_type", "variable",
)


@dataclass
class WrfConfig:
    model: str
    version: str
    wrf_type: str
    gfs_run: str
    gfs_data_hour: str
    wrf_systems: list[str]
    unit: str
    unit_type: str
    variable: str
    sim_tag: str = ""
    extra: dict = field(default_factory=dict)

    @property
    def effective_sim_tag(self) -> str:
        # sim_tag defaults to '[{wrf_type}_]gfs_{run}_{hour}'
        # (wrf_data_pusher_seq.py:433-437)
        if self.sim_tag:
            return self.sim_tag
        base = f"gfs_{self.gfs_run}_{self.gfs_data_hour}"
        return f"{self.wrf_type}_{base}" if self.wrf_type else base

    @classmethod
    def from_dict(cls, d: dict) -> "WrfConfig":
        missing = [
            k for k in REQUIRED_KEYS if k not in d or d[k] in ("", None)
        ]
        if missing:
            raise ValueError(
                f"config keys missing or empty: {missing} "
                "(fail-fast, matching read_attribute_from_config_file)"
            )
        systems = d["wrf_systems"]
        if isinstance(systems, str):
            systems = [s.strip() for s in systems.split(",") if s.strip()]
        known = {k: d[k] for k in REQUIRED_KEYS if k != "wrf_systems"}
        extra = {k: v for k, v in d.items()
                 if k not in REQUIRED_KEYS and k != "sim_tag"}
        return cls(
            wrf_systems=systems,
            sim_tag=d.get("sim_tag", ""),
            extra=extra,
            **known,
        )

    @classmethod
    def from_json(cls, path: str) -> "WrfConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))
