"""Synthetic F1-shaped WRF grid fixture (FIXTURES.md §F1) and the
independent pandas oracle replicating wrf_data_pusher.py:143-279
semantics (diff → unpivot → round → tz-shift → hash)."""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

EPOCH_STR = "2024-06-01 00:00:00"
FGT_UTC = "2024-06-02 03:17:45"
H, W, T = 6, 5, 13  # fixture grid: 6×5 cells, 13 steps → 12 intervals
SYSTEMS = ("A", "C")


def make_grid_pdf(seed: int = 7) -> pd.DataFrame:
    """Deterministic cumulative (non-decreasing in t) rainfall grid."""
    rng = np.random.default_rng(seed)
    rows = []
    lats = np.round(np.linspace(6.70, 7.30, H), 6)
    lons = np.round(np.linspace(79.80, 80.40, W), 6)
    for system in SYSTEMS:
        incr = rng.uniform(0, 5, size=(T, H, W))
        incr[0] = rng.uniform(0, 2, size=(H, W))
        cum = np.cumsum(incr, axis=0)
        for t in range(T):
            for y in range(H):
                for x in range(W):
                    rows.append(
                        {
                            "wrf_system": system,
                            "t_idx": t,
                            "xtime_min": 15 * (t + 1),
                            "y": y,
                            "x": x,
                            "latitude": lats[y],
                            "longitude": lons[x],
                            # 3-dp grid values: downstream 3-dp rounding
                            # is then a no-op in both engines (no
                            # half-up vs half-even tie divergence)
                            "rainnc_cum": round(float(cum[t, y, x]), 3),
                        }
                    )
    return pd.DataFrame(rows)


def oracle_push_rows(
    grid: pd.DataFrame,
    sim_tag: str,
    model: str,
    version: str,
    variable: str,
    unit: str,
    unit_type: str,
) -> pd.DataFrame:
    """Pandas replica of the reference's read_netcdf_file loop
    (wrf_data_pusher.py:198-268): numpy diff over t, per-cell unpivot,
    3-dp value rounding, +05:30 shift, minute formatting, sha256 ids."""
    epoch = datetime.strptime(EPOCH_STR, "%Y-%m-%d %H:%M:%S")
    fgt_lk = (
        datetime.strptime(FGT_UTC, "%Y-%m-%d %H:%M:%S")
        + timedelta(hours=5, minutes=30)
    ).strftime("%Y-%m-%d %H:%M:00")
    out = []
    for system, g in grid.groupby("wrf_system"):
        cube = (
            g.pivot_table(
                index="t_idx", columns=["y", "x"], values="rainnc_cum"
            )
            .sort_index()
        )
        times = g.drop_duplicates("t_idx").sort_values("t_idx")[
            "xtime_min"
        ].tolist()
        diff = cube.values[1:] - cube.values[:-1]
        coords = {
            (y, x): (lat, lon)
            for y, x, lat, lon in g[
                ["y", "x", "latitude", "longitude"]
            ].drop_duplicates().itertuples(index=False)
        }
        source = f"{model}_{system}"
        for i in range(diff.shape[0]):
            t_lk = (
                epoch
                + timedelta(minutes=times[i + 1])
                + timedelta(hours=5, minutes=30)
            ).strftime("%Y-%m-%d %H:%M:00")
            for col_idx, (y, x) in enumerate(cube.columns):
                lat, lon = coords[(y, x)]
                meta = ":".join(
                    [sim_tag, f"{lat:.6f}", f"{lon:.6f}", source,
                     version, variable, unit, unit_type]
                )
                tms_id = hashlib.sha256(meta.encode()).hexdigest()
                out.append(
                    {
                        "tms_id": tms_id,
                        "time": t_lk,
                        "fgt": fgt_lk,
                        "value": float(f"{diff[i, col_idx]:.3f}"),
                    }
                )
    return pd.DataFrame(out)
