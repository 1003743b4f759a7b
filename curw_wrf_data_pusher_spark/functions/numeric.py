"""Numeric formatting surface (SURVEY §2.2 P6).

The reference rounds coordinates to 6 dp and rainfall values to 3 dp at
emit time (wrf_data_pusher.py:214-215,268; gen_rfields.py:181-184).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_coord(c: Column) -> Column:
    return F.round(c, 6)


def round_value(c: Column) -> Column:
    return F.round(c, 3)
