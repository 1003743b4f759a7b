"""Timestamp decode / shift / truncate scalar surface (SURVEY §2.2 P7, P10).

Reference semantics reproduced:
- XTIME decode: minutes-since-epoch ints against a textual epoch parsed
  from the variable's description/units (wrf_data_pusher.py:174-176,
  265-266).
- UTC → Sri Lanka local: fixed +05:30, applied value-wise in local-naive
  style (wrf_data_pusher.py:75-76; file-mtime variant :68-72 adds 19800 s).
- Minute truncation: '%Y-%m-%d %H:%M:00' (wrf_data_pusher.py:268).

All implemented with built-in JVM-side functions — no Python UDFs in the
hot path; every expression stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Fixed Sri Lanka offset. Asia/Colombo has no DST; the reference
#: hard-codes timedelta(hours=5, minutes=30).
LK_OFFSET = "INTERVAL '5:30' HOUR TO MINUTE"


def decode_xtime(epoch_str: Column | str, minutes: Column) -> Column:
    """epoch string ('%Y-%m-%d %H:%M:%S') + minutes offset → timestamp.

    Mirrors ``datetime.strptime(epoch_str) + timedelta(minutes=m)``
    (wrf_data_pusher.py:265-266) as pure Catalyst expressions.
    """
    base = F.to_timestamp(
        epoch_str if isinstance(epoch_str, Column) else F.lit(epoch_str)
    )
    return base + F.make_interval(mins=minutes.cast("int"))


def utc_to_lk(ts: Column) -> Column:
    """UTC → Asia/Colombo (+05:30 fixed, DST-free).

    ``from_utc_timestamp`` renders the same local-naive instant the
    reference builds with ``+ timedelta(hours=5, minutes=30)``.
    """
    return F.from_utc_timestamp(ts, "Asia/Colombo")


def truncate_minute(ts: Column) -> Column:
    """Zero out seconds — the reference emits '%H:%M:00'."""
    return F.date_trunc("minute", ts)


def format_minute(ts: Column) -> Column:
    """Render to the reference's canonical minute-precision string."""
    return F.date_format(ts, "yyyy-MM-dd HH:mm:00")
