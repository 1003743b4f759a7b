"""Custom stateful streaming operator (SURVEY §2.10 "State" row —
the engine's extension beyond the reference's sink-side state).

``running_gauge_totals``: per-gauge running accumulation over an
unbounded stream — each micro-batch of (key, time, value) readings
updates per-key state (running total, reading count, last timestamp)
via ``applyInPandasWithState``.  This is the streaming analogue of the
cumulative series the WRF grid stores natively: with it, raw gauge
deltas stream in and cumulative series stream out, ready for the same
lag-diff consumers.

State is one tiny row per key (O(|gauges|), not O(|readings|)); Spark
checkpoints it with the query, so restarts resume exactly.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "hash_id string, time timestamp, value double, cum_value double, "
    "n_readings long"
)
STATE_SCHEMA = "total double, n long"


def _accumulate(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    total, n = state.get if state.exists else (0.0, 0)
    out = []
    for pdf in batches:
        pdf = pdf.sort_values("time")
        for row in pdf.itertuples(index=False):
            total = round(total + float(row.value), 6)
            n += 1
            out.append((key[0], row.time, float(row.value), total, n))
    state.update((total, n))
    yield pd.DataFrame(
        out, columns=["hash_id", "time", "value", "cum_value", "n_readings"]
    )


def running_gauge_totals(readings: DataFrame) -> DataFrame:
    """(hash_id, time, value) stream → per-reading running totals with
    cross-batch state. Works on streaming DataFrames; for batch input
    use a window cumsum instead (same semantics, no state needed)."""
    return readings.groupBy("hash_id").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
