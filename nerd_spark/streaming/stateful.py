"""Custom stateful streaming operator: per-entity running profile.

The reference's entity record IS its state store — every task does a
read-modify-write against Mongo (SURVEY §2.8 'stateful ops'). For
metrics that must update per micro-batch without rescanning the fact
table, Structured Streaming's applyInPandasWithState maintains the
per-key state inside the engine: here a running (total, last_ts,
max_value) profile per entity — the `add`/`setmax` op subset applied
incrementally, exactly the per-key serialization the hash-routed
workers provided (update_manager.py:420-435).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, total long, last_us long, max_value double"
STATE_SCHEMA = "total long, last_us long, max_value double"


def _update_profile(
    key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    total, last_us, max_value = (
        state.get if state.exists else (0, 0, float("-inf"))
    )
    for pdf in pdfs:
        total += len(pdf)
        if len(pdf):
            last_us = max(last_us, int(pdf["ts_us"].max()))
            max_value = max(max_value, float(pdf["value"].max()))
    state.update((total, last_us, max_value))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "total": [total],
            "last_us": [last_us],
            "max_value": [max_value],
        }
    )


def running_profiles(events_stream: DataFrame) -> DataFrame:
    """events stream (user_id, ts_us long, value) -> per-batch updated
    profiles. Update output mode; no timeout (profiles live as long as
    the entity — TTL expiry is the retention pass's job)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
