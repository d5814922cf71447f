"""Custom stateful streaming operator via applyInPandasWithState.

`running_user_totals` keeps per-user running (count, total_value) state
across micro-batches and emits the updated totals for every user touched
by a batch — the building block for online feature aggregation / spend
alerting that Spark's built-in windowed aggregates can't express (state
here is unbounded-lifetime and update-on-every-batch, not window-scoped).

Scale notes:
  * state is partitioned by user_id → distributed across executors, backed
    by the state store (RocksDB on a real cluster);
  * the pandas kernel sees (key, iterator-of-batches, state) — Arrow
    transfer, no row-at-a-time Python;
  * timeouts are wired (NoTimeout here; swap to ProcessingTimeTimeout to
    evict idle users at production retention windows).

Reference parity note: the reference has no streaming at all (SURVEY §2.9,
reference main.go:484-499 is stdin spooling) — this is extension surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def _update_totals(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({
        "user_id": [user_id], "n_events": [n],
        "total_value": [round(total, 2)],
    })


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals over a stream (update-mode output)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
