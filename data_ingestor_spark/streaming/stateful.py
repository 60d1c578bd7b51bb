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

Known-benign noise: executing this operator emits one pandas
FutureWarning per task from pyspark's OWN state serializer
(serializers.py ``pd.concat`` of the all-NA padding rows it inserts to
equalize data/state column lengths — not from this module's frames,
which are always 1 row and fully typed). The subsequent Arrow
conversion is pinned to the explicit output/state schemas, so the
pandas-3 dtype-inference change the warning describes cannot alter
this operator's result schema.
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


# --- transformWithState (Spark 4 arbitrary-state API) --------------------------
#
# The successor API to applyInPandasWithState: typed state variables
# (ValueState / ListState / MapState), per-key timers, and an object
# lifecycle (init/handleInputRows/close) instead of one callback — the
# shape long-running production stateful pipelines are moving to. The
# operator below is the same running-counter semantics as
# running_user_counters so the two APIs are directly comparable (and
# pytest asserts they agree).

try:  # the API landed in Spark 4.0; guard so older runtimes still import
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningCounterProcessor(StatefulProcessor):
        """Per-user running (count, value-sum) via a ValueState tuple."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("counters", "n bigint, total double")

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n_prev, total_prev = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            batch_n = 0
            batch_total = 0.0
            for pdf in rows:
                batch_n += len(pdf)
                batch_total += float(pdf["value"].sum())
            n_new = n_prev + batch_n
            total_new = total_prev + batch_total
            self._state.update((n_new, total_new))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "batch_events": [batch_n],
                    "total_events": [n_new],
                    "total_value": [total_new],
                }
            )

        def close(self) -> None:
            pass

    def running_user_counters_tws(events: DataFrame) -> DataFrame:
        """running_user_counters re-expressed on transformWithStateInPandas
        — typed ValueState, same output schema and semantics.

        Runtime requirement: the transformWithState state-server protocol
        needs ``google.protobuf`` in the Python worker; on runtimes
        without it the query fails at stream start with
        STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE (the pytest twin
        probes for protobuf and skips — the operator definition itself
        imports fine either way)."""
        return (
            events.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=_RunningCounterProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="append",
                timeMode="none",
            )
        )

except ImportError:  # pragma: no cover - pre-4.0 runtime
    running_user_counters_tws = None
