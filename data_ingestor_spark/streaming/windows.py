"""Streaming windowed aggregation + stateful dedup.

The reference has no time semantics at all (timestamps ride through as
strings/epochs, ``models/models.go:8-9,17``); these operators are part
of the engine's declared surface (SURVEY §2.2 streaming rows). The batch
twins — oracle-checked against DuckDB — live in ``plans/timeseries.py``;
the functions here produce the same logical plans on unbounded input
with watermark-bounded state.

State-size posture at scale: every operator below keys its state by
(window × group) or by the dedup key and a watermark bounds retention —
no unbounded state, which is the difference between a demo and a job
that survives day 30 of a 100 TB backfill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    window_size: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """(Sliding-)tumbling windowed counts with late-data tolerance.

    Works on both batch and streaming DataFrames: ``F.window`` is mode-
    agnostic; ``withWatermark`` bounds streaming state and drops rows
    later than ``watermark`` (no-op in batch mode).
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    win = F.window(F.col(ts_col), window_size, slide) if slide else F.window(F.col(ts_col), window_size)
    return (
        src.groupBy(win.alias("w"), F.col(group_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "n_events",
        )
    )


def session_windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Session windows: per-key activity bursts separated by ≥``gap``.

    ``F.session_window`` merges adjacent state as rows arrive; the
    watermark closes sessions once no earlier data can arrive.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("s"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def stateful_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup with watermark-bounded state.

    ``dropDuplicatesWithinWatermark`` keeps one row per key seen within
    the watermark horizon and expires state beyond it — the unbounded-
    state-safe form of ``dropDuplicates`` for infinite streams. Batch
    input falls back to plain ``dropDuplicates`` (same result set on
    bounded data).
    """
    if not events.isStreaming:
        return events.dropDuplicates(key_cols)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
