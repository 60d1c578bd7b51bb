"""Streaming joins: stream⋈static (broadcast enrichment) and
stream⋈stream with watermarked state.

The reference enriches nothing (each record loads as parsed); these are
the engine-provided streaming surface for the patterns a 100 TB
pipeline actually needs:

- :func:`enrich_with_static` — the dimension-lookup pattern: the static
  side is planned like any batch relation (broadcast when small), no
  state is kept, arbitrarily long streams are safe.
- :func:`join_streams_windowed` — correlating two live streams (clicks
  to impressions, responses to requests): BOTH sides carry watermarks
  and the join predicate bounds event-time distance, so each side's
  buffered state expires once the other side's watermark passes —
  bounded state on unbounded input, which is the entire game.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_static(stream: DataFrame, static_dim: DataFrame, on: str, how: str = "left") -> DataFrame:
    """Stream⋈static join — per-micro-batch lookup against a batch
    relation. Catalyst broadcasts a small dim; no streaming state."""
    return stream.join(static_dim, on=on, how=how)


def join_streams_windowed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream⋈stream inner join: rows match when keys are equal AND the
    right event lands within ``(left_ts, left_ts + max_gap]``. The
    event-time bound + both-side watermarks let Spark expire join state.
    """
    lcol = f"__l_{left_ts}"
    rcol = f"__r_{right_ts}"
    rkey = f"__r_{key}"
    lw = left.withWatermark(left_ts, watermark).withColumnRenamed(left_ts, lcol)
    rw = (
        right.withWatermark(right_ts, watermark)
        .withColumnRenamed(right_ts, rcol)
        .withColumnRenamed(key, rkey)
    )
    cond = (
        (F.col(key) == F.col(rkey))
        & (F.col(rcol) > F.col(lcol))
        & (F.col(rcol) <= F.col(lcol) + F.expr(f"INTERVAL {max_gap}"))
    )
    return lw.join(rw, cond).drop(rkey)
