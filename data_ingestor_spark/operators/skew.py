"""Skew-resistant two-phase aggregation.

The problem at scale: ``groupBy(key)`` hashes each key to one reducer —
a hot key (one customer with 10% of all events, a null-heavy join key)
turns into one straggler task that dominates the stage, no matter how
many executors idle. AQE splits skewed *join* partitions but a skewed
*aggregation* key still lands on one task for the final combine.

Fix (for algebraic aggregates — sum/count/min/max and anything built
from them): salt the key with a deterministic shard id, aggregate
(key, salt) — the hot key's rows now spread over ``salt_buckets``
reducers — then re-aggregate the per-shard partials by key alone. The
second shuffle moves only ``keys × salt_buckets`` pre-aggregated rows,
not data. Results are IDENTICAL to the direct groupBy (addition is
associative); only the physical distribution changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_sum_count(
    df: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, Column],
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe grouped aggregation.

    ``sum_cols`` maps output alias → summable column expression (use
    exact decimal casts for money, ``F.lit(1)`` for counts).
    ``salt_source`` is a column whose hash spreads the hot key's rows
    (default: a per-row monotonic id — any high-cardinality column is
    cheaper when available).
    """
    salt = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt_buckets))
        if salt_source
        else F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(*[F.sum(expr).alias(alias) for alias, expr in sum_cols.items()])
    )
    return partial.groupBy(*group_cols).agg(
        *[F.sum(alias).alias(alias) for alias in sum_cols]
    )
