"""As-of (time-travel) join — an operator Spark lacks natively
(SURVEY.md §2.2 "Join: as-of / interval").

Semantics: for each left row, attach the most recent right row with the
matching key whose time is <= the left time (backward as-of, like
``pd.merge_asof`` / DuckDB's ``ASOF JOIN``).

Implementation is the scalable sort-merge formulation, pure DataFrame
ops (no Python in the row path, no broadcast of the big side):

1. union the two inputs tagged by side, right-side payload carried,
   left payload null;
2. one shuffle: window partitioned by key, ordered by (time, side)
   with right rows sorting before left rows at equal times (<=);
3. ``last(payload, ignorenulls)`` forward-fills the latest right
   payload onto each left row;
4. filter back to left rows.

Cost: a single exchange on the key — the same price as the equi-join
Spark would do anyway; no per-group Python, no broadcast of the fact
side. This beats ``applyInPandas`` + ``pd.merge_asof`` (Arrow transfer
of both tables through Python) at 100 TB scale, and AQE's skew-join
splitting still applies to the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join. Returns all ``left`` columns + ``payload`` columns
    from ``right``.

    ``direction="backward"`` (default): most recent right row with
    time <= left time (null where none precedes). ``"forward"``: the
    nearest right row with time >= left time — implemented by running
    the same sort-merge formulation over the reversed time axis, so
    both directions cost exactly one exchange.

    ``right`` should be unique per (key, time) for deterministic output —
    pre-aggregate it otherwise. ``payload`` names must not collide with
    ``left`` columns.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    collisions = set(payload) & set(left.columns)
    if collisions:
        raise ValueError(f"payload columns collide with left columns: {sorted(collisions)}")
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)

    l_tagged = left.select(
        *left.columns,
        F.col(left_on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(rtypes[p]).alias(p) for p in payload],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left.columns],
        F.col(right_on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *payload,
    )
    u = l_tagged.unionByName(r_tagged)
    order = [F.col("_t").desc(), F.col("_side")] if direction == "forward" else ["_t", "_side"]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *left.columns,
        "_side",
        *[F.last(p, ignorenulls=True).over(w).alias(p) for p in payload],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    id_col: str,
) -> DataFrame:
    """Nearest-in-time as-of join: each left row attaches the payload
    of the temporally CLOSEST right row, past or future — composed
    from one backward and one forward :func:`asof_join` pass (each a
    single exchange) plus an id-keyed rejoin. Returns all ``left``
    columns + ``payload`` (from the chosen side) + ``direction``
    ('past'/'future', NULL when the key has no right rows at all).

    Ties (equidistant, including a right row AT the left time) resolve
    to 'past' so the choice is deterministic. Deltas compare as exact
    integer microseconds (both time columns cast to session-tz
    timestamp, so DATE/TIMESTAMP_NTZ right sides work). ``right`` must
    be unique per (key, time); ``id_col`` must uniquely identify left
    rows. The subject of the brute-force property test in
    ``tests/test_operator_properties.py``; reference cite as in
    :func:`asof_join`."""
    p_cols = [f"_p_{p}" for p in payload]
    f_cols = [f"_f_{p}" for p in payload]
    r_past = right.select(
        right_on,
        right_time,
        *[F.col(p).alias(a) for p, a in zip(payload, p_cols)],
    ).withColumn("_pt", F.col(right_time))
    past = asof_join(
        left, r_past, left_on, right_on, left_time, right_time,
        payload=p_cols + ["_pt"], direction="backward",
    )
    r_fut = right.select(
        right_on,
        right_time,
        *[F.col(p).alias(a) for p, a in zip(payload, f_cols)],
    ).withColumn("_ft", F.col(right_time))
    fut = asof_join(
        left.select(F.col(id_col).alias("_fid"), left_on, left_time),
        r_fut, left_on, right_on, left_time, right_time,
        payload=f_cols + ["_ft"], direction="forward",
    ).select("_fid", *f_cols, "_ft")
    j = past.join(fut, past[id_col] == fut["_fid"])
    past_closer = F.expr(
        f"unix_micros(cast({left_time} as timestamp))"
        " - unix_micros(cast(_pt as timestamp))"
        " <= unix_micros(cast(_ft as timestamp))"
        f" - unix_micros(cast({left_time} as timestamp))"
    )
    # side choice keys on the match-time columns (_pt/_ft), not the
    # payload values, so a legitimately-NULL payload on the matched
    # side cannot flip the choice away from what `direction` reports
    chosen = [
        F.when(F.col("_pt").isNull(), F.col(fc))
        .when(F.col("_ft").isNull(), F.col(pc))
        .when(past_closer, F.col(pc))
        .otherwise(F.col(fc))
        .alias(p)
        for p, pc, fc in zip(payload, p_cols, f_cols)
    ]
    direction = (
        F.when(F.col("_pt").isNull() & F.col("_ft").isNull(), F.lit(None).cast("string"))
        .when(F.col("_ft").isNull(), F.lit("past"))
        .when(F.col("_pt").isNull(), F.lit("future"))
        .when(past_closer, F.lit("past"))
        .otherwise(F.lit("future"))
        .alias("direction")
    )
    return j.select(*left.columns, *chosen, direction)
