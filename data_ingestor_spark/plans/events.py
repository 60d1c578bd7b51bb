"""Event-analytics queries over the ``events`` stream table: funnel,
cohort retention, gap-based sessionization, and daily anomaly scoring —
the product-analytics shapes an event warehouse runs at 100 TB.

Beyond the reference's surface (it has no event analytics; SURVEY §2.2
declares the engine's event/time-series family) — these extend the
time-window family in ``timeseries.py`` with the stateful/relational
patterns: funnels are ordered min-timestamp joins, retention is a
first-touch cohort matrix, sessionization is the lag-gap-cumsum window
idiom (the batch twin of ``applyInPandasWithState``'s streaming
sessions), anomaly scoring is a per-key z-score over daily partials.

Scale notes: every query shuffles on (user_id) or (event_type, day) —
the natural keys an event warehouse is already partitioned by; no
query materializes per-event state wider than a window function's
frame. ``events.ts`` is TIMESTAMP(NANOS) parquet, read through
``load_table``'s nanos→micros conversion (DuckDB truncates the same
way, so timestamps compare bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from data_ingestor_spark.plans.registry import load_table, query

#: session gap threshold: 30 minutes, in microseconds (exact integer math)
_GAP_US = 30 * 60 * 1_000_000


@query(
    "q_event_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click,
           (SELECT COUNT(*) FROM p) AS n_purchase
    """,
    tags=("events", "funnel"),
)
def q_event_funnel(spark, sf_dir):
    """Strictly-ordered funnel view → click → purchase: a user advances
    a stage only with an event strictly after their previous stage's
    first event. Each stage is a (user-key) aggregate then an equality
    join — at 100 TB all three stages shuffle on user_id once and the
    stage frames shrink monotonically. Single-row output of stage
    counts."""
    e = load_table(spark, sf_dir, "events")
    return funnel_counts(
        e, "user_id", "event_type", "ts", ("view", "click", "purchase")
    )


def funnel_counts(e, user_col: str, type_col: str, ts_col: str, steps):
    """Strictly-ordered funnel over ``(user, type, ts)`` events →
    one row of per-stage user counts (columns ``n_<step>``), greedy
    first-event matching: a user reaches stage k iff some strictly
    increasing chain of the step types exists, and taking the MIN
    eligible time at each stage finds one exactly when one exists
    (greedy-is-optimal — pinned against brute force by the property
    test in ``tests/test_operator_properties.py``). The reusable core
    of :func:`q_event_funnel`."""
    stage = (
        e.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t"))
    )
    counts = stage.agg(F.count(F.lit(1)).alias(f"n_{steps[0]}"))
    for s in steps[1:]:
        stage = (
            e.filter(F.col(type_col) == s)
            .join(stage, user_col)
            .filter(F.col(ts_col) > F.col("t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("t"))
        )
        counts = counts.crossJoin(stage.agg(F.count(F.lit(1)).alias(f"n_{s}")))
    return counts


@query(
    "q_event_retention",
    oracle="""
    WITH first_day AS (
        SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day FROM events GROUP BY user_id
    ), active AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    )
    SELECT f.cohort_day,
           CAST(datediff('day', f.cohort_day, a.d) AS INT) AS day_offset,
           COUNT(*) AS n_users
    FROM first_day f JOIN active a ON f.user_id = a.user_id
    GROUP BY f.cohort_day, day_offset
    """,
    tags=("events", "retention"),
)
def q_event_retention(spark, sf_dir):
    """First-touch cohort retention matrix: cohort = day of a user's
    first event; one row per (cohort_day, day_offset) with the count of
    cohort users active that day. Two user-keyed aggregates + one
    user-keyed join — the standard retention triangle, computed without
    ever materializing a per-user day bitmap."""
    e = load_table(spark, sf_dir, "events")
    return retention_matrix(e, "user_id", "ts")


def retention_matrix(e, user_col: str, ts_col: str):
    """First-touch cohort retention triangle: cohort = day of each
    user's first event, one ``(cohort_day, day_offset, n_users)`` row
    per cohort-day×offset with at most one count per user per day (the
    distinct user-day relation, so multiple same-day events never
    double-count). Two user-keyed aggregates + one user-keyed join;
    the reusable core of :func:`q_event_retention` and the subject of
    the cohort property test in
    ``tests/test_operator_properties.py``."""
    first_day = e.groupBy(user_col).agg(
        F.date_trunc("DAY", F.min(ts_col)).alias("cohort_day")
    )
    active = e.select(user_col, F.date_trunc("DAY", ts_col).alias("d")).distinct()
    return (
        first_day.join(active, user_col)
        .select(
            "cohort_day",
            F.datediff("d", "cohort_day").cast("int").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "q_event_sessions",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        FROM events
    ), marked AS (
        SELECT user_id, event_id, ts,
               CASE WHEN pts IS NULL OR epoch_us(ts) - epoch_us(pts) > {_GAP_US}
                    THEN 1 ELSE 0 END AS is_start
        FROM ordered
    ), sessioned AS (
        SELECT user_id, ts,
               SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM marked
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, COUNT(*) AS n_events,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
    FROM sessioned GROUP BY user_id, CAST(session_seq AS BIGINT)
    """,
    tags=("events", "session", "window"),
)
def q_event_sessions(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) via the lag →
    session-start flag → running-sum idiom: one shuffle on user_id,
    every later step stays inside that partitioning. The batch twin of
    the streaming ``session_window`` / ``applyInPandasWithState``
    operators (q_window_session tests those semantics); durations are
    exact integer microsecond arithmetic — no float drift."""
    e = load_table(spark, sf_dir, "events")
    return sessionize(e, "user_id", "ts", "event_id", _GAP_US)


def sessionize(e, user_col: str, ts_col: str, id_col: str, gap_us: int):
    """Gap-based sessionization core: per-``user_col`` lag over
    ``(ts, id)`` (the id column breaks equal-timestamp ties
    deterministically), a session-start flag wherever the inactivity
    gap EXCEEDS ``gap_us`` (strictly greater — a gap of exactly
    ``gap_us`` stays in-session), and a running sum numbering sessions
    1..n per user; aggregated to ``(user, session_seq, n_events,
    duration_us)`` with exact integer-microsecond durations. The
    reusable core of :func:`q_event_sessions` and the subject of the
    gap-boundary property test in
    ``tests/test_operator_properties.py``."""
    order = W.partitionBy(user_col).orderBy(ts_col, id_col)
    marked = e.select(
        user_col,
        id_col,
        ts_col,
        F.when(
            F.lag(ts_col).over(order).isNull()
            | (F.unix_micros(ts_col) - F.unix_micros(F.lag(ts_col).over(order)) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    sessioned = marked.select(
        user_col,
        ts_col,
        F.sum("is_start").over(order.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("session_seq"),
    )
    return sessioned.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))).alias("duration_us"),
    )


@query(
    "q_event_anomaly",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d, COUNT(*) AS n
        FROM events GROUP BY event_type, d
    ), stats AS (
        SELECT event_type,
               AVG(CAST(n AS DOUBLE)) AS mu,
               stddev_samp(CAST(n AS DOUBLE)) AS sigma
        FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.d, d.n,
           ROUND((d.n - s.mu) / s.sigma, 4) AS z,
           ABS(ROUND((d.n - s.mu) / s.sigma, 4)) > 2.0 AS is_anomaly
    FROM daily d JOIN stats s ON d.event_type = s.event_type
    """,
    tags=("events", "anomaly", "stats"),
)
def q_event_anomaly(spark, sf_dir):
    """Daily per-type volume anomaly score: z = (count − μ_type)/σ_type
    over daily partial counts. The heavy aggregation is the tiny daily
    rollup; the per-type stats table is a broadcast. ROUND(4) absorbs
    stddev accumulation-order differences between engines, and the
    anomaly flag is derived from the ROUNDED z so the boundary is
    engine-stable."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("DAY", "ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = daily.groupBy("event_type").agg(
        F.avg(F.col("n").cast("double")).alias("mu"),
        F.stddev_samp(F.col("n").cast("double")).alias("sigma"),
    )
    z = F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 4)
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "d",
            "n",
            z.alias("z"),
            (F.abs(z) > 2.0).alias("is_anomaly"),
        )
    )


@query(
    "q_event_dau_wau",
    oracle="""
    WITH du AS (
        SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events
    ), cover AS (
        SELECT user_id,
               unnest(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS day
        FROM du
    ), wau AS (
        SELECT day, COUNT(DISTINCT user_id) AS wau FROM cover GROUP BY day
    ), dau AS (
        SELECT d AS day, COUNT(*) AS dau FROM du GROUP BY d
    )
    SELECT dau.day, dau.dau, CAST(wau.wau AS BIGINT) AS wau
    FROM dau JOIN wau ON dau.day = wau.day
    """,
    tags=("events", "window", "distinct"),
)
def q_event_dau_wau(spark, sf_dir):
    """Daily + trailing-7-day active users (DAU/WAU) — the canonical
    engagement dashboard pair. COUNT(DISTINCT) over a sliding RANGE
    frame is not windowable in any engine, and the textbook day-spine
    theta join (du.d BETWEEN day-6 AND day) is a nested loop; instead
    each (user, day) row EXPLODES into the <=7 future days it covers
    and WAU becomes an ordinary (day)-keyed distinct aggregate — pure
    equality shuffles that parallelize like any groupBy at 100 TB
    (7x row inflation on the deduped user-day relation, which is
    already orders of magnitude smaller than the event log). Cover
    days beyond the observed range drop out via the inner join with
    the DAU spine. Exact integer counts -> bit-stable hash."""
    e = load_table(spark, sf_dir, "events")
    du = e.select(F.date_trunc("DAY", "ts").alias("d"), "user_id").distinct()
    return dau_wau(du, "d", "user_id")


def dau_wau(du, day_col: str, user_col: str, window_days: int = 7):
    """DAU + trailing-``window_days`` distinct actives from a DISTINCT
    ``(day, user)`` relation via the explode-to-cover-days rewrite of
    the un-windowable rolling COUNT DISTINCT (see
    :func:`q_event_dau_wau` for the scale argument); cover days with no
    activity of their own drop out through the DAU-spine join. The
    reusable core and the subject of the rolling-distinct property test
    in ``tests/test_operator_properties.py``."""
    cover = du.select(
        user_col,
        F.explode(
            F.sequence(
                F.col(day_col),
                F.col(day_col) + F.expr(f"INTERVAL {window_days - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    wau = cover.groupBy("day").agg(
        F.countDistinct(user_col).cast("bigint").alias("wau")
    )
    dau = du.groupBy(F.col(day_col).alias("day")).agg(F.count(F.lit(1)).alias("dau"))
    return dau.join(wau, "day").select("day", "dau", "wau")


@query(
    "q_event_path",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    ), trans AS (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n_transitions,
           CAST(n_transitions AS DOUBLE)
             / CAST(SUM(n_transitions) OVER (PARTITION BY prev_type) AS BIGINT)
               AS p_transition
    FROM trans
    """,
    tags=("events", "window", "path"),
)
def q_event_path(spark, sf_dir):
    """Clickstream path analysis: the event-type transition matrix
    (first-order Markov estimate). One lag window per user's
    time-ordered stream → pair counts → per-source transition
    probability via a window-over-aggregate. The lag ordering
    tie-breaks on event_id so the result is deterministic even with
    equal timestamps; counts are exact integers and each probability
    is ONE double division of two exact integers.

    Scale: one hash exchange on user_id for the lag window, then an
    aggregate on the (prev, next) pair space — 25 groups here, bounded
    by |event_type|² in general, so the second exchange is tiny; the
    probability window runs over that micro-relation. This is the
    standard funnel-free path-exploration query a product team runs
    over billions of events."""
    e = load_table(spark, sf_dir, "events")
    return transition_matrix(e, "user_id", "event_type", ["ts", "event_id"])


def transition_matrix(e, user_col: str, type_col: str, order_cols: list[str]):
    """First-order Markov transition estimate: per-``user_col`` lag
    window over ``order_cols`` (include a unique tie-break column!),
    exact pair counts, and per-source probability as one double
    division of two exact integers via a window-over-aggregate —
    ``(prev_type, next_type, n_transitions, p_transition)``. The
    reusable core of :func:`q_event_path` (see its docstring for the
    scale argument) and the subject of the transition property test in
    ``tests/test_operator_properties.py``."""
    w = W.partitionBy(user_col).orderBy(*order_cols)
    seq = e.select(
        type_col, F.lag(type_col).over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col(type_col).alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    out_w = W.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(out_w).cast("bigint")
        ).alias("p_transition"),
    )


@query(
    "q_event_attribution",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts, CAST(value AS DECIMAL(18,2)) AS val
        FROM events WHERE event_type = 'purchase'
    ), clicks AS (
        SELECT user_id, ts,
               CAST(json_extract(props, '$.k') AS BIGINT) % 5 AS campaign
        FROM events WHERE event_type = 'click'
    ), attributed AS (
        SELECT p.event_id, p.val,
               (SELECT c.campaign FROM clicks c
                WHERE c.user_id = p.user_id AND c.ts <= p.ts
                ORDER BY c.ts DESC, c.campaign LIMIT 1) AS campaign
        FROM purchases p
    )
    SELECT COALESCE(CAST(campaign AS VARCHAR), 'unattributed') AS campaign,
           COUNT(*) AS n_purchases,
           CAST(SUM(val) AS DOUBLE) AS revenue
    FROM attributed GROUP BY 1
    """,
    tags=("events", "attribution", "asof"),
)
def q_event_attribution(spark, sf_dir):
    """Last-touch marketing attribution: every purchase is credited to
    the SAME user's most recent prior click's campaign (here the click
    props' k mod 5 stands in for a campaign id), then revenue rolls up
    per campaign — the conversion-credit query behind every ads
    dashboard. Spark side is a union-sort trick, NOT a per-purchase
    subquery: interleave clicks and purchases on (user_id, ts), carry
    the last click's campaign forward with a last_value window over
    rows-unbounded-preceding, then keep purchase rows — one shuffle on
    user_id, linear in events, no join at all (the oracle's correlated
    LIMIT-1 subquery is the semantic spec; the window plan is the form
    that survives 100 TB). Ties: a click at exactly the purchase ts
    attributes (<=), and simultaneous clicks break toward the smaller
    campaign id, mirrored by the secondary sort key on both sides."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("is_purchase"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("decimal(18,2)").alias("val"),
        (F.get_json_object("props", "$.k").cast("bigint") % 5).alias("campaign"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_purchase"),
        "event_id",
        F.col("value").cast("decimal(18,2)").alias("val"),
        F.lit(None).cast("bigint").alias("campaign"),
    )
    # clicks sort BEFORE the purchase at an equal ts (is_purchase 0 < 1)
    # so '<=' attribution falls out of the ordering; among simultaneous
    # clicks the oracle's ORDER BY campaign ASC NULLS LAST picks the
    # smallest non-null campaign — mirrored here by sorting equal-ts
    # clicks campaign DESC **NULLS FIRST** so that pick is the LAST row
    # the carry-forward window sees (a NULL campaign wins a tie only
    # when it is the only click).
    attributed = last_touch_carry(clicks, purchases, "user_id", "ts")
    return (
        attributed.groupBy(
            F.coalesce(F.col("last_campaign").cast("string"), F.lit("unattributed")).alias(
                "campaign"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("val").cast("double").alias("revenue"),
        )
    )


def last_touch_carry(clicks, purchases, user_col: str, ts_col: str):
    """Union-sort last-touch carry-forward: interleave click and
    purchase rows (both carrying ``is_purchase`` 0/1 and a nullable
    bigint ``campaign``), sort within user by ``(ts, is_purchase,
    campaign DESC NULLS FIRST)`` so an equal-ts click precedes the
    purchase ('<=' semantics) and the smallest non-null campaign among
    simultaneous clicks is the LAST click row the window sees, then
    carry the last CLICK's campaign (struct-wrapped so a NULL-campaign
    click still wins the recency race) onto each purchase row as
    ``last_campaign``. The reusable core of :func:`q_event_attribution`
    (its docstring derives the plan; the oracle's correlated LIMIT-1
    subquery is the spec) and the subject of the carry-forward property
    test in ``tests/test_operator_properties.py``."""
    merged = clicks.unionByName(purchases)
    w = (
        W.partitionBy(user_col)
        .orderBy(
            F.col(ts_col).asc(), F.col("is_purchase").asc(), F.col("campaign").desc_nulls_first()
        )
        .rowsBetween(W.unboundedPreceding, 0)
    )
    # carry the LAST CLICK's campaign, not the last non-null campaign: a
    # click whose props lack a campaign must still win the recency race
    # (and attribute as NULL → 'unattributed', matching the oracle's
    # LIMIT-1 spec). Wrapping in a struct makes click rows non-null at
    # the struct level even when the campaign inside is NULL.
    click_mark = F.when(F.col("is_purchase") == 0, F.struct(F.col("campaign").alias("c")))
    carried = merged.withColumn(
        "last_campaign", F.last(click_mark, ignorenulls=True).over(w).getField("c")
    )
    return carried.filter(F.col("is_purchase") == 1)


@query(
    "q_event_funnel_latency",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    ), conv AS (
        SELECT user_id,
               date_trunc('week', t_signup) AS cohort_week,
               date_diff('second', t_signup, t_purchase) AS secs
        FROM firsts
        WHERE t_signup IS NOT NULL AND t_purchase IS NOT NULL
          AND t_purchase >= t_signup
    )
    SELECT cohort_week,
           COUNT(*) AS n_converted,
           QUANTILE_DISC(secs, 0.50) AS p50_secs,
           QUANTILE_DISC(secs, 0.90) AS p90_secs
    FROM conv GROUP BY cohort_week
    """,
    tags=("events", "funnel", "latency", "percentile"),
)
def q_event_funnel_latency(spark, sf_dir):
    """Funnel conversion latency: per signup-week cohort, the median and
    p90 seconds from a user's FIRST signup to their first subsequent
    purchase — the time-to-convert number product teams steer by (the
    count complement of q_event_funnel's stage totals). One user-keyed
    conditional-MIN aggregate builds the stage timestamps (no join
    between stages), then a tiny per-cohort discrete-percentile rollup;
    integer seconds + percentile_disc return actual data values, so the
    hash check needs no rounding guard."""
    e = load_table(spark, sf_dir, "events")
    return conversion_latency(e, "user_id", "event_type", "ts", "signup", "purchase")


def conversion_latency(e, user_col: str, type_col: str, ts_col: str,
                       from_stage: str, to_stage: str):
    """First-touch conversion latency: per ``from_stage``-week cohort,
    the count, p50 and p90 of integer seconds from each user's FIRST
    ``from_stage`` to their first ``to_stage`` at-or-after it — one
    user-keyed conditional-MIN aggregate (no stage-vs-stage join), a
    null/order filter, then a tiny per-cohort discrete-percentile
    rollup (percentile_disc returns actual data values: smallest value
    whose cumulative rank fraction reaches p — no interpolation, no
    rounding guard). The reusable core of
    :func:`q_event_funnel_latency` and the subject of the
    percentile-semantics property test in
    ``tests/test_operator_properties.py``."""
    firsts = e.groupBy(user_col).agg(
        F.min(F.when(F.col(type_col) == from_stage, F.col(ts_col))).alias("t_from"),
        F.min(F.when(F.col(type_col) == to_stage, F.col(ts_col))).alias("t_to"),
    )
    conv = firsts.filter(
        F.col("t_from").isNotNull()
        & F.col("t_to").isNotNull()
        & (F.col("t_to") >= F.col("t_from"))
    ).select(
        F.date_trunc("WEEK", "t_from").alias("cohort_week"),
        (F.unix_timestamp("t_to") - F.unix_timestamp("t_from")).alias("secs"),
    )
    return conv.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.expr(
            "cast(percentile_disc(0.50) WITHIN GROUP (ORDER BY secs) as bigint)"
        ).alias("p50_secs"),
        F.expr(
            "cast(percentile_disc(0.90) WITHIN GROUP (ORDER BY secs) as bigint)"
        ).alias("p90_secs"),
    )


@query(
    "q_event_trend",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                    // NULLIF(COUNT(CAST(ROUND(value * 100) AS BIGINT)), 0)
                    AS BIGINT) AS mean_cents
        FROM events GROUP BY 1, 2
    ), xy AS (
        SELECT event_type,
               CAST(date_diff('day',
                    MIN(d) OVER (PARTITION BY event_type), d) AS BIGINT) AS x,
               mean_cents AS y
        FROM daily
    ), sums AS (
        SELECT event_type,
               COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM xy GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(((n * sxy - sx * sy) * 10000)
                // NULLIF(n * sxx - sx * sx, 0) AS BIGINT) AS slope_bp
    FROM sums
    """,
    tags=("events", "trend", "regression"),
)
def q_event_trend(spark, sf_dir):
    """Per-event-type trend detection: the least-squares slope of the
    DAILY MEAN value over the day index, as exact integer basis points
    per day — regression as a distributed aggregation (no ML library,
    no iterative solver: OLS over (x, y) needs only the five mergeable
    sums n, Σx, Σy, Σxy, Σx², so it partial-aggregates like any
    COUNT). Determinism discipline: values quantize to cents, the
    daily mean is a truncating integer division, the day index is
    rebased per type (same defense as q_event_ewma — regenerated
    corpora can't overflow it), and the closed-form slope
    (nΣxy − ΣxΣy)·10⁴ div (nΣx² − (Σx)²) is all-BIGINT with a NULLIF
    guard for degenerate single-day groups. Magnitude audit: daily
    MEANS (not totals) bound y ≤ ~10⁵ cents regardless of corpus
    size, x ≤ span days, so the numerator stays < 10¹⁵ at any scale.
    At 100 TB: one (type, day) partial agg over the corpus, then a
    per-type aggregate over #days rows — the same two-level rollup as
    q_event_anomaly."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(
            # divide by the count of rows whose quantization SUCCEEDED
            # (ADVICE r8): NaN/overflow values are NULL under try_cast
            # and skipped by the sum — counting them in the divisor
            # would silently deflate the mean on corrupt data. NULLIF
            # keeps an all-corrupt day total (NULL mean) instead of an
            # ANSI divide-by-zero.
            F.expr(
                "cast(sum(try_cast(round(value * 100) as bigint))"
                " div nullif(count(try_cast(round(value * 100) as bigint)), 0)"
                " as bigint)"
            ).alias("y")
        )
    )
    xy = daily.select(
        "event_type",
        F.datediff(
            "d", F.min("d").over(W.partitionBy("event_type"))
        ).cast("bigint").alias("x"),
        "y",
    )
    return ols_slope_bp(xy, "event_type", "x", "y").select(
        "event_type",
        F.col("n_points").alias("n_days"),
        "slope_bp",
    )


def ols_slope_bp(xy, group_col: str, x_col: str, y_col: str):
    """Exact-integer OLS slope per group over ``(group, x, y)`` points
    → ``(group, n_points, slope_bp)``: basis points of
    (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), computed as mergeable BIGINT sums
    with Spark's truncate-toward-zero ``div`` (NULL for degenerate
    all-same-x groups); the reusable core of :func:`q_event_trend`
    (see its docstring for the magnitude audit) and the subject of the
    brute-force property test in
    ``tests/test_operator_properties.py``."""
    sums = xy.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x_col).alias("sx"),
        F.sum(y_col).alias("sy"),
        F.sum(F.expr(f"{x_col} * {y_col}")).alias("sxy"),
        F.sum(F.expr(f"{x_col} * {x_col}")).alias("sxx"),
    )
    return sums.select(
        group_col,
        F.col("n").cast("bigint").alias("n_points"),
        F.expr(
            "cast(((n * sxy - sx * sy) * 10000)"
            " div nullif(n * sxx - sx * sx, 0) as bigint)"
        ).alias("slope_bp"),
    )


@query(
    "q_event_robust_anomaly",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d, COUNT(*) AS n
        FROM events GROUP BY event_type, d
    ), med AS (
        SELECT event_type, MIN(n) AS med FROM (
            SELECT event_type, n,
                   SUM(1) OVER (PARTITION BY event_type ORDER BY n, d
                                ROWS UNBOUNDED PRECEDING) AS cw,
                   COUNT(*) OVER (PARTITION BY event_type) AS tw
            FROM daily
        ) WHERE 2 * cw >= tw GROUP BY event_type
    ), dev AS (
        SELECT daily.event_type, d, n, med, ABS(n - med) AS adev
        FROM daily JOIN med ON daily.event_type = med.event_type
    ), mad AS (
        SELECT event_type, MIN(adev) AS mad FROM (
            SELECT event_type, adev, d,
                   SUM(1) OVER (PARTITION BY event_type ORDER BY adev, d
                                ROWS UNBOUNDED PRECEDING) AS cw,
                   COUNT(*) OVER (PARTITION BY event_type) AS tw
            FROM dev
        ) WHERE 2 * cw >= tw GROUP BY event_type
    )
    SELECT dev.event_type, d, CAST(n AS BIGINT) AS n,
           CAST(med AS BIGINT) AS med, CAST(mad.mad AS BIGINT) AS mad,
           ABS(n - med) > 5 * GREATEST(mad.mad, 1) AS is_anomaly
    FROM dev JOIN mad ON dev.event_type = mad.event_type
    """,
    tags=("events", "anomaly", "robust", "median"),
)
def q_event_robust_anomaly(spark, sf_dir):
    """Robust daily-volume anomaly detection: median/MAD instead of
    mean/stddev — the estimator that doesn't move when the anomaly
    itself inflates the baseline (one 10× traffic day shifts μ and σ
    enough to mask itself; it moves the median by at most one rank).
    Flag = |n − median| > 5·MAD, all exact integers: the median is the
    ceil-half point of an ordered cumulative-count window (the same
    scale-free 2·cw ≥ tw idiom as q_agg_weighted_median, (value, day)
    tie-break), MAD is the median of absolute deviations by a second
    identical window, and GREATEST(mad,1) guards the degenerate
    all-days-equal case. No floats anywhere → bit-stable hash, no
    round-tie defenses needed (contrast q_event_anomaly's rounded z).
    At 100 TB: the corpus-scale work is one (type, day) partial count;
    both median windows run over #days rows per type — the two-level
    rollup shape again, with the windows on the tiny level."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return robust_anomaly(daily, "event_type", "d", "n")


def robust_anomaly(daily, group_col: str, day_col: str, n_col: str, k: int = 5):
    """Exact-integer median/MAD anomaly flags over ``(group, day, n)``
    series → every row with ``(n, med, mad, is_anomaly)`` attached;
    the reusable core of :func:`q_event_robust_anomaly` (see its
    docstring for the lower-median idiom) and the subject of the
    brute-force property test in
    ``tests/test_operator_properties.py``."""

    def ceil_half_min(df, val, out):
        wc = (
            W.partitionBy(group_col)
            .orderBy(val, day_col)
            .rowsBetween(W.unboundedPreceding, 0)
        )
        wt = W.partitionBy(group_col)
        return (
            df.withColumn("cw", F.sum(F.lit(1)).over(wc))
            .withColumn("tw", F.count(F.lit(1)).over(wt))
            .filter(F.expr("2 * cw >= tw"))
            .groupBy(group_col)
            .agg(F.min(val).alias(out))
        )

    med = ceil_half_min(daily, n_col, "med")
    dev = daily.join(med, group_col).withColumn(
        "adev", F.abs(F.col(n_col) - F.col("med"))
    )
    mad = ceil_half_min(dev, "adev", "mad")
    return dev.join(mad, group_col).select(
        group_col,
        day_col,
        F.col(n_col).cast("bigint").alias("n"),
        F.col("med").cast("bigint").alias("med"),
        F.col("mad").cast("bigint").alias("mad"),
        (
            F.abs(F.col(n_col) - F.col("med"))
            > k * F.greatest(F.col("mad"), F.lit(1))
        ).alias("is_anomaly"),
    )


@query(
    "q_event_abtest",
    oracle="""
    WITH users AS (
        SELECT user_id,
               CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) % 2 AS conv
        FROM events GROUP BY user_id
    ), arms AS (
        SELECT arm, COUNT(*) AS n, CAST(SUM(conv) AS BIGINT) AS n_conv
        FROM users GROUP BY arm
    ), wide AS (
        SELECT
            MAX(CASE WHEN arm = 'A' THEN n END) AS n_a,
            MAX(CASE WHEN arm = 'A' THEN n_conv END) AS conv_a,
            MAX(CASE WHEN arm = 'B' THEN n END) AS n_b,
            MAX(CASE WHEN arm = 'B' THEN n_conv END) AS conv_b
        FROM arms
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, conv_a,
           CAST(conv_a * 10000 // n_a AS BIGINT) AS rate_a_bp,
           CAST(n_b AS BIGINT) AS n_b, conv_b,
           CAST(conv_b * 10000 // n_b AS BIGINT) AS rate_b_bp,
           ROUND(
             (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / NULLIF(SQRT(
                 (CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                 * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                 * (1.0 / n_a + 1.0 / n_b)
               ), 0.0), 4) AS z_round,
           ABS(
             (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / NULLIF(SQRT(
                 (CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                 * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                 * (1.0 / n_a + 1.0 / n_b)
               ), 0.0)) > 1.96 AS significant
    FROM wide
    """,
    tags=("events", "abtest", "stats", "hypothesis"),
)
def q_event_abtest(spark, sf_dir):
    """Two-proportion A/B test as a distributed aggregation — run in
    A/A CALIBRATION form, the null-hypothesis validation every
    experimentation platform performs before trusting its pipeline:
    arms come from a deterministic user-id split, the per-user binary
    outcome is a data-derived coin (purchase-count parity — exactly
    computable, ~p=0.5 at any scale, carrying no real arm effect), so
    the expected readout IS "not significant", and a significant
    result here would flag assignment bias. The pooled two-proportion
    z-statistic is computed from four exact integers — the experiment
    readout (rates, z, significance at alpha=0.05) every event
    warehouse serves. Determinism: counts are exact BIGINTs, the z
    formula maps identical integers through identical double
    arithmetic in both engines, and z is ROUNDed (the q_agg_corr
    discipline for irrational outputs — sqrt makes exact-integer
    output impossible). Scale shape: one user-keyed aggregate over the
    corpus (partial-agg friendly: MAX of a 0/1), one 2-row arm
    rollup, one 1-row pivot — nothing after the first shuffle exceeds
    |users| rows. At 100 TB add CUPED or stratified variance the same
    way: more mergeable sums, same plan shape."""
    e = load_table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        (
            F.sum(F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")) % 2
        ).alias("conv")
    ).select(
        F.expr("CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END").alias("arm"),
        "conv",
    )
    return two_proportion_readout(users)


def two_proportion_readout(users):
    """Pooled two-proportion z-test readout over per-unit ``(arm,
    conv)`` rows (arm ∈ {'A','B'}, conv ∈ {0,1}): per-arm exact
    BIGINT counts + basis-point rates, the pooled z-statistic as one
    well-defined chain of double operations over those four integers
    (ROUNDed — the q_agg_corr discipline for irrational outputs), and
    the α=0.05 verdict on the UNROUNDED z. Degenerate pooled rates
    (0 or 1 — the sqrt collapses to 0) NULL out z and the verdict via
    NULLIF rather than dividing by zero. The reusable core of
    :func:`q_event_abtest` (see its docstring for the calibration
    framing) and the subject of the float-chain property test in
    ``tests/test_operator_properties.py``."""
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").cast("bigint").alias("n_conv")
    )
    wide = arms.agg(
        F.max(F.expr("CASE WHEN arm = 'A' THEN n END")).alias("n_a"),
        F.max(F.expr("CASE WHEN arm = 'A' THEN n_conv END")).alias("conv_a"),
        F.max(F.expr("CASE WHEN arm = 'B' THEN n END")).alias("n_b"),
        F.max(F.expr("CASE WHEN arm = 'B' THEN n_conv END")).alias("conv_b"),
    )
    z = (
        "((cast(conv_a as double) / n_a - cast(conv_b as double) / n_b)"
        " / nullif(sqrt((cast(conv_a + conv_b as double) / (n_a + n_b))"
        " * (1.0 - cast(conv_a + conv_b as double) / (n_a + n_b))"
        " * (1.0 / n_a + 1.0 / n_b)), 0.0d))"
    )
    return wide.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        "conv_a",
        F.expr("conv_a * 10000 div n_a").cast("bigint").alias("rate_a_bp"),
        F.col("n_b").cast("bigint").alias("n_b"),
        "conv_b",
        F.expr("conv_b * 10000 div n_b").cast("bigint").alias("rate_b_bp"),
        F.expr(f"round({z}, 4)").alias("z_round"),
        F.expr(f"abs({z}) > 1.96").alias("significant"),
    )


@query(
    "q_event_forecast_backtest",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d, COUNT(*) AS n
        FROM events GROUP BY event_type, d
    ), lagged AS (
        SELECT event_type, d, n,
               LAG(n, 7) OVER (PARTITION BY event_type ORDER BY d) AS pred
        FROM daily
    ), scored AS (
        SELECT event_type, d, n, pred, ABS(n - pred) AS abs_err
        FROM lagged WHERE pred IS NOT NULL
    )
    SELECT event_type,
           COUNT(*) AS n_days_scored,
           CAST(SUM(abs_err) * 100 // COUNT(*) AS BIGINT) AS mae_x100,
           CAST(SUM(abs_err) * 10000 // SUM(n) AS BIGINT) AS wape_bp,
           MAX(abs_err) AS worst_abs_err
    FROM scored GROUP BY event_type
    """,
    tags=("events", "forecast", "backtest", "time"),
)
def q_event_forecast_backtest(spark, sf_dir):
    """Forecast backtesting as relational algebra: the seasonal-naive
    baseline (predict each day's volume with the same weekday last
    week — the model every production forecast must beat) scored
    in-sample by MAE and WAPE per event type. The forecast is ONE lag
    window over the tiny daily rollup, the backtest is an exact
    integer aggregate: mae_x100 = Σ|err|·100 div days, wape_bp =
    Σ|err|·10⁴ div Σactual — no floats, no model state, bit-stable
    hash. This is the evaluation half of a forecasting pipeline
    expressed engine-side (the same measured-quality discipline as
    lsh-recall/knn-accuracy: a forecast without its backtest is a
    guess); swap the lag-7 column for any model's prediction table
    and the scoring plan is unchanged. Scale shape: corpus-scale work
    is the (type, day) partial count; everything after runs on #days
    rows per type."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return seasonal_naive_score(daily, "event_type", "d", "n", 7)


def seasonal_naive_score(daily, part_col: str, d_col: str, n_col: str, lag_rows: int):
    """Seasonal-naive forecast + integer backtest over a ``(partition,
    day, count)`` rollup: predict each row with the value ``lag_rows``
    ROWS earlier in day order (on a dense daily rollup row-lag ≡
    calendar lag; the property test pins the ROW semantics both
    engines' LAG share), drop the warm-up rows, and score per
    partition with exact integer MAE×100 (truncating div by scored
    days), WAPE basis points (div by Σ actual), and worst |err|. The
    reusable core of :func:`q_event_forecast_backtest` (see its
    docstring for the scale-shape discussion) and the subject of the
    scoring property test in ``tests/test_operator_properties.py``."""
    w = W.partitionBy(part_col).orderBy(d_col)
    scored = (
        daily.withColumn("pred", F.lag(n_col, lag_rows).over(w))
        .filter(F.col("pred").isNotNull())
        .withColumn("abs_err", F.abs(F.col(n_col) - F.col("pred")))
    )
    return scored.groupBy(part_col).agg(
        F.count(F.lit(1)).alias("n_days_scored"),
        F.expr("sum(abs_err) * 100 div count(*)").cast("bigint").alias("mae_x100"),
        F.expr(f"sum(abs_err) * 10000 div sum({n_col})")
        .cast("bigint")
        .alias("wape_bp"),
        F.max("abs_err").alias("worst_abs_err"),
    )


@query(
    "q_event_ltv_curve",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ), rev AS (
        SELECT e.user_id, f.cohort_week,
               CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts))
                    AS BIGINT) AS week_offset,
               CAST(ROUND(e.value * 100) AS BIGINT) AS cents
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase'
    ), weekly AS (
        SELECT cohort_week, week_offset,
               CAST(SUM(cents) AS BIGINT) AS rev_cents,
               COUNT(DISTINCT user_id) AS n_buyers
        FROM rev GROUP BY 1, 2
    ), sized AS (
        SELECT cohort_week, COUNT(*) AS cohort_users FROM firsts GROUP BY 1
    )
    SELECT w.cohort_week, w.week_offset, w.rev_cents, w.n_buyers,
           CAST(SUM(w.rev_cents) OVER (PARTITION BY w.cohort_week
                ORDER BY w.week_offset ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_rev_cents,
           CAST(s.cohort_users AS BIGINT) AS cohort_users,
           CAST(SUM(w.rev_cents) OVER (PARTITION BY w.cohort_week
                ORDER BY w.week_offset ROWS UNBOUNDED PRECEDING)
                // s.cohort_users AS BIGINT) AS cum_ltv_cents_per_user
    FROM weekly w JOIN sized s ON w.cohort_week = s.cohort_week
    """,
    tags=("events", "ltv", "cohort", "revenue"),
)
def q_event_ltv_curve(spark, sf_dir):
    """Cohort LTV curves: cumulative purchase revenue per signup cohort
    (first-seen week) across week offsets, absolute and per cohort
    user — the companion to q_event_retention that answers "how much
    VALUE does a cohort accrue by week k" rather than "how many come
    back", which is what LTV-based acquisition budgeting actually
    reads. Exact integers end to end: revenue in cents, the curve is
    a cumulative-sum window over the tiny (cohort, offset) grid, and
    per-user LTV is a truncating integer division by the exact cohort
    size (denominator = ALL cohort members, not just buyers — the
    standard LTV convention). Scale shape: one user-keyed first-touch
    aggregate, one (user→cohort) equality join for enrichment, one
    (cohort, offset) rollup; the windows run over #cohorts × #weeks
    rows. The distinct-buyer count rides along for curve QA."""
    e = load_table(spark, sf_dir, "events")
    return ltv_curve(e, "user_id", "event_type", "ts", "value", "purchase")


def ltv_curve(e, user_col: str, type_col: str, ts_col: str, value_col: str,
              purchase_type: str):
    """Cohort LTV grid: cohort = week of each user's first event of ANY
    type; per (cohort_week, week_offset) the purchase revenue in exact
    cents, distinct buyers, the cumulative revenue (rows-frame window
    over the tiny grid), and cumulative LTV per cohort USER — a
    truncating integer division by the full cohort size (all members,
    not just buyers — the standard LTV convention). The reusable core
    of :func:`q_event_ltv_curve` (see its docstring for the
    scale-shape discussion) and the subject of the cumulative/
    denominator property test in
    ``tests/test_operator_properties.py``."""
    from pyspark.sql import Window as W

    firsts = e.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    rev = (
        e.filter(F.col(type_col) == purchase_type)
        .join(firsts, user_col)
        .select(
            user_col,
            "cohort_week",
            F.expr(
                f"cast(datediff(date_trunc('week', {ts_col}), cohort_week)"
                " div 7 as bigint)"
            ).alias("week_offset"),
            F.expr(f"try_cast(round({value_col} * 100) as bigint)").alias("cents"),
        )
    )
    weekly = rev.groupBy("cohort_week", "week_offset").agg(
        F.sum("cents").cast("bigint").alias("rev_cents"),
        F.countDistinct(user_col).alias("n_buyers"),
    )
    sized = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    wcum = (
        W.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        weekly.join(sized, "cohort_week")
        .withColumn("cum_rev_cents", F.sum("rev_cents").over(wcum).cast("bigint"))
        .select(
            "cohort_week",
            "week_offset",
            "rev_cents",
            "n_buyers",
            "cum_rev_cents",
            F.col("cohort_users").cast("bigint").alias("cohort_users"),
            F.expr("cum_rev_cents div cohort_users")
            .cast("bigint")
            .alias("cum_ltv_cents_per_user"),
        )
    )


@query(
    "q_event_changepoint",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d, COUNT(*) AS n
        FROM events GROUP BY event_type, d
    ), st AS (
        SELECT event_type,
               CAST(SUM(n) AS BIGINT) AS total,
               COUNT(*) AS n_days
        FROM daily GROUP BY event_type
    ), cusum AS (
        SELECT daily.event_type, d, n,
               SUM(n_days * n - total) OVER (PARTITION BY daily.event_type
                   ORDER BY d ROWS UNBOUNDED PRECEDING) AS c_scaled
        FROM daily JOIN st ON daily.event_type = st.event_type
    ), ranked AS (
        SELECT event_type, d, n, c_scaled,
               ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY ABS(c_scaled) DESC, d) AS rk
        FROM cusum
    )
    SELECT event_type, d AS changepoint_day, CAST(n AS BIGINT) AS n_that_day,
           CAST(c_scaled AS BIGINT) AS peak_cusum_scaled
    FROM ranked WHERE rk = 1
    """,
    tags=("events", "changepoint", "cusum", "drift"),
)
def q_event_changepoint(spark, sf_dir):
    """Changepoint detection per event type — the CUSUM argmax: the
    day where the cumulative deviation of daily volume from the
    series mean peaks in magnitude, which for a single level shift is
    the maximum-likelihood split point (the classic offline CUSUM
    estimator; drift monitors page on it). Exactness trick: instead
    of the fractional mean, the running sum accumulates
    n_days·n_i − total (the deviation SCALED by the day count), which
    is the CUSUM times a positive constant — same argmax, all BIGINT,
    no division anywhere, so the peak day and its scaled statistic
    hash bit-stably. Ties break by earliest day. Complements the
    family: q_event_trend fits a slope, q_event_robust_anomaly flags
    single days, this locates a regime SHIFT. Scale shape: corpus
    work is the (type, day) partial count; the CUSUM window and
    argmax rank run over #days rows per type."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return cusum_changepoint(daily, "event_type", "d", "n").select(
        "event_type",
        F.col("d").alias("changepoint_day"),
        F.col("n").cast("bigint").alias("n_that_day"),
        F.col("c_scaled").cast("bigint").alias("peak_cusum_scaled"),
    )


def cusum_changepoint(daily, group_col: str, day_col: str, n_col: str):
    """Division-free CUSUM argmax over ``(group, day, n)`` series →
    the peak row per group with ``c_scaled`` attached; the reusable
    core of :func:`q_event_changepoint` (see its docstring for the
    integer-scaling derivation) and the subject of the brute-force
    property test in ``tests/test_operator_properties.py``."""
    from pyspark.sql import Window as W

    st = daily.groupBy(group_col).agg(
        F.sum(n_col).cast("bigint").alias("total"),
        F.count(F.lit(1)).alias("n_days"),
    )
    wcum = (
        W.partitionBy(group_col).orderBy(day_col).rowsBetween(W.unboundedPreceding, 0)
    )
    cusum = daily.join(st, group_col).withColumn(
        "c_scaled", F.sum(F.expr(f"n_days * {n_col} - total")).over(wcum)
    )
    wrk = W.partitionBy(group_col).orderBy(
        F.abs(F.col("c_scaled")).desc(), F.asc(day_col)
    )
    return (
        cusum.withColumn("rk", F.row_number().over(wrk))
        .filter("rk = 1")
        .drop("rk", "total", "n_days")
    )
