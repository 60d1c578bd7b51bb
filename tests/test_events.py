"""Event-analytics operator invariants (plans/events.py) on a
hand-built micro-dataset where every expected value is derivable by
eye — complementing the oracle hash checks with semantic assertions
(ordering strictness, session-gap laws, cohort completeness)."""

from datetime import datetime, timedelta

import pytest

from data_ingestor_spark.plans.events import (
    q_event_anomaly,
    q_event_funnel,
    q_event_retention,
    q_event_sessions,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _mk_events(spark, rows):
    """rows: (event_id, minutes_after_t0, user_id, event_type)"""
    data = [(eid, T0 + timedelta(minutes=m), uid, et, 1.0, "{}") for eid, m, uid, et in rows]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


@pytest.fixture()
def events_dir(spark, tmp_path):
    """Write a micro events.parquet so the q_* entry points (which read
    from sf_dir) run against known data."""
    rows = [
        # user 1: view -> click -> purchase, strictly ordered
        (0, 0, 1, "view"), (1, 10, 1, "click"), (2, 20, 1, "purchase"),
        # user 2: click BEFORE first view -> stalls at view stage
        (3, 0, 2, "click"), (4, 5, 2, "view"),
        # user 3: view only
        (5, 0, 3, "view"),
        # user 4: purchase without view -> not in funnel at all
        (6, 0, 4, "purchase"),
        # user 5: two sessions — events at 0,10 then a 40-min gap, then 50,55
        (7, 0, 5, "view"), (8, 10, 5, "click"), (9, 50, 5, "view"), (10, 55, 5, "click"),
    ]
    d = str(tmp_path / "ev")
    _mk_events(spark, rows).write.parquet(d + "/events.parquet")
    return d


def test_funnel_strict_ordering(spark, events_dir):
    row = q_event_funnel(spark, events_dir).collect()[0]
    # viewers: users 1,2,3,5 ; clicks strictly after first view: 1,5
    # (user 2's click precedes their view) ; purchases after click: 1
    assert (row.n_view, row.n_click, row.n_purchase) == (4, 2, 1)


def test_sessions_gap_law(spark, events_dir):
    out = {
        (r.user_id, r.session_seq): r
        for r in q_event_sessions(spark, events_dir).collect()
    }
    # user 5 splits into two sessions at the 40-minute gap
    assert (5, 1) in out and (5, 2) in out
    assert out[(5, 1)].n_events == 2 and out[(5, 1)].duration_us == 10 * 60 * 1_000_000
    assert out[(5, 2)].n_events == 2 and out[(5, 2)].duration_us == 5 * 60 * 1_000_000
    # single-event users form one zero-length session
    assert out[(3, 1)].n_events == 1 and out[(3, 1)].duration_us == 0
    # sessions partition the events: total n_events == total event count
    assert sum(r.n_events for r in out.values()) == 11


def test_retention_day0_complete(spark, events_dir):
    rows = q_event_retention(spark, events_dir).collect()
    day0 = [r for r in rows if r.day_offset == 0]
    # every user is active on their own cohort day
    assert sum(r.n_users for r in day0) == 5
    # offsets are never negative (first-touch is the minimum)
    assert all(r.day_offset >= 0 for r in rows)


def test_anomaly_zscores_centered(spark, events_dir):
    rows = q_event_anomaly(spark, events_dir).collect()
    # all micro-data lands on one day -> sigma is NULL (stddev_samp of
    # 1 sample), z NULL, no anomaly flags — the degenerate case must
    # not error or flag
    assert all(r.z is None for r in rows)
    assert all(r.is_anomaly is None or r.is_anomaly is False for r in rows)
