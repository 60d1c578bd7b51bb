"""Behavioral pins for the Pandas-UDF operator family (plans/udfs.py).

The oracle gate proves q_udf_cogrouped against the full-outer join+agg
SQL on the fixed testdata; these tests pin the edge cases that data may
not exercise — users present on only ONE side of the cogroup — and the
bucketing invariant the round-6 rewrite introduced (the cogroup key is
a hash bucket, so one Python call sees MANY users and the per-user
merge happens inside the function; results must not depend on how
users land in buckets).
"""

import os
import tempfile

import pytest


@pytest.fixture(scope="module")
def ltv_sf_dir(spark):
    """A tiny sf_dir with users covering every sidedness case:
    u1 both sides, u2 events-only, u3 orders-only."""
    d = tempfile.mkdtemp(prefix="ltv-sf-")
    events = spark.createDataFrame(
        [
            (1, "purchase"),
            (1, "click"),
            (1, "purchase"),
            (2, "click"),
        ],
        "user_id bigint, event_type string",
    )
    orders = spark.createDataFrame(
        [
            (1, 10.05),
            (3, 0.01),
            (3, 99.99),
        ],
        "o_custkey bigint, o_totalprice double",
    )
    events.write.parquet(os.path.join(d, "events.parquet"))
    orders.write.parquet(os.path.join(d, "orders.parquet"))
    return d


def test_cogrouped_ltv_one_sided_users(spark, ltv_sf_dir):
    from data_ingestor_spark.plans.udfs import q_udf_cogrouped

    rows = {
        r["user_id"]: r.asDict()
        for r in q_udf_cogrouped(spark, ltv_sf_dir).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[1] == {
        "user_id": 1,
        "n_events": 3,
        "n_purchases": 2,
        "n_orders": 1,
        "total_spend": 10.05,
    }
    # events-only user: zero orders, zero spend
    assert rows[2] == {
        "user_id": 2,
        "n_events": 1,
        "n_purchases": 0,
        "n_orders": 0,
        "total_spend": 0.0,
    }
    # orders-only user: zero events; exact-cents sum (0.01 + 99.99)
    assert rows[3] == {
        "user_id": 3,
        "n_events": 0,
        "n_purchases": 0,
        "n_orders": 2,
        "total_spend": 100.0,
    }


def test_cogrouped_ltv_multi_user_bucket_merge():
    """The combine fn receives a whole BUCKET of users per call; its
    in-function groupby must produce the same per-user rows regardless
    of which users share a call (the bucketing-invariance the plan
    relies on: pmod(hash(key), N) is just a partitioning choice)."""
    import pandas as pd

    from data_ingestor_spark.plans.udfs import _user_ltv

    events = pd.DataFrame(
        {"user_id": [7, 8, 7], "event_type": ["purchase", "click", "click"]}
    )
    orders = pd.DataFrame({"o_custkey": [8, 9], "o_totalprice": [1.10, 2.23]})

    together = _user_ltv(events, orders)
    # same users split into singleton calls (what raw-key cogrouping did)
    apart = pd.concat(
        [
            _user_ltv(events[events.user_id == 7], orders[orders.o_custkey == -1]),
            _user_ltv(events[events.user_id == 8], orders[orders.o_custkey == 8]),
            _user_ltv(events[events.user_id == -1], orders[orders.o_custkey == 9]),
        ]
    )
    key = lambda df: df.sort_values("user_id").reset_index(drop=True)  # noqa: E731
    pd.testing.assert_frame_equal(key(together), key(apart), check_dtype=True)
