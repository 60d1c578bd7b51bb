"""As-of join direction semantics (operators/asof.py)."""

from data_ingestor_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 40), (2, 5)], "k bigint, t bigint"
    )
    right = spark.createDataFrame(
        [(1, 8, "a"), (1, 20, "b"), (1, 30, "c"), (2, 50, "z")],
        "rk bigint, rt bigint, payload string",
    )
    return left, right


def test_asof_backward(spark):
    left, right = _frames(spark)
    out = {
        (r["k"], r["t"]): r["payload"]
        for r in asof_join(left, right, "k", "rk", "t", "rt", ["payload"]).collect()
    }
    # most recent right row at-or-before each left time
    assert out == {(1, 10): "a", (1, 25): "b", (1, 40): "c", (2, 5): None}


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = {
        (r["k"], r["t"]): r["payload"]
        for r in asof_join(
            left, right, "k", "rk", "t", "rt", ["payload"], direction="forward"
        ).collect()
    }
    # nearest right row at-or-after each left time
    assert out == {(1, 10): "b", (1, 25): "c", (1, 40): None, (2, 5): "z"}


def test_asof_equal_time_inclusive(spark):
    left = spark.createDataFrame([(1, 20)], "k bigint, t bigint")
    right = spark.createDataFrame([(1, 20, "x")], "rk bigint, rt bigint, payload string")
    back = asof_join(left, right, "k", "rk", "t", "rt", ["payload"]).collect()[0]
    fwd = asof_join(
        left, right, "k", "rk", "t", "rt", ["payload"], direction="forward"
    ).collect()[0]
    assert back["payload"] == "x" and fwd["payload"] == "x"  # both bounds inclusive
