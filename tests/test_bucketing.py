"""Bucketed co-located join: the shuffle-elimination technique for
repeated big-table joins at scale (SURVEY §2.2 / task scale posture).

Writing both join sides bucketed by the join key means every future
join on that key is exchange-free: each task zips matching buckets.
At 100 TB this turns the recurring orders⋈lineitem join from the
dominant shuffle into a local merge."""

import pytest

from conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    from data_ingestor_spark.plans.registry import load_table

    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    for name, df, key in [("b_orders", o, "o_orderkey"), ("b_lineitem", li, "l_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    # at test scale Catalyst would broadcast instead (bypassing buckets);
    # disable to surface the merge path a 100 TB fact⋈fact join takes
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(ot).join(
            spark.table(lt), spark.table(ot).o_orderkey == spark.table(lt).l_orderkey
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: sort-merge join with NO exchange on either side
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_result_matches_plain(spark, bucketed_tables):
    from pyspark.sql import functions as F

    from data_ingestor_spark.plans.registry import load_table

    ot, lt = bucketed_tables
    bucketed_n = (
        spark.table(ot)
        .join(spark.table(lt), spark.table(ot).o_orderkey == spark.table(lt).l_orderkey)
        .count()
    )
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    plain_n = o.join(li, o.o_orderkey == li.l_orderkey).count()
    assert bucketed_n == plain_n


def test_bucketed_groupby_avoids_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also reuses the bucketing — no
    exchange before the final aggregate."""
    from pyspark.sql import functions as F

    ot, _ = bucketed_tables
    agg = spark.table(ot).groupBy("o_orderkey").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
