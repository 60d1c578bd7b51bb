"""User-defined function surface: vectorized scalar Pandas UDF, grouped
UDAF via applyInPandas, and a Spark 4 Python UDTF (SURVEY.md §2.2 "UDF /
UDAF / UDTF" — absent from the reference, whose transforms are hardwired
Go functions).

Performance stance: these exist to prove the extension points. The UDFs
are Arrow-vectorized (pandas batches, not row-at-a-time); everything
that CAN be a built-in expression elsewhere in the engine IS one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestor_spark.plans.registry import load_table, query


@F.pandas_udf(T.DoubleType())
def _charge_udf(price: pd.Series, tax: pd.Series, discount: pd.Series) -> pd.Series:
    """Vectorized charge formula — numpy IEEE doubles, same result as the
    SQL expression (price * (1 + tax)) * (1 - discount)."""
    return (price * (1.0 + tax)) * (1.0 - discount)


@query(
    "q_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (l_extendedprice * (1 + l_tax)) * (1 - l_discount) AS charge
    FROM lineitem WHERE l_orderkey < 500
    """,
    tags=("udf",),
)
def q_udf_scalar(spark, sf_dir):
    """Scalar Pandas UDF (Arrow-batched). The oracle is the equivalent
    plain-SQL expression — numpy and the SQL engine both evaluate IEEE
    doubles in the same association order, so values are bit-identical."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _charge_udf("l_extendedprice", "l_tax", "l_discount").alias("charge"),
    )


def _median_per_group(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
            "n": [len(pdf)],
            "median_bal": [pdf["c_acctbal"].median()],
        }
    )


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n, MEDIAN(c_acctbal) AS median_bal
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("udf", "agg"),
)
def q_udaf_grouped(spark, sf_dir):
    """Grouped-map UDAF (applyInPandas): exact median per group — an
    aggregate Spark has no exact built-in for. pandas and DuckDB both
    average the two middle values on even counts. One shuffle on the
    group key; each group is a single Arrow batch in Python.

    Scale note: per-group pandas requires groups to fit in memory —
    fine for dimension-cardinality groups; for billions-per-group use
    percentile_approx instead (q_agg_approx)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInPandas(
        _median_per_group, schema="c_mktsegment string, n long, median_bal double"
    )


@query(
    "q_udtf_tokens",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents WHERE doc_id < 20
    """,
    tags=("udf", "udtf", "text"),
)
def q_udtf_tokens(spark, sf_dir):
    """Python UDTF (Spark 4): one input row → N output rows (token with
    position). The oracle is DuckDB's unnest(string_split). The engine's
    hot tokenization path uses built-in split/posexplode (q_explode,
    ext.text); the UDTF exists to prove the table-function extension
    point."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, token string", useArrow=True)
    class Tokenize:
        def eval(self, doc_id: int, text: str):  # noqa: A002
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield doc_id, i, tok

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("tokenize_udtf", Tokenize)
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.token FROM _udtf_docs, LATERAL tokenize_udtf(doc_id, text) t"
    )


_LTV_COLS = ["user_id", "n_events", "n_purchases", "n_orders", "total_spend"]


def _user_ltv(events_pdf: pd.DataFrame, orders_pdf: pd.DataFrame) -> pd.DataFrame:
    """Cogrouped combine over one BUCKET of users: each side's frame
    holds every row for the ~|users|/N_LTV_BUCKETS users hashing to the
    bucket; the per-user merge runs vectorized in pandas. Round-6
    scaling-probe finding that forced this shape, measured at sf0.1:
    cogrouping on the raw user key (~15.5k cogroup keys) cost 24 s, and
    the floor was Spark's per-KEY cogroup machinery (~1.5 ms/key for the
    co-partitioned exchange + per-group Arrow round trip), NOT the
    Python — slimming the 1-row frame construction 400→145 µs was
    end-to-end neutral. Bucketing the cogroup key amortizes that floor
    over ~hundreds of users per Arrow call while keeping the operator a
    genuine cogrouped applyInPandas. That is the 100 TB guidance:
    cogrouped applyInPandas prices every KEY, so keep keys coarse
    (bucket + in-function groupby) or prefer join+agg (the oracle's own
    shape) unless the per-user combine is genuinely non-relational."""
    # exact-cents arithmetic: a float sum + Python round() drifts on
    # .xx5 boundaries vs the oracle's exact decimal sum; np.rint on
    # price*100 is exact (prices are 2-decimal) and divides back
    # losslessly
    if len(events_pdf):
        is_p = (events_pdf["event_type"].to_numpy() == "purchase").astype(np.int64)
        ev = pd.DataFrame(
            {"user_id": events_pdf["user_id"].to_numpy(), "is_p": is_p}
        ).groupby("user_id", sort=False)
        ev = pd.DataFrame(
            {"n_events": ev["is_p"].size(), "n_purchases": ev["is_p"].sum()}
        )
    else:
        ev = pd.DataFrame(
            {"n_events": [], "n_purchases": []}, index=pd.Index([], name="user_id")
        )
    if len(orders_pdf):
        cents = np.rint(orders_pdf["o_totalprice"].to_numpy() * 100).astype(np.int64)
        od = pd.DataFrame(
            {"o_custkey": orders_pdf["o_custkey"].to_numpy(), "cents": cents}
        ).groupby("o_custkey", sort=False)
        od = pd.DataFrame({"n_orders": od["cents"].size(), "cents": od["cents"].sum()})
    else:
        od = pd.DataFrame(
            {"n_orders": [], "cents": []}, index=pd.Index([], name="o_custkey")
        )
    merged = ev.join(od, how="outer").fillna(0)
    return pd.DataFrame(
        {
            "user_id": merged.index.to_numpy().astype(np.int64),
            "n_events": merged["n_events"].to_numpy().astype(np.int64),
            "n_purchases": merged["n_purchases"].to_numpy().astype(np.int64),
            "n_orders": merged["n_orders"].to_numpy().astype(np.int64),
            "total_spend": merged["cents"].to_numpy().astype(np.int64) / 100.0,
        },
        columns=_LTV_COLS,
    )


@query(
    "q_udf_cogrouped",
    oracle="""
    WITH ev AS (
        SELECT user_id, COUNT(*) AS n_events,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases
        FROM events GROUP BY user_id
    ), od AS (
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        FROM orders GROUP BY o_custkey
    )
    SELECT COALESCE(ev.user_id, od.o_custkey) AS user_id,
           COALESCE(ev.n_events, 0) AS n_events,
           COALESCE(ev.n_purchases, 0) AS n_purchases,
           COALESCE(od.n_orders, 0) AS n_orders,
           COALESCE(od.total_spend, 0.0) AS total_spend
    FROM ev FULL JOIN od ON ev.user_id = od.o_custkey
    """,
    tags=("udf", "cogroup"),
)
def q_udf_cogrouped(spark, sf_dir):
    """Cogrouped applyInPandas (the fourth Pandas-UDF shape after
    scalar / grouped-agg / UDTF): events and orders cogrouped on the
    user key, combined per-user in one Python function — the
    custom-combine escape hatch when a correlation of two tables isn't
    expressible as join+agg. Arrow-batched both sides, one co-partition
    shuffle each, no per-row Python. The cogroup key is a HASH BUCKET of
    the user key, not the raw key: Spark prices cogrouped applyInPandas
    per group (~1.5 ms/key machinery floor, measured r6), so raw-key
    cogrouping cost 24 s at sf0.1's ~15.5k users while 64 buckets with a
    vectorized in-function per-user groupby costs the same shuffle but
    ~64 Arrow calls. Same trick a 1000-executor job needs at 100 TB —
    bucket count scales with cores, not users. The oracle is the
    equivalent full-outer join+agg; the pandas side sums in exact
    integer cents so the spend total equals the oracle's exact decimal
    sum bit-for-bit (a float sum + round() would drift on half-cent
    boundaries)."""
    n_buckets = 64
    e = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .withColumn("b", F.pmod(F.hash("user_id"), F.lit(n_buckets)))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .withColumn("b", F.pmod(F.hash("o_custkey"), F.lit(n_buckets)))
    )
    out_schema = (
        "user_id bigint, n_events bigint, n_purchases bigint, "
        "n_orders bigint, total_spend double"
    )
    return (
        e.groupBy("b")
        .cogroup(o.groupBy("b"))
        .applyInPandas(_user_ltv, schema=out_schema)
    )


@query(
    "q_udtf_analyze",
    oracle="""
    SELECT 'click' AS event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT 'purchase', COUNT(*),
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
    FROM events WHERE event_type = 'purchase'
    """,
    tags=("udf", "udtf", "analyze"),
)
def q_udtf_analyze(spark, sf_dir):
    """Polymorphic Python UDTF (Spark 4 ``analyze``): the output schema
    is computed AT PLAN TIME from the constant argument — here a
    comma-separated metric list chooses which aggregate columns exist.
    This is the table-function shape connector authors need when the
    result schema depends on arguments (a pivoted export, a configurable
    profiler). The eval path just re-emits rows; the aggregates run in
    ordinary Catalyst on top, so nothing hot lives in Python. Catalyst
    cannot push predicates THROUGH a UDTF boundary, so the event-type
    filter is stated Catalyst-side before the lateral (it reaches the
    parquet scan as a pushed filter) and only matching rows pay the
    Arrow transfer; eval keeps its own guard so its contract doesn't
    depend on the caller's pre-filter (round-6 scaling probe: this key
    was shipping every event row into Python, 8.6 s at sf0.1)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class FilterEmit:
        @staticmethod
        def analyze(types_arg: AnalyzeArgument, *_rest) -> AnalyzeResult:
            # schema derived from the constant argument at plan time
            wanted = [t.strip() for t in str(types_arg.value).split(",")]
            fields = [StructField("event_type", StringType())]
            if "n" in wanted:
                fields.append(StructField("one", LongType()))
            if "value" in wanted:
                fields.append(StructField("value", DoubleType()))
            return AnalyzeResult(StructType(fields))

        def eval(self, types_arg, event_type, value):  # noqa: A002
            # row arity must track the analyze()-derived schema for EVERY
            # argument value, and NULL measures propagate as NULL instead
            # of crashing the task (float(None) raises). The metric-list
            # parse is memoized per instance — the argument is a plan
            # constant, so parsing it per row is pure overhead.
            if event_type in ("click", "purchase"):
                wanted = getattr(self, "_wanted", None)
                if wanted is None:
                    wanted = [t.strip() for t in str(types_arg).split(",")]
                    self._wanted = wanted
                row = [event_type]
                if "n" in wanted:
                    row.append(1)
                if "value" in wanted:
                    row.append(float(value) if value is not None else None)
                yield tuple(row)

    Emitter = udtf(FilterEmit, useArrow=True)
    spark.udtf.register("filter_emit_udtf", Emitter)
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    e.createOrReplaceTempView("_udtf_events")
    return spark.sql(
        """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM (SELECT t.* FROM
              (SELECT event_type, value FROM _udtf_events
               WHERE event_type IN ('click', 'purchase')) src,
              LATERAL filter_emit_udtf('n,value', event_type, value) t)
        GROUP BY event_type
        """
    )
