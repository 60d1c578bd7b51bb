"""Subquery, pivot, sampling, and multi-join benchmark queries.

The reference has no SQL surface at all (SURVEY §2.1) — these are part
of the engine's declared relational surface (§2.2): correlated and
uncorrelated subqueries (EXISTS / IN / scalar), PIVOT / UNPIVOT
reshaping, deterministic hash sampling, and two TPC-H-shaped multi-join
aggregations that exercise Catalyst's join reordering + broadcast
selection the way a 100 TB warehouse query would.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_spark.plans.registry import dec, load_table, query


@query(
    "q_subq_exists",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    tags=("subquery",),
)
def q_subq_exists(spark, sf_dir):
    """Correlated EXISTS — decorrelated by Catalyst into a left-semi
    join on the correlation key (no per-row re-execution)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    c.createOrReplaceTempView("sq_customer")
    o.createOrReplaceTempView("sq_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_nationkey
        FROM sq_customer c
        WHERE EXISTS (SELECT 1 FROM sq_orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        """
    )


@query(
    "q_subq_in",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey
    FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
    """,
    tags=("subquery",),
)
def q_subq_in(spark, sf_dir):
    """Uncorrelated IN subquery → broadcast semi join (the inner side is
    a handful of nation keys; Catalyst broadcasts it)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    s.createOrReplaceTempView("sq_supplier")
    n.createOrReplaceTempView("sq_nation")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, s_nationkey
        FROM sq_supplier
        WHERE s_nationkey IN (SELECT n_nationkey FROM sq_nation WHERE n_regionkey = 1)
        """
    )


@query(
    "q_subq_not_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("subquery",),
)
def q_subq_not_exists(spark, sf_dir):
    """Correlated NOT EXISTS → left-anti join (customers with no orders)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    c.createOrReplaceTempView("sq_customer2")
    o.createOrReplaceTempView("sq_orders2")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM sq_customer2 c
        WHERE NOT EXISTS (SELECT 1 FROM sq_orders2 o WHERE o.o_custkey = c.c_custkey)
        """
    )


@query(
    "q_subq_scalar",
    oracle="""
    WITH stats AS (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents,
               COUNT(*) AS n
        FROM orders
    )
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_dec,
           CAST((SELECT cents FROM stats) AS DOUBLE)
               / CAST(100 * (SELECT n FROM stats) AS DOUBLE) AS global_avg
    FROM orders
    WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              * 2 * (SELECT n FROM stats)
          > 3 * (SELECT cents FROM stats)
    """,
    tags=("subquery", "scalar"),
)
def q_subq_scalar(spark, sf_dir):
    """Scalar subquery (global average) used in both projection and
    filter — computed once and broadcast, not per-row.

    Determinism discipline: DuckDB's AVG over DECIMAL accumulates in
    parallel floating point, so its last bits vary run-to-run; instead
    the average is derived from the *exact* decimal SUM (hugeint in
    DuckDB, unbounded decimal in Spark) converted to integer cents.
    The `price > 1.5 * avg` predicate is rewritten as pure integer
    arithmetic (2 * cents(price) * n > 3 * sum_cents) — zero FP in the
    filter — and the projected average is one well-defined IEEE double
    division, identical on both engines."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("sq_orders3")
    return spark.sql(
        """
        WITH stats AS (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents,
                   COUNT(*) AS n
            FROM sq_orders3
        )
        SELECT o_orderkey, o_custkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_dec,
               CAST((SELECT cents FROM stats) AS DOUBLE)
                   / CAST(100 * (SELECT n FROM stats) AS DOUBLE) AS global_avg
        FROM sq_orders3
        WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  * 2 * (SELECT n FROM stats)
              > 3 * (SELECT cents FROM stats)
        """
    )


@query(
    "q_pivot",
    oracle="""
    SELECT o_custkey,
        CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'F'), 0) AS DOUBLE) AS spend_F,
        CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'O'), 0) AS DOUBLE) AS spend_O,
        CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'P'), 0) AS DOUBLE) AS spend_P
    FROM orders
    GROUP BY o_custkey
    """,
    tags=("pivot",),
)
def q_pivot(spark, sf_dir):
    """PIVOT: order status → columns of per-customer spend. With an
    explicit value list the pivot is one pass (no distinct-values
    pre-job) — map-side partial aggregation, single shuffle."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_custkey")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(dec("o_totalprice")))
    )
    return piv.select(
        "o_custkey",
        *[
            F.coalesce(F.col(s).cast("double"), F.lit(0.0)).alias(f"spend_{s}")
            for s in ["F", "O", "P"]
        ],
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT p_partkey, metric, CAST(val AS DOUBLE) AS val
    FROM (
        SELECT p_partkey,
               CAST(p_retailprice AS DECIMAL(18,2)) AS retailprice,
               CAST(p_size AS DECIMAL(18,2)) AS size
        FROM part
    ) UNPIVOT (val FOR metric IN (retailprice, size))
    """,
    tags=("pivot",),
)
def q_unpivot(spark, sf_dir):
    """UNPIVOT (melt): wide numeric columns → (metric, value) rows via
    the built-in unpivot — a narrow map, no shuffle at all."""
    p = load_table(spark, sf_dir, "part")
    wide = p.select(
        "p_partkey",
        dec("p_retailprice").alias("retailprice"),
        dec("p_size").alias("size"),
    )
    return wide.unpivot("p_partkey", ["retailprice", "size"], "metric", "val").select(
        "p_partkey", "metric", F.col("val").cast("double").alias("val")
    )


@query(
    "q_sample_hash",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders
    WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 100 < 10
    """,
    tags=("sample",),
)
def q_sample_hash(spark, sf_dir):
    """Deterministic 10% sample by key hash — the reproducible sampling
    primitive for pipeline debugging (unlike TABLESAMPLE, identical on
    every engine and every run, and pushes down as a plain filter)."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.expr("conv(substring(md5(cast(o_orderkey as string)), 1, 8), 16, 10)").cast(
        "bigint"
    ) % 100
    return o.select("o_orderkey", "o_custkey", "o_orderstatus").filter(bucket < 10)


@query(
    "q_sample_stratified",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 100
          < CASE o_orderstatus WHEN 'F' THEN 5 WHEN 'O' THEN 10 ELSE 50 END
    """,
    tags=("sample", "stratified"),
)
def q_sample_stratified(spark, sf_dir):
    """Stratified deterministic sampling: per-stratum rates (5% of
    'F' orders, 10% of 'O', 50% of the rare 'P') via the same md5
    bucket — the class-rebalancing primitive for training-data
    pipelines, reproducible across engines and runs, executed as one
    pushed-down filter with no shuffle."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.expr("conv(substring(md5(cast(o_orderkey as string)), 1, 8), 16, 10)").cast(
        "bigint"
    ) % 100
    rate = (
        F.when(F.col("o_orderstatus") == "F", 5)
        .when(F.col("o_orderstatus") == "O", 10)
        .otherwise(50)
    )
    return o.select("o_orderkey", "o_orderstatus").filter(bucket < rate)


def _revenue_units() -> F.Column:
    """``SUM(extendedprice · (1 − discount))`` as an exact long
    multiply-add per row instead of per-row decimal casts plus a
    128-bit Decimal accumulator (r13, guide §2.3 — the q_agg_basic /
    q_tpch_q9 integer-units discipline). Both columns are 2-decimal
    values, so ``round(x·100)`` is the exact cent count and the product
    is exact in 10⁻⁴ units; ONE decimal rescale per group reconstructs
    the exact rational before the double cast, so the output double is
    bit-identical to the decimal pipeline's (sf0.1 hashes unchanged on
    both headline consumers). ANSI mode turns any overflow of the
    ~2⁶³ long headroom into an error, never a silent wrap."""
    units = F.expr(
        "cast(round(l_extendedprice * 100) as bigint)"
        " * (100 - cast(round(l_discount * 100) as bigint))"
    )
    return (F.sum(units).cast("decimal(38,0)") / F.lit(10000)).cast("double")


@query(
    "q_tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15'
      AND l.l_shipdate > TIMESTAMP '1997-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 20
    """,
    tags=("join", "agg", "benchmark"),
)
def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 (shipping priority): 3-way join with selective filters
    on every input. Catalyst pushes each predicate into its scan and
    AQE picks broadcast for the filtered customer side; the top-20 is
    TakeOrdered, never a full sort. Deterministic tie-break on
    (o_orderdate, l_orderkey)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue_units().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(20)
    )


@query(
    "q_tpch_q5",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    tags=("join", "agg", "benchmark"),
)
def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 (local-supplier revenue): 6-way star join. The true
    dimension tables (supplier, nation, region) broadcast explicitly;
    customer is mid-sized so Catalyst/AQE picks its strategy from
    runtime stats. At 100 TB the orders⋈lineitem and customer joins are
    the only exchanges — every dimension join stays map-side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(_revenue_units().alias("revenue"))


@query(
    "q_recursive_compound",
    oracle="""
    WITH RECURSIVE dep AS (
        SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate)
                    - (1997 * 12 + 1) AS BIGINT) AS m,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS dep_cents
        FROM orders
        WHERE year(o_orderdate) = 1997
        GROUP BY m
    ), bal(m, cents) AS (
        SELECT CAST(-1 AS BIGINT), CAST(0 AS BIGINT)
        UNION ALL
        SELECT b.m + 1, b.cents + b.cents // 100 + COALESCE(d.dep_cents, 0)
        FROM bal b LEFT JOIN dep d ON d.m = b.m + 1
        WHERE b.m < 11
    )
    SELECT m AS month_idx, CAST(cents AS DOUBLE) / 100 AS balance
    FROM bal WHERE m >= 0
    """,
    tags=("subquery", "recursive", "iterative"),
)
def q_recursive_compound(spark, sf_dir):
    """Native recursive CTE (Spark 4 WITH RECURSIVE): a compounding
    monthly balance over 1997's order receipts — balance(m) =
    balance(m-1) + 1% interest + month-m deposits. The recurrence is
    multiplicative in the prior state, so it is NOT expressible as a
    window/prefix aggregate; the recursive CTE is the honest SQL form,
    and Spark executes it as an iterative loop of the step plan (the
    same execution strategy as DuckDB's recursive evaluator). All
    arithmetic is BIGINT cents with floor division (``DIV`` / ``//``),
    so twelve chained steps stay bit-exact across engines; the balance
    surfaces through one double division.

    Scale: the recursion is 12 iterations over a 12-row aggregate —
    driver-cheap by construction; the heavy lifting (the orders scan
    and monthly rollup) happens ONCE in the non-recursive seed CTE
    with map-side partial aggregation, which is exactly how an
    iterative-recurrence job should be laid out at 100 TB: aggregate
    first, iterate on the small state."""
    o = load_table(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997)
    dep = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - (1997 * 12 + 1))
        .cast("bigint")
        .alias("m")
    ).agg(F.sum((dec("o_totalprice") * 100).cast("bigint")).alias("dep_cents"))
    # materialize the 12-row rollup ONCE: the recursive step plan joins
    # this view every iteration, and an unmaterialized view would re-run
    # the full orders scan+agg per iteration (measured 12x the scan cost
    # at sf0.1 — the "aggregate first, iterate on the small state"
    # docstring contract requires this checkpoint)
    dep = dep.localCheckpoint(eager=True)
    # createOrReplaceTempView is idempotent, so re-invocation is safe;
    # the view must outlive this call because the returned plan is lazy.
    dep.createOrReplaceTempView("_recursive_dep")
    return spark.sql(
            """
            WITH RECURSIVE bal(m, cents) AS (
                SELECT CAST(-1 AS BIGINT), CAST(0 AS BIGINT)
                UNION ALL
                SELECT b.m + 1, b.cents + b.cents DIV 100 + COALESCE(d.dep_cents, 0)
                FROM bal b LEFT JOIN _recursive_dep d ON d.m = b.m + 1
                WHERE b.m < 11
            )
            SELECT m AS month_idx, CAST(cents AS DOUBLE) / 100 AS balance
            FROM bal WHERE m >= 0
            """
    )


@query(
    "q_subq_lateral",
    oracle="""
    SELECT r.r_name, t.n_name, t.n_nationkey
    FROM region r, LATERAL (
        SELECT n_name, n_nationkey FROM nation n
        WHERE n.n_regionkey = r.r_regionkey
        ORDER BY n_name, n_nationkey LIMIT 2
    ) t
    """,
    tags=("subquery", "lateral", "join"),
)
def q_subq_lateral(spark, sf_dir):
    """Correlated LATERAL subquery (per-outer-row top-2): the SQL-native
    spelling of top-k-per-group — each region row drives an ordered,
    limited scan of its nations. Catalyst decorrelates the LIMIT into a
    rank-window over one join instead of re-executing the inner query
    per row (the nested-loop a naive engine would run); the tie-break on
    (n_name, n_nationkey) makes the kept rows unique, so the hash check
    is order-insensitively exact."""
    load_table(spark, sf_dir, "region").createOrReplaceTempView("lat_region")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("lat_nation")
    return spark.sql(
        """
        SELECT r.r_name, t.n_name, t.n_nationkey
        FROM lat_region r
        JOIN LATERAL (
            SELECT n_name, n_nationkey FROM lat_nation n
            WHERE n.n_regionkey = r.r_regionkey
            ORDER BY n_name, n_nationkey LIMIT 2
        ) t
        """
    )
