"""TPC-H-shaped benchmark queries over the testdata warehouse tables.

The reference has no SQL surface (SURVEY §2.1); like ``subqueries.py``'s
Q3/Q5 these are part of the engine's declared relational surface (§2.2)
— the classic decision-support shapes a 100 TB warehouse runs daily,
adapted to the testdata's reduced schemas (no partsupp table; lineitem
has no commitdate/receiptdate/shipmode; dates span 1995–2001; nation
names are ``NATION_<k>``; ``p_type`` is a single word incl. ``PROMO``).
All 22 spec shapes are covered. Queries whose spec predicates use the
missing partsupp table / part columns survive with documented
substitutions: Q4/Q12/Q22 (late-shipment ← shipdate lag instead of the
absent commit/receipt dates; ship mode ← return flag; country code ←
nation key), Q2/Q11/Q16/Q20 (the part-supplier relation ← the DISTINCT
(l_partkey, l_suppkey) pairs observed in lineitem, with supply cost ←
min observed line price, availability/stock value ← shipped volume),
Q9 (supply cost ← 0.6 × p_retailprice), Q19 (container ← size band),
Q21 (late ← shipdate lag, as in Q4). The plan *shapes* — EXISTS
semi-join, fact-fact two-way-case agg, anti-join + scalar subquery,
correlated-min de-correlation, HAVING vs broadcast scalar, disjunctive
join predicate, double-correlated EXISTS/NOT-EXISTS — are the spec's.

Float discipline (see ``registry.dec``): base money columns are cast to
exact decimal before arithmetic, sums surface as double, and every
division is performed on exact operands with identical parenthesization
in both engines, so the hashes match bit-for-bit without rounding.

Scale notes: each query follows the same plan discipline as Q3/Q5 —
selective filters pushed into every scan, true dimensions broadcast
explicitly, fact-fact joins as the only exchanges, top-k as TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_spark.plans.registry import dec, load_table, query

_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def _rev_col():
    return F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast("double")


@query(
    "q_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({_REV}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({_REV} * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "benchmark"),
)
def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 (pricing summary): the canonical wide scan-aggregate —
    one pass, map-side partial aggregation into a 6-group shuffle.
    Averages are computed as exact-sum-as-double / count (one identical
    division per engine) rather than engine AVG, which would round
    differently.

    r13 optimization (guide §2.3; the q_agg_basic / q_tpch_q9
    integer-units discipline): all eight aggregates accumulate exact
    long units instead of per-row decimal casts + 128-bit Decimal adds
    — 2-decimal columns are exact in cents, the discounted price in
    10⁻⁴ units, and the taxed charge in 10⁻⁶ units. The charge sum is
    split into (div 10⁶, mod 10⁶) long halves re-joined exactly in ONE
    per-group decimal expression, so its long headroom scales to
    ~10⁸ × TPC-H sf1000 instead of overflowing near sf150; every
    output double is the correctly-rounded value of the same exact
    rational the decimal pipeline produced (sf0.1 hash unchanged,
    oracle re-pass at two SFs)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp")
    )
    cnt = F.count(F.lit(1))
    c = lambda col: f"cast(round({col} * 100) as bigint)"  # noqa: E731
    u4 = f"{c('l_extendedprice')} * (100 - {c('l_discount')})"
    u6 = f"({u4}) * (100 + {c('l_tax')})"
    as_dbl = lambda s, scale, name: (  # noqa: E731
        (s.cast("decimal(38,0)") / F.lit(scale)).cast("double").alias(name)
    )
    sum_qty = F.sum(F.expr(c("l_quantity")))
    sum_price = F.sum(F.expr(c("l_extendedprice")))
    sum_disc = F.sum(F.expr(c("l_discount")))
    charge = (
        (
            F.sum(F.expr(f"({u6}) div 1000000")).cast("decimal(38,0)") * F.lit(1000000)
            + F.sum(F.expr(f"({u6}) % 1000000")).cast("decimal(38,0)")
        )
        / F.lit(1000000)
    ).cast("double")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        as_dbl(sum_qty, 100, "sum_qty"),
        as_dbl(sum_price, 100, "sum_base_price"),
        as_dbl(F.sum(F.expr(u4)), 10000, "sum_disc_price"),
        charge.alias("sum_charge"),
        (as_dbl(sum_qty, 100, "_q") / cnt).alias("avg_qty"),
        (as_dbl(sum_price, 100, "_p") / cnt).alias("avg_price"),
        (as_dbl(sum_disc, 100, "_d") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@query(
    "q_tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "benchmark"),
)
def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): pure filter-aggregate.
    All three predicates push into the parquet scan; the aggregation is
    a single global decimal sum — zero joins, one tiny shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double").alias("revenue")
    )


@query(
    "q_tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(SUM({_REV.replace('l_', 'l.l_')}) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg", "benchmark"),
)
def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 (volume shipping between two nations): fact-fact join
    chain with a disjunctive nation-pair predicate. Both nation lookups
    broadcast; the nation filter is applied AFTER the broadcast joins
    (it needs both sides), but the date filter pushes into the lineitem
    scan, which at 100 TB prunes ~2/7 of partitions by ship date."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8"))
            | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_rev_col().alias("revenue"))
    )


@query(
    "q_tpch_q8",
    oracle=f"""
    WITH all_nations AS (
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               {_REV.replace('l_', 'l.l_')} AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA'
          AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           COALESCE(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume END) AS DOUBLE), 0.0)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM all_nations GROUP BY o_year
    """,
    tags=("join", "agg", "benchmark"),
)
def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 (national market share): 8-way star join with a
    conditional-aggregate ratio. part/supplier/nation/region broadcast;
    the market-share division runs on exact decimal sums cast to double
    (identical operands both engines — no rounding needed)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(F.year("o_orderdate").cast("int").alias("o_year"), vol.alias("volume"), "nation")
    )
    num = F.coalesce(
        F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume"))).cast("double"),
        F.lit(0.0),
    )
    return joined.groupBy("o_year").agg(
        (num / F.sum("volume").cast("double")).alias("mkt_share")
    )


@query(
    "q_tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({_REV.replace('l_', 'l.l_')}) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "benchmark"),
)
def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): quarter of orders × returned
    lineitems × customer × nation, top-20 by lost revenue. Both
    selective filters push into their scans; nation broadcasts; top-20
    is TakeOrdered with c_custkey tie-break."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_rev_col().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("join", "agg", "benchmark"),
)
def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution): left join with an
    extra join-side predicate (adapted: priority filter stands in for
    the original o_comment NOT LIKE — the column doesn't exist here),
    double aggregation. Customers with zero qualifying orders land in
    the c_count=0 bucket — the left join is load-bearing."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q_tpch_q14",
    oracle=f"""
    SELECT 100.0 * (CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN {_REV.replace('l_', 'l.l_')} END) AS DOUBLE)
                    / CAST(SUM({_REV.replace('l_', 'l.l_')}) AS DOUBLE)) AS promo_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
    tags=("join", "agg", "benchmark"),
)
def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promotion effect): one broadcast join + conditional
    ratio. The month filter pushes into the lineitem scan (partition
    pruning at scale); part broadcasts. Division on exact decimal sums
    cast double, multiplied by 100 with identical parenthesization."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    vol = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    promo = F.sum(F.when(F.col("p_type") == "PROMO", vol)).cast("double")
    return joined.agg(
        (F.lit(100.0) * (promo / F.sum(vol).cast("double"))).alias("promo_revenue")
    )


@query(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, SUM({_REV}) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
    tags=("join", "agg", "subquery", "benchmark"),
)
def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier): aggregate → scalar-subquery max →
    equality. The max comparison runs on EXACT decimals (never the
    double projection) so ties and near-ties are engine-stable; the
    1-row max broadcasts. Supplier table broadcasts onto the winner."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_rev == mx.mx)
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
    )


@query(
    "q_tpch_q17",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
          SELECT 0.2 * (CAST(SUM(l2.l_quantity) AS DOUBLE) / COUNT(*))
          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    """,
    tags=("join", "agg", "subquery", "benchmark"),
)
def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): correlated aggregate
    subquery, decorrelated into a per-partkey average join. The brand
    filter semi-joins lineitem FIRST (broadcast), so the per-part
    average aggregates only the ~brand-share of the fact table rather
    than all of it — the decorrelation you'd want at 100 TB. Quantities
    are small integers, so their double sums are exact and the 0.2×avg
    threshold is bit-identical in both engines."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    avgq = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.sum("l_quantity").cast("double") / F.count(F.lit(1))).alias("aq")
    )
    flagged = li.join(avgq, F.col("l_partkey") == F.col("ap_key")).filter(
        F.col("l_quantity") < F.lit(0.2) * F.col("aq")
    )
    return flagged.agg(
        (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly")
    )


@query(
    "q_tpch_q18",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    tags=("join", "agg", "subquery", "benchmark"),
)
def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): IN-subquery over a grouped
    HAVING — decorrelated as a semi-join from the pre-aggregated
    order-quantity relation (threshold 250, sized to this data's
    per-order quantity distribution). The big-order id list is tiny
    after HAVING, so it broadcasts into the fact join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 250)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    joined = (
        li.join(F.broadcast(big), li.l_orderkey == F.col("big_key"), "inner")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("sum_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            dec("o_totalprice").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
    )


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    tags=("agg", "subquery", "benchmark"),
)
def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 (order priority checking), adapted: the spec's
    late-delivery predicate (l_commitdate < l_receiptdate) uses columns
    this schema lacks, so "late" is re-expressed as any line shipping
    more than 60 days after the order date — same correlated-EXISTS
    shape, executed as a LEFT SEMI join. The quarter filter prunes the
    orders scan first, so the semi-join probes only one quarter of the
    fact table; the lineitem side carries just (orderkey, shipdate)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q_tpch_q12",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag IN ('A', 'R')
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
    tags=("join", "agg", "benchmark"),
)
def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 (shipping modes / order priority), adapted: this schema
    has no l_shipmode, so the mode dimension is stood in by
    l_returnflag ('A'/'R' ~ the spec's two-mode IN list) — the plan
    shape is the spec's: a year of lineitem filtered and pre-projected,
    one fact-fact hash join on orderkey, then a two-way conditional
    count. Both CASE counts are exact integers; the only exchange is
    the join shuffle (the priority flag rides along as a 1-byte map)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q22",
    oracle="""
    WITH pos AS (
        SELECT SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sum_cents,
               COUNT(*) AS n
        FROM customer
        WHERE c_acctbal > 0.0 AND (c_nationkey % 10) IN (1, 3, 5, 7, 9)
    )
    SELECT (c.c_nationkey % 10) AS cntrycode,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, pos
    WHERE (c.c_nationkey % 10) IN (1, 3, 5, 7, 9)
      AND CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * pos.n > pos.sum_cents
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY cntrycode
    """,
    tags=("agg", "subquery", "antijoin", "benchmark"),
)
def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity), adapted: the spec's phone
    country code becomes ``c_nationkey % 10`` (no phone column) with the
    odd codes as the IN-list — the shape is the spec's: an uncorrelated
    scalar average over positive balances, customers above it with NO
    recent orders (LEFT ANTI join against orders since 1999 — this
    generator gives every customer SOME order, so the spec's "no
    orders ever" is re-expressed as the spec's own "dormant for N
    years" intent), grouped by country code. The above-average
    predicate is exact integer arithmetic (``cents * n > sum_cents``
    — the q_subq_scalar discipline: no engine AVG, no decimal
    division), so the hash matches without rounding. The 1-row
    aggregate broadcasts; the anti-join's build side is just the
    pre-filtered recent o_custkey set."""
    code = (F.col("c_nationkey") % 10).alias("cntrycode")
    cents = (dec("c_acctbal") * 100).cast("bigint")
    c = load_table(spark, sf_dir, "customer").filter(
        (F.col("c_nationkey") % 10).isin(1, 3, 5, 7, 9)
    )
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(cents).alias("sum_cents"), F.count(F.lit(1)).alias("n")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    rich = (
        c.crossJoin(F.broadcast(pos))
        .filter(cents * F.col("n") > F.col("sum_cents"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return rich.groupBy(code).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
    )


@query(
    "q_tpch_q2",
    oracle="""
    WITH offers AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ), best AS (
        SELECT l_partkey AS bp, MIN(cost) AS mincost FROM offers GROUP BY l_partkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
           CAST(o.cost AS DOUBLE) AS cost
    FROM offers o
    JOIN best ON o.l_partkey = best.bp AND o.cost = best.mincost
    JOIN part p ON p.p_partkey = o.l_partkey
    JOIN supplier s ON s.s_suppkey = o.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD'
      AND r.r_name = 'EUROPE'
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 20
    """,
    tags=("join", "subquery", "benchmark"),
)
def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 (minimum cost supplier), adapted: with no partsupp
    table, the part-supplier offer relation is derived from lineitem —
    ``cost(part, supp) = MIN(l_extendedprice)`` over observed lines —
    and the spec's correlated MIN subquery is expressed directly in its
    de-correlated form (per-part min aggregate joined back on equality),
    which is exactly the plan Catalyst rewrites the correlated form
    into. Size/type filters replace the spec's size/``%BRASS`` pair.
    Scale shape: the only wide shuffles are the two lineitem groupBys
    (offers, then per-part min); part/supplier/nation/region are all
    dimension-sized and broadcast; the final top-20 is TakeOrdered with
    a full tie-break (acctbal DESC, nation, supplier, part)."""
    li = load_table(spark, sf_dir, "lineitem")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(dec("l_extendedprice")).alias("cost")
    )
    best = offers.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.min("cost").alias("mincost")
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        offers.join(
            best,
            (F.col("l_partkey") == F.col("bp")) & (F.col("cost") == F.col("mincost")),
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.col("cost").cast("double").alias("cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@query(
    "q_tpch_q9",
    oracle="""
    SELECT n.n_name AS nation, EXTRACT(year FROM o.o_orderdate) AS o_year,
           CAST(SUM(
               CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 * (100 - CAST(CAST(l.l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
               - CAST(CAST(p.p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 * CAST(l.l_quantity AS BIGINT) * 60
           ) AS DOUBLE) / 10000 AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    """,
    tags=("join", "agg", "benchmark"),
)
def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 (product type profit), adapted: supply cost ←
    ``0.6 × p_retailprice`` (no ps_supplycost), part filter ←
    ``%widget%`` (no ``%green%`` names). Profit is computed entirely in
    exact integer 10^-4-dollar units — revenue as cents × (100 −
    discount-cents), cost as retail-cents × qty × 60 — summed as BIGINT
    and surfaced through ONE double division, so the hash is
    associativity-proof without rounding. Scale shape: the spec's
    classic 5-way star — part filter pushed into the broadcast side and
    pruning lineitem via the join, supplier/nation broadcast, the
    orders join the only fact-fact exchange; group-by (nation, year) is
    low-cardinality so partial aggregation collapses it map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation")
    ext_c = (dec("l_extendedprice") * 100).cast("bigint")
    disc_c = (dec("l_discount") * 100).cast("bigint")
    retail_c = (dec("p_retailprice") * 100).cast("bigint")
    qty = F.col("l_quantity").cast("bigint")
    profit_u = ext_c * (F.lit(100) - disc_c) - retail_c * qty * 60
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg((F.sum(profit_u).cast("double") / 10000).alias("sum_profit"))
    )


@query(
    "q_tpch_q11",
    oracle="""
    WITH val AS (
        SELECT l.l_partkey,
               CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_3', 'NATION_8', 'NATION_15')
        GROUP BY l.l_partkey
    ), tot AS (
        SELECT CAST(SUM(cents) AS BIGINT) AS tc FROM val
    )
    SELECT val.l_partkey AS p_partkey, CAST(val.cents AS DOUBLE) / 100 AS value
    FROM val, tot
    WHERE val.cents * 1000 > tot.tc
    """,
    tags=("agg", "subquery", "benchmark"),
)
def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 (important stock identification), adapted: stock value
    ← shipped line value (SUM l_extendedprice) per part for suppliers
    in a 3-nation set (no partsupp/availqty), HAVING value > 0.1% of
    the total — the spec's group-agg with an uncorrelated scalar
    subquery in HAVING. Both the per-part and grand totals are exact
    BIGINT cents and the threshold test is integer cross-multiplication
    (``cents × 1000 > total``), so no FP compare sits on a knife edge.
    Scale shape: supplier/nation broadcast into the lineitem scan, ONE
    wide groupBy on partkey; the grand total is a 1-row aggregate
    broadcast back (Spark: crossJoin(broadcast)); value surfaces as
    cents/100 in ONE double division."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8", "NATION_15")
    )
    cents = (dec("l_extendedprice") * 100).cast("bigint")
    val = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("cents"))
    )
    tot = val.agg(F.sum("cents").alias("tc"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("cents") * 1000 > F.col("tc"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("cents").cast("double") / 100).alias("value"),
        )
    )


@query(
    "q_tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 5 = 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("join", "agg", "subquery", "benchmark"),
)
def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 (parts/supplier relationship), adapted: the
    part-supplier relation ← DISTINCT (l_partkey, l_suppkey) from
    lineitem; the spec's complaint-supplier NOT IN exclusion ←
    ``s_suppkey % 5 = 0`` (no s_comment column). Shape is the spec's:
    brand/type/size filters, a NOT IN anti-join against a tiny
    subquery, COUNT DISTINCT suppliers per (brand, type, size) — all
    exact integers. Scale shape: the DISTINCT pair projection is the
    one wide shuffle (and is the natural pre-aggregation — it carries
    two BIGINTs, not the fact row); part is broadcast; the exclusion
    list is dimension-sized and anti-joined broadcast (safe for NOT IN
    here: s_suppkey is non-null by construction)."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 5 == 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q19",
    oracle=f"""
    SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "agg", "benchmark"),
)
def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 (discounted revenue), adapted: the spec's three
    conjunctive clauses keep brand + quantity ranges; the container
    IN-lists become size bands (no p_container column). The point of
    Q19 is the disjunctive join predicate — an OR of per-clause
    conjunctions mixing build-side (part) and probe-side (lineitem)
    columns. Scale shape: part is broadcast, so the OR evaluates inside
    the probe without a shuffle; Catalyst additionally pushes the
    derived per-side disjunctions (brand IN (...) to the part scan,
    quantity BETWEEN 1 AND 30 to the lineitem scan) so both scans
    prune before the join. Revenue is exact decimal summed, surfaced
    as double."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
    clause = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(clause)
        .agg(rev.cast("double").alias("revenue"))
    )


@query(
    "q_tpch_q20",
    oracle="""
    WITH pairs AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_partkey, l_suppkey
    ), tot AS (
        SELECT l_partkey AS tp, CAST(SUM(sq) AS BIGINT) AS tq
        FROM pairs GROUP BY l_partkey
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_3', 'NATION_8', 'NATION_15')
      AND s.s_suppkey IN (
          SELECT p2.l_suppkey
          FROM pairs p2
          JOIN tot ON p2.l_partkey = tot.tp
          WHERE 2 * p2.sq > tot.tq
            AND p2.l_partkey IN
                (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
      )
    """,
    tags=("join", "subquery", "benchmark"),
)
def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 (potential part promotion), adapted: the spec's
    "availqty > half a year's shipments" becomes "supplier shipped MORE
    than half of the part's 1997 volume" (dominant supplier) — same
    doubly-nested semi-join shape: suppliers IN (pairs over parts IN
    (name-filtered part set) with a correlated quantity threshold),
    then a nation filter. Quantities are integral doubles summed as
    exact BIGINT; the threshold is integer cross-multiplication.
    Scale shape: one year of lineitem pre-aggregated to (part, supp)
    pairs — the only wide shuffle; the per-part total reuses that
    pair agg (not a second fact scan); the part name filter broadcasts
    into a semi-join; the final supplier probe is dimension-sized."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pairs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sq")
    )
    tot = pairs.groupBy(F.col("l_partkey").alias("tp")).agg(F.sum("sq").alias("tq"))
    wanted = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("large%"))
        .select("p_partkey")
    )
    dom = (
        pairs.join(F.broadcast(wanted), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(tot, F.col("l_partkey") == F.col("tp"))
        .filter(2 * F.col("sq") > F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8", "NATION_15")
    )
    return (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(dom), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@query(
    "q_tpch_q21",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM orders o
    JOIN lineitem l1 ON l1.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND n.n_name IN ('NATION_3', 'NATION_8', 'NATION_15')
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = o.o_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = o.o_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    tags=("join", "agg", "subquery", "benchmark"),
)
def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: "late" ←
    shipping >60 days after the order date (no commit/receipt dates,
    same substitution as Q4). The spec shape is the double-correlated
    EXISTS (another supplier contributed) / NOT EXISTS (no OTHER
    supplier was late) over finished orders. The Spark plan uses the
    standard aggregation rewrite: ONE per-order pass computes
    ``n_supp = COUNT(DISTINCT suppkey)`` and ``n_late_supp =
    COUNT(DISTINCT late suppkey)``; a late line then waits alone iff
    ``n_supp > 1 AND n_late_supp = 1`` — bit-identical to the
    EXISTS/NOT-EXISTS pair (the oracle keeps the spec's correlated
    form) because l1's own supplier is always in the late set.
    Scale shape: this replaces TWO correlated probes of the fact table
    with one reusable per-order aggregate joined back on orderkey —
    the orders join and that aggregate are the only exchanges;
    supplier/nation broadcast; top-20 is TakeOrdered (s_name unique)."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    stats = lines.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8", "NATION_15")
    )
    return (
        lines.filter(F.col("late"))
        .join(stats, F.col("l_orderkey") == F.col("k"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
