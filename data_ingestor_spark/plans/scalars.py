"""Scalar function surface: string / date / math / conditional / JSON /
array expressions (SURVEY.md §2.2). All built-in ``pyspark.sql.functions``
— JVM-side, inside whole-stage codegen; zero Python in the row path.

Oracle discipline: expressions restricted to constructs with identical
semantics in Spark SQL and DuckDB (1-based SUBSTRING, SQL LIKE, IEEE
double arithmetic); anything engine-divergent (round-on-double ties,
libm transcendentals) is either avoided or tolerance-rounded.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_spark.plans.registry import load_table, query


@query(
    "q_scalar_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name)                          AS name_upper,
           LOWER(c_mktsegment)                    AS seg_lower,
           SUBSTRING(c_name, 1, 8)                AS name_prefix,
           LENGTH(c_name)                         AS name_len,
           CONCAT_WS('-', c_mktsegment, c_name)   AS seg_name,
           REPLACE(c_name, 'Customer#', 'C')      AS name_short,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1)  AS name_digits,
           c_name LIKE 'Customer#00000000_'       AS is_low_key
    FROM customer
    """,
    tags=("scalar",),
)
def q_scalar_string(spark, sf_dir):
    """String functions: upper/lower/substring/length/concat_ws/replace/
    regexp_extract/LIKE."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C")).alias("name_short"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.col("c_name").like("Customer#00000000_").alias("is_low_key"),
    )


@query(
    "q_scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT)   AS order_year,
           CAST(MONTH(o_orderdate) AS INT)  AS order_month,
           CAST(DAY(o_orderdate) AS INT)    AS order_day,
           DATE_TRUNC('month', o_orderdate) AS order_month_start,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_95
    FROM orders
    """,
    tags=("scalar",),
)
def q_scalar_date(spark, sf_dir):
    """Date/time functions: year/month/day, date_trunc, cast-to-date,
    day difference from an epoch date."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
    )


@query(
    "q_scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05)                     AS disc_dev,
           CAST(FLOOR(l_extendedprice) AS BIGINT)     AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT)      AS price_ceil,
           CAST(l_quantity AS BIGINT) % 7             AS qty_mod7,
           SQRT(l_quantity)                           AS qty_sqrt,
           l_extendedprice * l_tax                    AS tax_amount,
           CAST(SIGN(l_discount - 0.05) AS INT)       AS disc_sign
    FROM lineitem WHERE l_orderkey < 1000
    """,
    tags=("scalar",),
)
def q_scalar_math(spark, sf_dir):
    """Math functions: abs/floor/ceil/mod/sqrt/sign + IEEE multiply.
    sqrt is IEEE-correctly-rounded (identical in both engines); libm
    transcendentals (log/exp/pow) are NOT and are excluded from the
    hash-checked set."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_extendedprice") * F.col("l_tax")).alias("tax_amount"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


@query(
    "q_scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END                             AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status_or_default,
           CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
                THEN TRUE ELSE FALSE END                   AS is_urgent
    FROM orders
    """,
    tags=("scalar",),
)
def q_scalar_conditional(spark, sf_dir):
    """Conditional/null functions: CASE WHEN, COALESCE, NULLIF."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending")).alias(
            "status_or_default"
        ),
        (F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%")).alias(
            "is_urgent"
        ),
    )


@query(
    "q_scalar_json",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    """,
    tags=("scalar", "json"),
)
def q_scalar_json(spark, sf_dir):
    """JSON extraction from a string column (events.props) — the engine's
    semi-structured path. get_json_object is evaluated JVM-side per row
    without a full parse tree materialization."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
    )


@query(
    "q_scalar_array",
    oracle="""
    SELECT vec_id,
           len(embedding)                     AS dim,
           embedding[1]                       AS first_val,
           embedding[64]                      AS last_val,
           CAST(label IN (0, 1, 2) AS BOOLEAN) AS label_small
    FROM embeddings
    """,
    tags=("scalar", "array"),
)
def q_scalar_array(spark, sf_dir):
    """Array functions: size, element_at (1-based in both engines), IN.

    ``try_element_at``, not ``element_at``: under ANSI mode an
    out-of-bounds index is a JOB failure, while DuckDB's list index
    (and this query's intent) is NULL-on-missing — on an empty or
    short array the row must survive with NULL, not kill the scan
    (registry totality gate, ``tests/test_totality.py``)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.try_element_at("embedding", F.lit(1)).alias("first_val"),
        F.try_element_at("embedding", F.lit(64)).alias("last_val"),
        F.col("label").isin(0, 1, 2).alias("label_small"),
    )


@query(
    "q_sql_entry",
    oracle="""
    SELECT n_name, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 0
    GROUP BY n_name
    HAVING COUNT(*) > 10
    """,
    tags=("sql",),
)
def q_sql_entry(spark, sf_dir):
    """The SQL string entry point: identical text runs through
    spark.sql() over registered temp views — proving the engine's
    full SQL surface, not just the DataFrame DSL."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_cust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > 0
        GROUP BY n_name
        HAVING COUNT(*) > 10
        """
    )


@query(
    "q_scalar_map",
    oracle="""
    SELECT n_nationkey,
           'name|region' AS keys_sorted,
           n_name AS name_val,
           2 AS n_entries
    FROM nation
    """,
    tags=("scalar", "map"),
)
def q_scalar_map(spark, sf_dir):
    """Map-type functions: build a map from columns, read keys/values
    back sorted (map iteration order is engine-dependent; sorting makes
    it checkable).  Keys surface as a '|'-joined string because the
    oracle harness cannot hash array-typed cells."""
    n = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"), F.col("n_name"), F.lit("region"), F.col("n_regionkey").cast("string")
    )
    return n.select(
        "n_nationkey",
        F.array_join(F.array_sort(F.map_keys(m)), "|").alias("keys_sorted"),
        F.element_at(m, "name").alias("name_val"),
        F.size(m).alias("n_entries"),
    )


@query(
    "q_scalar_null",
    oracle="""
    SELECT n_nationkey,
           COALESCE(NULLIF(n_name, 'NATION_3'), 'masked') AS masked_name,
           n_regionkey IS DISTINCT FROM n_nationkey AS distinct_keys,
           CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey END AS maybe_key,
           COALESCE(CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey END, -1)
               AS filled_key,
           ifnull(NULLIF(n_regionkey, 0), -1) AS region_or_default
    FROM nation
    """,
    tags=("scalar", "null"),
)
def q_scalar_null(spark, sf_dir):
    """Null-semantics scalar functions: COALESCE / NULLIF / IFNULL /
    IS DISTINCT FROM and null-producing CASE — the three-valued-logic
    corners every engine must agree on (NULL-safe comparison is the one
    place `=` and `IS DISTINCT FROM` diverge)."""
    n = load_table(spark, sf_dir, "nation")
    maybe = F.when(F.col("n_nationkey") % 5 == 0, F.lit(None)).otherwise(F.col("n_nationkey"))
    return n.select(
        "n_nationkey",
        F.coalesce(F.nullif(F.col("n_name"), F.lit("NATION_3")), F.lit("masked")).alias(
            "masked_name"
        ),
        F.expr("n_regionkey IS DISTINCT FROM n_nationkey").alias("distinct_keys"),
        maybe.alias("maybe_key"),
        F.coalesce(maybe, F.lit(-1)).alias("filled_key"),
        F.ifnull(F.nullif(F.col("n_regionkey"), F.lit(0)), F.lit(-1)).alias("region_or_default"),
    )


@query(
    "q_scalar_variant",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "json", "variant"),
)
def q_scalar_variant(spark, sf_dir):
    """Semi-structured aggregation through Spark 4's VARIANT type:
    ``parse_json`` shreds the props string into the binary variant
    encoding once, then ``variant_get`` does typed path extraction —
    the scale path for JSON-heavy events (parse once, extract many,
    no per-access string re-parse, Tungsten-friendly binary layout).
    The oracle reads the same numbers with DuckDB's JSON extraction;
    all outputs are exact integers so the hash needs no FP defense."""
    e = load_table(spark, sf_dir, "events")
    return (
        # try_parse_json: a malformed/empty payload row must shred to
        # NULL (typed extraction then yields NULL, aggregates skip it) —
        # plain parse_json is a job failure on the first bad record
        e.select("event_type", F.try_parse_json("props").alias("v"))
        .select(
            "event_type",
            F.expr("CAST(variant_get(v, '$.k') AS BIGINT)").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "q_scalar_url",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
                   || '?lang=' || lang || '&v=2' AS url
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, 'lang=([^&#]*)', 1) AS lang_param
    FROM u
    """,
    tags=("scalar", "url", "string"),
)
def q_scalar_url(spark, sf_dir):
    """URL parsing — the curation primitive behind domain blocklists and
    source attribution in a web-scale corpus (URLs synthesized from the
    table since the corpus carries none). Spark side uses the NATIVE
    parse_url expression (JVM, codegen) for protocol/host/path/query
    plus the keyed QUERY extraction; the oracle derives the identical
    parts with anchored regexes — a PASS pins Spark's parse_url
    semantics against the RFC-shaped expectations the regexes encode."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"), F.lit("&v=2"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.expr("parse_url(url, 'PROTOCOL')").alias("proto"),
        F.expr("parse_url(url, 'HOST')").alias("host"),
        F.expr("parse_url(url, 'PATH')").alias("path"),
        F.expr("parse_url(url, 'QUERY')").alias("query"),
        F.expr("parse_url(url, 'QUERY', 'lang')").alias("lang_param"),
    )


@query(
    "q_scalar_try",
    oracle="""
    SELECT event_id,
           CAST(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) % 7 = 0 THEN NULL
                ELSE ROUND(CAST(value AS DECIMAL(18,2))
                           / (CAST(json_extract(props, '$.k') AS BIGINT) % 7), 4)
           END AS DOUBLE) AS safe_ratio,
           TRY_CAST(CASE WHEN event_id % 3 = 0 THEN 'not-a-number'
                         ELSE CAST(event_id AS VARCHAR) END AS BIGINT) AS safe_cast,
           CASE WHEN event_id > 0 THEN NULL
                ELSE 9223372036854775807 END AS safe_sum
    FROM events
    """,
    tags=("scalar", "try", "null-safety"),
)
def q_scalar_try(spark, sf_dir):
    """Error-safe scalar surface (``try_divide`` / ``try_cast`` /
    ``try_add``): a malformed cell, a zero denominator, or an int64
    overflow yields NULL instead of failing the 100 TB job at task
    30000 of 30001 — the ANSI-mode answer to the dirty-data reality
    every landing zone has. The oracle spells out identical semantics
    with explicit CASE guards (which also keep DuckDB from evaluating
    the overflowing branch), so a PASS pins Spark's try_* null-on-error
    behavior cell-for-cell."""
    e = load_table(spark, sf_dir, "events")
    bad = F.when(F.col("event_id") % 3 == 0, F.lit("not-a-number")).otherwise(
        F.col("event_id").cast("string")
    )
    return e.select(
        "event_id",
        F.round(
            F.expr(
                "try_divide(cast(value as decimal(18,2)), "
                "cast(get_json_object(props, '$.k') as bigint) % 7)"
            ),
            4,
        )
        .cast("double")
        .alias("safe_ratio"),
        bad.try_cast("bigint").alias("safe_cast"),
        F.expr("try_add(9223372036854775807L, event_id)").alias("safe_sum"),
    )
