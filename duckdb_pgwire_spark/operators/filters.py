"""Projection, filter and predicate surface (SURVEY.md §2.4).

All delegated capabilities in the reference (any WHERE/SELECT expression
reachable through ``conn.Prepare``, ``src/duckdb_pgwire_extension.cpp:52``).
Every predicate here stays inside whole-stage codegen and — where it
touches a base column — reaches the parquet scan as a pushed filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..session import load_table


@query(
    "proj_expressions",
    oracle="""
    SELECT
        p_partkey,
        upper(p_brand)                              AS brand_u,
        p_size + 100                                AS size_plus,
        ROUND(p_retailprice * 1.1, 2)               AS inflated,
        p_brand || '/' || p_type                    AS brand_type
    FROM part
    """,
    tags=("projection",),
)
def proj_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression projection with aliases (``select 'euiko' from …`` shape,
    main.go:27). Column-pruned scan: only 5 of 6 part columns are read."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        (F.col("p_size") + 100).alias("size_plus"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("inflated"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
    )


@query(
    "filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE (l_quantity >= 30 AND l_discount < 0.03)
       OR (NOT l_returnflag = 'N' AND l_tax <> 0.0 AND l_quantity <= 2)
    """,
    tags=("filter",),
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound boolean predicates: AND/OR/NOT, =, <>, <=, >=, < over the
    fact table — pushed into the parquet scan by Catalyst."""
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (F.col("l_quantity") >= 30) & (F.col("l_discount") < 0.03)
    ) | (
        (~(F.col("l_returnflag") == "N"))
        & (F.col("l_tax") != 0.0)
        & (F.col("l_quantity") <= 2)
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@query(
    "pred_between_in_like",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderstatus
    FROM orders
    WHERE o_totalprice BETWEEN 100000 AND 150000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderpriority LIKE '%-%'
      AND o_orderstatus ILIKE 'o'
    """,
    tags=("filter",),
)
def pred_between_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN / IN / LIKE / ILIKE predicate family."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(100000, 150000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderpriority").like("%-%")
        & F.col("o_orderstatus").ilike("o")
    ).select("o_orderkey", "o_orderpriority", "o_orderstatus")


@query(
    "pred_null_semantics",
    oracle="""
    SELECT
        s_suppkey,
        nullif(s_name, 'Supplier#000000003')                    AS maybe_name,
        nullif(s_name, 'Supplier#000000003') IS NULL            AS is_masked,
        nullif(s_name, 'Supplier#000000003') IS NOT NULL        AS not_masked,
        s_name IS NOT DISTINCT FROM nullif(s_name, 'Supplier#000000003') AS null_safe_eq
    FROM supplier
    """,
    tags=("filter",),
)
def pred_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL and IS [NOT] DISTINCT FROM (null-safe equality).

    The fixtures contain no NULLs, so NULLIF injects them; eqNullSafe is
    Spark's <=> operator.
    """
    s = load_table(spark, sf_dir, "supplier")
    masked = F.nullif(F.col("s_name"), F.lit("Supplier#000000003"))
    return s.select(
        "s_suppkey",
        masked.alias("maybe_name"),
        masked.isNull().alias("is_masked"),
        masked.isNotNull().alias("not_masked"),
        F.col("s_name").eqNullSafe(masked).alias("null_safe_eq"),
    )


@query(
    "case_coalesce_greatest",
    oracle="""
    SELECT
        c_custkey,
        CASE WHEN c_acctbal < 0 THEN 'overdrawn'
             WHEN c_acctbal < 1000 THEN 'low'
             ELSE 'high' END                              AS balance_band,
        ROUND(COALESCE(nullif(c_acctbal, 0.0), -1.0), 2)  AS bal_or_default,
        ROUND(GREATEST(c_acctbal, 0.0), 2)                AS floor0,
        ROUND(LEAST(c_acctbal, 5000.0), 2)                AS cap5k
    FROM customer
    """,
    tags=("filter",),
)
def case_coalesce_greatest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / COALESCE / NULLIF / GREATEST / LEAST."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 1000, "low")
        .otherwise("high")
        .alias("balance_band"),
        F.round(F.coalesce(F.nullif(F.col("c_acctbal"), F.lit(0.0)), F.lit(-1.0)), 2).alias(
            "bal_or_default"
        ),
        F.round(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 2).alias("floor0"),
        F.round(F.least(F.col("c_acctbal"), F.lit(5000.0)), 2).alias("cap5k"),
    )


@query(
    "cast_try_cast",
    oracle="""
    SELECT
        o_orderkey,
        -- Spark CAST(double AS BIGINT) truncates toward zero; DuckDB rounds
        -- to nearest → oracle floors explicitly (values are positive)
        CAST(FLOOR(o_totalprice) AS BIGINT)                 AS price_int,
        CAST(o_orderkey AS VARCHAR)                         AS key_str,
        TRY_CAST(o_orderstatus AS INTEGER)                  AS status_int,
        TRY_CAST('20' || o_orderstatus AS INTEGER)          AS still_null,
        CAST(o_orderdate AS DATE)                           AS odate
    FROM orders
    """,
    tags=("filter",),
)
def cast_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST and TRY_CAST (failure → NULL, not error) across type classes."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("bigint").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.expr("TRY_CAST(o_orderstatus AS INT)").alias("status_int"),
        F.expr("TRY_CAST(concat('20', o_orderstatus) AS INT)").alias("still_null"),
        F.col("o_orderdate").cast("date").alias("odate"),
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("filter",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT — hash-aggregate dedup; partial agg makes shuffle
    volume O(distinct values), not O(rows)."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "distinct_on",
    oracle="""
    SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey, ROUND(c_acctbal, 2) AS c_acctbal
    FROM customer
    ORDER BY c_nationkey, c_acctbal DESC, c_custkey
    """,
    tags=("filter",),
)
def distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB DISTINCT ON: first row per key under an explicit order.

    Spark has no DISTINCT ON → the idiomatic rewrite is row_number()
    over a window + filter rn=1 (SURVEY.md §2.4). One shuffle on the
    partition key; at scale this is the standard top-1-per-group plan.
    """
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal"))
    )


_COMPOSITE_ORD_SQL = """
    SELECT
        l_orderkey,
        l_linenumber,
        [l_linenumber % 3, CASE WHEN l_quantity > 25 THEN 1 END] < [1, 2]
            AS lt,
        [l_linenumber % 3, CASE WHEN l_quantity > 25 THEN 1 END] <= [1, 1]
            AS le,
        (l_linenumber % 3, CASE WHEN l_quantity > 25 THEN 1 END) >= (1, 1)
            AS ge,
        [l_linenumber % 3]
            BETWEEN [0] AND [1, CASE WHEN l_quantity > 25 THEN 1 END]
            AS btw,
        CASE WHEN [l_linenumber % 3, CASE WHEN l_quantity > 25 THEN 1 END]
                  > [1, 1] THEN 1 ELSE 0 END AS cond2vl
    FROM lineitem
    WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber
"""


@query(
    "pred_composite_ordering",
    oracle=_COMPOSITE_ORD_SQL,
    tags=("filter",),
)
def pred_composite_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite ORDERING comparisons (r12 closure): lexicographic 3VL
    in value positions (a NULL element pair decides NULL even before a
    length difference), the NULLs-GREATEST 2VL total order in CASE-WHEN
    cond slots, and BETWEEN desugaring to the same machinery. Runs the
    statement through the WIRE rewrite path — this dialect surface IS
    the product here (compat._rewrite_composite_ord/_between; probed
    DuckDB 1.x semantics, NOTES r12)."""
    from ..server.compat import rewrite
    from ..session import register_views

    register_views(spark, sf_dir)
    return spark.sql(rewrite(_COMPOSITE_ORD_SQL))


_QUANTIFIED_3VL_SQL = """
    SELECT
        c_custkey,
        c_acctbal > ALL(
            SELECT nullif(s_acctbal, min(ab.mn))
            FROM supplier, (SELECT min(s_acctbal) AS mn FROM supplier) ab
            WHERE s_suppkey <= 5 GROUP BY s_acctbal
        ) AS gt_all,
        c_acctbal < ANY(
            SELECT nullif(s_acctbal, min(ab.mn))
            FROM supplier, (SELECT min(s_acctbal) AS mn FROM supplier) ab
            WHERE s_suppkey <= 5 GROUP BY s_acctbal
        ) AS lt_any
    FROM customer
    WHERE c_custkey <= 300
    ORDER BY c_custkey
"""


@query(
    "pred_quantified_3vl",
    oracle=_QUANTIFIED_3VL_SQL,
    tags=("filter",),
)
def pred_quantified_3vl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified ANY/ALL subqueries in VALUE position carry the
    standard 3VL verdict (r12 sweep find: `x > ALL(sub)` with a NULL
    row is NULL unless a definite violation exists) — exercised
    through the wire rewrite path against a subquery with one injected
    NULL (the minimum supplier balance nullifies itself)."""
    from ..server.compat import rewrite
    from ..session import register_views

    register_views(spark, sf_dir)
    return spark.sql(rewrite(_QUANTIFIED_3VL_SQL))
