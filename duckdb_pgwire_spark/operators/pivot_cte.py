"""PIVOT / UNPIVOT / recursive CTE — DuckDB-dialect surfaces the
reference delegates (src/duckdb_pgwire_extension.cpp:52) that Spark 4
also provides natively.

Oracles use the ANSI-portable formulations (CASE aggregation for PIVOT,
UNION ALL for UNPIVOT, identical WITH RECURSIVE for the CTE) so DuckDB
runs them verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import load_table, register_views

SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@query(
    "pivot_segment_by_nation",
    oracle=f"""
    SELECT c_nationkey,
           {", ".join(
               f"COUNT(CASE WHEN c_mktsegment = '{s}' THEN 1 END) AS {s}"
               for s in SEGMENTS
           )}
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("pivot",),
)
def pivot_segment_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: customer counts, market segments as columns.

    DataFrame pivot with EXPLICIT values: passing the value list avoids
    the extra distinct-collect job Spark otherwise runs to discover
    them — at 100 TB that discovery pass is a full extra scan."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .pivot("c_mktsegment", list(SEGMENTS))
        .count()
        .na.fill(0)  # CASE-count yields 0, pivot yields null — align
    )


@query(
    "unpivot_pricing_metrics",
    oracle="""
    WITH m AS (
        SELECT ROUND(SUM(l_quantity), 2)      AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               ROUND(SUM(l_discount), 2)      AS sum_disc
        FROM lineitem
    )
    SELECT 'sum_qty' AS metric, sum_qty AS value FROM m
    UNION ALL SELECT 'sum_price', sum_price FROM m
    UNION ALL SELECT 'sum_disc', sum_disc FROM m
    """,
    tags=("pivot", "unpivot"),
)
def unpivot_pricing_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long): one aggregate row melted to (metric,
    value) rows via Spark SQL UNPIVOT; oracle is the UNION ALL form."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT metric, value FROM (
            SELECT ROUND(SUM(l_quantity), 2)      AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_price,
                   ROUND(SUM(l_discount), 2)      AS sum_disc
            FROM lineitem
        ) UNPIVOT (value FOR metric IN (sum_qty, sum_price, sum_disc))
        """
    )


_RECURSIVE_SQL = """
    WITH RECURSIVE fib(n, a, b) AS (
        SELECT 1, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
        UNION ALL
        SELECT n + 1, b, a + b FROM fib WHERE n < 40
    )
    SELECT n, a AS fib_n FROM fib ORDER BY n
"""


@query("cte_recursive_fibonacci", oracle=_RECURSIVE_SQL, tags=("cte", "recursive"))
def cte_recursive_fibonacci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (iterative fixpoint) — same SQL text runs on both
    engines. Spark executes each recursion step as a distributed batch;
    bounded here (40 steps), the shape that also powers transitive
    closure / BOM explosion on real graph data."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)
