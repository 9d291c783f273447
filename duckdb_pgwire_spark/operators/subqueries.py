"""Subquery surface: scalar + EXISTS/IN, correlated and not.

The reference delegates all subquery forms to DuckDB's binder
(src/duckdb_pgwire_extension.cpp:52). On our side these run through
``spark.sql`` so Catalyst's decorrelation machinery
(RewriteCorrelatedScalarSubquery, null-aware anti join — SURVEY.md §4.2)
actually executes: a correlated scalar subquery decorrelates into an
aggregate + join, EXISTS into a semi join. The plan-level guarantee is
asserted in tests/test_plans.py; these entries check the values.

Both engines get the SAME SQL text (ANSI subset) — the Spark side is
deliberately SQL-first here because the surface under test IS the SQL
planner's subquery handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..session import register_views

_Q17_SQL = """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size = 1
      AND l.l_quantity < (
          SELECT 0.5 * AVG(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
"""


@query("subq_correlated_scalar", oracle=_Q17_SQL, tags=("subquery", "flagship"))
def subq_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average).

    Catalyst decorrelates to: aggregate lineitem by partkey (one
    map-side-combined shuffle of O(parts) rows) → join back — never the
    naive per-row re-scan, which would be O(rows × parts) at 100 TB.
    """
    register_views(spark, sf_dir)
    return spark.sql(_Q17_SQL)


_Q4_SQL = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("subq_correlated_exists", oracle=_Q4_SQL, tags=("subquery", "flagship"))
def subq_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS (orders with a line shipped
    >60 days after ordering; the fixture has no commit/receipt dates) →
    left-semi join after decorrelation, with the correlated comparison
    as the join condition."""
    register_views(spark, sf_dir)
    return spark.sql(_Q4_SQL)


_IN_SQL = """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    )
    AND o_totalprice > 400000
    ORDER BY o_totalprice DESC, o_orderkey
"""


@query("subq_in_list", oracle=_IN_SQL, tags=("subquery",))
def subq_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN (SELECT ...) → semi join against the subquery."""
    register_views(spark, sf_dir)
    return spark.sql(_IN_SQL)


_NOT_IN_SQL = """
    SELECT c_custkey
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
      AND c_custkey <= 200
    ORDER BY c_custkey
"""


@query("subq_not_in_null_aware", oracle=_NOT_IN_SQL, tags=("subquery",))
def subq_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a subquery — the null-aware anti join case (one NULL
    in the subquery output empties the result under SQL three-valued
    logic; Catalyst plans NAAJ to honor that without a cross join)."""
    register_views(spark, sf_dir)
    return spark.sql(_NOT_IN_SQL)


_SCALAR_GLOBAL_SQL = """
    SELECT l_orderkey, ROUND(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_extendedprice > (SELECT 19.5 * AVG(l_extendedprice) FROM lineitem)
    ORDER BY price DESC, l_orderkey
"""


@query("subq_scalar_global", oracle=_SCALAR_GLOBAL_SQL, tags=("subquery",))
def subq_scalar_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: computed once, broadcast as a
    literal into the main scan's filter."""
    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_GLOBAL_SQL)
