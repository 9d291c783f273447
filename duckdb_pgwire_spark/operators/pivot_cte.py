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


# ancestor edges over the supplier→nation→region forest (keys offset
# into disjoint ranges so one edge table holds both levels), plus a
# synthetic root above the regions — 3 recursion rounds to fixpoint
_CLOSURE_EDGES_SQL = """
    SELECT s_suppkey AS child, n_nationkey + 100000 AS parent
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    UNION ALL
    SELECT n_nationkey + 100000 AS child, n_regionkey + 200000 AS parent
    FROM nation
    UNION ALL
    SELECT r_regionkey + 200000 AS child, 900000 AS parent FROM region
"""

_CLOSURE_ORACLE = f"""
    WITH RECURSIVE e(child, parent) AS ({_CLOSURE_EDGES_SQL}),
    anc(node, anc) AS (
        SELECT child, parent FROM e
        UNION
        SELECT a.node, e.parent FROM anc a JOIN e ON a.anc = e.child
    )
    SELECT anc, count(*) AS descendants FROM anc
    GROUP BY anc ORDER BY anc
"""


@query("cte_recursive_closure", oracle=_CLOSURE_ORACLE, tags=("cte", "recursive"))
def cte_recursive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive ancestor closure — the DEDUPLICATING ``UNION``
    recursion (DuckDB's fixpoint form; Spark 4.1 only runs UNION ALL
    natively, and the pg-wire server evaluates this same shape
    semi-naively in ``_recursive_union_df``). DataFrame-side
    semi-naive loop: the frontier joins the broadcast edge table, new
    pairs dedup against everything seen, empty frontier stops — one
    distributed job per LEVEL of the hierarchy (3 here), never
    per-row. At 100 TB the edge table is the small dimension
    (broadcast); the accumulated closure only ever shuffles on its
    own keys."""
    register_views(spark, sf_dir)
    edges = spark.sql(_CLOSURE_EDGES_SQL).cache()
    acc = edges.select(
        F.col("child").alias("node"), F.col("parent").alias("anc")
    ).distinct().cache()
    frontier = acc
    for _ in range(100):
        fr, e = frontier.alias("fr"), edges.alias("e")
        new = (
            fr.join(F.broadcast(e), F.col("fr.anc") == F.col("e.child"))
            .select(
                F.col("fr.node").alias("node"),
                F.col("e.parent").alias("anc"),
            )
            .distinct()
            .subtract(acc)
            .cache()
        )
        if new.isEmpty():
            break
        acc = acc.union(new).cache()
        frontier = new
    else:
        raise RuntimeError("closure did not converge in 100 rounds")
    return (
        acc.groupBy("anc")
        .agg(F.count(F.lit(1)).alias("descendants"))
        .orderBy("anc")
    )
