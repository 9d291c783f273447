"""Sort / limit / top-k and set operations (SURVEY.md §2.8–§2.9).

Sort-order itself is invisible to the driver's order-insensitive hash, so
every sort query here pairs ORDER BY with LIMIT/OFFSET — the returned SET
of rows then depends on correct ordering (incl. null placement), which is
what gets verified.

DuckDB default null ordering is NULLS LAST; Spark's is NULLS FIRST for
ASC — all generated plans emit explicit null ordering (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import load_table


@query(
    "sort_multi_key_nulls",
    oracle="""
    SELECT o_orderkey, o_orderstatus, masked_price
    FROM (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderstatus = 'P' THEN NULL
                    ELSE ROUND(o_totalprice, 2) END AS masked_price
        FROM orders
    )
    ORDER BY masked_price DESC NULLS LAST, o_orderkey ASC
    LIMIT 100
    """,
    tags=("sort",),
)
def sort_multi_key_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY with explicit DESC NULLS LAST + unique tiebreak;
    LIMIT makes ordering observable. Catalyst fuses to
    TakeOrderedAndProject — per-partition top-N + driver merge, never a
    global sort."""
    o = load_table(spark, sf_dir, "orders")
    masked = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(
        F.round(F.col("o_totalprice"), 2)
    )
    return (
        o.select("o_orderkey", "o_orderstatus", masked.alias("masked_price"))
        .orderBy(F.col("masked_price").desc_nulls_last(), F.col("o_orderkey").asc())
        .limit(100)
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders
    ORDER BY o_orderkey LIMIT 20 OFFSET 10
    """,
    tags=("sort",),
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT + OFFSET over a unique total order."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderpriority").orderBy("o_orderkey").offset(10).limit(20)


@query(
    "topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 25
    """,
    tags=("sort", "topk"),
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY + LIMIT → TakeOrderedAndProject (heap per
    partition, k rows to driver — O(k) memory regardless of table size)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(25)
    )


def _mktsegment_keys(spark: SparkSession, sf_dir: str, segment: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == segment)
        .select(F.col("c_nationkey").alias("k"))
    )


_SET_ORACLE = """
    SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    {op}
    SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY'
"""


@query("setop_union_all", oracle=_SET_ORACLE.format(op="UNION ALL"), tags=("setop",))
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (by position, bag semantics) — pure concatenation, no
    shuffle."""
    a = _mktsegment_keys(spark, sf_dir, "BUILDING")
    b = _mktsegment_keys(spark, sf_dir, "MACHINERY")
    return a.union(b)


@query("setop_union", oracle=_SET_ORACLE.format(op="UNION"), tags=("setop",))
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — concat + hash dedup."""
    a = _mktsegment_keys(spark, sf_dir, "BUILDING")
    b = _mktsegment_keys(spark, sf_dir, "MACHINERY")
    return a.union(b).distinct()


@query("setop_intersect", oracle=_SET_ORACLE.format(op="INTERSECT"), tags=("setop",))
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _mktsegment_keys(spark, sf_dir, "BUILDING")
    b = _mktsegment_keys(spark, sf_dir, "MACHINERY")
    return a.intersect(b)


@query(
    "setop_intersect_all", oracle=_SET_ORACLE.format(op="INTERSECT ALL"), tags=("setop",)
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection (min multiplicity per row)."""
    a = _mktsegment_keys(spark, sf_dir, "BUILDING")
    b = _mktsegment_keys(spark, sf_dir, "MACHINERY")
    return a.intersectAll(b)


@query("setop_except", oracle=_SET_ORACLE.format(op="EXCEPT"), tags=("setop",))
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _mktsegment_keys(spark, sf_dir, "BUILDING")
    b = _mktsegment_keys(spark, sf_dir, "MACHINERY")
    return a.subtract(b)


@query("setop_except_all", oracle=_SET_ORACLE.format(op="EXCEPT ALL"), tags=("setop",))
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference (multiplicity-aware)."""
    a = _mktsegment_keys(spark, sf_dir, "BUILDING")
    b = _mktsegment_keys(spark, sf_dir, "MACHINERY")
    return a.exceptAll(b)


@query(
    "setop_union_by_name",
    oracle="""
    SELECT r_regionkey AS key, r_name AS name FROM region
    UNION ALL BY NAME
    SELECT n_name AS name, n_nationkey AS key FROM nation
    """,
    tags=("setop",),
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB UNION BY NAME → Spark unionByName (column-name alignment)."""
    r = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("key"), F.col("r_name").alias("name")
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_name").alias("name"), F.col("n_nationkey").alias("key")
    )
    return r.unionByName(n)
