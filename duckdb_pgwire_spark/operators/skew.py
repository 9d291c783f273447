"""Skew mitigation: salted join.

AQE's skew-join splitting (enabled in session.py) handles moderate skew
at runtime by splitting oversized sort-merge partitions. Salting is the
manual escape hatch for the cases AQE can't fix — a single hot key whose
rows exceed one task's memory, or a shuffled-hash join where AQE skew
splitting doesn't apply. Mechanism: the skewed (fact) side spreads each
key over N sub-partitions via a salt column derived from its own rows;
the other side is replicated N× with every salt value, so (key, salt)
equi-join ≡ the plain key join, but the hot key's work fans out over N
reducers instead of one.

Cost model: replicates the build side N× through the shuffle — use only
when the skew stall costs more than (N-1)× extra build-side volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import load_table

N_SALTS = 8


def salted_join(
    fact: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = N_SALTS,
    salt_src: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `fact` (skewed side) with `other` on column `on`,
    spreading each fact key over `n_salts` reducers.

    `salt_src` seeds the fact-side salt (defaults to a hash of the whole
    row via all columns — any value works, results are salt-invariant;
    pass a cheap column for speed)."""
    if salt_src is None:
        salt_src = F.hash(*[F.col(c) for c in fact.columns])
    f = fact.withColumn("__salt", F.pmod(F.hash(salt_src), F.lit(n_salts)))
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(o, [on, "__salt"], how).drop("__salt")


@query(
    "join_salted_skew",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("join", "skew"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⨝dim join — result must be IDENTICAL to the plain
    join (the oracle runs the unsalted SQL), only the shuffle layout
    differs: lineitem spreads each orderkey over 8 salt buckets, orders
    is replicated 8×. tests/test_ext.py asserts salt-invariance against
    the DataFrame-level plain join too."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, "l_orderkey", salt_src=F.col("l_linenumber"))
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )
