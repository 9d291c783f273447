"""UDF / UDAF / UDTF surface (SURVEY.md §2.2, §2.12).

The reference registers exactly two C++ scalar functions:

- ``duckdb_pgwire(name)`` → ``'DuckdbPgwire ' || name || ' 🐥'``,
  vectorized via ``UnaryExecutor::Execute``
  (``src/duckdb_pgwire_extension.cpp:195-202``, registered at 211-212).
  Its golden output is the repo's sqllogictest
  (``test/sql/duckdb_pgwire.test:16-18``).
- ``pg_is_in_recovery()`` → constant ``false``, a PG-compat shim clients
  call on connect (``cpp:190-193``, registered at 206-209).

The Spark analogue of ``UnaryExecutor`` (vectorized over a DataChunk) is
an Arrow-vectorized pandas UDF over record batches. Both are registered
in the session catalog so wire-protocol SQL can call them by name.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..session import load_table, register_views


@F.pandas_udf(T.StringType())
def duckdb_pgwire_udf(name: pd.Series) -> pd.Series:
    """Vectorized greeting — one Arrow batch in, one out (the moral
    equivalent of the reference's DataChunk-at-a-time UnaryExecutor,
    cpp:197-201)."""
    return "DuckdbPgwire " + name + " 🐥"


import weakref

# WeakSet, not id()-keyed set: a stopped+collected session's CPython
# address can be RECYCLED by a new session, which would silently skip
# registration and leave every compat UDF missing (r13 ADVICE). Weak
# membership dies with the session, so a recycled address cannot alias.
_REGISTERED_SESSIONS: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def register_udfs(spark: SparkSession) -> None:
    """Register the reference's function surface into the Spark catalog
    (the analogue of ExtensionUtil::RegisterFunction, cpp:206-212),
    plus the DuckDB scalar-parity UDF batch (compat_udfs). Memoized per
    session (second review r12: fuzz tests re-registering ~50 UDFs per
    hypothesis example paid thousands of redundant Py4J round trips)."""
    if spark in _REGISTERED_SESSIONS:
        return
    from .compat_udfs import register_compat_udfs

    spark.udf.register("duckdb_pgwire", duckdb_pgwire_udf)
    spark.udf.register("pg_is_in_recovery", lambda: False, T.BooleanType())
    register_compat_udfs(spark)
    _REGISTERED_SESSIONS.add(spark)


@query(
    "udf_duckdb_pgwire",
    oracle="""
    SELECT c_custkey, 'DuckdbPgwire ' || c_name || ' 🐥' AS greeting
    FROM customer WHERE c_custkey <= 500
    """,
    tags=("udf",),
)
def udf_duckdb_pgwire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's demo UDF applied through SQL-by-name (so the
    registration path is exercised, not just the Python callable)."""
    register_udfs(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT c_custkey, duckdb_pgwire(c_name) AS greeting "
        "FROM customer WHERE c_custkey <= 500"
    )


@query(
    "udf_pg_is_in_recovery",
    oracle="SELECT false AS pg_is_in_recovery",
    tags=("udf", "pg-compat"),
)
def udf_pg_is_in_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG-compat shim — always false (cpp:190-193)."""
    register_udfs(spark)
    return spark.sql("SELECT pg_is_in_recovery() AS pg_is_in_recovery")


@query(
    "udaf_grouped_pandas",
    oracle="""
    SELECT
        l_returnflag,
        ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udf", "udaf"),
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF surface: grouped-agg pandas UDF (Arrow batches per
    group) computing a weighted average, oracle-checked against plain SQL.

    Scale note: GROUPED_AGG ships each group's columns to Python — fine
    for bounded groups; for 100 TB hot paths prefer the pure-SQL
    sum(x*w)/sum(w) decomposition (which the oracle shows).
    """

    @F.pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 4).alias("wavg_price")
    )


@query(
    "udtf_split_words",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 5
    """,
    tags=("udf", "udtf"),
)
def udtf_split_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF surface: table-valued function emitting one row per word.

    Implemented as explode over an array-returning expression — the
    JVM-side UDTF form (Python UDTFs exist in Spark ≥3.5 but run
    row-at-a-time; explode stays in codegen).
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
