"""Declarative query/operator registry.

Every capability from SURVEY.md §2 is declared exactly once, as a
``@query(name, oracle=...)``-decorated callable ``(spark, sf_dir) ->
DataFrame`` paired with the equivalent ANSI SQL that DuckDB (the oracle
engine, standing in for the reference's delegated DuckDB v1.1.1 —
``src/duckdb_pgwire_extension.cpp:52,97``) runs over the same parquet
tables. The driver compares row-count + schema + order-insensitive value
hash; columns are therefore aliased identically on both sides, and
floating-point aggregates are rounded on both sides so summation-order
differences between engines cannot flip the hash.

Queries with no SQL-expressible oracle (streaming state, approximate
sketches with engine-specific estimates) register with ``oracle=None``
→ the driver records a weaker rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default=())
    doc: str = ""


_REGISTRY: dict[str, QueryDef] = {}

# Modules that populate the registry on import.
_QUERY_MODULES = (
    "duckdb_pgwire_spark.operators.tpch",
    "duckdb_pgwire_spark.operators.sources",
    "duckdb_pgwire_spark.operators.dml",
    "duckdb_pgwire_spark.operators.filters",
    "duckdb_pgwire_spark.operators.joins",
    "duckdb_pgwire_spark.operators.subqueries",
    "duckdb_pgwire_spark.operators.skew",
    "duckdb_pgwire_spark.operators.pivot_cte",
    "duckdb_pgwire_spark.operators.aggregates",
    "duckdb_pgwire_spark.operators.windows",
    "duckdb_pgwire_spark.operators.sort_setops",
    "duckdb_pgwire_spark.functions.strings",
    "duckdb_pgwire_spark.functions.datetime_fns",
    "duckdb_pgwire_spark.functions.math_fns",
    "duckdb_pgwire_spark.functions.arrays",
    "duckdb_pgwire_spark.functions.json_fns",
    "duckdb_pgwire_spark.functions.udfs",
    "duckdb_pgwire_spark.ext.dedup",
    "duckdb_pgwire_spark.ext.similarity",
    "duckdb_pgwire_spark.ext.text",
    "duckdb_pgwire_spark.ext.multimodal",
    "duckdb_pgwire_spark.streaming.windows",
    "duckdb_pgwire_spark.streaming.stateful",
    "duckdb_pgwire_spark.streaming.joins",
)


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a query implementation with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=(fn.__doc__ or "")
        )
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)


def spark_queries() -> dict[str, QueryFn]:
    return {name: qd.fn for name, qd in load_all().items()}


def oracle_queries() -> dict[str, str]:
    return {name: qd.oracle for name, qd in load_all().items() if qd.oracle is not None}
