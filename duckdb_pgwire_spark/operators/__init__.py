"""Relational operator surface (SURVEY.md §2.3–§2.9).

The reference implements zero relational operators itself — all are
delegated to DuckDB through ``conn.Prepare(query)`` / ``p->Execute()``
(``src/duckdb_pgwire_extension.cpp:52,97``). Here each delegated
capability is re-expressed as a declarative Spark DataFrame/SQL plan so
Catalyst + Tungsten pick the physical strategy.
"""
