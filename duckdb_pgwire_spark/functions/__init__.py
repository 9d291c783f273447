"""Scalar function library + UDF surface (SURVEY.md §2.10, §2.12).

The reference delegates its entire scalar library to DuckDB v1.1.1
(``src/duckdb_pgwire_extension.cpp:52``) and registers two C++ UDFs of
its own (``cpp:190-212``). Here every group maps to built-in
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen'd); the UDF
module mirrors the reference's own registrations as Arrow-vectorized
pandas UDFs.
"""
