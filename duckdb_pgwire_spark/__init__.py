"""duckdb_pgwire_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the reference ``euiko/duckdb-pgwire`` (a DuckDB extension exposing a
PostgreSQL wire-protocol server; see ``/root/reference/README.md:1-12``).

Architecture (Spark-first, not a port):

- :mod:`duckdb_pgwire_spark.session` — the long-running ``SparkSession``
  plays the role of the embedded DuckDB ``DatabaseInstance``.
- :mod:`duckdb_pgwire_spark.registry` — declarative catalog of every
  query/operator the engine supports, each paired with an ANSI-SQL oracle.
- :mod:`duckdb_pgwire_spark.operators` — relational operator surface
  (scans, filters, joins, aggregation, windows, sort, set ops).
- :mod:`duckdb_pgwire_spark.functions` — scalar function library +
  UDF surface (the reference registers C++ scalar UDFs,
  ``src/duckdb_pgwire_extension.cpp:206-212``).
- :mod:`duckdb_pgwire_spark.ext` — [EXT] LLM-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal columns).
- :mod:`duckdb_pgwire_spark.streaming` — Structured Streaming variants.
- :mod:`duckdb_pgwire_spark.server` — the PostgreSQL wire-protocol
  front-end (the reference's actual novelty,
  ``src/duckdb_pgwire_extension.cpp:40-188``).
- :mod:`duckdb_pgwire_spark.plans` — PG-dialect → Spark SQL compat
  rewrites (QUALIFY, DISTINCT ON, generate_series bounds).
"""

__version__ = "0.1.0"
