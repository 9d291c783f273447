"""Scans, sources and sinks (SURVEY.md §2.3).

Reference capabilities: catalog table scan + DDL/DML over the wire
(``client/go/cmd/simple/main.go:23-31``), ``generate_series`` row source
(``README.md:54``), and DuckDB's delegated parquet/CSV/JSON readers and
``COPY TO`` writers (via ``src/duckdb_pgwire_extension.cpp:52``).

Scale notes: every file source here is the Spark DataSource V2 path —
splittable, predicate/projection pushdown, partition pruning. The CSV and
JSON round-trips write with explicit schemas (inference is a full extra
pass at 100 TB).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import load_table


@query(
    "scan_table",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("scan",),
)
def scan_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain catalog table scan (``SELECT * FROM users`` shape, main.go:31)."""
    return load_table(spark, sf_dir, "nation")


@query(
    "scan_generate_series",
    oracle="""
    SELECT generate_series AS n FROM generate_series(0, 100)
    """,
    tags=("scan",),
)
def scan_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series generator (``generate_series(0, 100)``, README.md:54).

    DuckDB's generate_series is END-INCLUSIVE; Spark's range is exclusive,
    so the bound is +1 (SURVEY.md §2.3 gotcha).
    """
    return spark.range(0, 101).select(F.col("id").alias("n"))


@query(
    "scan_values",
    oracle="""
    SELECT * FROM (VALUES (1, 'one'), (2, 'two'), (3, NULL)) AS t(k, v)
    """,
    tags=("scan",),
)
def scan_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-memory literal rows (DuckDB ``VALUES`` list via cpp:52)."""
    return spark.sql("SELECT * FROM VALUES (1, 'one'), (2, 'two'), (3, CAST(NULL AS STRING)) AS t(k, v)")


@query(
    "ddl_users_roundtrip",
    oracle="SELECT 'euiko' AS name FROM generate_series(0, 10)",
    tags=("ddl",),
)
def ddl_users_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's own E2E: CREATE TABLE → INSERT…SELECT FROM
    generate_series → SELECT * (client/go/cmd/simple/main.go:23-31).

    Uses a real catalog table (parquet-backed) so INSERT INTO is the
    actual DML path, not a temp-view shortcut. 11 rows: generate_series
    is inclusive.
    """
    loc = tempfile.mkdtemp(prefix="users_tbl_")
    spark.sql("DROP TABLE IF EXISTS users")
    spark.sql(f"CREATE TABLE users(name STRING) USING parquet LOCATION '{loc}'")
    spark.sql("INSERT INTO users SELECT 'euiko' FROM range(0, 11)")
    return spark.table("users")


@query(
    "scan_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("scan", "sink"),
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + scan (DuckDB ``COPY TO (FORMAT csv)`` + ``read_csv``).

    Explicit schema on read — no inference pass (100 TB rule).
    """
    out = os.path.join(tempfile.mkdtemp(prefix="csv_rt_"), "nation")
    load_table(spark, sf_dir, "nation").write.mode("overwrite").option("header", True).csv(out)
    return spark.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT").option(
        "header", True
    ).csv(out)


@query(
    "scan_json_roundtrip",
    oracle="SELECT r_regionkey, r_name FROM region",
    tags=("scan", "sink"),
)
def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON lines sink + scan (DuckDB ``read_json``/``COPY TO json``)."""
    out = os.path.join(tempfile.mkdtemp(prefix="json_rt_"), "region")
    load_table(spark, sf_dir, "region").write.mode("overwrite").json(out)
    return spark.read.schema("r_regionkey INT, r_name STRING").json(out).select(
        "r_regionkey", "r_name"
    )


@query(
    "sink_parquet_copy",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS total
    FROM lineitem WHERE l_quantity > 45 GROUP BY l_returnflag
    """,
    tags=("sink",),
)
def sink_parquet_copy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet ``COPY TO`` analogue: filtered write, scan-back, aggregate.

    Verifies the sink preserves values exactly (parquet round-trip is
    lossless for doubles), the way DuckDB's COPY TO ... (FORMAT parquet)
    does.
    """
    out = os.path.join(tempfile.mkdtemp(prefix="pq_copy_"), "li")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    li.write.mode("overwrite").parquet(out)
    return (
        spark.read.parquet(out)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
    )


@query(
    "scan_orc_roundtrip",
    oracle="""
    SELECT source, lang, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents WHERE n_chars > 50
    GROUP BY source, lang
    """,
    tags=("scan", "sink"),
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC columnar sink + scan — Spark's second native columnar format
    (a lake migration path the reference lacks entirely; DuckDB has no
    ORC reader, so the oracle aggregates the same rows from the parquet
    source). Same DataSource V2 properties as the parquet scan:
    splittable stripes, predicate pushdown, column pruning — the
    filter below reaches the ORC reader as a pushed filter, asserted
    in tests/test_plans.py.
    """
    out = os.path.join(tempfile.mkdtemp(prefix="orc_rt_"), "docs")
    (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "lang", "n_chars")
        .write.mode("overwrite")
        .orc(out)
    )
    return (
        spark.read.orc(out)
        .filter(F.col("n_chars") > 50)
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
    )


@query(
    "view_create_query",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM (SELECT * FROM orders WHERE o_totalprice > 200000)
    GROUP BY o_orderpriority
    """,
    tags=("ddl",),
)
def view_create_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE VIEW + query-through-view (DuckDB ``CREATE VIEW`` via cpp:52)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v_src")
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW big_orders AS "
        "SELECT * FROM orders_v_src WHERE o_totalprice > 200000"
    )
    return spark.sql(
        "SELECT o_orderpriority, COUNT(*) AS n FROM big_orders GROUP BY o_orderpriority"
    )


@query(
    "sink_partitioned_pruning",
    oracle="""
    SELECT user_id % 10 AS user_band, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM events
    WHERE event_type = 'click'
    GROUP BY user_id % 10
    """,
    tags=("sink", "partitioning"),
)
def sink_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned write + partition-pruned read-back.

    Writes events partitioned by event_type (directory per value — the
    layout that makes a 100 TB event store queryable), then reads with a
    partition-key filter: the scan must list ONLY the matching
    directory, never the other partitions' files. Pruning is asserted on
    the plan in tests/test_plans.py; values here round-trip through the
    partition columns (which parquet stores in the path, not the file).
    """
    out = os.path.join(tempfile.mkdtemp(prefix="pq_part_"), "events_by_type")
    ev = load_table(spark, sf_dir, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    return back.groupBy((F.col("user_id") % 10).alias("user_band")).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
