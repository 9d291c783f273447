"""UPDATE / DELETE via rewrite-on-write, plus the oracle-checked entry.

The reference executes UPDATE/DELETE by delegation — any DML string a PG
client sends reaches DuckDB's executor through ``conn.Prepare(query)``
(``/root/reference/src/duckdb_pgwire_extension.cpp:52``). Spark's v1
parquet catalog tables have no in-place mutation, so the engine applies
the standard rewrite-on-write recipe:

    1. build the post-image as a SELECT (CASE WHEN for UPDATE, an
       inverted WHERE for DELETE),
    2. materialize it to a staging table (distributed CTAS — never
       through the driver),
    3. INSERT OVERWRITE the target from the stage, drop the stage.

Two full-table writes per statement is the scale-correct shape for an
append-only storage format; a transactional table format (Delta/Iceberg)
would replace step 2-3 with a metadata swap, not change this API.

Affected-row counts match PG semantics: rows matching WHERE (UPDATE) /
rows removed (DELETE).
"""

from __future__ import annotations

import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import load_table

_UPDATE = re.compile(
    r"^\s*UPDATE\s+([\w.]+)\s+SET\s+(.*)$", re.IGNORECASE | re.DOTALL
)
_DELETE = re.compile(r"^\s*DELETE\s+FROM\s+([\w.]+)\s*(.*)$", re.IGNORECASE | re.DOTALL)


def _split_where(tail: str) -> tuple[str, str | None]:
    """(head, where-predicate) split at the top-level WHERE keyword."""
    from ..server.compat import _find_keyword

    w = _find_keyword(tail, "WHERE")
    if w == -1:
        return tail, None
    return tail[:w], tail[w + len("WHERE") :].strip()


def parse_update(stmt: str) -> tuple[str, list[tuple[str, str]], str | None] | None:
    """``UPDATE t SET a = e1, b = e2 [WHERE p]`` →
    (table, [(col, expr)], predicate) — expressions stay SQL text."""
    from ..server.compat import split_top_level

    m = _UPDATE.match(stmt)
    if m is None:
        return None
    table, tail = m.group(1), m.group(2)
    set_part, pred = _split_where(tail)
    assignments = []
    for piece in split_top_level(set_part):
        if "=" not in piece:
            return None
        col, expr = piece.split("=", 1)
        assignments.append((col.strip(), expr.strip()))
    return table, assignments, pred


def parse_delete(stmt: str) -> tuple[str, str | None] | None:
    """``DELETE FROM t [WHERE p]`` → (table, predicate)."""
    m = _DELETE.match(stmt)
    if m is None:
        return None
    table, tail = m.group(1), m.group(2)
    _, pred = _split_where(" " + tail)
    return table, pred


def _rewrite_table(session: SparkSession, table: str, post_image_sql: str) -> None:
    """Materialize the post-image and swap it in (stage CTAS +
    INSERT OVERWRITE — Spark refuses to overwrite a table from a plan
    that reads the same table, so the stage hop is mandatory)."""
    stage = f"__dml_stage_{table.replace('.', '_')}"
    session.sql(f"DROP TABLE IF EXISTS {stage}")
    # fresh external location per statement: the default in-memory
    # catalog forgets tables across processes but their warehouse dirs
    # persist, and a leftover dir blocks a managed CTAS
    loc = tempfile.mkdtemp(prefix="dml_stage_")
    session.sql(f"CREATE TABLE {stage} USING parquet LOCATION '{loc}' AS {post_image_sql}")
    try:
        session.sql(f"INSERT OVERWRITE TABLE {table} SELECT * FROM {stage}")
    finally:
        session.sql(f"DROP TABLE IF EXISTS {stage}")


def update_table(
    session: SparkSession,
    table: str,
    assignments: list[tuple[str, str]],
    pred: str | None,
) -> int:
    """Rewrite-on-write UPDATE; returns the matched-row count."""
    cols = session.table(table).columns
    set_map = {c.lower(): e for c, e in assignments}
    if pred is None:
        select = ", ".join(set_map.get(c.lower(), c) + f" AS {c}" for c in cols)
        n = session.table(table).count()
    else:
        select = ", ".join(
            f"CASE WHEN ({pred}) THEN ({set_map[c.lower()]}) ELSE {c} END AS {c}"
            if c.lower() in set_map
            else c
            for c in cols
        )
        n = session.sql(f"SELECT count(*) AS n FROM {table} WHERE {pred}").first()["n"]
    _rewrite_table(session, table, f"SELECT {select} FROM {table}")
    return int(n)


def delete_from(session: SparkSession, table: str, pred: str | None) -> int:
    """Rewrite-on-write DELETE; returns the removed-row count."""
    if pred is None:
        n = session.table(table).count()
        _rewrite_table(
            session, table, f"SELECT * FROM {table} WHERE 1 = 0"
        )
        return int(n)
    n = session.sql(f"SELECT count(*) AS n FROM {table} WHERE {pred}").first()["n"]
    # keep rows where the predicate is false OR NULL (PG deletes only
    # rows where it is true)
    _rewrite_table(
        session,
        table,
        f"SELECT * FROM {table} WHERE NOT coalesce(({pred}), false)",
    )
    return int(n)


@query(
    "dml_update_delete",
    oracle="""
    SELECT c_custkey, ROUND(bal, 2) AS bal
    FROM (
        SELECT c_custkey,
               CASE WHEN c_mktsegment = 'BUILDING'
                    THEN c_acctbal + 100.0 ELSE c_acctbal END AS bal
        FROM customer
    )
    WHERE NOT coalesce((bal < 500.0), false)
    """,
    tags=("dml",),
)
def dml_update_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE + DELETE round-trip on a real catalog table.

    Copies ``customer`` into a managed table, applies
    ``UPDATE ... SET c_acctbal = c_acctbal + 100 WHERE segment =
    'BUILDING'`` then ``DELETE ... WHERE c_acctbal < 500`` through the
    same rewrite-on-write path the wire server uses, and returns the
    surviving (key, balance) rows. The oracle computes the identical
    post-image as a pure SELECT — the DuckDB-side semantic spec of the
    two statements.
    """
    tbl = "dml_demo_customer"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    loc = tempfile.mkdtemp(prefix="dml_demo_")  # see _rewrite_table note
    load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    ).write.option("path", loc).mode("overwrite").saveAsTable(tbl)
    update_table(
        spark,
        tbl,
        [("c_acctbal", "c_acctbal + 100.0")],
        "c_mktsegment = 'BUILDING'",
    )
    delete_from(spark, tbl, "c_acctbal < 500.0")
    return spark.table(tbl).select(
        "c_custkey", F.round("c_acctbal", 2).alias("bal")
    )
