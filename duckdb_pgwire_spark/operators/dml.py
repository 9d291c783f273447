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
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import load_table

_UPDATE = re.compile(
    r"^\s*UPDATE\s+([\w.]+)\s+SET\s+(.*)$", re.IGNORECASE | re.DOTALL
)
_DELETE = re.compile(r"^\s*DELETE\s+FROM\s+([\w.]+)\s*(.*)$", re.IGNORECASE | re.DOTALL)
_MERGE = re.compile(r"^\s*MERGE\s+INTO\s+(.*)$", re.IGNORECASE | re.DOTALL)


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


@dataclass
class MergeClause:
    """One ``WHEN [NOT] MATCHED [AND pred] THEN action`` arm."""

    matched: bool
    pred: str | None  # extra AND-predicate, SQL text (may reference both aliases)
    action: str  # 'update' | 'delete' | 'insert'
    assignments: list[tuple[str, str]] = field(default_factory=list)  # update
    insert_cols: list[str] | None = None  # insert; None = all target columns
    insert_exprs: list[str] = field(default_factory=list)  # insert


@dataclass
class MergeSpec:
    target: str
    t_alias: str
    source_sql: str  # always a SELECT (bare table names are wrapped)
    s_alias: str
    cond: str
    clauses: list[MergeClause]


def _parse_rel(text: str) -> tuple[str, str] | None:
    """``name [AS] [alias]`` or ``(subquery) [AS] alias`` →
    (sql-or-name, alias). The subquery form returns the inner SELECT."""
    text = text.strip()
    if text.startswith("("):
        depth = 0
        end = -1
        for i, c in enumerate(text):  # source subqueries carry no quoted ')'
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        if end == -1:
            return None
        rel, rest = text[1:end].strip(), text[end + 1 :].split()
    else:
        parts = text.split()
        if not parts:
            return None
        rel, rest = parts[0], parts[1:]
    if rest and rest[0].upper() == "AS":
        rest = rest[1:]
    if len(rest) > 1 or (rest and not re.fullmatch(r"\w+", rest[0])):
        return None
    return rel, (rest[0] if rest else rel)


def parse_merge(stmt: str) -> MergeSpec | None:
    """Parse the standard ``MERGE INTO … USING … ON … WHEN …`` grammar
    (PG 15 subset: multiple WHEN arms, first-match-wins; no DO NOTHING —
    an arm-less row falls through to "keep" naturally)."""
    from ..server.compat import _find_keyword, split_top_level

    m = _MERGE.match(stmt)
    if m is None:
        return None
    tail = m.group(1).rstrip().rstrip(";")
    iu = _find_keyword(tail, "USING")
    if iu == -1:
        return None
    target = _parse_rel(tail[:iu])
    rest = tail[iu + len("USING") :]
    io = _find_keyword(rest, "ON")
    if io == -1:
        return None
    source = _parse_rel(rest[:io])
    if target is None or source is None or "(" in target[0]:
        return None
    rest = rest[io + len("ON") :]
    iw = _find_keyword(rest, "WHEN")
    if iw == -1:
        return None
    cond = rest[:iw].strip()

    # split the WHEN arms at top level
    arms: list[str] = []
    pos = iw
    while pos != -1:
        nxt = _find_keyword(rest, "WHEN", pos + 4)
        arms.append(rest[pos + 4 : nxt if nxt != -1 else len(rest)].strip())
        pos = nxt

    clauses: list[MergeClause] = []
    for arm in arms:
        am = re.match(r"^(NOT\s+)?MATCHED\b(.*)$", arm, re.IGNORECASE | re.DOTALL)
        if am is None:
            return None
        matched = am.group(1) is None
        body = am.group(2)
        it = _find_keyword(body, "THEN")
        if it == -1:
            return None
        guard, action = body[:it].strip(), body[it + len("THEN") :].strip()
        pred = None
        if guard:
            gm = re.match(r"^AND\b(.*)$", guard, re.IGNORECASE | re.DOTALL)
            if gm is None:
                return None
            pred = gm.group(1).strip()
        up = re.match(r"^UPDATE\s+SET\s+(.*)$", action, re.IGNORECASE | re.DOTALL)
        ins = re.match(
            r"^INSERT\s*(\([^)]*\))?\s*VALUES\s*\((.*)\)\s*$",
            action,
            re.IGNORECASE | re.DOTALL,
        )
        if matched and up is not None:
            assignments = []
            for piece in split_top_level(up.group(1)):
                if "=" not in piece:
                    return None
                col, expr = piece.split("=", 1)
                assignments.append((col.strip(), expr.strip()))
            clauses.append(MergeClause(True, pred, "update", assignments))
        elif matched and re.fullmatch(r"DELETE", action, re.IGNORECASE):
            clauses.append(MergeClause(True, pred, "delete"))
        elif not matched and ins is not None:
            cols = (
                [c.strip() for c in ins.group(1)[1:-1].split(",")]
                if ins.group(1)
                else None
            )
            exprs = [e.strip() for e in split_top_level(ins.group(2))]
            clauses.append(
                MergeClause(False, pred, "insert", insert_cols=cols, insert_exprs=exprs)
            )
        else:
            return None
    tgt_rel, t_alias = target
    src_rel, s_alias = source
    src_sql = src_rel if " " in src_rel else f"SELECT * FROM {src_rel}"
    return MergeSpec(tgt_rel, t_alias, src_sql, s_alias, cond, clauses)


def merge_into(session: SparkSession, spec: MergeSpec) -> int:
    """Rewrite-on-write MERGE; returns updated+deleted+inserted count.

    Post-image = (target LEFT JOIN flagged-source, per-column CASE over
    the matched arms in order, delete arms filtered out) UNION ALL (one
    anti-join SELECT per NOT MATCHED arm). First-match-wins is encoded
    by AND-ing the negation of every earlier arm's predicate — the same
    null-safe ``coalesce(p, false)`` form on both engines. Like PG, a
    target row matching >1 source row is a spec violation; this engine
    processes duplicates instead of erroring (documented delta).
    """
    cols = session.table(spec.target).columns
    t, s = spec.t_alias, spec.s_alias
    src = f"(SELECT __merge_src.*, true AS __merge_m FROM ({spec.source_sql}) __merge_src) {s}"
    guard = f"coalesce({s}.__merge_m, false)"

    def first_match(arms: list[MergeClause], implicit_guard: bool) -> list[str]:
        fms, prior = [], []
        for cl in arms:
            p = "true" if cl.pred is None else f"coalesce(({cl.pred}), false)"
            parts = ([] if implicit_guard else [guard]) + [f"NOT {q}" for q in prior] + [p]
            fms.append("(" + " AND ".join(parts) + ")")
            prior.append(p)
        return fms

    matched = [c for c in spec.clauses if c.matched]
    fms = first_match(matched, implicit_guard=False)

    sel_parts = []
    for c in cols:
        whens = []
        for cl, fm in zip(matched, fms):
            if cl.action != "update":
                continue
            expr = dict((k.lower(), v) for k, v in cl.assignments).get(c.lower())
            if expr is not None:
                whens.append(f"WHEN {fm} THEN ({expr})")
        sel_parts.append(
            f"CASE {' '.join(whens)} ELSE {t}.{c} END AS {c}" if whens else f"{t}.{c} AS {c}"
        )
    del_fms = [fm for cl, fm in zip(matched, fms) if cl.action == "delete"]
    upd_fms = [fm for cl, fm in zip(matched, fms) if cl.action == "update"]
    where = f" WHERE NOT ({' OR '.join(del_fms)})" if del_fms else ""
    joined = f"FROM {spec.target} {t} LEFT JOIN {src} ON ({spec.cond})"
    target_part = f"SELECT {', '.join(sel_parts)} {joined}{where}"

    not_matched = [c for c in spec.clauses if not c.matched]
    nm_fms = first_match(not_matched, implicit_guard=True)
    insert_parts = []
    anti = f"FROM ({spec.source_sql}) {s} LEFT ANTI JOIN {spec.target} {t} ON ({spec.cond})"
    for cl, fm in zip(not_matched, nm_fms):
        ins_cols = cl.insert_cols if cl.insert_cols is not None else cols
        if len(ins_cols) != len(cl.insert_exprs):
            raise ValueError("INSERT column/VALUES arity mismatch in MERGE")
        by_col = {c.lower(): e for c, e in zip(ins_cols, cl.insert_exprs)}
        proj = ", ".join(f"({by_col.get(c.lower(), 'NULL')}) AS {c}" for c in cols)
        insert_parts.append(f"SELECT {proj} {anti} WHERE {fm}")

    # affected-row counts (PG MERGE reports inserted+updated+deleted)
    n = 0
    if matched:
        u = " OR ".join(upd_fms) if upd_fms else "false"
        d = " OR ".join(del_fms) if del_fms else "false"
        row = session.sql(
            f"SELECT sum(CASE WHEN {u} THEN 1 ELSE 0 END) AS u, "
            f"sum(CASE WHEN {d} THEN 1 ELSE 0 END) AS d {joined}"
        ).first()
        n += int(row["u"] or 0) + int(row["d"] or 0)
    for part in insert_parts:
        n += session.sql(f"SELECT count(*) AS n FROM ({part})").first()["n"]

    post_image = " UNION ALL ".join([target_part] + insert_parts)
    _rewrite_table(session, spec.target, post_image)
    return n


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


@query(
    "dml_merge",
    oracle="""
    WITH s AS (SELECT c_custkey * 2 AS k FROM customer),
    kept AS (
        SELECT t.c_custkey,
               CASE WHEN s.k IS NOT NULL
                         AND NOT coalesce((t.c_acctbal < 0.0), false)
                    THEN t.c_acctbal + 10.0 ELSE t.c_acctbal END AS bal
        FROM customer t LEFT JOIN s ON t.c_custkey = s.k
        WHERE NOT (s.k IS NOT NULL AND coalesce((t.c_acctbal < 0.0), false))
    ),
    ins AS (
        SELECT s.k AS c_custkey, 0.0 AS bal
        FROM s
        WHERE NOT EXISTS (SELECT 1 FROM customer t WHERE t.c_custkey = s.k)
          AND s.k % 3 = 0
    )
    SELECT c_custkey, ROUND(bal, 2) AS bal
    FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins)
    """,
    tags=("dml",),
)
def dml_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-arm MERGE on a real catalog table through the full
    parse → rewrite-on-write path the wire server uses.

    Source = every even custkey (half match, half don't at any SF):
    matched negative balances are DELETEd, other matches get +10, and
    unmatched source keys divisible by 3 are INSERTed at balance 0.
    The oracle is the pure-SELECT post-image of the same three arms
    (the reference reaches DuckDB's MERGE via delegation,
    ``/root/reference/src/duckdb_pgwire_extension.cpp:52``).
    """
    tbl = "dml_merge_customer"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    loc = tempfile.mkdtemp(prefix="dml_merge_")  # see _rewrite_table note
    load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal").write.option(
        "path", loc
    ).mode("overwrite").saveAsTable(tbl)
    spec = parse_merge(
        f"""
        MERGE INTO {tbl} t
        USING (SELECT c_custkey * 2 AS k FROM {tbl}) s
        ON t.c_custkey = s.k
        WHEN MATCHED AND t.c_acctbal < 0.0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET c_acctbal = t.c_acctbal + 10.0
        WHEN NOT MATCHED AND s.k % 3 = 0
             THEN INSERT (c_custkey, c_acctbal) VALUES (s.k, 0.0)
        """
    )
    assert spec is not None
    merge_into(spark, spec)
    return spark.table(tbl).select("c_custkey", F.round("c_acctbal", 2).alias("bal"))
