"""PG/DuckDB-dialect → Spark SQL compatibility pre-pass.

The reference forwards SQL text verbatim to DuckDB
(src/duckdb_pgwire_extension.cpp:52), so its dialect IS DuckDB v1.1.1's.
Spark SQL covers almost all of it; this shim rewrites the known deltas
(SURVEY.md §4.2 last row) on the incoming wire SQL:

- ``generate_series(a, b [, s])`` in FROM position → inclusive-end
  ``explode(sequence(...))`` subquery (DuckDB inclusive vs Spark
  ``range`` exclusive; ``sequence`` is inclusive).
- ``SELECT DISTINCT ON (keys) ... ORDER BY ...`` → row_number window
  (no native DISTINCT ON in Spark).
- ``expr::type`` casts → ``CAST(expr AS type)``.
- bare ``varchar``/``bpchar`` column types in DDL → ``STRING`` (Spark
  requires a length argument on VARCHAR).
- ``QUALIFY`` needs no rewrite on Spark 4 (native support); listed here
  because older Sparks would need the subquery rewrite.

String-level regex rewrites, applied outside of quoted literals —
deliberately minimal: every construct Spark already parses passes
through untouched.
"""

from __future__ import annotations

import re


def _split_quoted(sql: str) -> list[tuple[bool, str]]:
    """Split into (is_literal, segment) runs so rewrites never touch the
    inside of '...' / "..." / $$...$$ literals."""
    out: list[tuple[bool, str]] = []
    i, n = 0, len(sql)
    buf = []
    while i < n:
        c = sql[i]
        if c in ("'", '"'):
            out.append((False, "".join(buf)))
            buf = []
            q = c
            j = i + 1
            while j < n:
                if sql[j] == q:
                    if j + 1 < n and sql[j + 1] == q:  # doubled quote
                        j += 2
                        continue
                    break
                j += 1
            out.append((True, sql[i : j + 1]))
            i = j + 1
        else:
            buf.append(c)
            i += 1
    out.append((False, "".join(buf)))
    return out


def _rewrite_code(seg: str) -> str:
    # expr::type → CAST(expr AS type) — simple identifier/number/paren-free exprs
    seg = re.sub(
        r"(\w+(?:\.\w+)*)\s*::\s*(\w+(?:\(\d+(?:,\s*\d+)?\))?)",
        r"CAST(\1 AS \2)",
        seg,
    )
    # FROM generate_series(a, b[, s]) [AS alias] → inclusive explode(sequence)
    def gs(m: re.Match) -> str:
        args, alias = m.group(1), m.group(2) or "generate_series"
        return (
            f"FROM (SELECT explode(sequence({args})) AS {alias})"
        )

    seg = re.sub(
        r"FROM\s+generate_series\s*\(([^)]*)\)(?:\s+(?:AS\s+)?(\w+))?",
        gs,
        seg,
        flags=re.IGNORECASE,
    )
    # scalar generate_series(...) (not FROM position): list-returning
    seg = re.sub(
        r"(?<!FROM )\bgenerate_series\s*\(",
        "sequence(",
        seg,
        flags=re.IGNORECASE,
    )
    # bare varchar/bpchar (no length) in DDL → STRING
    seg = re.sub(r"\bvarchar\b(?!\s*\()", "STRING", seg, flags=re.IGNORECASE)
    seg = re.sub(r"\bbpchar\b(?!\s*\()", "STRING", seg, flags=re.IGNORECASE)
    return seg


_DISTINCT_ON = re.compile(
    r"^\s*SELECT\s+DISTINCT\s+ON\s*\(([^)]*)\)\s*(.*?)\s*FROM\s+(.*)$",
    re.IGNORECASE | re.DOTALL,
)


def _rewrite_distinct_on(sql: str) -> str:
    """SELECT DISTINCT ON (k) cols FROM rest [ORDER BY o] →
    window row_number per k, ordered by o (or k), filtered to 1.
    Matches DuckDB/PG semantics: first row per key group."""
    m = _DISTINCT_ON.match(sql)
    if not m:
        return sql
    keys, cols, rest = m.group(1), m.group(2), m.group(3)
    order_m = re.search(r"(.*)\bORDER\s+BY\b(.*)$", rest, re.IGNORECASE | re.DOTALL)
    if order_m:
        src, order = order_m.group(1), order_m.group(2)
    else:
        src, order = rest, keys
    return (
        f"SELECT {cols} FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY {keys} ORDER BY {order}) AS __don_rn "
        f"FROM {src}) WHERE __don_rn = 1"
    )


def rewrite(sql: str) -> str:
    """Apply the full dialect pre-pass to one statement."""
    sql = _rewrite_distinct_on(sql)
    return "".join(
        seg if is_lit else _rewrite_code(seg) for is_lit, seg in _split_quoted(sql)
    )


def split_statements(sql: str) -> list[str]:
    """Split a simple-Query payload on top-level semicolons (PG allows
    several statements per message; each gets its own result cycle)."""
    stmts: list[str] = []
    cur: list[str] = []
    for is_lit, seg in _split_quoted(sql):
        if is_lit:
            cur.append(seg)
            continue
        while ";" in seg:
            head, seg = seg.split(";", 1)
            cur.append(head)
            stmts.append("".join(cur))
            cur = []
        cur.append(seg)
    stmts.append("".join(cur))
    return [s.strip() for s in stmts if s.strip()]


_COPY = re.compile(
    r"^\s*COPY\s+(\(.*\)|\w+)\s+TO\s+'([^']+)'\s*(?:\(\s*FORMAT\s+(\w+)[^)]*\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def parse_copy(stmt: str) -> tuple[str, str, str] | None:
    """DuckDB/PG ``COPY <table|(query)> TO 'path' (FORMAT fmt)`` →
    (inner select SQL, path, format). Spark has no COPY statement; the
    server executes it as DataFrameWriter (the reference reaches DuckDB's
    COPY through the same delegated path, SURVEY.md §2.3). Format
    defaults from the file extension (parquet/csv/json)."""
    m = _COPY.match(stmt)
    if not m:
        return None
    src, path, fmt = m.group(1), m.group(2), m.group(3)
    inner = src[1:-1] if src.startswith("(") else f"SELECT * FROM {src}"
    if not fmt:
        ext = path.rsplit(".", 1)[-1].lower()
        fmt = ext if ext in ("parquet", "csv", "json") else "parquet"
    return inner, path, fmt.lower()
