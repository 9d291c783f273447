"""Differential comparator mirroring the driver's correctness gate.

The driver compares each ``queries()`` entry against ``oracle_sql()`` via
row-count + schema + order-insensitive value hash (``__spark_entry__.py``
docstring). This local mirror compares canonicalized cell values exactly,
so anything that passes here should hash-match for the driver; float
drift (engine summation order) must be eliminated at the query level by
rounding on BOTH sides, not papered over with tolerances here.
"""

from __future__ import annotations

import datetime
import math
from typing import Any

# Loose type classes: the driver checks schemas; engines legitimately
# differ on width (int32 vs int64 promotion), so compare by class.
_CLASS = {
    "int": "int",
    "integer": "int",
    "bigint": "int",
    "long": "int",
    "smallint": "int",
    "short": "int",
    "tinyint": "int",
    "byte": "int",
    "float": "float",
    "double": "float",
    "string": "str",
    "varchar": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "binary": "bytes",
}


def _canon_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and format so 1.0 == 1 across engines
        if v == 0:
            return 0.0
        return float(v)
    if isinstance(v, int):
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if hasattr(v, "tolist"):  # numpy scalars / arrays
        return _canon_cell(v.tolist())
    return v


def _rows_to_canon(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    canon.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return canon


def spark_type_class(dt: str) -> str:
    base = dt.split("(")[0].lower()
    if base.startswith("decimal"):
        return "float"
    if base.startswith("array"):
        return "list"
    return _CLASS.get(base, base)


def duckdb_type_class(dt: str) -> str:
    d = dt.upper()
    if "[]" in d or d.startswith("LIST"):
        return "list"
    if d in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if d in ("FLOAT", "DOUBLE", "REAL") or d.startswith("DECIMAL"):
        return "float"
    if d in ("VARCHAR", "TEXT"):
        return "str"
    if d == "BOOLEAN":
        return "bool"
    if d == "DATE":
        return "date"
    if d.startswith("TIMESTAMP"):
        return "ts"
    if d == "BLOB":
        return "bytes"
    return d.lower()


def compare_spark_vs_duckdb(spark_df, con, sql: str, name: str = "?") -> None:
    """Assert the Spark DataFrame and the DuckDB result are equivalent."""
    srows = [tuple(r) for r in spark_df.collect()]
    sch = {f.name: spark_type_class(f.dataType.simpleString()) for f in spark_df.schema}

    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    ocols = [d[0] for d in desc]
    otypes = [d[1] for d in desc]
    # A DECIMAL anywhere in the oracle output means the SQL used bare
    # numeric literals; the resulting Decimal values compare == to floats
    # in Python but will NOT value-hash-match — force a DOUBLE cast.
    bad = [c for c, t in zip(ocols, otypes) if "DECIMAL" in t.upper()]
    assert not bad, f"{name}: oracle columns {bad} are DECIMAL — cast to DOUBLE in the SQL"
    orows = [tuple(r) for r in con.execute(sql).fetchall()]

    assert sorted(sch) == sorted(ocols), (
        f"{name}: column names differ: spark={sorted(sch)} oracle={sorted(ocols)}"
    )
    och = {c: duckdb_type_class(t) for c, t in zip(ocols, otypes)}
    for c in sch:
        assert sch[c] == och[c], f"{name}: column {c} type class differs: spark={sch[c]} oracle={och[c]}"

    assert len(srows) == len(orows), f"{name}: row count {len(srows)} != oracle {len(orows)}"

    s_canon = _rows_to_canon(list(sch), srows)
    o_canon = _rows_to_canon(ocols, orows)
    if s_canon != o_canon:
        diffs = [(a, b) for a, b in zip(s_canon, o_canon) if a != b][:5]
        raise AssertionError(
            f"{name}: values differ (first diffs, spark vs oracle, cols sorted "
            f"{sorted(sch)}):\n" + "\n".join(f"  {a}\n  {b}" for a, b in diffs)
        )
