"""CSV dialect sniffer replicating DuckDB's auto-detection (probed
against DuckDB v1.0 — see tests/test_pgwire.py CSV battery):

- delimiter ∈ {',', ';', '\\t', '|'}: the one giving the most columns
  with a CONSISTENT per-line field count across the sample;
- per-column type inference over the data rows, lattice
  BOOLEAN → BIGINT → DOUBLE → DATE → TIME → TIMESTAMP → VARCHAR
  (empty fields are NULL and never disqualify a type);
- header = first row present whose value in SOME column does not parse
  as that column's data type — and, per DuckDB's observed rule, an
  all-VARCHAR table also claims its first row as the header;
- duplicate header names deduplicate with _1, _2, … suffixes.

The sniff reads ONE bounded sample (first ``SAMPLE_BYTES`` of the first
matching file) on the driver; the actual scan is a distributed
``spark.read.csv`` with the EXPLICIT sniffed schema — never Spark's
``inferSchema``, which would run a full extra pass over every byte of
a 100 TB input just to guess types.

TIME columns scan as STRING plus a CAST projection to Spark 4.1's
TIME type (spark.sql.timeType.enabled, session.py) — the relation
advertises the real PG OID 1083 with DuckDB's rendered text (the
r8-verdict gap here is closed; see _SPARK_TYPES).
"""

from __future__ import annotations

import csv as _csv
import io
import re

SAMPLE_BYTES = 64 * 1024
SAMPLE_LINES = 100
_DELIMS = (",", ";", "\t", "|")

# DuckDB's CSV boolean sniff accepts true/false/t/f case-insensitively
# (probed: yes/no → VARCHAR, 1/0 → BIGINT)
_BOOL = {"true", "false", "t", "f"}
_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_TIME_RE = re.compile(r"^\d{2}:\d{2}:\d{2}(\.\d+)?$")
_TS_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}(\.\d+)?$"
)

# inference lattice, narrowest first; VARCHAR always parses
_TYPES = ("BOOLEAN", "BIGINT", "DOUBLE", "DATE", "TIME", "TIMESTAMP")


# STRICT numeric forms — the intersection of what DuckDB's sniffer and
# Spark's CSV parser both accept. Python's int()/float() are looser
# ('1_0', 'inf', 'nan') and would make the explicit Spark schema
# silently NULL real data (code review r8); DuckDB's underscore
# numerals and bare inf/nan stay VARCHAR here (data preserved, type
# diverges — the lesser evil).
_INT_RE = re.compile(r"^-?\d+$")
_FLOAT_RE = re.compile(r"^-?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def _strptime_ok(v: str, fmt: str) -> bool:
    import datetime as _dt

    try:
        _dt.datetime.strptime(v, fmt)
        return True
    except ValueError:
        return False


def _parses_as(
    v: str,
    t: str,
    nulls: tuple = ("",),
    datefmt: str | None = None,
    tsfmt: str | None = None,
) -> bool:
    if v in nulls:
        return True  # NULL fits every type
    if t == "BOOLEAN":
        return v.lower() in _BOOL
    if t == "BIGINT":
        return bool(_INT_RE.match(v)) and -(2**63) <= int(v) < 2**63
    if t == "DOUBLE":
        return bool(_FLOAT_RE.match(v))
    if t == "DATE":
        # a user dateformat= drives the sniff too (DuckDB does the
        # same); Python's strptime shares DuckDB's %-directives
        if datefmt is not None:
            return _strptime_ok(v, datefmt)
        return bool(_DATE_RE.match(v))
    if t == "TIME":
        return bool(_TIME_RE.match(v))
    if t == "TIMESTAMP":
        if tsfmt is not None:
            return _strptime_ok(v, tsfmt)
        return bool(_TS_RE.match(v))
    return True  # VARCHAR


def _infer_column(
    values: list[str],
    nulls: tuple = ("",),
    datefmt: str | None = None,
    tsfmt: str | None = None,
) -> str:
    for t in _TYPES:
        if any(v not in nulls for v in values) and all(
            _parses_as(v, t, nulls, datefmt, tsfmt) for v in values
        ):
            return t
    return "VARCHAR"


def _split_sample(
    text: str,
    delim: str,
    quote: str = '"',
    escape: str | None = None,
) -> list[list[str]]:
    return list(
        _csv.reader(
            io.StringIO(text),
            delimiter=delim,
            quotechar=quote,
            escapechar=escape,
        )
    )


def sniff_text(
    text: str,
    sep: str | None = None,
    header: bool | None = None,
    quote: str | None = None,
    nullstr: str | None = None,
    datefmt: str | None = None,
    tsfmt: str | None = None,
    escape: str | None = None,
) -> dict:
    """Sniff a decoded sample. Returns ``{"sep", "header", "names",
    "types"}`` (types in DuckDB names). ``sep``/``header`` force an
    explicit user option instead of detecting it."""
    q = quote or '"'
    # csv.reader raises TypeError (unmapped: escapes the ValueError →
    # 58030 path) on multi-char quote/escape chars — the r8 sep bug
    # shape, guarded the same way (code review r10)
    if len(q) != 1:
        raise ValueError(
            f"CSV quote must be a single character, got {q!r}"
        )
    if escape is not None and len(escape) != 1:
        raise ValueError(
            f"CSV escape must be a single character, got {escape!r}"
        )
    nulls = ("",) if nullstr is None else ("", nullstr)
    fmts = (datefmt, tsfmt)
    # drop a trailing partial line (the sample may cut mid-record)
    if "\n" in text:
        text = text[: text.rfind("\n") + 1]
    lines = [ln for ln in text.splitlines() if ln != ""][:SAMPLE_LINES]
    if not lines:
        raise ValueError("empty CSV sample")
    sample = "\n".join(lines) + "\n"
    if sep is not None:
        # An override longer than 1 char would reach csv.reader and
        # raise TypeError — which escapes the ValueError→58030 IO-error
        # mapping and surfaces as an internal error (ADVICE r8 item 4).
        # Translate the common escaped spellings first, then refuse
        # multi-char separators loudly with the mappable exception type.
        sep = {"\\t": "\t", "\\n": "\n"}.get(sep, sep)
        if len(sep) != 1:
            raise ValueError(
                f"CSV delimiter must be a single character, got {sep!r}"
            )
        best = sep
    else:
        best, best_cols = ",", 1
        for d in _DELIMS:
            rows = _split_sample(sample, d, q, escape)
            counts = {len(r) for r in rows if r}
            if len(counts) == 1:
                (n,) = counts
                if n > best_cols:
                    best, best_cols = d, n
    rows = [r for r in _split_sample(sample, best, q, escape) if r]
    ncol = max(len(r) for r in rows)
    grid = [[*(r), *[""] * (ncol - len(r))] for r in rows]
    rest = grid[1:]
    if header is None and all(v == "" for v in grid[0]):
        # an all-empty first row is DATA (a row of NULLs) — DuckDB
        # never claims empty header names (found by the r8 CSV fuzzer)
        header = False
    if rest:
        types_rest = [
            _infer_column([row[c] for row in rest], nulls, *fmts)
            for c in range(ncol)
        ]
        if header is None:
            # a column whose DATA rows are all empty types as SQL NULL
            # in DuckDB, so ANY non-empty first-row cell there fails
            # the type check and claims the header (found by the r8
            # CSV fuzzer on degenerate mostly-empty grids)
            null_col_hdr = any(
                grid[0][c] not in nulls
                and all(row[c] in nulls for row in rest)
                for c in range(ncol)
            )
            header = (
                null_col_hdr
                or all(t == "VARCHAR" for t in types_rest)
                or any(
                    not _parses_as(grid[0][c], types_rest[c], nulls, *fmts)
                    for c in range(ncol)
                )
            )
    else:
        # single-line file (probed): DuckDB keeps a numeric/mixed row
        # as DATA ('1,2,3' → column0.. with one row; 'a,1' too) and
        # claims an all-text row as a header-only table ('a,b' → empty)
        row0_types = [
            _infer_column([grid[0][c]], nulls, *fmts) for c in range(ncol)
        ]
        if header is None:
            # an EMPTY cell (after unquoting) keeps the row as DATA
            # even when everything else is text (probed: ',:' → one
            # NULL/text row; ' ,b' → header — whitespace counts as
            # text; r10 fuzzer)
            header = all(t == "VARCHAR" for t in row0_types) and all(
                c not in nulls for c in grid[0]
            )
        types_rest = ["VARCHAR"] * ncol
    if header:
        # DuckDB's header naming, probed r10: a truly-EMPTY cell is
        # named positionally (column1 for index 1) up front; other
        # cells are space-trimmed (tabs survive: 'a,\t' → '\t');
        # duplicates left-to-right get _1, _2 (a space-only cell
        # trims to '' and dedups AS the empty string: ' , , ' →
        # '', '_1', '_2'); names still empty AFTER dedup become
        # C<index> with NO re-dedup — a clash with a literal C0 is
        # DuckDB's binder error, kept loud here.
        names: list[str] = []
        used: set[str] = set()
        for ci, raw in enumerate(grid[0]):
            base = raw.strip(" ") if raw != "" else f"column{ci}"
            name, k = base, 0
            while name in used:
                k += 1
                name = f"{base}_{k}"
            used.add(name)
            names.append(name)
        names = [
            n if n != "" else f"C{ci}" for ci, n in enumerate(names)
        ]
        if len(set(names)) != len(names):
            raise ValueError(
                "CSV header has duplicate column name after "
                "normalization (DuckDB binder error parity)"
            )
        types = types_rest
    else:
        names = [f"column{i}" for i in range(ncol)]
        types = [
            _infer_column([row[c] for row in grid], nulls, *fmts)
            for c in range(ncol)
        ]
    return {"sep": best, "header": header, "names": names, "types": types}


_SPARK_TYPES = {
    # BOOLEAN scans as string + a CASE projection: Spark's CSV reader
    # only parses true/false, but DuckDB's boolean sniff also accepts
    # t/f — the projection keeps both forms, codegen-side
    "BOOLEAN": "string",
    "BIGINT": "long",
    "DOUBLE": "double",
    "DATE": "date",
    # TIME scans as string + a CAST projection: Spark's CSV datasource
    # rejects TIME columns even with the r10 timeType flag on, but a
    # CAST over the string scan yields a real TIME column (OID 1083)
    "TIME": "string",
    "TIMESTAMP": "timestamp",
    "VARCHAR": "string",
}


# DuckDB type spellings accepted in read_csv columns= → (Spark scan
# type, projection kind). BOOLEAN/TIME scan as string: DuckDB's bool
# parse also takes t/f, and Spark's CSV datasource rejects TIME — the
# same projections the sniffed path uses.
_DUCK_COL_TYPES = {
    "BOOLEAN": ("string", "BOOLEAN"), "BOOL": ("string", "BOOLEAN"),
    "LOGICAL": ("string", "BOOLEAN"),
    "TINYINT": ("tinyint", None), "INT1": ("tinyint", None),
    "SMALLINT": ("smallint", None), "INT2": ("smallint", None),
    "INTEGER": ("int", None), "INT": ("int", None), "INT4": ("int", None),
    "BIGINT": ("long", None), "INT8": ("long", None), "LONG": ("long", None),
    "HUGEINT": ("decimal(38,0)", None),
    "FLOAT": ("float", None), "FLOAT4": ("float", None),
    "REAL": ("float", None),
    "DOUBLE": ("double", None), "FLOAT8": ("double", None),
    "VARCHAR": ("string", None), "TEXT": ("string", None),
    "STRING": ("string", None), "BPCHAR": ("string", None),
    "CHAR": ("string", None),
    "DATE": ("date", None), "TIME": ("string", "TIME"),
    "TIMESTAMP": ("timestamp", None), "DATETIME": ("timestamp", None),
}


def _duck_col_type(t: str) -> tuple[str, str | None]:
    up = t.strip().upper()
    m = re.fullmatch(r"(?:DECIMAL|NUMERIC)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", up)
    if m:
        return (f"decimal({m.group(1)},{m.group(2)})", None)
    if up in _DUCK_COL_TYPES:
        return _DUCK_COL_TYPES[up]
    raise ValueError(f"read_csv columns=: unsupported column type {t!r}")


def _proj(n: str, kind: str | None) -> str:
    if kind == "BOOLEAN":
        return (
            f"CASE WHEN lower(`{n}`) IN ('true', 't') THEN true "
            f"WHEN lower(`{n}`) IN ('false', 'f') THEN false END AS `{n}`"
        )
    if kind == "TIME":
        return f"CAST(`{n}` AS TIME) AS `{n}`"
    return f"`{n}`"


def sniff_file(
    path: str,
    sep: str | None = None,
    header: bool | None = None,
    quote: str | None = None,
    nullstr: str | None = None,
    names: tuple | None = None,
    columns: tuple | None = None,
    all_varchar: bool = False,
    datefmt: str | None = None,
    tsfmt: str | None = None,
    escape: str | None = None,
) -> dict:
    """Sniff the first matching file of ``path`` (globs allowed). Adds
    ``schema_ddl`` — the explicit Spark schema for the scan.

    read_csv named-option semantics (probed r10): ``names`` renames
    the FIRST len(names) columns only; ``columns`` (name, ducktype)
    pairs must cover every column and REPLACE sniffed names/types
    (header detection still decides whether row 1 is data);
    ``all_varchar`` keeps every sniffed column as VARCHAR;
    ``nullstr`` cells count as NULL during type inference."""
    import glob as _glob
    import os

    matches = sorted(_glob.glob(path)) or [path]
    first = matches[0]
    if not os.path.isfile(first):
        raise ValueError(f'could not open CSV file "{path}"')
    with open(first, "rb") as f:
        raw = f.read(SAMPLE_BYTES)
    res = sniff_text(
        raw.decode("utf-8", errors="replace"),
        sep,
        header,
        quote,
        nullstr,
        datefmt,
        tsfmt,
        escape,
    )
    if columns is not None:
        if len(columns) != len(res["names"]):
            raise ValueError(
                f"read_csv columns=: {len(columns)} columns specified "
                f"but the file has {len(res['names'])} (DuckDB errors "
                "on the mismatch too)"
            )
        cols = [(n, *_duck_col_type(t)) for n, t in columns]
    else:
        kinds = {"BOOLEAN": "BOOLEAN", "TIME": "TIME"}
        if all_varchar:
            res["types"] = ["VARCHAR"] * len(res["types"])
        col_names = list(res["names"])
        if names is not None:
            if len(names) > len(col_names):
                raise ValueError(
                    f"read_csv names=: {len(names)} names for "
                    f"{len(col_names)} columns"
                )
            col_names[: len(names)] = list(names)  # first-N rename (probed)
        cols = [
            (n, _SPARK_TYPES[t], kinds.get(t))
            for n, t in zip(col_names, res["types"])
        ]
        if len({n for n, _, _ in cols}) != len(cols):
            raise ValueError("read_csv: duplicate column name after names=")
    res["names"] = [n for n, _, _ in cols]
    res["schema_ddl"] = ", ".join(f"`{n}` {st}" for n, st, _ in cols)
    res["select_exprs"] = [_proj(n, k) for n, _, k in cols]
    # explicit flag — the caller must not re-derive this by substring
    # matching expr text (a column NAMED "forecast" contains "CAST";
    # code review r10)
    res["needs_projection"] = any(k is not None for _, _, k in cols)
    return res
