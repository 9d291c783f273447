"""Property-based tests for the dialect shim's lexer and rewriter.

The shim rewrites CODE segments only; literals and comments must pass
through byte-for-byte no matter what they contain. Hypothesis drives
adversarial inputs (quotes inside literals, dollar-quoting, comment
markers inside strings, placeholder-looking data) at the pure-function
level — no SparkSession needed, so these run in milliseconds.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_pgwire_spark.server.compat import (
    _lex,
    rewrite,
    rewrite_integer_sums,
    split_statements,
)

# fragments that stress the lexer: quote styles, comment markers,
# escapes, dollar tags, placeholder lookalikes
_FRAGMENTS = st.sampled_from(
    [
        "SELECT 1", "a", ",", ";", " ", "''", "'it''s'", '"col name"',
        "-- line comment\n", "/* block */", "/* nested /* deep */ x */",
        "'--not a comment'", "'/*not either*/'", "$$body$$", "$tag$x$tag$",
        "'$1 ? $2'", "E", "len(x)", "SUM(v)", "ARRAY[1,2]", "::int",
        "'unterminated start", "1.5e3", "word_chars", "(", ")",
    ]
)


@given(st.lists(_FRAGMENTS, max_size=12).map("".join))
@settings(max_examples=300, deadline=None)
def test_lex_roundtrip_lossless(sql):
    """Concatenating the lexed segments must reproduce the input exactly
    (the lexer may classify, never alter)."""
    assert "".join(seg for _, seg in _lex(sql)) == sql


@given(st.lists(_FRAGMENTS, max_size=10).map("".join))
@settings(max_examples=300, deadline=None)
def test_rewrite_never_touches_complete_literals(sql):
    """Every complete single-quoted literal's body must survive rewrite
    verbatim (rewrites apply to code segments only)."""
    lits_in = [seg for kind, seg in _lex(sql) if kind == "lit" and seg.endswith("'") and len(seg) >= 2]
    out = rewrite(sql)
    for lit in lits_in:
        assert lit in out, (sql, lit, out)


@given(st.lists(_FRAGMENTS, max_size=10).map("".join))
@settings(max_examples=300, deadline=None)
def test_split_statements_preserves_content(sql):
    """Splitting never invents or loses non-whitespace code content:
    the split parts, re-joined, contain the same characters as the
    input minus top-level semicolons and whitespace trimming."""
    parts = split_statements(sql)
    for p in parts:
        assert p.strip() == p  # trimmed
        assert p  # no empty statements emitted


@given(
    st.lists(_FRAGMENTS, max_size=8).map("".join),
    st.sets(st.sampled_from(["v", "w", "qty"]), max_size=3),
)
@settings(max_examples=300, deadline=None)
def test_integer_sum_rewrite_is_stable(sql, cols):
    """rewrite_integer_sums must be a no-op on inputs without SUM, never
    raise, and be idempotent (rewriting twice == rewriting once)."""
    once = rewrite_integer_sums(sql, cols)
    if "sum" not in sql.lower():
        assert once == sql
    assert rewrite_integer_sums(once, cols) == once


# --- bracket-idiom rewrite vs DuckDB (r5): generated list expressions
# must produce identical VALUES through both engines' front doors.

_INT = st.integers(min_value=-5, max_value=7)


@st.composite
def _list_expr(draw, depth=0):
    """A DuckDB expression string whose value is deterministic: either a
    flat list literal, a subscript of one, or a slice."""
    items = draw(st.lists(_INT, min_size=1, max_size=5))
    lit = "[" + ", ".join(str(i) for i in items) + "]"
    form = draw(st.sampled_from(["lit", "sub", "slice", "comp"]))
    if form == "lit":
        return lit
    if form == "sub":
        idx = draw(st.integers(min_value=1, max_value=len(items)))
        if draw(st.booleans()):
            idx = -idx  # negative: count from the end, both engines
        return f"{lit}[{idx}]"
    if form == "slice":
        a = draw(st.integers(min_value=1, max_value=len(items)))
        b = draw(st.integers(min_value=a, max_value=len(items)))
        return f"{lit}[{a}:{b}]"
    mult = draw(st.integers(min_value=0, max_value=3))
    return f"[x * {mult} FOR x IN {lit} IF x > 0]"


@given(expr=_list_expr())
@settings(max_examples=60, deadline=None)
def test_bracket_rewrite_matches_duckdb_values(spark, expr):
    """rewrite() must map every generated bracket idiom onto a Spark
    expression with the SAME value DuckDB computes — especially the
    1-based subscripts, where Spark's native parse is 0-based and a
    missed rewrite is a silently-wrong answer."""
    import duckdb

    sql = f"SELECT {expr} AS v"
    expected = duckdb.connect().execute(sql).fetchall()[0][0]
    got = spark.sql(rewrite(sql)).collect()[0][0]
    assert got == expected, (expr, rewrite(sql), got, expected)


@given(
    d=st.decimals(
        allow_nan=False,
        allow_infinity=False,
        min_value=-10**20,
        max_value=10**20,
        places=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_pg_numeric_binary_roundtrip(d):
    """PG binary NUMERIC codec: encode → decode reproduces the exact
    decimal value AND its display scale (base-10000 digit grouping,
    negative weights, zero stripping)."""
    import decimal

    from duckdb_pgwire_spark.server.typemap import (
        _decode_pg_numeric,
        _encode_pg_numeric,
    )

    back = _decode_pg_numeric(_encode_pg_numeric(d))
    assert decimal.Decimal(back) == d, (d, back)
    # display scale preserved: same count of fractional digits
    want_scale = max(0, -d.as_tuple().exponent)
    got_scale = len(back.split(".")[1]) if "." in back else 0
    assert got_scale == want_scale, (d, back)


@st.composite
def _json_chain(draw):
    """A JSON document + an arrow chain over it, DuckDB-valid."""
    leaf = draw(
        st.one_of(
            st.integers(min_value=-99, max_value=99),
            st.booleans(),
            st.text(alphabet="abxyz", min_size=0, max_size=5),
            st.floats(min_value=-9, max_value=9, allow_nan=False).map(
                lambda f: round(f, 3)
            ),
        )
    )
    keys = draw(st.lists(st.sampled_from(["a", "b", "k1"]), min_size=1, max_size=3))
    doc = leaf
    steps = []
    for k in keys:
        wrap_list = draw(st.booleans())
        if wrap_list:
            idx = draw(st.integers(min_value=0, max_value=2))
            doc = [None] * idx + [doc]
            steps.append(idx)
        doc = {k: doc}
        steps.append(k)
    import json as _json

    chain = ""
    for s in reversed(steps):
        chain += f" -> {s}" if isinstance(s, int) else f" -> '{s}'"
    final = draw(st.sampled_from(["->", "->>"]))
    if final == "->>":
        chain = chain.rsplit("->", 1)
        chain = chain[0] + "->>" + chain[1]
    return _json.dumps(doc), chain


@given(case=_json_chain())
@settings(max_examples=80, deadline=None)
def test_json_arrow_chains_match_duckdb(spark, case):
    """The full -> / ->> chain rewrite (incl. the r6 variant form that
    preserves JSON quoting on a final ->) must match DuckDB exactly on
    randomized documents and chains."""
    import duckdb

    doc, chain = case
    sql = f"SELECT '{doc}'{chain} AS v"
    expected = duckdb.connect().execute(sql).fetchall()[0][0]
    got = spark.sql(rewrite(sql)).collect()[0][0]
    assert got == (None if expected is None else str(expected)), (
        sql,
        rewrite(sql),
        got,
        expected,
    )


# ------------------------------------------------ operator-rewrite fuzz

import math as _math

import duckdb as _duckdb
import pytest as _pytest

_NUM = st.one_of(
    st.integers(min_value=-50, max_value=50),
    st.decimals(
        min_value=-50, max_value=50, places=2, allow_nan=False,
        allow_infinity=False,
    ),
)
_BINOP = st.sampled_from(["//", "**", "^", "+", "-", "*", "%"])


@st.composite
def _op_expr(draw, depth=0):
    """Random arithmetic over DuckDB's operator spellings."""
    if depth >= 2 or draw(st.booleans()):
        return str(draw(_NUM))
    a = draw(_op_expr(depth + 1))  # noqa: F821 — composite self-reference
    b = draw(_op_expr(depth + 1))
    op = draw(_BINOP)
    return f"({a} {op} {b})"


@given(_op_expr())
@settings(max_examples=120, deadline=None)
def test_operator_rewrite_matches_duckdb_numerically(expr):
    """The //, **, ^ operator rewrites must agree with DuckDB on random
    arithmetic (to 9 significant digits; both-error cases — division by
    zero, overflow — count as agreement)."""
    sql = f"SELECT {expr} AS v"
    con = _duckdb.connect()
    try:
        want = con.execute(sql).fetchone()[0]
    except Exception:  # noqa: BLE001 — duckdb rejects: ours may too
        want = "__ERR__"
    finally:
        con.close()
    rewritten = rewrite(sql)
    assert "//" not in rewritten and "**" not in rewritten
    assert "^" not in rewritten
    if want == "__ERR__":
        return
    # evaluate the rewritten expression through DuckDB itself after
    # mapping the Spark spellings back (POWER/FLOOR/DIV are common SQL)
    # — a pure-function equivalence check with no SparkSession cost.
    back = rewritten.replace(" DIV ", " // ")
    con = _duckdb.connect()
    try:
        got = con.execute(back).fetchone()[0]
    except Exception:  # noqa: BLE001
        got = "__ERR__"
    finally:
        con.close()
    if got == "__ERR__":
        return  # Spark-only spelling duckdb can't take — covered by battery
    if want is None or got is None:
        assert want == got, (sql, rewritten)
        return
    w, g = float(want), float(got)
    if _math.isnan(w) or _math.isnan(g):
        assert _math.isnan(w) == _math.isnan(g), (sql, rewritten)
        return
    assert g == _pytest.approx(w, rel=1e-9, abs=1e-9), (sql, rewritten, want, got)


# ---------------------------------------------------------------- r7 fixes


def test_find_keyword_whitespace_tolerant():
    """Multi-word keywords match across any whitespace run — a literal
    substring find would scope a trailing ``ORDER\\n BY`` to the last
    UNION arm instead of the whole statement."""
    from duckdb_pgwire_spark.server.compat import _find_keyword, _find_keyword_span

    assert _find_keyword("a ORDER BY b", "ORDER BY") == 2
    assert _find_keyword("a ORDER  BY b", "ORDER BY") == 2
    assert _find_keyword("a ORDER\nBY b", "ORDER BY") == 2
    assert _find_keyword("a ORDER\n\t BY b", "ORDER BY") == 2
    s, e = _find_keyword_span("x ORDER \n BY y", "ORDER BY")
    assert (s, e) == (2, 12)
    # still literal-masked and word-bounded
    assert _find_keyword("'ORDER BY' x", "ORDER BY") == -1
    assert _find_keyword("PREORDER BY", "ORDER BY") == -1


def test_unrewritable_occurrence_skips_not_aborts():
    """One odd operator spelling must not disable every later rewrite in
    the statement (r6 bug: the whole pass bailed with the raw SQL)."""
    out = rewrite("SELECT a GLOB b, 4 ** 2 AS p, 'x' ~ 'y' AS r FROM t")
    assert "POWER(4, 2)" in out  # later ** still rewritten
    assert "RLIKE" in out  # later ~ still rewritten
    assert "GLOB" in out  # non-literal glob left for a loud parse error


def test_unrewritable_power_raises():
    """Spark parses ``^`` as XOR — an occurrence we can't rewrite must
    refuse loudly, never pass through to silently compute the wrong op."""
    with _pytest.raises(ValueError, match="XOR"):
        rewrite("SELECT GROUP ^ 2")


def test_typed_literal_operands_not_garbled():
    """INTERVAL/DATE/TIMESTAMP literals are single operands: the typed-
    literal keyword travels with the quoted part on both sides."""
    out = rewrite("SELECT INTERVAL '1 day' ^ 2")
    assert "POWER(INTERVAL '1 day', 2)" in out
    out = rewrite("SELECT DATE '2024-01-02' ^ 2")
    assert "POWER(DATE '2024-01-02', 2)" in out


def test_case_end_block_is_an_operand():
    out = rewrite("SELECT CASE WHEN x THEN 1 END ^ 2, 4 ^ 2 FROM t")
    assert "POWER(CASE WHEN x THEN 1 END, 2)" in out
    assert "POWER(4, 2)" in out
    out = rewrite("SELECT 2 ^ CASE WHEN x THEN 3 ELSE 4 END FROM t")
    assert "POWER(2, CASE WHEN x THEN 3 ELSE 4 END)" in out
    # nested CASE
    out = rewrite(
        "SELECT CASE WHEN x THEN CASE WHEN y THEN 1 END ELSE 2 END ^ 2 FROM t"
    )
    assert out.startswith(
        "SELECT POWER(CASE WHEN x THEN CASE WHEN y THEN 1 END ELSE 2 END, 2)"
    )


def test_quantile_disc_list_argument():
    out = rewrite("SELECT quantile_disc(x, [0.25, 0.75]) AS q FROM t")
    assert out.count("percentile_disc") == 2
    assert "array(" in out
    with _pytest.raises(ValueError, match="non-literal"):
        rewrite("SELECT quantile_disc(x, [a, b]) FROM t")


def test_window_exclude_and_groups_refusals():
    """GROUPS mode refuses with DuckDB's own parser wording (probed:
    v1.1 does not implement it); EXCLUDE forms outside the subtraction
    rewrite's validity envelope refuse loudly instead of computing a
    silently-wrong subtraction."""
    cases = [
        ("SELECT sum(x) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t",
         "GROUPS mode"),
        ("SELECT min(x) OVER (ORDER BY k ROWS BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) FROM t",
         "min"),
        ("SELECT sum(x) OVER (ORDER BY k ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) FROM t",
         "ROWS frame"),
        ("SELECT sum(x) OVER (ORDER BY k ROWS BETWEEN 5 FOLLOWING AND 8 FOLLOWING EXCLUDE CURRENT ROW) FROM t",
         "may not contain"),
        ("SELECT sum(x) OVER (ORDER BY k EXCLUDE GROUP) FROM t",
         "frame clause is required"),
    ]
    for sql, frag in cases:
        with _pytest.raises(ValueError, match=frag):
            rewrite(sql)
    # literals never trip the refusals
    assert rewrite("SELECT 'GROUPS BETWEEN 1'") == "SELECT 'GROUPS BETWEEN 1'"
    assert "EXCLUDE TIES" in rewrite("SELECT 'x EXCLUDE TIES'")


@given(
    xs=st.lists(
        st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)), max_size=12
    )
)
@settings(max_examples=150, deadline=None)
def test_pg_binary_array_roundtrip_int4(xs):
    """PG binary array layout round-trips: encode a Spark int array cell,
    decode it through the Bind-parameter path, and land on the same PG
    array literal the TEXT path renders."""
    from pyspark.sql import types as T

    from duckdb_pgwire_spark.server.typemap import (
        decode_binary_param,
        encode_binary,
        encode_text,
    )

    dt = T.ArrayType(T.IntegerType())
    raw = encode_binary(xs, dt)
    assert decode_binary_param(raw, 1007).decode() == encode_text(xs)


@given(
    xs=st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(
                    codec="utf-8", exclude_characters="\x00"
                ),
                max_size=8,
            ),
        ),
        max_size=8,
    )
)
@settings(max_examples=150, deadline=None)
def test_pg_binary_array_roundtrip_text(xs):
    """Text arrays: the binary decode applies the same quoting rules as
    the text renderer, so both paths agree on every weird string."""
    from pyspark.sql import types as T

    from duckdb_pgwire_spark.server.typemap import (
        decode_binary_param,
        encode_binary,
        encode_text,
    )

    dt = T.ArrayType(T.StringType())
    raw = encode_binary(xs, dt)
    assert decode_binary_param(raw, 1009).decode() == encode_text(xs)


@given(
    rows=st.integers(0, 5),
    cols=st.integers(0, 5),
    data=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_pg_binary_array_roundtrip_nested(rows, cols, data):
    """Nested (2-D) arrays (r7 verdict item 5): the ndim=2 binary
    layout round-trips to the same {{..},{..}} literal the text
    renderer produces for rectangular input; ragged input refuses
    loudly instead of mis-shaping."""
    from pyspark.sql import types as T

    from duckdb_pgwire_spark.server.typemap import (
        decode_binary_param,
        encode_binary,
        encode_text,
        pg_oid,
    )

    dt = T.ArrayType(T.ArrayType(T.LongType()))
    cells = st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1))
    xs = [
        [data.draw(cells) for _ in range(cols)] for _ in range(rows)
    ]
    raw = encode_binary(xs, dt)
    if rows == 0 or cols == 0:
        assert decode_binary_param(raw, pg_oid(dt)).decode() == "{}"
    else:
        assert (
            decode_binary_param(raw, pg_oid(dt)).decode()
            == encode_text(xs)
        )
    if rows >= 2 and cols >= 1:
        import pytest as _pytest

        with _pytest.raises(ValueError, match="ragged"):
            encode_binary([xs[0], xs[1][:-1]], dt)
        with _pytest.raises(ValueError, match="NULL sub-array"):
            encode_binary([xs[0], None], dt)


_UV_TAGS = st.sampled_from(["num", "s", "tag_1", "x"])
_UV_VALS = st.one_of(
    st.integers(min_value=-10**6, max_value=10**6),
    st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                               whitelist_characters=" ,'"),
        max_size=12,
    ),
)


@given(_UV_TAGS, _UV_VALS)
@settings(max_examples=60, deadline=None)
def test_union_fn_rewrite_matches_duckdb(tag, val):
    """union_tag/union_extract over random tags and values must agree
    with DuckDB, and the rewrite must always produce the tagged-struct
    form (no union_* spelling may survive to Spark's parser)."""
    lit = str(val) if isinstance(val, int) else "'" + val.replace("'", "''") + "'"
    sql = (
        f"SELECT union_tag(union_value({tag} := {lit})) AS t, "
        f"union_extract(union_value({tag} := {lit}), '{tag}') AS v"
    )
    con = _duckdb.connect()
    try:
        want = con.execute(sql).fetchone()
    finally:
        con.close()
    assert want[0] == tag and want[1] == val
    rewritten = rewrite(sql)
    assert "union_" not in rewritten.lower(), rewritten
    assert f"named_struct('__utag', '{tag}'" in rewritten, rewritten
    # field access must target the same tag the struct carries
    assert f".__utag" in rewritten and f".{tag}" in rewritten


# ------------------------------------------------------ CSV sniff fuzz

# value space where DuckDB's sniffer and ours agree BY DESIGN —
# excluded: candidate delimiter chars (quoting ambiguity resolves
# engine-specifically), underscore numerals / inf / nan / leading '+'
# (DuckDB-only numeric forms our sniffer deliberately keeps VARCHAR so
# Spark's parser can't silently NULL them), quotes/newlines in cells.
_CSV_TEXT = st.text(
    alphabet="abcdefghjkmpqrsuvwxyz XYZ.-:", min_size=1, max_size=8
).filter(lambda s: s.strip() == s and s.lower() not in ("inf", "nan"))
_CSV_CELLS = {
    "int": st.integers(-(10**6), 10**6).map(str),
    "float": st.floats(
        min_value=-1000, max_value=1000, allow_nan=False
    ).map(lambda v: f"{v:.3f}"),
    "text": _CSV_TEXT,
    "bool": st.sampled_from(["true", "false", "t", "f"]),
    "date": st.dates(
        min_value=__import__("datetime").date(2000, 1, 1),
        max_value=__import__("datetime").date(2030, 12, 28),
    ).map(lambda d: d.isoformat()),
}


@given(data=st.data())
@settings(max_examples=20, deadline=None)
def test_csv_sniff_fuzz_matches_duckdb(spark, tmp_path_factory, data):
    """Random typed CSVs (delimiter × header × nullable cells) read by
    THIS engine's sniff+scan must value-match DuckDB reading the same
    file — the systematic net over csv_sniff's probed rules (r8)."""
    import csv as _csv
    import uuid

    import duckdb

    from duckdb_pgwire_spark.server.csv_sniff import sniff_file
    from duckdb_pgwire_spark.server.typemap import encode_text

    ncols = data.draw(st.integers(1, 4))
    nrows = data.draw(st.integers(1, 6))
    delim = data.draw(st.sampled_from([",", ";", "|", "\t"]))
    header = data.draw(st.booleans())
    kinds = [
        data.draw(st.sampled_from(list(_CSV_CELLS))) for _ in range(ncols)
    ]
    grid = []
    for _ in range(nrows):
        row = [
            ""
            if data.draw(st.integers(0, 9)) == 0
            else data.draw(_CSV_CELLS[kinds[c]])
            for c in range(ncols)
        ]
        if all(v == "" for v in row):
            # documented engine delta: Spark's CSV reader SKIPS rows
            # where every field is null; DuckDB keeps a NULL row
            row[0] = data.draw(_CSV_CELLS[kinds[0]])
        grid.append(row)
    path = str(
        tmp_path_factory.mktemp("csvfuzz") / f"f{uuid.uuid4().hex[:8]}.csv"
    )
    with open(path, "w", newline="") as f:
        w = _csv.writer(f, delimiter=delim)
        if header:
            w.writerow([f"col_{chr(97 + c)}" for c in range(ncols)])
        w.writerows(grid)

    con = duckdb.connect()
    try:
        res = con.execute(f"SELECT * FROM '{path}'")
        duck_cols = [c[0] for c in res.description]
        duck_rows = res.fetchall()
    finally:
        con.close()

    sn = sniff_file(path)
    df = (
        spark.read.option("sep", sn["sep"])
        .option("header", str(sn["header"]).lower())
        .schema(sn["schema_ddl"])
        .csv(path)
    ).selectExpr(*sn["select_exprs"])
    assert df.columns == duck_cols, (sn, duck_cols, open(path).read())

    def canon(rows):
        return sorted(
            tuple("\x00NULL" if v is None else encode_text(v) for v in r)
            for r in rows
        )

    assert canon(r for r in df.collect()) == canon(duck_rows), (
        sn, open(path).read()
    )


def test_csv_sniff_header_naming_probe_table(tmp_path):
    """Pinned DuckDB probes for header-claim and header-NAMING edges
    (r10 fuzzer found the single-line empty-cell case): truly-empty
    header cells name positionally (column1), space-only cells trim
    to '' and dedup as the empty string then become C<index>, tabs
    survive untrimmed, a post-normalization clash is a loud error —
    each expectation produced by DuckDB v1.x on the same text."""
    import duckdb

    from duckdb_pgwire_spark.server.csv_sniff import sniff_text

    cases = [
        ",:", "a,", "a,b", ",b", ":,:", " ,b", "a, ", '"",b',
        ",:\nx,y", "a,\nx,y", " ,b\nx,y", ",:\n1,y", " , \nx,y",
        "\t,b", "a, , \nx,y,z", " , , \nx,y,z", "C0, \nx,y",
        "a,,\nx,y,z", ", ,\nx,y,z", "a,\t\nx,y", ",,:\nx,y,z",
        " a ,b\nx,y", "column0,\nx,y",
    ]
    con = duckdb.connect()
    try:
        for i, c in enumerate(cases):
            p = str(tmp_path / f"probe{i}.csv")
            with open(p, "w") as f:
                f.write(c + "\n")
            want = [
                col[0]
                for col in con.execute(f"SELECT * FROM '{p}'").description
            ]
            sn = sniff_text(c + "\n")
            got = (
                sn["names"]
                if sn["header"]
                else [f"column{j}" for j in range(len(sn["names"]))]
            )
            assert got == want, (c, got, want)
    finally:
        con.close()
    # ' ,C0' normalizes the space cell to C0 → duplicate → loud error
    # on BOTH engines (DuckDB: binder error)
    import pytest as _pt

    with _pt.raises(ValueError, match="duplicate column name"):
        sniff_text(" ,C0\nx,y\n")


@given(
    micros=st.integers(
        min_value=-(10**15), max_value=10**15
    )
)
@settings(max_examples=300, deadline=None)
def test_interval_text_fuzz_matches_duckdb(micros):
    """Randomized day-time intervals: encode_text must equal DuckDB's
    interval::VARCHAR for the SAME canonical day/time components (the
    r8 unit test pins the probed fixed cases; this sweeps the space —
    sign combinations, fractional-second trimming, day pluralization)."""
    import datetime as dt

    import duckdb

    from duckdb_pgwire_spark.server.typemap import encode_text

    td = dt.timedelta(microseconds=micros)
    sgn = -1 if micros < 0 else 1
    days, rem = divmod(abs(micros), 86_400_000_000)
    con = duckdb.connect()
    try:
        want = con.execute(
            f"SELECT (to_days(CAST({sgn * days} AS INT)) + "
            f"to_microseconds({sgn * rem}))::VARCHAR"
        ).fetchone()[0]
    finally:
        con.close()
    assert encode_text(td) == want, (micros, encode_text(td), want)


# ------------------------------------------------------ ENUM fuzz

# member alphabet: letters plus space/quote/punctuation — members are
# VALUES (any string is legal); the quote exercises _esc_lit and the
# DuckDB '' doubling in the member-list parser
_ENUM_MEMBER = st.text(
    alphabet="abcdxyz AB'_-.\\", min_size=1, max_size=6
).filter(lambda s: s.strip() == s)


@given(data=st.data())
@settings(max_examples=25, deadline=None)
def test_enum_fuzz_matches_duckdb(spark, data):
    """Random ENUM types (member lists incl. quotes/spaces) through the
    ordered-struct emulation: casts (strict + TRY), declaration-order
    enum-enum comparisons, varchar-semantics literal comparisons, and
    ORDER BY/min/max — value-matched against DuckDB running the SAME
    statements with a real enum type (r9 systematic net over the
    probed cases in census r9_enum)."""
    import duckdb

    from duckdb_pgwire_spark.functions.udfs import register_udfs
    from duckdb_pgwire_spark.server import compat
    from duckdb_pgwire_spark.server.compat import rewrite

    register_udfs(spark)  # r12: the PUA guard can route to a UDF

    members = data.draw(
        st.lists(_ENUM_MEMBER, min_size=1, max_size=5, unique=True)
    )

    def dq(s: str) -> str:  # DuckDB literal ('' doubling)
        return "'" + s.replace("'", "''") + "'"

    con = duckdb.connect()
    con.execute(
        "CREATE TYPE fz_enum AS ENUM ("
        + ", ".join(dq(m) for m in members)
        + ")"
    )
    compat.ENUM_TYPES.pop("fz_enum", None)
    compat.TYPE_ALIASES.pop("fz_enum", None)
    compat.define_enum_type("fz_enum", members)
    try:
        a = data.draw(st.sampled_from(members))
        b = data.draw(st.sampled_from(members))
        outsider = data.draw(_ENUM_MEMBER.filter(lambda s: s not in members))
        stmts = [
            f"SELECT {dq(a)}::fz_enum AS m",
            f"SELECT TRY_CAST({dq(outsider)} AS fz_enum) AS m",
            f"SELECT {dq(a)}::fz_enum < {dq(b)}::fz_enum AS lt,"
            f" {dq(a)}::fz_enum = {dq(b)}::fz_enum AS eq",
            f"SELECT {dq(a)}::fz_enum < {dq(b)} AS vlt,"
            f" {dq(a)}::fz_enum >= {dq(b)} AS vge",
            "SELECT m FROM ("
            + " UNION ALL ".join(
                f"SELECT {dq(m)}::fz_enum AS m" for m in members
            )
            + ") t ORDER BY m",
            "SELECT min(m) AS lo, max(m) AS hi FROM ("
            + " UNION ALL ".join(
                f"SELECT {dq(m)}::fz_enum AS m" for m in members
            )
            + ") t",
            "SELECT enum_range(NULL::fz_enum) AS r",
            # CAST(...) spellings must hit the same varchar-context /
            # struct decision as :: (advice r9, fixed r10)
            f"SELECT CAST({dq(a)} AS fz_enum) AS m",
            f"SELECT CAST(CAST({dq(a)} AS fz_enum) AS VARCHAR) AS v,"
            f" upper({dq(a)}::fz_enum::VARCHAR) AS u",
            f"SELECT CAST({dq(a)} AS fz_enum) = {dq(b)} AS ve,"
            f" CAST({dq(a)} AS fz_enum) < {dq(b)} AS vl",
            f"SELECT TRY_CAST({dq(outsider)} AS fz_enum) = {dq(b)} AS tn",
        ]
        from duckdb_pgwire_spark.server.typemap import encode_text

        for sql in stmts:
            want = [
                tuple(None if v is None else encode_text(v) for v in row)
                for row in con.execute(sql).fetchall()
            ]
            got_rows = spark.sql(rewrite(sql)).collect()
            got = [
                tuple(
                    None if v is None else encode_text(v) for v in row
                )
                for row in got_rows
            ]
            assert got == want, (sql, got, want)
        # invalid strict cast errors on BOTH engines
        bad = f"SELECT {dq(outsider)}::fz_enum AS m"
        import pytest as _pt

        with _pt.raises(Exception):
            con.execute(bad).fetchall()
        with _pt.raises(Exception):
            spark.sql(rewrite(bad)).collect()
        # r10: enum TABLE-COLUMN contexts — the schema-aware pass
        # (rewrite_enum_table_columns, driven by app._hugeint_sums on
        # the wire) renders the label for casts and compares the label
        # as varchar; exercised here with the resolved column map the
        # app layer would hand it
        union_sql = " UNION ALL ".join(
            f"SELECT {dq(m)}::fz_enum AS m" for m in members
        )
        con.execute(f"CREATE OR REPLACE TABLE fz_t AS {union_sql}")
        spark.sql(rewrite(union_sql)).createOrReplaceTempView("fz_t")
        col_map = {"m": "fz_enum"}
        col_stmts = [
            "SELECT CAST(m AS VARCHAR) AS v FROM fz_t ORDER BY v",
            f"SELECT count(*) AS n FROM fz_t WHERE m = {dq(a)}",
            f"SELECT count(*) AS n FROM fz_t WHERE m <= {dq(b)}",
            f"SELECT count(*) AS n FROM fz_t WHERE {dq(a)} < m",
            f"SELECT count(*) AS n FROM fz_t WHERE m IN ({dq(a)}, {dq(b)})",
            "SELECT m FROM fz_t ORDER BY m",  # decl order, untouched
        ]
        from duckdb_pgwire_spark.server.compat import (
            rewrite_enum_table_columns,
        )

        for sql in col_stmts:
            want = [
                tuple(None if v is None else encode_text(v) for v in row)
                for row in con.execute(sql).fetchall()
            ]
            rewritten = rewrite_enum_table_columns(
                rewrite(sql), col_map, set()
            )
            got = [
                tuple(None if v is None else encode_text(v) for v in row)
                for row in spark.sql(rewritten).collect()
            ]
            assert got == want, (sql, rewritten, got, want)
    finally:
        compat.ENUM_TYPES.pop("fz_enum", None)
        compat.TYPE_ALIASES.pop("fz_enum", None)
        con.close()


# ------------------------------------------------------ WAV codec fuzz

@given(
    data=st.data(),
    sr=st.integers(min_value=1, max_value=192_000),
    nch=st.integers(min_value=1, max_value=3),
)
@settings(max_examples=200, deadline=None)
def test_wav_roundtrip_fuzz(data, sr, nch):
    """Random PCM16 clips round-trip bit-exactly through the WAV codec,
    with random unknown chunks (odd lengths included — word alignment)
    injected before and after fmt/data surviving the chunk walk."""
    import struct

    from duckdb_pgwire_spark.ext.audiocodec import (
        decode_wav,
        encode_wav_pcm16,
    )

    frames = data.draw(st.integers(min_value=0, max_value=64))
    samples = data.draw(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=frames * nch,
            max_size=frames * nch,
        )
    )
    raw = encode_wav_pcm16(sr, samples, n_channels=nch)
    assert len(raw) == 44 + 2 * len(samples)
    au = decode_wav(raw)
    assert (au.sample_rate, au.n_channels, au.samples) == (sr, nch, samples)
    assert au.n_frames == frames

    # inject 0-2 junk chunks between the RIFF header and fmt/data
    body = raw[12:]
    junk = b""
    for _ in range(data.draw(st.integers(min_value=0, max_value=2))):
        payload = data.draw(st.binary(max_size=9))
        junk += (
            data.draw(st.sampled_from([b"LIST", b"fact", b"cue ", b"junk"]))
            + struct.pack("<I", len(payload))
            + payload
            + (b"\x00" if len(payload) % 2 else b"")
        )
    riffed = (
        b"RIFF" + struct.pack("<I", 4 + len(junk) + len(body)) + b"WAVE"
        + junk + body
    )
    assert decode_wav(riffed).samples == samples


# ------------------------------------------- VARCHAR-family + TIME fuzz

_VF_SPELLINGS = [
    "TEXT", "VARCHAR", "CHAR", "BPCHAR", "NVARCHAR", "NCHAR", "STRING",
    "CHARACTER", "CHARACTER VARYING", "CHARACTER  VARYING",
]
_VF_VALUES = st.one_of(
    st.integers(min_value=-10**6, max_value=10**6),
    st.text(
        alphabet="abcXYZ019 _-%", min_size=0, max_size=12
    ).map(lambda s: "'" + s + "'"),
    st.sampled_from(["1.5", "DATE '2024-03-05'", "true", "NULL"]),
)


@given(
    val=_VF_VALUES,
    spelling=st.sampled_from(_VF_SPELLINGS),
    length=st.one_of(st.none(), st.integers(min_value=1, max_value=9)),
    use_colon=st.booleans(),
    lower=st.booleans(),
)
@settings(max_examples=120, deadline=None)
def test_varchar_family_fuzz_matches_duckdb(spark, val, spelling, length, use_colon, lower):
    """Every VARCHAR-alias spelling x optional (n) x ::/CAST x case,
    over random values: DuckDB parses them all as ONE length-less text
    type (any (n) ignored) — the r10 type-position rewrite must agree
    on the VALUE for every combination (a missed spelling either
    errors loudly or, worse, truncates silently)."""
    from duckdb_pgwire_spark.server.compat import rewrite
    from duckdb_pgwire_spark.server.typemap import encode_text

    t = spelling + (f"({length})" if length is not None else "")
    if lower:
        t = t.lower()
    sql = (
        f"SELECT ({val})::{t} AS v"
        if use_colon
        else f"SELECT CAST({val} AS {t}) AS v"
    )
    con = _duckdb.connect()
    try:
        (want,) = con.execute(sql).fetchall()[0]
    finally:
        con.close()
    (got,) = spark.sql(rewrite(sql)).collect()[0]
    wt = None if want is None else encode_text(want)
    gt = None if got is None else encode_text(got)
    assert gt == wt, (sql, rewrite(sql), gt, wt)


@given(
    h=st.integers(min_value=0, max_value=23),
    m=st.integers(min_value=0, max_value=59),
    s=st.integers(min_value=0, max_value=59),
    us=st.integers(min_value=0, max_value=999_999),
)
@settings(max_examples=150, deadline=None)
def test_time_text_render_matches_duckdb(h, m, s, us):
    """encode_text(datetime.time) must render exactly what DuckDB's
    TIME::VARCHAR prints — fractional microseconds with trailing zeros
    trimmed, no fraction dot for whole seconds (r10 TimeType plane)."""
    import datetime as dt

    from duckdb_pgwire_spark.server.typemap import encode_text

    lit = f"{h:02d}:{m:02d}:{s:02d}.{us:06d}"
    con = _duckdb.connect()
    try:
        (want,) = con.execute(
            f"SELECT (TIME '{lit}')::VARCHAR"
        ).fetchall()[0]
    finally:
        con.close()
    assert encode_text(dt.time(h, m, s, us)) == want, (lit, want)


@st.composite
def _recursive_numeric_case(draw):
    # bounded domain (mod m) → the dedup fixpoint ALWAYS terminates,
    # even when the step cycles
    mod = draw(st.integers(min_value=2, max_value=12))
    mult = draw(st.integers(min_value=1, max_value=5))
    add = draw(st.integers(min_value=0, max_value=7))
    start = draw(st.integers(min_value=0, max_value=3))
    pred = draw(st.sampled_from(["", " WHERE n % 2 = 0", " WHERE n < 8"]))
    return (
        f"WITH RECURSIVE t(n) AS (SELECT {start} UNION "
        f"SELECT (n * {mult} + {add}) % {mod} FROM t{pred}) "
        "SELECT * FROM t ORDER BY n"
    )


@st.composite
def _recursive_reach_case(draw):
    # random small digraph (cycles allowed): transitive closure over
    # ≤ 6 nodes is ≤ 36 pairs, so the fixpoint terminates
    n_edges = draw(st.integers(min_value=1, max_value=8))
    edges = [
        (
            draw(st.integers(min_value=0, max_value=5)),
            draw(st.integers(min_value=0, max_value=5)),
        )
        for _ in range(n_edges)
    ]
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    return (
        f"WITH RECURSIVE r(s, d) AS (SELECT * FROM (VALUES {vals}) e(a, b)"
        f" UNION SELECT r.s, e.b FROM r"
        f" JOIN (VALUES {vals}) e(a, b) ON r.d = e.a)"
        " SELECT * FROM r ORDER BY s, d"
    )


@given(q=st.one_of(_recursive_numeric_case(), _recursive_reach_case()))
@settings(max_examples=15, deadline=None)
def test_recursive_union_fixpoint_matches_duckdb(spark, q):
    """The server-side semi-naive UNION fixpoint must produce DuckDB's
    exact row set on randomized cyclic numeric recursions and random
    digraph transitive closures (the working-table semantics, global
    dedup, and termination rule all have to agree)."""
    import duckdb

    from duckdb_pgwire_spark.server.app import _recursive_union_df

    want = sorted(tuple(r) for r in duckdb.connect().execute(q).fetchall())
    df = _recursive_union_df(spark, q)
    assert df is not None, q
    got = sorted(tuple(r) for r in df.collect())
    assert got == want, (q, got, want)


# ---------------------------------------------------------- r11 nets


@st.composite
def _strptime_case(draw):
    # random %-format + a matching input string rendered by Python's
    # strftime (C semantics, same as DuckDB's). Year directive present,
    # two-digit, or absent — exercising the 1900 default and the
    # 69-99 → 19xx pivot the r11 rewrite pins.
    import datetime as dtm

    year_kind = draw(st.sampled_from(["%Y", "%y", None]))
    # %j is excluded: DuckDB 1.0 IGNORES day-of-year when a year
    # directive is also present (returns Jan 1) — a duck quirk we
    # don't emulate (NOTES.md r11 knowns)
    date_part = draw(st.sampled_from(["%m-%d", "%d/%m", "%m"]))
    time_part = draw(st.sampled_from([None, "%H:%M", "%H:%M:%S", "%I %p"]))
    parts = [p for p in (year_kind, date_part, time_part) if p]
    fmt = " ".join(parts)
    dt = dtm.datetime(
        draw(st.integers(min_value=1969, max_value=2068)),
        draw(st.integers(min_value=1, max_value=12)),
        draw(st.integers(min_value=1, max_value=28)),
        draw(st.integers(min_value=1, max_value=11)),  # %I needs 1-12
        draw(st.integers(min_value=0, max_value=59)),
        draw(st.integers(min_value=0, max_value=59)),
    )
    return fmt, dt.strftime(fmt)


@given(case=_strptime_case())
@settings(max_examples=40, deadline=None)
def test_strptime_year_defaults_match_duckdb(spark, case):
    """strptime over random partial formats must land on DuckDB's
    exact timestamp — the 1900 no-year default and the C two-digit
    pivot are silent 70/100-year shifts if missed."""
    import duckdb

    fmt, val = case
    sql = f"SELECT strptime('{val}', '{fmt}') AS v"
    want = duckdb.connect().execute(sql).fetchall()[0][0]
    got = spark.sql(rewrite(sql)).collect()[0][0]
    assert got == want, (fmt, val, rewrite(sql), got, want)


@st.composite
def _composite_value(draw, depth=0):
    # duck-spelled composite literal with NULL-able leaves
    leaf = st.sampled_from(["NULL", "1", "2"])
    if depth >= 2:
        return draw(leaf)
    kind = draw(st.sampled_from(["leaf", "row", "list"]))
    if kind == "leaf":
        return draw(leaf)
    n = draw(st.integers(min_value=1, max_value=3))
    elems = [draw(_composite_value(depth + 1)) for _ in range(n)]
    if kind == "row" and n >= 2:
        return "(" + ", ".join(elems) + ")"
    return "[" + ", ".join(elems) + "]"


@st.composite
def _composite_eq_case(draw):
    a = draw(_composite_value())
    # bias toward same-shape pairs (mutate a leaf) so TRUE/NULL/FALSE
    # all occur; occasionally draw an independent b
    if draw(st.booleans()):
        b = a.replace("1", draw(st.sampled_from(["1", "2", "NULL"])), 1)
    else:
        b = draw(_composite_value())
    op = draw(st.sampled_from(["=", "<>"]))
    return f"{a} {op} {b}"


@st.composite
def _composite_ord_case(draw):
    a = draw(_composite_value())
    if draw(st.booleans()):
        b = a.replace("1", draw(st.sampled_from(["1", "2", "NULL"])), 1)
    else:
        b = draw(_composite_value())
    op = draw(st.sampled_from(["<", "<=", ">", ">="]))
    return a, op, b


@given(case=_composite_ord_case())
@settings(max_examples=60, deadline=None)
def test_composite_ord_matches_duckdb(spark, case):
    """Random nested row/list literals with NULL leaves through the
    ordering ops, in BOTH position classes: the value position must
    reproduce DuckDB's lexicographic 3VL, the CASE-WHEN slot its
    NULLs-greatest 2VL total order (r12 ordering closure)."""
    import duckdb

    a, op, b = case
    for sql in (
        f"SELECT {a} {op} {b} AS v",
        f"SELECT CASE WHEN {a} {op} {b} THEN 1 ELSE 0 END AS v",
    ):
        try:
            want = duckdb.connect().execute(sql).fetchall()[0][0]
        except Exception:
            continue  # duck rejects the shape pair — no oracle
        got = spark.sql(rewrite(sql)).collect()[0][0]
        assert got == want, (sql, rewrite(sql), got, want)


@given(expr=_composite_eq_case())
@settings(max_examples=60, deadline=None)
def test_composite_eq_3vl_matches_duckdb(spark, expr):
    """Random nested row/list literals with NULL leaves: =/<> must
    reproduce DuckDB's three-valued result (or error on both engines
    when the shapes don't unify)."""
    import duckdb

    sql = f"SELECT {expr} AS v"
    try:
        want = duckdb.connect().execute(sql).fetchall()[0][0]
    except Exception:
        return  # duck rejects the shape pair; Spark may too — no oracle
    got = spark.sql(rewrite(sql)).collect()[0][0]
    assert got == want, (expr, rewrite(sql), got, want)


_CASE_ALPHABET = (
    "abcXYZ ß ẞ İ ı Σ σ ς é É ﬁ ﬂ ﬀ ŉ ǰ ẚ և ᾀ ᾈ ᾳ ῼ ΐ ΰ straße ΟΣ"
).replace(" ", "")


@given(
    s=st.text(alphabet=_CASE_ALPHABET, min_size=0, max_size=12),
    fn=st.sampled_from(["upper", "lower"]),
)
@settings(max_examples=60, deadline=None)
def test_case_mapping_fuzz_matches_duckdb(spark, s, fn):
    """Random strings over the special-casing alphabet: upper/lower
    through the translate sandwich must equal DuckDB's simple-mapping
    answer exactly (ß/ligatures/iota-subscripts/final-sigma/İ are the
    chars where Java's full mapping silently diverges)."""
    import duckdb

    from duckdb_pgwire_spark.functions.udfs import register_udfs

    register_udfs(spark)  # r12: the PUA guard can route to a UDF
    lit = s.replace("'", "''")
    sql = f"SELECT {fn}('{lit}') AS v"
    want = duckdb.connect().execute(sql).fetchone()[0]
    got = spark.sql(rewrite(sql)).collect()[0][0]
    assert got == want, (s, fn, rewrite(sql), got, want)


@st.composite
def _decimal_div_case(draw):
    def dec_lit():
        whole = draw(st.integers(min_value=-999, max_value=999))
        frac = draw(st.integers(min_value=0, max_value=9999))
        return f"{whole}.{frac}"

    lhs = dec_lit()
    rhs = draw(st.sampled_from([dec_lit(), str(draw(st.integers(1, 9)))]))
    op = draw(st.sampled_from(["/", "//", "%"]))
    return f"{lhs} {op} {rhs}"


@given(expr=_decimal_div_case())
@settings(max_examples=60, deadline=None)
def test_decimal_div_fuzz_matches_duckdb(spark, expr):
    """Random decimal-literal /, //, % expressions: the duck-double
    division rule must hold to float-repr precision (duck divides as
    DOUBLE; Spark's native DECIMAL scale rules print different
    digits)."""
    import duckdb
    import math

    sql = f"SELECT {expr} AS v"
    try:
        want = duckdb.connect().execute(sql).fetchone()[0]
    except Exception:
        return  # duck rejects (e.g. % by zero handled as NULL, fine)
    got = spark.sql(rewrite(sql)).collect()[0][0]
    if want is None or got is None:
        assert got == want, (expr, got, want)
        return
    wf, gf = float(want), float(got)
    if math.isnan(wf) or math.isnan(gf):
        assert math.isnan(wf) and math.isnan(gf), (expr, got, want)
        return
    assert repr(gf) == repr(wf) or abs(gf - wf) <= 1e-12 * max(
        1.0, abs(wf)
    ), (expr, rewrite(sql), got, want)
