#!/usr/bin/env python
"""FLOAT×INT comparison-position parity net (r16, VERDICT item 1):
DuckDB evaluates FLOAT arithmetic in float32 and compares a FLOAT
side against int/decimal/string sides in FLOAT; Spark widens to
DOUBLE. The census arm pins the judge's requested family (f32 column
× int/decimal literal × {> >= < <= = <> BETWEEN IN} at boundary
values); the fuzz arm generates random f32 arithmetic chains with
ADVERSARIAL thresholds (each row's exact duck-f32 result value as a
decimal literal — rows sit exactly ON the comparison boundary, where
the f64-vs-f32 membership divergence is maximal).

Usage:  python scripts/fuzz_f32_cmp.py [N_TRIALS] [SEED]
Exit 0 = every census probe and fuzz trial row-set-matched DuckDB.
"""

from __future__ import annotations

import random
import sys
import tempfile
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from duckdb_pgwire_spark.functions.udfs import register_udfs  # noqa: E402
from duckdb_pgwire_spark.server.compat import rewrite  # noqa: E402

# boundary-rich float32 payloads: values whose f32 arithmetic rounds
# away from the f64 result (0.1, 0.3, 1/3…), the 2^24 integer-exactness
# edge, subnormals-adjacent tiny values, sign edges, NULL
F_VALUES = [
    "0.1", "0.3", "0.15", "0.2", "0.7", "1.0", "-0.1", "-0.3",
    "0.333333333333333", "16777216", "16777215", "1e-30",
    "123456.789", "-2.5", "0.0", "NULL",
]
I_VALUES = ["1", "2", "3", "-5", "16777217", "100000000", "0", "NULL"]
N_VALUES = ["0.3000", "0.6000", "1.2345", "-0.1000", "33554434.0000",
            "0.0000", "2.5000", "NULL"]

CENSUS = [
    # bare column vs decimal/int/string literal — every op
    "SELECT id FROM f32t WHERE f > 0.3",
    "SELECT id FROM f32t WHERE f >= 0.3",
    "SELECT id FROM f32t WHERE f < 0.3",
    "SELECT id FROM f32t WHERE f <= 0.3",
    "SELECT id FROM f32t WHERE f = 0.3",
    "SELECT id FROM f32t WHERE f <> 0.3",
    "SELECT id FROM f32t WHERE f = 0.1",
    "SELECT id FROM f32t WHERE f = '0.3'",
    "SELECT id FROM f32t WHERE f = 16777217",
    "SELECT id FROM f32t WHERE f > 16777215.5",
    # arithmetic × int literal — the VERDICT's named family
    "SELECT id FROM f32t WHERE f * 2 > 0.6",
    "SELECT id FROM f32t WHERE f * 2 >= 0.6",
    "SELECT id FROM f32t WHERE f * 2 < 0.6",
    "SELECT id FROM f32t WHERE f * 2 <= 0.6",
    "SELECT id FROM f32t WHERE f * 2 = 0.6",
    "SELECT id FROM f32t WHERE f * 3 = 0.3",
    "SELECT id FROM f32t WHERE f + 1 > 1.1",
    "SELECT id FROM f32t WHERE f - 1 < -0.9",
    "SELECT id FROM f32t WHERE f / 2 >= 0.05",
    "SELECT id FROM f32t WHERE f % 2 = 0.1",
    "SELECT id FROM f32t WHERE 2 * f + 1 > 1.2",
    "SELECT id FROM f32t WHERE -f * 2 < -0.6",
    # decimal-literal operand keeps FLOAT in duck
    "SELECT id FROM f32t WHERE f * 3.0 = 0.3",
    "SELECT id FROM f32t WHERE f * 1.5 > 0.15",
    # column × column promotions
    "SELECT id FROM f32t WHERE f = n",
    "SELECT id FROM f32t WHERE f > n",
    "SELECT id FROM f32t WHERE f = i",
    "SELECT id FROM f32t WHERE f * 2 > i",
    "SELECT id FROM f32t WHERE f = g",
    "SELECT id FROM f32t WHERE f * 2 = g * 2",
    # DOUBLE side keeps the comparison in f64 (native must match)
    "SELECT id FROM f32t WHERE f > d",
    "SELECT id FROM f32t WHERE f * 2 > d",
    # BETWEEN (single common type across all three operands)
    "SELECT id FROM f32t WHERE f BETWEEN 0.1 AND 0.3",
    "SELECT id FROM f32t WHERE f * 2 BETWEEN 0.2 AND 0.6",
    "SELECT id FROM f32t WHERE f NOT BETWEEN 0.1 AND 0.3",
    "SELECT id FROM f32t WHERE f BETWEEN 0.1 AND d",
    "SELECT id FROM f32t WHERE f BETWEEN i AND 16777217",
    # IN lists
    "SELECT id FROM f32t WHERE f IN (0.1, 0.3, 2.5)",
    "SELECT id FROM f32t WHERE f NOT IN (0.1, 0.3)",
    "SELECT id FROM f32t WHERE f * 2 IN (0.2, 0.6)",
    "SELECT id FROM f32t WHERE f IN (0.1, d)",
    # int/int division contaminates to DOUBLE (native must match)
    "SELECT id FROM f32t WHERE f * (1 / 2) > 0.04",
    # HAVING / CASE / join-free select positions
    "SELECT count(*) AS c FROM f32t GROUP BY i HAVING max(f) * 2 > 0.6",
    "SELECT id, CASE WHEN f * 2 > 0.6 THEN 1 ELSE 0 END AS flag"
    " FROM f32t",
    # type-blind cast-unit leg (no schema needed)
    "SELECT 0.3::FLOAT = 0.3 AS a",
    "SELECT 0.1::FLOAT * 3 > 0.3 AS a",
    "SELECT 16777217 = 16777216::FLOAT AS a",
    "SELECT 0.1::FLOAT * 3 BETWEEN 0.3 AND 0.3 AS a",
    # aliased select items send duck's FLOAT value (r16)
    "SELECT id, f * 2 AS v FROM f32t",
    # unaliased items narrow too when the auto-name is engine-shared
    "SELECT id, f * 2 FROM f32t",
    "SELECT id, f * 3.0 - 1 FROM f32t",
    "SELECT id, f * 3.0 - 1 AS v FROM f32t",
    "SELECT max(f) * 2 AS v FROM f32t",
    "SELECT v FROM (SELECT id, f * 2 AS v FROM f32t) q WHERE v > 0.6",
    # aggregate/function pass-through typing
    "SELECT id FROM f32t WHERE abs(f) * 3 = 0.3",
    "SELECT id FROM f32t WHERE coalesce(f, g) * 2 > 0.6",
    "SELECT min(f) * 2 AS v FROM f32t WHERE f > 0",
    # ---- r17 function tier (VERDICT item 2): round/trunc/ceil/floor
    # keep FLOAT in duck; signed zero and the 2^24 edge are the traps
    "SELECT id FROM f32t WHERE round(f, 1) > 0.2",
    "SELECT id FROM f32t WHERE round(f * 2, 1) = 0.2",
    "SELECT id FROM f32t WHERE round(f) = 0",
    "SELECT id FROM f32t WHERE round(f, -2) = 16777200",
    "SELECT id FROM f32t WHERE ceil(f) = 1",
    "SELECT id FROM f32t WHERE floor(f * 2) <= 0",
    "SELECT id FROM f32t WHERE trunc(f) = 0",
    "SELECT id, round(f * 3, 2) AS v FROM f32t",
    "SELECT id, round(f, 1) AS v FROM f32t",
    "SELECT id, trunc(f) AS v FROM f32t",
    "SELECT id, ceil(f * 2) AS v FROM f32t",
    "SELECT id, floor(f) AS v FROM f32t",
    "SELECT id FROM f32t WHERE abs(round(f, 1) * 2 - 0.4) < 0.01",
    # greatest/least widen to DOUBLE in duck whenever a FLOAT operand
    # is present (f32 arithmetic inside operands still narrows first)
    "SELECT id FROM f32t WHERE greatest(f, 0.3) > 0.3",
    "SELECT id FROM f32t WHERE least(f * 2, g) < 0.6",
    "SELECT id, greatest(f, i) AS v FROM f32t",
    "SELECT id, least(f, 0.3, f * 3) AS v FROM f32t",
    "SELECT id, greatest(f * 2, g) AS v FROM f32t",
    # window value functions keep the argument's FLOAT; the lag/lead
    # DEFAULT casts to the value type (f32-narrowed)
    "SELECT id, lag(f) OVER (ORDER BY id) AS v FROM f32t",
    "SELECT id, lag(f * 2, 1, 0.123) OVER (ORDER BY id) AS v FROM f32t",
    "SELECT id, lead(f, 2, f) OVER (ORDER BY id) AS v FROM f32t",
    "SELECT id, lead(f * 3, 1) OVER (ORDER BY id) AS v FROM f32t",
    "SELECT id, nth_value(f * 2, 3) OVER"
    " (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND"
    " UNBOUNDED FOLLOWING) AS v FROM f32t",
    "SELECT id, first_value(f * 3) OVER (ORDER BY id) AS v FROM f32t",
    "SELECT id, last_value(f) OVER (ORDER BY id) AS v FROM f32t",
    "SELECT v FROM (SELECT id, round(f * 2, 1) AS v FROM f32t) q"
    " WHERE v > 0.2",
    # HAVING-position composition over the r17 tier
    "SELECT i, count(*) AS c FROM f32t GROUP BY i"
    " HAVING round(max(f), 1) > 0.2",
    "SELECT i, count(*) AS c FROM f32t GROUP BY i"
    " HAVING greatest(max(f) * 2, 0.3) > 0.5",
    "SELECT i, trunc(max(f) * 3) AS v FROM f32t GROUP BY i",
    # unary-sign right operands must pass the item gate (r17 review)
    "SELECT id, f * -2.5 AS v FROM f32t",
    "SELECT id, f * - 3.0 AS v FROM f32t",
    "SELECT id FROM f32t WHERE f - -g > 0.2",
    # window PARTITION BY keys narrow: mirrored in grouped scopes,
    # directly when ungrouped (r17 review — the grouped form raised
    # MISSING_AGGREGATION half-narrowed)
    "SELECT f * 2 AS v, sum(count(*)) OVER (PARTITION BY f * 2) AS s"
    " FROM f32t GROUP BY f * 2",
    "SELECT id, count(*) OVER (PARTITION BY f * 2) AS c FROM f32t",
    "SELECT id, count(*) OVER (PARTITION BY trunc(f * 3)"
    " ORDER BY id) AS c FROM f32t",
    # DISTINCT aggregates form their distinct set over f32 values
    "SELECT sum(DISTINCT f * 3) AS s FROM f32t",
    "SELECT avg(DISTINCT f * 2) AS a FROM f32t",
    "SELECT count(DISTINCT f * 3) AS c FROM f32t",
    "SELECT count(DISTINCT f / 3.0) AS c FROM f32t",
    "SELECT i, count(DISTINCT f * 3) AS c FROM f32t GROUP BY i",
    # stat aggregates: DOUBLE result over f32-narrowed args. `* 3`
    # separates (f32 product differs at ~1e-8 relative); round(…, 9)
    # hides only accumulation-order ulps (~1e-15) on the small-f
    # subset, so a missed narrowing still fails
    "SELECT round(stddev(f * 3), 9) AS s FROM f32t WHERE abs(f) < 2",
    "SELECT round(var_pop(f * 3), 9) AS s FROM f32t WHERE abs(f) < 2",
    "SELECT round(var_samp(f * 3), 9) AS s FROM f32t WHERE abs(f) < 2",
    "SELECT round(covar_samp(f * 3, g), 9) AS s FROM f32t"
    " WHERE abs(f) < 2 AND abs(g) < 2",
    "SELECT round(covar_pop(g, f * 3), 9) AS s FROM f32t"
    " WHERE abs(f) < 2 AND abs(g) < 2",
    "SELECT round(stddev_pop(f * 3), 9) AS s FROM f32t WHERE abs(f) < 2",
    # collection aggregates carry f32 ELEMENT values (opaque result:
    # arg narrows, the node never joins arithmetic/comparisons)
    "SELECT array_agg(f * 3) AS a FROM (SELECT f FROM f32t"
    " WHERE f IS NOT NULL ORDER BY id LIMIT 4) q",
    "SELECT i, array_agg(f * 3) AS a FROM (SELECT * FROM f32t"
    " WHERE f IS NOT NULL ORDER BY id LIMIT 6) q GROUP BY i ORDER BY i",
    # string_agg renders duck's float text over the f32-narrowed arg
    "SELECT string_agg(f, ',' ORDER BY id) AS s FROM f32t",
    "SELECT string_agg(f * 3, ',' ORDER BY id) AS s FROM f32t",
    "SELECT string_agg(d, '|' ORDER BY id) AS s FROM f32t",
]


def canon(rows):
    out = []
    for r in rows:
        out.append(tuple("NULL" if v is None else str(v) for v in r))
    return sorted(out)


def spark_run(spark, sql):
    from duckdb_pgwire_spark.server.app import _hugeint_sums

    return spark.sql(_hugeint_sums(spark, rewrite(sql))).collect()


def setup(spark, con):
    con.execute(
        "CREATE TABLE f32t(id INT, f FLOAT, g FLOAT, i INT,"
        " n DECIMAL(18,4), d DOUBLE)"
    )
    loc = tempfile.mkdtemp(prefix="fuzz_f32_")
    spark.sql("DROP TABLE IF EXISTS f32t")
    spark.sql(
        "CREATE TABLE f32t(id INT, f FLOAT, g FLOAT, i INT,"
        " n DECIMAL(18,4), d DOUBLE)"
        f" USING parquet LOCATION '{loc}/f32t'"
    )
    rows = []
    for k in range(len(F_VALUES)):
        f = F_VALUES[k]
        g = F_VALUES[(k * 7 + 3) % len(F_VALUES)]
        i = I_VALUES[k % len(I_VALUES)]
        n = N_VALUES[k % len(N_VALUES)]
        d = F_VALUES[(k * 5 + 1) % len(F_VALUES)]
        fv = "NULL" if f == "NULL" else f"CAST({f} AS FLOAT)"
        gv = "NULL" if g == "NULL" else f"CAST({g} AS FLOAT)"
        dv = "NULL" if d == "NULL" else f"CAST({d} AS DOUBLE)"
        rows.append(f"({k}, {fv}, {gv}, {i}, {n}, {dv})")
    stmt = "INSERT INTO f32t VALUES " + ", ".join(rows)
    con.execute(stmt)
    spark.sql(rewrite(stmt))


ARITH_TEMPLATES = [
    "f * {k}", "f + {k}", "f - {k}", "{k} * f", "f / {k}",
    "f % {k}", "f * {k} + {j}", "f * {k} - {j}", "(f + {j}) * {k}",
    "-f * {k}", "f * g", "f + g * {k}", "f * {k} / {j}",
    # r17 function tier: round/trunc/ceil/floor nodes inside chains,
    # greatest/least widening, window-free scalar shapes only (the
    # window functions get their own select-item arm in gen_trial)
    "round(f * {k}, 1)", "round(f, 2) * {k}", "trunc(f * {k})",
    "ceil(f) * {k}", "floor(f * {k}) + {j}", "round(f * {k})",
    "greatest(f * {k}, g)", "least(f, g * {k})",
    "greatest(f, {j}) * {k}",
]
CMP_OPS = ["<", "<=", ">", ">=", "=", "<>"]


def gen_trial(rng, con):
    t = rng.choice(ARITH_TEMPLATES)
    k = rng.choice(["2", "3", "7", "10", "1.5", "0.5", "100", "3.0"])
    j = rng.choice(["1", "2", "0.1", "5"])
    expr = t.format(k=k, j=j)
    op = rng.choice(CMP_OPS)
    # adversarial threshold: one row's exact duck-f32 value of expr,
    # rendered as a full-precision decimal literal → boundary case
    vals = [
        r[0]
        for r in con.execute(
            f"SELECT CAST({expr} AS DOUBLE) FROM f32t"
        ).fetchall()
        if r[0] is not None
    ]
    if vals and rng.random() < 0.8:
        thr = repr(rng.choice(vals))
        if "e" in thr or "E" in thr or "inf" in thr or "nan" in thr:
            thr = rng.choice(["0.3", "0.6", "1"])
    else:
        thr = rng.choice(["0.3", "0.6", "1", "16777217", "0.20000000298"])
    shape = rng.random()
    if shape < 0.08:
        # r17: window value functions in select-item position — the
        # only position they can appear; default arg narrows to f32
        wfn = rng.choice([
            f"lag({expr}) OVER (ORDER BY id)",
            f"lag({expr}, 1, {rng.choice(['0.123', '0.3', 'g'])})"
            " OVER (ORDER BY id)",
            f"lead({expr}, 2) OVER (ORDER BY id)",
            f"first_value({expr}) OVER (ORDER BY id)",
            f"nth_value({expr}, 2) OVER (ORDER BY id ROWS BETWEEN"
            " UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)",
        ])
        return f"SELECT id, {wfn} AS v FROM f32t"
    if shape < 0.12:
        lo, hi = sorted([thr, rng.choice(["0.3", "1", "2.5"])])
        return f"SELECT id FROM f32t WHERE {expr} BETWEEN {lo} AND {hi}"
    if shape < 0.2:
        other = rng.choice(["0.3", "1", "16777217"])
        return f"SELECT id FROM f32t WHERE {expr} IN ({thr}, {other})"
    if shape < 0.28:
        return f"SELECT id, {expr} AS v FROM f32t"
    if shape < 0.64:
        return f"SELECT id FROM f32t WHERE {expr} {op} {thr}"
    return f"SELECT id FROM f32t WHERE {thr} {op} {expr}"


def main() -> int:
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rng = random.Random(seed)

    from duckdb_pgwire_spark.session import build_session

    spark = build_session()
    register_udfs(spark)
    con = duckdb.connect()
    setup(spark, con)

    failures = 0
    ran = 0
    for sql in CENSUS:
        ran += 1
        try:
            want = canon(con.execute(sql).fetchall())
        except Exception as e:  # noqa: BLE001
            want = ("ERR", type(e).__name__)
        try:
            got = canon(spark_run(spark, sql))
        except Exception as e:  # noqa: BLE001
            got = ("ERR", type(e).__name__)
        if isinstance(want, tuple) != isinstance(got, tuple) or (
            not isinstance(want, tuple) and want != got
        ):
            failures += 1
            print(f"CENSUS MISMATCH: {sql}\n  duck={want}\n  spark={got}")
    for t in range(n_trials):
        sql = gen_trial(rng, con)
        ran += 1
        try:
            want = canon(con.execute(sql).fetchall())
        except Exception as e:  # noqa: BLE001
            want = ("ERR", type(e).__name__)
        try:
            got = canon(spark_run(spark, sql))
        except Exception as e:  # noqa: BLE001
            got = ("ERR", type(e).__name__)
        if isinstance(want, tuple) != isinstance(got, tuple) or (
            not isinstance(want, tuple) and want != got
        ):
            failures += 1
            print(f"FUZZ MISMATCH [{t}]: {sql}\n  duck={want}\n  spark={got}")
    print(f"{ran} probes, {failures} mismatches")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
