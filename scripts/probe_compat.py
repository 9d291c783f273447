#!/usr/bin/env python
"""Dialect-gap probe: run a battery of DuckDB idioms through the wire
server AND through DuckDB, report statements where the wire errors but
DuckDB succeeds (gap), or where values diverge (mismatch).

Usage:  python scripts/probe_compat.py [category ...]

Advisory tool — findings feed new shims/tests; not part of the suite.
"""

from __future__ import annotations

import asyncio
import sys
import threading
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from duckdb_pgwire_spark.functions.udfs import register_udfs  # noqa: E402
from duckdb_pgwire_spark.server.app import PgWireServer  # noqa: E402
from duckdb_pgwire_spark.session import (  # noqa: E402
    TABLES,
    build_session,
    register_views,
    table_path,
)

SF_DIR = "/root/testdata/sf0.01"

# CSV fixture for the bare-path/read_csv sniffing cases (r8): written
# at import so the battery strings can embed the path
_CSV_FIXTURE = "/tmp/__probe_fixture.csv"
with open(_CSV_FIXTURE, "w") as _f:
    _f.write("a,b,c\n1,2,x\n3,4,y\n5,6,z\n")

# ---------------------------------------------------------------- battery

BATTERY: dict[str, list[str]] = {
    "select_misc": [
        # r7: DuckDB's bare-path relation + UNION-type surface
        f"SELECT count(*) AS n FROM '{SF_DIR}/region.parquet'",
        # r8: bare-path CSV relations sniff like DuckDB
        f"SELECT * FROM '{_CSV_FIXTURE}' ORDER BY a",
        f"SELECT sum(b) AS s FROM read_csv_auto('{_CSV_FIXTURE}')",
        f"SELECT c FROM read_csv('{_CSV_FIXTURE}', header=true, "
        "delim=',') ORDER BY c",
        # r10: widened read_csv named-option surface
        f"SELECT * FROM read_csv('{_CSV_FIXTURE}', all_varchar=true)"
        " ORDER BY a",
        f"SELECT * FROM read_csv('{_CSV_FIXTURE}',"
        " names=['p', 'q']) ORDER BY p",
        f"SELECT * FROM read_csv('{_CSV_FIXTURE}', columns="
        "{'p': 'BIGINT', 'q': 'DOUBLE', 'r': 'VARCHAR'}) ORDER BY p",
        f"SELECT * FROM read_csv('{_CSV_FIXTURE}', nullstr='x')"
        " ORDER BY a",
        # r10: unary list-aggregate spellings + index lambdas
        "SELECT list_median([1, NULL, 3]) AS md, list_mode([2, 1]) AS mo,"
        " list_histogram([2, 1, 1]) AS lh",
        "SELECT list_transform([10, 20], (x, i) -> i) AS ti,"
        " list_filter([10, 20, 30], (x, i) -> i % 2 = 1) AS fi",
        "SELECT array_pop_back([1, 2, 3]) AS pb,"
        " list_element([1, 2], -1) AS le,"
        " list_slice([1, 2, 3, 4, 5], 2, 4, 2) AS ls",
        "SELECT strftime(DATE '2024-12-31', '%G-W%V-%u') AS iso",
        # r10: recursive UNION (dedup fixpoint) — server-side
        # semi-naive evaluation; UNION ALL recursion is Spark-native
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION SELECT (n % 3) + 1"
        " FROM t) SELECT * FROM t ORDER BY n",
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1"
        " FROM t WHERE n < 5) SELECT sum(n) AS s FROM t",
        "SELECT union_tag(union_value(num := 2)) AS t,"
        " union_extract(union_value(num := 2), 'num') AS v",
        "SELECT 1_000_000 AS n",
        "SELECT 0x10 AS h",
        "SELECT 1e3 AS e",
        "SELECT 'Inf'::DOUBLE AS inf",
        "SELECT '-inf'::DOUBLE AS ninf",
        "SELECT 'nan'::DOUBLE AS nan",
        "SELECT 3 // 2 AS idiv",
        "SELECT 2 ** 10 AS p",
        "SELECT 5 % 3 AS m",
        "SELECT -7 // 2 AS negidiv",
        "SELECT 10 & 6 AS band, 10 | 6 AS bor, xor(10, 6) AS bxor",
        "SELECT 1 << 4 AS shl, 256 >> 4 AS shr",
        "SELECT ~5 AS bnot",
        "SELECT @-4 AS absop",
        "SELECT 4! AS fact",
        "SELECT TRUE AND NULL AS a, FALSE OR NULL AS b",
        "SELECT 1 BETWEEN 0 AND 2 AS bt",
        "SELECT NULLIF(1, 1) AS n1, NULLIF(2, 1) AS n2",
        "SELECT IFNULL(NULL, 9) AS c1",
        "SELECT IF(1 < 2, 'y', 'n') AS i",
        "SELECT CASE 2 WHEN 1 THEN 'a' WHEN 2 THEN 'b' END AS c",
        "SELECT DISTINCT ON (r_regionkey % 2) r_regionkey FROM region ORDER BY r_regionkey % 2, r_regionkey",
    ],
    "order_group": [
        # late-r10: DuckDB's DEFAULT null order is nulls_last in both
        # directions; Spark's ASC default was NULLS FIRST (the census
        # had never ordered by a nullable key)
        "SELECT c FROM (VALUES (1), (NULL), (2)) t(c) ORDER BY c",
        "SELECT c FROM (VALUES (1), (NULL), (2)) t(c) ORDER BY c DESC",
        "SELECT nullif(n_regionkey, 2) AS g, count(*) AS c FROM nation"
        " GROUP BY g ORDER BY g",
        "SELECT n_name, rank() OVER (ORDER BY nullif(n_regionkey, 2))"
        " AS rn FROM nation ORDER BY n_name LIMIT 5",
        "SELECT r_regionkey % 2 AS par, count(*) AS c FROM region GROUP BY ALL ORDER BY ALL",
        "SELECT n_regionkey, count(*) AS c FROM nation GROUP BY 1 ORDER BY 1",
        "SELECT n_regionkey FROM nation ORDER BY ALL LIMIT 3",
        "SELECT n_name FROM nation ORDER BY n_name DESC NULLS LAST LIMIT 2",
        "SELECT r_regionkey FROM region ORDER BY 1 LIMIT 10% ",
        "SELECT r_regionkey FROM region ORDER BY 1 OFFSET 3",
        "SELECT count(*) FILTER (r_regionkey > 1) AS c FROM region",
        "SELECT grouping(n_regionkey) AS g, n_regionkey, count(*) AS c FROM nation GROUP BY ROLLUP(n_regionkey) ORDER BY g, n_regionkey NULLS LAST LIMIT 4",
    ],
    "strings": [
        "SELECT format('{} x {}', 1, 'a') AS f",
        "SELECT printf('%d-%s', 7, 'z') AS p",
        "SELECT repeat('ab', 3) AS r",
        "SELECT reverse('abc') AS v",
        "SELECT md5('abc') AS h",
        "SELECT levenshtein('kitten', 'sitting') AS l",
        "SELECT jaccard('duck', 'luck') AS j",
        "SELECT jaro_winkler_similarity('duck', 'duckdb') AS jw",
        "SELECT hamming('abc', 'abd') AS hd",
        "SELECT regexp_matches('hello', 'l+') AS m",
        "SELECT regexp_replace('aaa', 'a', 'b', 'g') AS g",
        "SELECT regexp_extract('abc123', '([a-z]+)(\\d+)', 2) AS e",
        "SELECT regexp_extract_all('a1b2', '\\d') AS ea",
        "SELECT regexp_split_to_array('a,b;c', '[,;]') AS sp",
        "SELECT string_split('a,b,c', ',') AS ss",
        "SELECT str_split_regex('a1b2c', '\\d') AS sr",
        "SELECT split_part('a|b|c', '|', 2) AS s2",
        "SELECT starts_with('abcdef', 'abc') AS sw, ends_with('abcdef', 'def') AS ew",
        "SELECT prefix('abcdef', 'abc') AS p, suffix('abcdef', 'def') AS s",
        "SELECT contains('abcdef', 'cd') AS c",
        "SELECT position('b' IN 'abc') AS pos",
        "SELECT strpos('hello', 'll') AS sp2",
        "SELECT instr('hello', 'll') AS ins",
        "SELECT left('abcdef', 2) AS l, right('abcdef', 2) AS r",
        "SELECT lpad('7', 3, '0') AS lp, rpad('7', 3, '0') AS rp",
        "SELECT ltrim('  x  ') AS lt, rtrim('  x  ') AS rt, trim('  x  ') AS t",
        "SELECT ltrim('xxaxx', 'x') AS lt2, rtrim('xxaxx', 'x') AS rt2, trim('xxaxx', 'x') AS t2",
        "SELECT ascii('A') AS a, chr(66) AS b",
        "SELECT unicode('€') AS u",
        "SELECT strip_accents('café') AS sa",
        "SELECT translate('abc', 'ab', 'xy') AS tr",
        "SELECT replace('aaa', 'a', 'b') AS rp2",
        "SELECT substring('abcdef', 2, 3) AS s1, substr('abcdef', 2, 3) AS s3",
        "SELECT substring('abcdef' FROM 2 FOR 3) AS s4",
        "SELECT 'abc' LIKE 'a%' AS lk, 'abc' ILIKE 'A%' AS il",
        "SELECT 'abc' SIMILAR TO 'a.c' AS st",
        "SELECT 'abc' GLOB 'a*' AS gl",
        "SELECT 'abc' ~ 'a.c' AS rx, 'abc' !~ 'xyz' AS nrx",
        "SELECT 'a_c' LIKE 'a$_c' ESCAPE '$' AS esc",
        "SELECT concat_ws('-', 'a', NULL, 'b') AS cw",
        "SELECT 'a' || 'b' || 'c' AS cat",
        "SELECT upper('a') AS u2, lower('A') AS l2, initcap('hello world') AS ic",
        "SELECT length('abc') AS n, strlen('abc') AS sl",
        "SELECT bit_length('abc') AS bl, octet_length('abc') AS ol",
        "SELECT to_base(255, 16) AS tb",
        "SELECT bar(3, 0, 10, 10) AS br",
        "SELECT to_hex(255) AS th, from_hex('ff') AS fh",
        "SELECT base64('ab'::BLOB) AS b64, from_base64('YWI=') AS fb",
        "SELECT encode('ab') AS en, decode('ab'::BLOB) AS de",
        "SELECT nfc_normalize('é') AS nfc",
        "SELECT string_agg(n_name, ',' ORDER BY n_name) AS sa FROM (SELECT n_name FROM nation LIMIT 3)",
    ],
    "datetime": [
        "SELECT DATE '2024-03-05' + 3 AS d",
        "SELECT DATE '2024-03-05' - DATE '2024-03-01' AS dd",
        "SELECT TIMESTAMP '2024-03-05 01:02:03' + INTERVAL 90 MINUTE AS t",
        "SELECT TIMESTAMP '2024-03-05 01:02:03' - INTERVAL '1 day' AS t2",
        "SELECT INTERVAL 2 DAY + INTERVAL 3 HOUR AS iv",
        "SELECT date_trunc('month', DATE '2024-03-15') AS dt",
        "SELECT datetrunc('week', TIMESTAMP '2024-03-15 10:00:00') AS dt2",
        "SELECT date_part('year', DATE '2024-03-15') AS y",
        "SELECT datepart('dow', DATE '2024-03-17') AS dow",
        "SELECT dayname(DATE '2024-03-17') AS dn, monthname(DATE '2024-03-17') AS mn",
        "SELECT dayofweek(DATE '2024-03-17') AS d1, dayofyear(DATE '2024-03-17') AS d2, weekofyear(DATE '2024-03-17') AS w",
        "SELECT isodow(DATE '2024-03-17') AS iso",
        "SELECT last_day(DATE '2024-02-05') AS ld",
        "SELECT make_date(2024, 3, 5) AS md",
        "SELECT make_timestamp(2024, 3, 5, 10, 30, 12.5) AS mt",
        "SELECT epoch(TIMESTAMP '2024-01-01 00:00:00') AS ep",
        "SELECT epoch_ms(TIMESTAMP '2024-01-01 00:00:00.5') AS em",
        "SELECT to_timestamp(1704067200) AS tt",
        "SELECT age(TIMESTAMP '2024-03-05', TIMESTAMP '2023-01-04') AS ag",
        "SELECT greatest(DATE '2024-01-01', DATE '2024-02-01') AS g",
        "SELECT date_diff('day', DATE '2024-01-01', DATE '2024-03-01') AS dd2",
        "SELECT date_add(DATE '2024-01-31', INTERVAL 1 MONTH) AS da",
        "SELECT time_bucket(INTERVAL '15 minutes', TIMESTAMP '2024-03-05 01:17:00') AS tb",
        "SELECT strftime(DATE '2024-03-05', '%Y/%m/%d') AS sf",
        "SELECT strptime('05-03-2024', '%d-%m-%Y') AS sp",
        "SELECT EXTRACT(epoch FROM INTERVAL 90 MINUTE) AS exi",
        "SELECT TIME '11:30:00' AS t3",
        # r10: real TIME type (Spark 4.1 TimeType) — cast spelling,
        # fractional trim render, comparisons, ORDER BY
        "SELECT '09:15:30.25'::TIME AS t4",
        "SELECT CAST('23:59:59' AS TIME) AS t5",
        "SELECT TIME '01:02:03.400' AS t6",
        "SELECT TIME '12:00:00' < TIME '13:00:00' AS tlt,"
        " TIME '12:00:00' = '12:00:00'::TIME AS teq",
        "SELECT t FROM (SELECT TIME '23:00:00' AS t UNION ALL"
        " SELECT TIME '01:30:00') x ORDER BY t",
        "SELECT TIMESTAMP '2024-03-05 01:02:03'::DATE AS cast1",
        "SELECT '2024-03-05'::DATE AS cast2",
    ],
    "numeric": [
        "SELECT round(2.5) AS r1, round(3.567, 2) AS r2",
        "SELECT ceil(1.1) AS c, floor(1.9) AS f, trunc(1.9) AS t",
        "SELECT abs(-3) AS a, sign(-3) AS s",
        "SELECT sqrt(2) AS q, cbrt(27) AS cb",
        "SELECT exp(1) AS e, ln(2.718281828) AS l, log10(100) AS lg, log2(8) AS l2",
        "SELECT log(100) AS lg2",
        "SELECT pow(2, 10) AS p, power(2, 0.5) AS p2",
        "SELECT pi() AS pi",
        "SELECT sin(0) AS s1, cos(0) AS c1, tan(0) AS t1, atan2(1, 1) AS a2",
        "SELECT degrees(pi()) AS dg, radians(180) AS rd",
        "SELECT gamma(5) AS g, lgamma(5) AS lg3",
        "SELECT factorial(5) AS fa",
        "SELECT even(2.5) AS ev",
        "SELECT isnan('nan'::DOUBLE) AS n1, isinf('inf'::DOUBLE) AS n2, isfinite(1.0) AS n3",
        "SELECT greatest(1, 2, 3) AS g2, least(1, 2, 3) AS l3",
        "SELECT gcd(12, 18) AS gc, lcm(4, 6) AS lc",
        "SELECT bit_count(7) AS bc",
        "SELECT random() >= 0 AND random() <= 1 AS rnd",
        "SELECT setseed(0.5)",
        "SELECT 1.5::DECIMAL(10,2) AS d",
        "SELECT 170141183460469231731687303715884105727 AS hug",
    ],
    "aggregates": [
        "SELECT bool_and(r_regionkey >= 0) AS ba, bool_or(r_regionkey > 3) AS bo FROM region",
        "SELECT bit_and(r_regionkey + 1) AS b1, bit_or(r_regionkey) AS b2, bit_xor(r_regionkey) AS b3 FROM region",
        "SELECT product(r_regionkey + 1) AS pr FROM region",
        "SELECT entropy(n_regionkey) AS en FROM nation",
        "SELECT covar_pop(n_nationkey, n_regionkey) AS cp, covar_samp(n_nationkey, n_regionkey) AS cs FROM nation",
        "SELECT regr_slope(n_nationkey, n_regionkey) AS rs, regr_intercept(n_nationkey, n_regionkey) AS ri, regr_r2(n_nationkey, n_regionkey) AS r2 FROM nation",
        "SELECT regr_count(n_nationkey, n_regionkey) AS rc, regr_avgx(n_nationkey, n_regionkey) AS rx, regr_avgy(n_nationkey, n_regionkey) AS ry FROM nation",
        "SELECT quantile_cont(n_nationkey, [0.25, 0.5, 0.75]) AS qs FROM nation",
        "SELECT histogram(n_regionkey) AS h FROM nation",
        "SELECT min(n_name) AS mn, max(n_name) AS mx FROM nation",
        "SELECT arg_min(n_name, n_nationkey) AS am, arg_max(n_name, n_nationkey) AS ax FROM nation",
        "SELECT sum(DISTINCT n_regionkey) AS sd FROM nation",
        "SELECT median(n_nationkey) AS md FROM nation",
        "SELECT mad(n_nationkey) AS mad FROM nation",
        "SELECT approx_quantile(n_nationkey, 0.5) BETWEEN 10 AND 14 AS aq FROM nation",
        "SELECT skewness(n_nationkey) AS sk, kurtosis(n_nationkey) AS ku FROM nation",
        "SELECT var_pop(n_nationkey) AS vp, var_samp(n_nationkey) AS vs FROM nation",
        "SELECT stddev(n_nationkey) AS sd2 FROM nation",
        "SELECT corr(n_nationkey, n_regionkey) AS co FROM nation",
        "SELECT min(n_nationkey ORDER BY n_name) AS mo FROM nation",
        "SELECT first(n_name ORDER BY n_nationkey) AS f, last(n_name ORDER BY n_nationkey) AS la FROM nation",
        "SELECT array_agg(n_regionkey ORDER BY n_nationkey DESC) AS aa FROM (SELECT * FROM nation LIMIT 3)",
    ],
    "lists": [
        "SELECT [1, 2, 3] AS l",
        "SELECT list_value(1, 2, 3) AS lv",
        "SELECT range(5) AS r",
        "SELECT range(2, 5) AS r2",
        "SELECT range(0, 10, 3) AS r3",
        "SELECT flatten([[1, 2], [3]]) AS fl",
        "SELECT list_concat([1], [2, 3]) AS lc",
        "SELECT [1] || [2] AS lcat",
        "SELECT list_contains([1, 2], 2) AS lco",
        "SELECT array_contains([1, 2], 3) AS ac",
        "SELECT list_position([7, 8, 9], 9) AS lp",
        "SELECT list_transform([1, 2, 3], x -> x * 2) AS lt",
        "SELECT list_filter([1, 2, 3], x -> x > 1) AS lf",
        "SELECT list_reduce([1, 2, 3], (a, b) -> a + b) AS lr",
        "SELECT list_sort([3, 1, 2]) AS ls",
        "SELECT list_reverse_sort([1, 3, 2]) AS lrs",
        "SELECT list_distinct([1, 1, 2]) AS ld",
        "SELECT list_unique([1, 1, 2]) AS lu",
        "SELECT list_min([3, 1]) AS lmin, list_max([3, 1]) AS lmax",
        "SELECT list_sum([1, 2, 3]) AS lsum, list_avg([1, 2, 3]) AS lavg",
        "SELECT len([1, 2, 3]) AS ln",
        "SELECT array_length([1, 2, 3]) AS al",
        "SELECT list_slice([1, 2, 3, 4], 2, 3) AS sl",
        "SELECT [1, 2, 3, 4][2:3] AS br",
        "SELECT [1, 2, 3][2] AS idx",
        "SELECT list_zip([1, 2], [3, 4]) AS lz",
        "SELECT list_append([1], 2) AS la, list_prepend(0, [1]) AS lpre",
        "SELECT array_push_back([1], 2) AS pb, array_push_front([1], 0) AS pf",
        "SELECT list_intersect([1, 2, 3], [2, 3, 4]) AS li",
        "SELECT list_has_any([1, 2], [2, 9]) AS ha, list_has_all([1, 2, 3], [1, 2]) AS hall",
        "SELECT array_cosine_similarity([1.0, 0.0], [1.0, 0.0]) AS cos",
        "SELECT array_inner_product([1.0, 2.0], [3.0, 4.0]) AS ip",
        "SELECT list_grade_up([3, 1, 2]) AS gu",
        "SELECT list_aggregate([1, 2, 3], 'sum') AS lag",
        "SELECT list_aggr([1, 2, 3], 'max') AS lag2",
        "SELECT unnest([1, 2, 3]) AS u",
        "SELECT unnest(generate_series(1, 3)) AS ug",
        "SELECT generate_subscripts([7, 8, 9], 1) AS gsub",
        "SELECT [x * 2 FOR x IN [1, 2, 3] IF x > 1] AS comp",
        "SELECT string_to_array('a,b', ',') AS sta",
        "SELECT array_to_string([1, 2], '-') AS ats",
        "SELECT list_string_agg(['a', 'b']) AS lsa",
    ],
    "structs_maps": [
        "SELECT {'a': 1, 'b': 'x'} AS s",
        "SELECT struct_pack(a := 1, b := 2) AS sp",
        "SELECT {'a': 1}.a AS fa",
        "SELECT struct_extract({'a': 1, 'b': 2}, 'b') AS se",
        "SELECT row(1, 'x') AS r",
        "SELECT map([1, 2], ['a', 'b']) AS m",
        "SELECT map([1, 2], ['a', 'b'])[2] AS mi",
        "SELECT map_extract(map([1], ['a']), 1) AS me",
        "SELECT element_at(map([1], ['a']), 1) AS ea",
        "SELECT cardinality(map([1, 2], ['a', 'b'])) AS ca",
        "SELECT map_keys(map([1, 2], ['a', 'b'])) AS mk, map_values(map([1, 2], ['a', 'b'])) AS mv",
        "SELECT map_from_entries([(1, 'a'), (2, 'b')]) AS mfe",
        "SELECT union_value(num := 2) AS uv",
    ],
    "json": [
        "SELECT '{\"a\": {\"b\": 7}}'::JSON -> 'a' ->> 'b' AS j",
        "SELECT json_extract('{\"a\": [1, 2]}', '$.a[1]') AS je",
        "SELECT json_extract_string('{\"a\": \"x\"}', '$.a') AS js",
        "SELECT json_array_length('[1, 2, 3]') AS jal",
        "SELECT json_structure('{\"a\": 1}') AS jst",
        "SELECT json_valid('{\"a\": 1}') AS jv",
        "SELECT json_keys('{\"a\": 1, \"b\": 2}') AS jk",
        "SELECT to_json([1, 2]) AS tj",
        "SELECT json_object('a', 1) AS jo",
        "SELECT json_array(1, 2) AS ja",
        "SELECT json_merge_patch('{\"a\": 1}', '{\"b\": 2}') AS jm",
        "SELECT json_contains('{\"a\": 1}', '1') AS jc",
        "SELECT json_type('{\"a\": 1}') AS jt",
        "SELECT json_transform('{\"a\": 1}', '{\"a\": \"VARCHAR\"}') AS jtr",
    ],
    "subqueries": [
        "SELECT r_name FROM region WHERE r_regionkey = (SELECT min(r_regionkey) FROM region)",
        "SELECT r_name FROM region WHERE r_regionkey IN (SELECT n_regionkey FROM nation WHERE n_nationkey < 3) ORDER BY r_name",
        "SELECT r_name FROM region WHERE EXISTS (SELECT 1 FROM nation WHERE n_regionkey = r_regionkey AND n_nationkey > 20) ORDER BY r_name",
        "SELECT r_name FROM region WHERE r_regionkey = ANY (SELECT n_regionkey FROM nation WHERE n_nationkey < 2) ORDER BY r_name",
        "SELECT r_name FROM region WHERE r_regionkey < ALL (SELECT n_regionkey + 3 FROM nation) ORDER BY r_name",
        "SELECT r_name, (SELECT count(*) FROM nation WHERE n_regionkey = r_regionkey) AS cnt FROM region ORDER BY r_name",
        "SELECT (SELECT 42) AS scalar",
        "SELECT * FROM (VALUES (1, 'a'), (2, 'b')) t(id, v) ORDER BY id",
        "WITH x AS (SELECT 1 AS a) SELECT * FROM x",
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 5) SELECT sum(n) AS s FROM t",
        "SELECT n_name FROM nation WHERE (n_regionkey, n_nationkey) IN (SELECT n_regionkey, min(n_nationkey) FROM nation GROUP BY n_regionkey) ORDER BY n_name",
        "SELECT r_name, u FROM region, unnest([1, 2]) AS t(u) WHERE r_regionkey = 0 ORDER BY u",
    ],
    "ddl_dml": [
        "CREATE OR REPLACE TABLE probe_t1 AS SELECT 1 AS a, 'x' AS b",
        "SELECT * FROM probe_t1",
        "INSERT INTO probe_t1 VALUES (2, 'y'), (3, 'z')",
        "INSERT INTO probe_t1 (b, a) VALUES ('w', 4)",
        "INSERT INTO probe_t1 BY NAME SELECT 'v' AS b, 5 AS a",
        "INSERT INTO probe_t1 SELECT 6, 'u' RETURNING a",
        "UPDATE probe_t1 SET b = upper(b) WHERE a <= 2",
        "DELETE FROM probe_t1 WHERE a = 3",
        "SELECT * FROM probe_t1 ORDER BY a",
        "CREATE OR REPLACE TEMP TABLE probe_tmp AS SELECT 9 AS z",
        "SELECT * FROM probe_tmp",
        "DROP TABLE probe_tmp",
        "ALTER TABLE probe_t1 ADD COLUMN c INT DEFAULT 0",
        "SELECT a, c FROM probe_t1 ORDER BY a LIMIT 2",
        "ALTER TABLE probe_t1 RENAME COLUMN c TO c2",
        "ALTER TABLE probe_t1 DROP COLUMN c2",
        "CREATE OR REPLACE VIEW probe_v AS SELECT a FROM probe_t1",
        "SELECT count(*) AS c FROM probe_v",
        "DROP VIEW probe_v",
        "DROP TABLE probe_t1",
    ],
    "txn_misc": [
        "BEGIN",
        "COMMIT",
        "BEGIN TRANSACTION",
        "ROLLBACK",
        "SET TimeZone = 'UTC'",
        "SELECT current_setting('TimeZone') AS tz",
        "SHOW TABLES",
        "SELECT current_schema() AS cs",
        "SELECT current_database() AS cd",
        "SELECT version() AS v",
        "SELECT typeof(1) AS t1, typeof('x') AS t2, typeof([1]) AS t3",
        "SELECT 1 AS a UNION ALL BY NAME SELECT 2 AS a",
        "FROM region SELECT r_name ORDER BY r_name LIMIT 1",
        "FROM region LIMIT 1",
        "SELECT * FROM region POSITIONAL JOIN (SELECT 1 AS x UNION ALL SELECT 2) t LIMIT 2",
        "SELECT * FROM region USING SAMPLE 2 ROWS",
        "SELECT count(*) AS c FROM region TABLESAMPLE RESERVOIR(3 ROWS)",
        "SELECT r_name FROM region ORDER BY r_name LIMIT 2 OFFSET 1",
        "DESCRIBE SELECT 1 AS x",
        "SELECT alias(r_name) AS al FROM region LIMIT 1",
        "SELECT hash(42) = hash(42) AS h",
        "SELECT uuid() <> uuid() AS u",
        "SELECT gen_random_uuid() IS NOT NULL AS g",
        "SELECT txid_current() >= 0 AS t",
        "SELECT pg_typeof(1) AS pt",
        "SELECT coalesce(NULL, NULL, 3) AS c",
        "VALUES (1, 2), (3, 4)",
        "SELECT columns('r_.*') FROM region ORDER BY r_regionkey LIMIT 1",
        "SELECT * EXCLUDE (r_comment) FROM region ORDER BY r_regionkey LIMIT 1",
        "SELECT * REPLACE (upper(r_name) AS r_name) FROM region ORDER BY r_regionkey LIMIT 1",
        "SELECT min(COLUMNS(['n_nationkey', 'n_regionkey'])) FROM nation",
    ],
    "r8_sweep": [
        "SELECT array_slice([1,2,3,4], 2, 3) AS s",
        "SELECT list_resize([1,2], 4, 0) AS r",
        "SELECT damerau_levenshtein('abc', 'acb') AS d",
        "SELECT array_unique([1,1,2]) AS u",
        "SELECT TRY_CAST('x' AS INT) AS t",
        "SELECT quarter(DATE '2024-05-05') AS q",
        "SELECT sha256('abc') AS h",
        "SELECT list_any_value([NULL, 7, 8]) AS av",
        "SELECT unnest([1,2]) AS u",
        "SELECT generate_subscripts([9,8,7], 1) AS g",
        "SELECT last_day(DATE '2024-02-05') AS ld",
        "SELECT monthname(DATE '2024-02-05') AS mn, dayname(DATE '2024-02-05') AS dn",
        "SELECT isodow(DATE '2024-02-05') AS iso, week(DATE '2024-02-05') AS wk",
        "SELECT strftime(DATE '2024-02-05', '%Y/%m/%d') AS sf",
        "SELECT strptime('05-02-2024', '%d-%m-%Y') AS sp",
        "SELECT epoch_ms(TIMESTAMP '2024-01-01 00:00:01') AS em",
        "SELECT printf('%d-%s', 7, 'x') AS pf",
        "SELECT format('{}-{}', 7, 'x') AS fm",
        "SELECT map_keys(map([1,2],['a','b'])) AS mk",
        "SELECT map_values(map([1,2],['a','b'])) AS mv",
        "SELECT element_at(map([1,2],['a','b']), 1) AS ea",
        "SELECT string_agg(x, '/') AS sa FROM (VALUES ('a'),('b')) t(x)",
        "SELECT to_milliseconds(1500) AS ms",
        "SELECT [NULL]::INT[] AS a",
        "SELECT CAST([[1],[2]] AS BIGINT[][]) AS b",
        "SELECT ['a','b']::VARCHAR[] AS c",
        # aggregates sweep
        "SELECT arg_max(x, y) AS am, arg_min(x, y) AS an"
        " FROM (VALUES ('a',1),('b',9)) t(x,y)",
        "SELECT mode(x) AS m FROM (VALUES (1),(1),(2)) t(x)",
        "SELECT product(x) AS p FROM (VALUES (2),(3),(4)) t(x)",
        "SELECT bool_and(x) AS ba, bool_or(x) AS bo"
        " FROM (VALUES (true),(false)) t(x)",
        "SELECT bit_and(x) AS b1, bit_or(x) AS b2, bit_xor(x) AS b3"
        " FROM (VALUES (12),(10)) t(x)",
        "SELECT ROUND(skewness(x), 6) AS sk, ROUND(kurtosis(x), 6) AS ku"
        " FROM (VALUES (1.0),(2.0),(4.0),(8.0)) t(x)",
        "SELECT ROUND(corr(x, y), 6) AS c, covar_pop(x, y) AS cp,"
        " covar_samp(x, y) AS cs FROM (VALUES (1,2),(2,4),(3,5)) t(x,y)",
        "SELECT ROUND(entropy(x), 6) AS e FROM (VALUES (1),(1),(2)) t(x)",
        "SELECT mad(x) AS m FROM (VALUES (1.0),(2.0),(9.0)) t(x)",
        "SELECT ROUND(regr_slope(y, x), 6) AS rs,"
        " ROUND(regr_intercept(y, x), 6) AS ri, ROUND(regr_r2(y, x), 6) AS r2"
        " FROM (VALUES (1,2),(2,4),(3,5)) t(x,y)",
        "SELECT favg(x) AS f, fsum(x) AS fs FROM (VALUES (1.5),(2.5)) t(x)",
        "SELECT string_agg(DISTINCT x, ',' ORDER BY x) AS s"
        " FROM (VALUES ('a'),('a'),('b')) t(x)",
        "SELECT arbitrary(x) AS ar, first(x) AS fi, last(x) AS la"
        " FROM (VALUES (5),(6)) t(x)",
        "SELECT count(*) FILTER (x > 1) AS cf FROM (VALUES (1),(2),(3)) t(x)",
        # window + string sweep
        "SELECT ntile(2) OVER (ORDER BY x) AS n FROM (VALUES (1),(2),(3)) t(x)",
        "SELECT cume_dist() OVER (ORDER BY x) AS c FROM (VALUES (1),(2)) t(x)",
        "SELECT percent_rank() OVER (ORDER BY x) AS p"
        " FROM (VALUES (1),(2)) t(x)",
        "SELECT nth_value(x, 2) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND UNBOUNDED FOLLOWING) AS nv"
        " FROM (VALUES (5),(6),(7)) t(x)",
        "SELECT lag(x, 1, -1) OVER (ORDER BY x) AS lg,"
        " lead(x, 1, -1) OVER (ORDER BY x) AS ld FROM (VALUES (1),(2)) t(x)",
        "SELECT x, sum(x) OVER w AS s FROM (VALUES (1),(2)) t(x)"
        " WINDOW w AS (ORDER BY x)",
        "SELECT strip_accents('áé') AS sa",
        "SELECT unicode('A') AS u, ord('B') AS o, chr(67) AS c",
        "SELECT to_base(255, 16) AS tb",
        "SELECT bin(5) AS b, hex(255) AS h",
        "SELECT ltrim('xxa', 'x') AS lt, rtrim('axx', 'x') AS rt,"
        " trim('xax', 'x') AS tr",
        "SELECT split_part('a/b/c', '/', 2) AS sp",
        "SELECT position('b' IN 'abc') AS p, strpos('abc', 'b') AS s2,"
        " instr('abc', 'b') AS i",
        "SELECT regexp_replace('aaa', 'a', 'b', 'g') AS g",
        "SELECT like_escape('a%c', 'a$%c', '$') AS le",
        "SELECT 'abc' LIKE 'a%' ESCAPE '$' AS lk",
        "SELECT parse_filename('/a/b/c.txt') AS pf,"
        " parse_dirpath('/a/b/c.txt') AS pd",
        # statement forms
        "UNPIVOT (SELECT 1 AS a, 2 AS b) ON a, b",
        "UNPIVOT (SELECT 9 AS k, 1 AS a, 2 AS b) ON a, b"
        " INTO NAME attr VALUE v",
        # ') ON ' inside the source query (code review r8: a lazy
        # regex cut the source at the join's ON)
        "UNPIVOT (SELECT t.a, u.b FROM (SELECT 1 AS a) t"
        " JOIN (SELECT 2 AS b) u ON 1 = 1) ON a, b",
        "SELECT to_seconds(90) AS s, to_milliseconds(1500) AS ms,"
        " to_days(3) + to_seconds(5) AS mix",
        "SELECT gen_random_uuid() IS NOT NULL AS u",
        # CTE hints, misc scalar surface
        "WITH x AS MATERIALIZED (SELECT 2 AS v) SELECT v FROM x",
        "WITH x AS NOT MATERIALIZED (SELECT 2 AS v) SELECT v FROM x",
        "SELECT 'abc' SIMILAR TO 'a.c' AS st,"
        " 'abc' NOT SIMILAR TO 'x' AS nst",
        "SELECT date_diff('day', DATE '2024-01-01', DATE '2024-02-01') AS dd",
        "SELECT date_add(DATE '2024-01-01', INTERVAL 3 MONTHS) AS da",
        "SELECT INTERVAL 90 SECONDS + TIMESTAMP '2024-01-01' AS t1",
        "SELECT 1 LIMIT ALL",
        "SELECT 2 OFFSET 0",
        # NOTE: ordering a ROLLUP by an UNPROJECTED grouping column is
        # a loud Spark analyzer error (the Expand node shields it) —
        # the projected spelling below is the portable form
        "SELECT r_name, grouping(r_name) AS g, count(*) AS n FROM region"
        " GROUP BY ROLLUP(r_name) ORDER BY g, r_name NULLS LAST LIMIT 2",
        "SELECT pow(2, 3) AS p, cbrt(27) AS cb, log2(8) AS l2,"
        " log10(100) AS l10, ln(exp(1)) AS ll, log(100) AS lg",
        "SELECT gamma(5) AS gm, lgamma(5) AS lg2, factorial(4) AS fa",
        "SELECT isfinite(1.0) AS f1, isinf('inf'::DOUBLE) AS f2,"
        " isnan('nan'::DOUBLE) AS f3, signbit(-1.0) AS sb",
        "SELECT cot(1) AS ct, degrees(pi()) AS dg, radians(180.0) AS rd",
        "SELECT even(2.5) AS ev, nextafter(1.0, 2.0) AS na",
        "SELECT even(-2.5) AS e1, even(3.0) AS e2, even(-3.0) AS e3,"
        " even(2.0) AS e4",
        "SELECT signbit(-0.0) AS s0, signbit(0.0) AS s1, signbit(-5) AS s2",
        # IEEE negative zero carries a real sign bit (ADVICE r8 item 2)
        "SELECT signbit(-0.0::DOUBLE) AS z0, signbit((-1.0::DOUBLE) * 0.0) AS z1",
        # dot-call method chaining (paren / call receivers; DuckDB v1.0
        # itself rejects string-literal receivers)
        "SELECT ('ab' || 'c').len() AS chain",
        "SELECT (n_name).lower().len() AS ll FROM nation ORDER BY 1 LIMIT 2",
        "SELECT upper('a').len() AS l",
        # type-system idioms
        "SELECT COLUMNS(c -> c LIKE 'r_n%') FROM region ORDER BY 1 LIMIT 1",
        "SELECT {'a': 1, 'b': 'x'}::STRUCT(a INT, b VARCHAR) AS s",
        "SELECT CAST(NULL AS STRUCT(a INT)) AS s2",
        "SELECT '5'::UTINYINT AS u1, '50000'::USMALLINT AS u2,"
        " '3000000000'::UINTEGER AS u3",
        "SELECT 'abc'::CHAR(2) AS c2",
        "SELECT TIME '12:30:45' AS t",
        "SELECT struct_extract({'a': 7}, 'a') AS se",
        # struct_insert stays a loud refusal: splatting UNKNOWN struct
        # fields needs catalog introspection no textual rewrite has
        "SELECT row_to_json({'a': 1}) AS rj",
        "SELECT map_concat(map([1],['x']), map([2],['y'])) AS mc",
        "SELECT cardinality(map([1,2],['a','b'])) AS cd",
        "SELECT COLUMNS(* EXCLUDE (r_name)) FROM region ORDER BY 1 LIMIT 1",
        "SELECT min(COLUMNS(* EXCLUDE (r_name))) FROM region",
    ],
    "r9_enum": [
        # r9 (r8 verdict item 3): CREATE TYPE ... AS ENUM — stateful
        # on both engines; declaration-order vs varchar semantics are
        # DuckDB-probed (compat.py ENUM_TYPES docstring)
        "CREATE TYPE probe_mood AS ENUM ('sad', 'ok', 'happy')",
        "SELECT 'ok'::probe_mood AS m",
        "SELECT TRY_CAST('nope' AS probe_mood) AS m",
        "SELECT 'ok'::probe_mood < 'happy'::probe_mood AS c1,"
        " 'ok'::probe_mood < 'sad' AS c2, 'ok'::probe_mood = 'ok' AS e1",
        "SELECT 'sad'::probe_mood BETWEEN 'sad' AND 'happy' AS b",
        "SELECT m FROM (SELECT 'happy'::probe_mood AS m UNION ALL"
        " SELECT 'sad'::probe_mood UNION ALL SELECT 'ok'::probe_mood) t"
        " ORDER BY m",
        "SELECT min(m) AS lo, max(m) AS hi FROM"
        " (SELECT 'happy'::probe_mood AS m UNION ALL"
        " SELECT 'sad'::probe_mood) t",
        "SELECT enum_range(NULL::probe_mood) AS r,"
        " enum_first(NULL::probe_mood) AS f,"
        " enum_last(NULL::probe_mood) AS l",
        "SELECT enum_code('ok'::probe_mood) AS c",
        "SELECT enum_range_boundary(NULL::probe_mood, 'ok'::probe_mood) AS rb",
        "SELECT 'ok'::probe_mood::VARCHAR AS v,"
        " CAST('sad'::probe_mood AS VARCHAR) AS v2",
        # code review r9 shapes: CASE operand, enum-cast BETWEEN/IN
        # bounds (declaration order), array casts, subscript operands
        "SELECT CASE WHEN 1 = 1 THEN 'sad' ELSE 'ok' END::probe_mood AS m",
        "SELECT 'ok'::probe_mood BETWEEN 'sad'::probe_mood"
        " AND 'happy'::probe_mood AS b,"
        " 'ok'::probe_mood IN ('sad'::probe_mood, 'ok'::probe_mood) AS i",
        "SELECT ['sad', 'ok']::probe_mood[] AS arr",
        "SELECT (['sad', 'ok', 'happy'][2])::probe_mood AS sub",
        # r10: unnest(...)::enum hoists the cast inside the array
        # (transform), dodging the generator-in-CASE refusal
        "SELECT unnest(['sad', 'ok'])::probe_mood AS m",
        "CREATE OR REPLACE TABLE probe_emood AS SELECT m FROM"
        " (SELECT 'happy'::probe_mood AS m UNION ALL"
        " SELECT 'sad'::probe_mood UNION ALL"
        " SELECT 'ok'::probe_mood) t",
        "SELECT m FROM probe_emood ORDER BY m",
        "INSERT INTO probe_emood VALUES ('sad')",
        "SELECT m, count(*) AS n FROM probe_emood GROUP BY m ORDER BY m",
        # r10: enum TABLE COLUMN contexts (schema-aware pass) — the
        # cast renders the LABEL, comparisons against varchar operands
        # compare as varchar (probed DuckDB semantics)
        "SELECT CAST(m AS VARCHAR) AS v FROM probe_emood ORDER BY v",
        "SELECT m::VARCHAR AS v FROM probe_emood ORDER BY v",
        "SELECT m FROM probe_emood WHERE m = 'sad' ORDER BY m",
        "SELECT m FROM probe_emood WHERE 'happy' <= m ORDER BY m",
        "SELECT m FROM probe_emood WHERE m IN ('sad', 'ok') ORDER BY m",
        "SELECT m FROM probe_emood WHERE m LIKE '%a%' ORDER BY m",
        "SELECT count(*) AS n FROM probe_emood WHERE m <> 'ok'",
        # r10: DESCRIBE renders the enum type, not the emulation struct
        "DESCRIBE probe_emood",
        # r10: enum column as a varchar-taking FUNCTION argument —
        # DuckDB implicitly uses the label
        "SELECT lower(m) AS v FROM probe_emood ORDER BY v",
        "SELECT length(m) AS n FROM probe_emood ORDER BY n",
        "SELECT concat(m, '!') AS v FROM probe_emood ORDER BY v",
        "SELECT string_agg(m, ',' ORDER BY m) AS sa FROM probe_emood",
        "SELECT count(*) AS n FROM probe_emood WHERE upper(m) = 'OK'",
        # late-r10: SELECT-list aliases of enum columns resolve through
        # subqueries/CTEs (fixpoint propagation in the schema pass)
        "SELECT x FROM (SELECT m AS x FROM probe_emood) t"
        " WHERE x = 'sad' ORDER BY x",
        "WITH s AS (SELECT m AS x FROM probe_emood)"
        " SELECT lower(x) AS v FROM s WHERE x <> 'ok' ORDER BY v",
        # r10 code review: enum predicates + bare-string assignment in
        # UPDATE/DELETE (the SELECT path's schema-aware semantics)
        "UPDATE probe_emood SET m = 'sad' WHERE m = 'ok'",
        "SELECT m, count(*) AS n FROM probe_emood GROUP BY m ORDER BY m",
        "DELETE FROM probe_emood WHERE m <> 'happy'",
        "SELECT m FROM probe_emood ORDER BY m",
        "DROP TABLE probe_emood",
        "DROP TYPE probe_mood",
    ],
    "r9_seq_update": [
        # nextval in single-table UPDATE (r8 verdict item 6) — the
        # allocated value set is exact; ORDER BY a makes the compare
        # order-stable (row↔value pairing is scan order on both
        # engines, guaranteed by neither, so only `a` is selected)
        "CREATE SEQUENCE probe_useq START 50 INCREMENT 3",
        "CREATE OR REPLACE TABLE probe_ut AS"
        " SELECT range AS k, 0 AS a FROM range(4)",
        "UPDATE probe_ut SET a = nextval('probe_useq') WHERE k >= 2",
        "SELECT a FROM probe_ut ORDER BY a",
        "UPDATE probe_ut SET a = nextval('probe_useq')",
        "SELECT a FROM probe_ut ORDER BY a",
        # aliased target with alias-qualified predicate (review r9)
        "UPDATE probe_ut AS x SET a = nextval('probe_useq') WHERE x.k = 1",
        "SELECT a FROM probe_ut ORDER BY a",
        "SELECT currval('probe_useq') AS c",
        "DROP TABLE probe_ut",
        "DROP SEQUENCE probe_useq",
    ],
    "r10_edge_defaults": [
        # late-r10 default-semantics sweep: shapes where raw Spark
        # diverges from DuckDB — the wire layer must close each
        "SELECT concat('a', NULL) AS c1, concat('a', NULL, 'b') AS c2",
        "SELECT concat(1, NULL, 'b') AS c3",
        "SELECT 1/0 AS d1, 1.0/0 AS d2, 1%0 AS m1, 1//0 AS f1",
        "SELECT 10 / n AS d FROM (VALUES (0), (2)) t(n) ORDER BY d",
        "SELECT substr('abcdef', 0, 3) AS s0",
        "SELECT left('abc', -1) AS l, right('abc', -1) AS r",
        "SELECT strpos('abc', '') AS sp",
        "SELECT sign(-3.2) AS s1, sign(0) AS s2, sign(2.5) AS s3",
        "SELECT list_sort([3, NULL, 1]) AS v",
        "SELECT list_sort([3, NULL, 1], 'DESC') AS v",
        "SELECT list_sort([3, 1], 'DESC', 'NULLS FIRST') AS v",
        "SELECT list_reverse_sort([1, NULL, 3]) AS v",
        "SELECT list_sort(list_distinct([1, 1, NULL, 2, NULL])) AS v",
        "SELECT list_unique([1, 1, NULL, 2]) AS v",
        "SELECT map([1, 2], ['a', 'b'])[1] AS hit,"
        " map([1, 2], ['a', 'b'])[3] AS miss",
    ],
    "r10_agg_defaults": [
        # late-r10: aggregate default-semantics (separator defaults,
        # duck-only aggregates, FILTER/ORDER BY modifier combos)
        "CREATE OR REPLACE TABLE probe_agt AS SELECT * FROM (VALUES"
        " (1, 2.0, 'a'), (2, 3.0, 'b'), (3, NULL, 'a'), (4, 7.0, NULL))"
        " v(k, x, s)",
        # length() pins the default ',' separator while staying
        # order-invariant (1-arg string_agg row order is unspecified
        # on both engines; Spark's listagg really does vary)
        "SELECT length(string_agg(s)) AS sa FROM probe_agt",
        "SELECT string_agg(DISTINCT s, '|' ORDER BY s) AS sa FROM probe_agt",
        # no ORDER BY → row order is unspecified on BOTH engines (duck
        # happens to preserve insertion order; a distributed engine
        # cannot) — probes pin the ordered forms
        "SELECT group_concat(s ORDER BY k) AS g1,"
        " group_concat(k, '-' ORDER BY k) AS g2 FROM probe_agt",
        "SELECT string_agg(k ORDER BY k) AS ik FROM probe_agt",
        "SELECT arbitrary(s ORDER BY k DESC) AS ar,"
        " any_value(s ORDER BY k DESC) AS av FROM probe_agt",
        "SELECT product(x) AS p FROM probe_agt",
        "SELECT fsum(x) AS fs, favg(x) AS fa FROM probe_agt",
        "SELECT entropy(s) AS e FROM probe_agt",
        "SELECT bit_and(k) AS ba, bit_or(k) AS bo, bit_xor(k) AS bx"
        " FROM probe_agt",
        "SELECT quantile_cont(x, [0.25, 0.5, 0.75]) AS q FROM probe_agt",
        "SELECT count(DISTINCT (k, s)) AS c FROM probe_agt",
        "SELECT kurtosis(x) AS kt, skewness(x) AS sk FROM probe_agt",
        "SELECT arg_min(s, x) AS lo, arg_max(s, x) AS hi FROM probe_agt",
        "SELECT sum(k) FILTER (s IS NOT NULL) AS f FROM probe_agt",
        # list_sort: unordered list() row order is unspecified on both
        # engines (flaked once against collect_list's partition order)
        "SELECT list_sort(list(s) FILTER (s IS NOT NULL)) AS l"
        " FROM probe_agt",
        "SELECT any_value(k ORDER BY k DESC) AS a FROM probe_agt",
        "SELECT regr_slope(x, k) AS rs, regr_r2(x, k) AS r2"
        " FROM probe_agt",
        "SELECT var_samp(x) AS vs, var_pop(x) AS vp FROM probe_agt",
        "DROP TABLE probe_agt",
    ],
    "r10_dt_win_defaults": [
        # late-r10 sweep: datetime part numbering, boundary arithmetic,
        # and window-function defaults over ties/nulls
        "SELECT date_part('dow', DATE '2024-03-17') AS dow,"
        " date_part('isodow', DATE '2024-03-17') AS isodow,"
        " date_part('week', DATE '2024-01-01') AS wk,"
        " date_part('doy', DATE '2024-03-01') AS doy",
        "SELECT date_part('quarter', DATE '2024-08-15') AS q,"
        " date_part('epoch', TIMESTAMP '2024-01-01 00:00:01') AS ep",
        "SELECT last_day(DATE '2024-02-05') AS ld",
        "SELECT DATE '2024-01-31' + INTERVAL 1 MONTH AS clamp",
        "SELECT TIMESTAMP '2024-03-02 03:04:05' -"
        " TIMESTAMP '2024-03-01 01:02:03' AS tdiff",
        "SELECT to_timestamp(1700000000) AS ts",
        "SELECT epoch_ms(1700000000500) AS ts2",
        "SELECT make_date(2024, 2, 29) AS md,"
        " make_timestamp(2024, 2, 29, 1, 2, 3.5) AS mt",
        "SELECT time_bucket(INTERVAL 15 MINUTE,"
        " TIMESTAMP '2024-03-01 01:23:45') AS tb",
        "SELECT generate_series AS g FROM generate_series(DATE"
        " '2024-01-01', DATE '2024-01-04', INTERVAL 1 DAY) ORDER BY g",
        "SELECT k, ntile(3) OVER (ORDER BY k) AS nt FROM"
        " (VALUES (1), (2), (3), (4), (5)) t(k) ORDER BY k",
        "SELECT k, percent_rank() OVER (ORDER BY v) AS pr,"
        " cume_dist() OVER (ORDER BY v) AS cd FROM"
        " (VALUES (1, 10), (2, 10), (3, 20)) t(k, v) ORDER BY k",
        # default frame: RANGE UNBOUNDED..CURRENT ROW groups TIES
        "SELECT k, sum(v) OVER (ORDER BY g) AS s FROM"
        " (VALUES (1, 1, 5), (2, 1, 6), (3, 2, 7)) t(k, g, v)"
        " ORDER BY k",
        "SELECT k, first_value(v) OVER (ORDER BY k) AS fv,"
        " last_value(v) OVER (ORDER BY k) AS lv FROM"
        " (VALUES (1, NULL), (2, 7), (3, 8)) t(k, v) ORDER BY k",
        "SELECT k, nth_value(v, 2) OVER (ORDER BY k) AS nv FROM"
        " (VALUES (1, 5), (2, 6), (3, 7)) t(k, v) ORDER BY k",
        # date COLUMN ± INTERVAL promotes to TIMESTAMP (schema pass)
        "SELECT o_orderdate + INTERVAL 1 DAY AS d1 FROM orders"
        " ORDER BY o_orderkey LIMIT 2",
        "SELECT o_orderdate - INTERVAL 2 MONTH AS d2 FROM orders"
        " ORDER BY o_orderkey LIMIT 2",
        "SELECT range(DATE '2024-01-01', DATE '2024-01-03',"
        " INTERVAL 1 DAY) AS r",
    ],
    "r10_ddl_defaults": [
        # late-r10: column DEFAULT values and COLLATE NOCASE
        "CREATE OR REPLACE TABLE probe_dflt(k INT, v INT DEFAULT 7,"
        " s VARCHAR DEFAULT 'x')",
        "INSERT INTO probe_dflt(k) VALUES (1)",
        "INSERT INTO probe_dflt VALUES (2, 8, 'y')",
        "INSERT INTO probe_dflt(k, v) VALUES (3, DEFAULT)",
        "SELECT * FROM probe_dflt ORDER BY k",
        "UPDATE probe_dflt SET v = DEFAULT WHERE k = 2",
        "SELECT * FROM probe_dflt ORDER BY k",
        "DROP TABLE probe_dflt",
        "SELECT 'A' = 'a' COLLATE NOCASE AS c1,"
        " 'B' < 'a' COLLATE NOCASE AS c2",
        "SELECT n_name FROM nation WHERE n_name = 'nation_3' COLLATE"
        " NOCASE ORDER BY n_name",
    ],
    "r10_json_struct_defaults": [
        # late-r10 sweep: JSON path/merge corners, struct compare,
        # blob round-trips
        "SELECT json_array_length('[1,2,3]') AS n",
        "SELECT json_merge_patch('{\"a\":1}', '{\"b\":2}') AS m",
        "SELECT json_extract('{\"a\":[1,2]}', '$.a[1]') AS e",
        "SELECT json_extract_string('{\"a\":\"x\"}', '$.a') AS es",
        "SELECT '{\"a\": {\"b\": 7}}'::JSON -> 'a' -> 'b' AS j",
        "SELECT '{\"a\": [10, 20]}'::JSON -> 'a' ->> 1 AS j2",
        "SELECT json_keys('{\"b\":1,\"a\":2}') AS jk",
        "SELECT json_valid('{\"a\":}') AS jv1, json_valid('{}') AS jv2",
        "SELECT json_type('[1]') AS jt, json_type('\"x\"') AS jt2",
        "SELECT to_json({'a': 1, 'b': [1, 2]}) AS tj",
        "SELECT json_quote('a\"b') AS jq",
        "SELECT {'a': 1, 'b': 'x'} = {'a': 1, 'b': 'x'} AS seq",
        "SELECT {'a': 2} > {'a': 1} AS sgt",
        "SELECT [1, 2] < [1, 3] AS alt, [1] < [1, 0] AS alt2",
        "SELECT ('ab'::BLOB)::VARCHAR AS bv",
        "SELECT octet_length('abc'::BLOB) AS ol",
        "SELECT '\\x41B'::BLOB AS bl",
        "SELECT row(1, 'x') AS r",
        "SELECT struct_extract({'a': 7}, 'a') AS se",
        "SELECT map_extract(map([1], ['v']), 1) AS me",
        "SELECT map_from_entries([(1, 'a'), (2, 'b')]) AS mfe",
    ],
    "r10_late_dml": [
        # late-r10 sweep: PG-style join DML (UPDATE ... FROM,
        # DELETE ... USING), map_entries, PRAGMA/CHECKPOINT statements
        "CREATE OR REPLACE TABLE probe_uf_a AS"
        " SELECT * FROM (VALUES (1, 10), (2, 20), (3, 30)) t(k, v)",
        "CREATE OR REPLACE TABLE probe_uf_b AS"
        " SELECT * FROM (VALUES (1, 100), (3, 300)) t(k, nv)",
        "UPDATE probe_uf_a SET v = b.nv FROM probe_uf_b b"
        " WHERE probe_uf_a.k = b.k",
        "SELECT * FROM probe_uf_a ORDER BY k",
        "DELETE FROM probe_uf_a USING probe_uf_b b WHERE probe_uf_a.k = b.k",
        "SELECT * FROM probe_uf_a ORDER BY k",
        # aliased target + expression assignment through the joined row
        "UPDATE probe_uf_b AS x SET nv = x.nv + probe_uf_a.v FROM probe_uf_a"
        " WHERE x.k = probe_uf_a.k + 1",
        "SELECT * FROM probe_uf_b ORDER BY k",
        "DROP TABLE probe_uf_a",
        "DROP TABLE probe_uf_b",
        "SELECT map_entries(map([1, 2], ['a', 'b'])) AS e",
        "CHECKPOINT",
    ],
    "r11_window_edges": [
        "CREATE OR REPLACE TABLE probe_w AS SELECT * FROM (VALUES"
        " (1, 10), (2, NULL), (3, 30), (4, NULL), (5, 50)) t(k, x)",
        "SELECT k, first_value(x IGNORE NULLS) OVER (ORDER BY k) a,"
        " last_value(x IGNORE NULLS) OVER (ORDER BY k) b"
        " FROM probe_w ORDER BY k",
        "SELECT k, lag(x IGNORE NULLS) OVER (ORDER BY k) a,"
        " lead(x, -1) OVER (ORDER BY k) b FROM probe_w ORDER BY k",
        "SELECT k, nth_value(x, 2) OVER (ORDER BY k) a"
        " FROM probe_w ORDER BY k",
        "SELECT k, rank() OVER (ORDER BY x NULLS FIRST) a,"
        " percent_rank() OVER (ORDER BY x) b FROM probe_w ORDER BY k",
    ],
    "r11_overflow": [
        # integer overflow is LOUD on both engines (duck Out of Range,
        # Spark ANSI ARITHMETIC_OVERFLOW) — both_err is the parity
        "SELECT 2147483647 + 1 AS v",
        "SELECT 9223372036854775807 + 1 AS v",
        "SELECT CAST(127 AS TINYINT) + CAST(1 AS TINYINT) AS v",
        "SELECT 9223372036854775807 * 2 AS v",
        "SELECT abs(CAST(-2147483648 AS INT)) AS v",
        # factorial: HUGEINT everywhere, n<=0 -> 1, >33 errors
        "SELECT factorial(21) AS a, factorial(0) AS b, factorial(-1) AS c",
        "SELECT factorial(33) AS v",
        "SELECT factorial(34) AS v",
        "SELECT 21! AS v",
        "SELECT factorial(NULL::INT) AS v",
        "SELECT factorial(20) AS v",
    ],
    "r11_string_edges": [
        # argument-edge defaults: negative lengths/counts, empty
        # separators/pads, special-casing, reversed-order trim args
        "SELECT substring('hello', 3, -1) AS a, substr('hello', 2, -5) AS b",
        "SELECT substring('hello', -3, 2) AS a, substring('hello', 0, 2) AS b",
        "SELECT repeat('ab', -1) AS a, repeat('ab', 0) AS b",
        "SELECT lpad('abc', 2, 'x') AS a, lpad('abc', -1, 'x') AS b,"
        " rpad('ab', 5, 'xy') AS c",
        "SELECT trim('xxhixx', 'x') AS a, ltrim('xxhix', 'x') AS b,"
        " rtrim('xhixx', 'x') AS c",
        "SELECT upper('stra\u00dfe') AS a, lower('STRA\u1e9eE') AS b",
        # simple-vs-full case mapping: ligatures, iota subscripts,
        # final sigma context, dotted capital I, aliases, nesting
        "SELECT upper('\ufb01le \ufb00 \u1e9a') AS a,"
        " upper('\u1f80\u1fb3\u1fc3') AS b",
        "SELECT lower('\u039f\u03a3 \u03a3\u039f\u03a3') AS a,"
        " lower('\u0130stanbul') AS b",
        "SELECT ucase('gro\u00df') AS a, lcase('GRO\u1e9e') AS b",
        "SELECT upper(concat('stra', '\u00dfe')) AS a,"
        " length(upper('stra\u00dfe')) AS n",
        "SELECT k FROM (VALUES (1)) t(k) WHERE upper('\u00df') = '\u1e9e'",
        "SELECT '\u00df' ILIKE '\u1e9e' AS a, 'SS' ILIKE '\u00df' AS b,"
        " 'STRA\u1e9eE' ILIKE 'stra\u00dfe' AS c,"
        " 'STRASSE' ILIKE 'stra\u00dfe' AS d",
        "SELECT '\u0130' ILIKE 'i' AS a, '\u00e9' ILIKE '\u00c9' AS b,"
        " 'abc' ILIKE 'A%' AS c",
        "SELECT split_part('a,b', ',', -1) AS a, split_part('a,b', ',', 5) AS b,"
        " split_part('', ',', 1) AS c",
        "SELECT string_split('', ',') AS a, string_split('a', '') AS b,"
        " string_split('a,,b', ',') AS c",
        "SELECT concat_ws(',', 'a', NULL, 'b') AS a, concat_ws(NULL, 'a', 'b') AS b",
        "SELECT left('abc', 5) AS a, right('abc', 5) AS b,"
        " left('abc', -1) AS c, right('abc', -1) AS d",
        "SELECT replace('aaa', '', 'b') AS a, contains('abc', '') AS b,"
        " strpos('abc', '') AS c",
        "SELECT reverse('h\u00e9llo') AS a, ascii('\u20ac') AS b",
        "SELECT regexp_extract('abc', '') AS a, regexp_matches('abc', '') AS b",
        "SELECT md5('') AS a, format('{}', NULL) AS b",
    ],
    "r11_decimal": [
        # DuckDB '/' is ALWAYS double; avg(DECIMAL) is double (Spark:
        # DECIMAL with its own scale rules — trailing-zero text).
        # decimal sweep, r11 second session.
        "CREATE OR REPLACE TABLE probe_dec AS SELECT"
        " CAST(k AS INT) AS k, CAST(p AS DECIMAL(12,2)) AS p,"
        " CAST(q AS DECIMAL(10,4)) AS q FROM (VALUES"
        " (1, 10.25, 0.1234), (2, 3.50, 2.0000), (3, 7.33, NULL))"
        " v(k, p, q)",
        "SELECT 1.0/3.0 AS a, 1/3 AS b, 7/2 AS c, -7/2 AS d",
        "SELECT CAST(1.23 AS DECIMAL(10,2)) / CAST(0.7 AS DECIMAL(10,2)) AS v",
        "SELECT 1.5::DECIMAL(20,10) / 7 AS v",
        "SELECT (1.5 + 2.5) / 2 AS v, 7.5 // 2 AS w, -7.55 // 2 AS x",
        "SELECT k, p / 7 AS a, p / q AS b FROM probe_dec ORDER BY k",
        "SELECT sum(p) / count(*) AS v FROM probe_dec",
        "SELECT avg(p) AS a, avg(DISTINCT p) AS ad, mean(q) AS m"
        " FROM probe_dec",
        "SELECT sum(p) AS sp, min(p) AS mn, max(p) AS mx FROM probe_dec",
        "SELECT p % 2 AS v FROM probe_dec ORDER BY k",
        "SELECT 123.456 % 2.5 AS a, 10.0 % 3 AS b",
        "SELECT k, p * q AS v FROM probe_dec ORDER BY k",
        "SELECT p + q AS v FROM probe_dec ORDER BY k",
        "SELECT round(p, 1) AS v FROM probe_dec ORDER BY k",
        "SELECT 0.1 + 0.2 AS v",
    ],
    "r10_varchar_family": [
        # DuckDB: TEXT/STRING/[N]VARCHAR/[BP]CHAR/CHARACTER [VARYING]
        # are ONE length-less type; any (n) is parsed then IGNORED
        # (Spark would truncate/pad — silent value divergence)
        "SELECT 'a'::TEXT AS v",
        "SELECT CAST(1 AS TEXT) AS v",
        "SELECT TRY_CAST(123 AS TEXT) AS v",
        "SELECT 'a'::CHARACTER VARYING AS v",
        "SELECT 'abcd'::VARCHAR(2) AS v",
        "SELECT CAST('abcd' AS CHAR(2)) AS v",
        "SELECT 'a'::NVARCHAR AS v",
        "SELECT 'ab'::BPCHAR AS v",
        "SELECT 'ab'::CHARACTER AS v",
        "CREATE OR REPLACE TABLE probe_vf (c TEXT, d VARCHAR(3))",
        "INSERT INTO probe_vf VALUES ('xyz', 'abcdef')",
        "SELECT c, d FROM probe_vf",
        "DROP TABLE probe_vf",
        # `text` stays reachable as a column name / alias
        "SELECT text FROM documents ORDER BY doc_id LIMIT 1",
        "SELECT 7 AS text",
    ],
    # r10 default-semantics sweep closures (scripts/sweep_defaults.py):
    # chained casts, bracket slices, list NULL semantics, json paths,
    # printf/LIKE defaults — each had a fix in compat.py this round
    "r10_sweep": [
        "SELECT 1.999::DOUBLE::INTEGER AS a, (-1.999)::DOUBLE::INTEGER AS b",
        "SELECT 2.5::DOUBLE::INT AS a, 3.5::DOUBLE::INT AS b",
        "SELECT '1.5'::INTEGER AS a, '1e3'::INTEGER AS b, '0x1A'::INTEGER AS c",
        "SELECT TRY_CAST('1.5' AS INTEGER) AS a, TRY_CAST('abc' AS INTEGER) AS b",
        "SELECT 1.5::DECIMAL(4,1)::INTEGER AS a, 2.5::DECIMAL(4,1)::INTEGER AS b",
        "SELECT ''::VARCHAR::BLOB AS eb, 'ab'::BLOB::VARCHAR AS bs",
        "SELECT (DATE '2024-01-02')::TIMESTAMP::VARCHAR AS d2ts",
        "SELECT ([1, 2, 3])[-1] AS n, ([1, 2, 3])[0] AS z, ([1, 2, 3])[9] AS o",
        "SELECT ([1, 2, 3, 4])[2:3] AS a, ([1, 2, 3, 4])[:2] AS b, ([1, 2, 3, 4])[3:] AS c",
        "SELECT ([1, 2, 3, 4])[-2:] AS d, ([1, 2, 3, 4])[:-2] AS e, ([1, 2, 3, 4])[3:2] AS f",
        "SELECT ([1, 2, 3, 4, 5])[1:5:2] AS st",
        "SELECT 'abcdef'[2:4] AS a, 'abcdef'[:3] AS b, 'abcdef'[-3:] AS c, 'abc'[2] AS d",
        "SELECT unnest(NULL::INTEGER[]) AS u",
        "SELECT list_concat([1], NULL) AS a, array_cat(NULL, [2]) AS b",
        "SELECT [1, 2] || NULL AS a, NULL || [3] AS b",
        "SELECT list_contains([1, NULL], 9) AS a, list_contains([1, 2], NULL) AS b",
        "SELECT list_position([1, 2], NULL) AS a, list_indexof([5, 6], 6) AS b",
        "SELECT list_intersect([1, 2, NULL], [2, NULL, 3]) AS li",
        "SELECT flatten([[1, 2], NULL, [3]]) AS fl",
        "SELECT list_sum([1, NULL, 2]) AS a, list_avg([1, 2, NULL]) AS b, list_sum([]) AS c",
        "SELECT list_aggr([1, 2], 'string_agg', '-') AS la",
        "SELECT len([1, 2, 3]) AS a, array_length([1, 2]) AS b, cardinality(MAP([1], ['a'])) AS c",
        "SELECT array_value(1, 2) AS av",
        "SELECT map_values(map_concat(MAP([1], ['a']), MAP([1], ['z']))) AS m",
        "SELECT split_part('a,b,c', '', 2) AS a, string_split('abc', '') AS b",
        "SELECT substr('abcdef', 3, -2) AS a, substr('abcdef', -2, -1) AS b",
        "SELECT fdiv(7.5, 2) AS a, fmod(-7, 3) AS b",
        "SELECT regexp_escape('a.b c') AS re",
        "SELECT md5_number_lower('abc') AS l, md5_number_upper('abc') AS u",
        "SELECT chr(960) AS a, chr(128512) AS b",
        "SELECT format_bytes(1000000) AS a, formatReadableDecimalSize(1500) AS b",
        "SELECT json_extract('{\"a\": {\"b\": 7}}', 'a') AS a, json_extract('{\"a\": {\"b\": 7}}', '/a/b') AS b",
        "SELECT json_extract('[1, 2, 3]', '$[-1]') AS a, json_extract('[1, 2]', 1) AS b",
        "SELECT json_extract_string('[1.50, \"x\"]', '$[-2]') AS es",
        "SELECT json_array_length('{}') AS a, json_array_length('\"x\"') AS b",
        "SELECT json_array(1, 'a', NULL) AS ja, json_object('a', 1, 'b', NULL) AS jo",
        "SELECT '{\"a\":1}'::JSON = '{\"a\": 1}'::JSON AS eq, len('[1, 2]'::JSON) AS l",
        "SELECT from_json('[1,2]', '[\"INTEGER\"]') AS fj",
        "SELECT printf('%5.2f|%d|%s', 3.14159, 42, 'x') AS pf",
        "SELECT 'a_c' LIKE 'a\\_c' AS esc, 'a\\c' LIKE 'a\\c' AS bs",
        # error-parity guards: both engines must ERROR (both_err class)
        "SELECT ln(0.0) AS e",
        "SELECT ln(-1.0) AS e",
        "SELECT sqrt(-1.0) AS e",
        "SELECT acos(2.0) AS e",
        "SELECT lpad('abc', 5, '') AS e",
        # and their value paths stay exact
        "SELECT ln(1.0) AS a, log(100.0) AS b, log(2, 8.0) AS c, sqrt(4.0) AS d, acos(1.0) AS e2, asin(0.5) AS f",
        # lenient literal casts + string slices through the fn spelling
        "SELECT '2024/01/02'::DATE AS d2",
        "SELECT '[1, 2]'::INTEGER[] AS l",
        "SELECT array_slice('abcdef', 2, 4) AS s1, list_slice('abcdef', -3, -1) AS s2",
        "SELECT '1 day'::INTERVAL AS iv, '1:02:03'::INTERVAL AS iv3",
        # datetime sweep closures
        "SELECT extract(isodow FROM DATE '2024-01-15') AS a, extract(epoch FROM TIMESTAMP '2024-01-01 00:00:01.5') AS b",
        "SELECT extract(microseconds FROM TIMESTAMP '2024-01-01 00:00:01.5') AS us, extract(second FROM TIMESTAMP '2024-01-01 00:00:01.75') AS s",
        "SELECT yearweek(DATE '2024-12-30') AS yw, isoyear(DATE '2024-12-30') AS iy, weekday(DATE '2024-01-14') AS wd",
        "SELECT julian(DATE '2024-01-01') AS j, epoch_us(TIMESTAMP '2024-01-01 00:00:00.5') AS us2",
        "SELECT timezone('America/New_York', TIMESTAMP '2024-06-01 00:00:00') AS tz",
        "SELECT strptime('02/01/2024 3:04 PM', '%d/%m/%Y %I:%M %p') AS sp, try_strptime('bogus', '%Y-%m-%d') AS ts",
        "SELECT date_part(['year', 'month'], DATE '2024-05-02') AS multi",
        # regex sweep closures
        "SELECT regexp_full_match('abc', 'a.c') AS fm, regexp_matches('AB', 'ab', 'i') AS ci",
        "SELECT regexp_extract('abc123', '([a-z]+)([0-9]+)', 9) AS e9",
        "SELECT regexp_replace('a.a', '.', 'x', 's') AS dotall",
        "SELECT regexp_extract('2024-01-02', '(\\d+)-(\\d+)-(\\d+)', ['y', 'm', 'd']) AS grp",
        # aggregate-edge closures
        "SELECT any_value(x) AS av FROM (VALUES (NULL), (2)) t(x)",
        "SELECT array_agg(x) AS aa, list(x) AS l FROM (VALUES (1), (NULL), (2)) t(x)",
    ],
    "r11_composite_3vl": [
        # struct/list/map = with NULL elements is THREE-valued in
        # DuckDB (r10 sweep residue, closed r11 by
        # compat._rewrite_composite_eq/_in)
        "SELECT (1,NULL)=(1,NULL) AS a, (1,NULL)=(1,2) AS b,"
        " (1,NULL)=(2,NULL) AS c, (1,2)=(1,2) AS d",
        "SELECT (1,NULL)<>(1,NULL) AS a, (1,NULL)<>(2,NULL) AS b",
        "SELECT [1,NULL]=[1,NULL] AS a, [1,NULL]=[1,2] AS b,"
        " [1,NULL]=[2,NULL] AS c, [1]=[1,2] AS d, [1,NULL]=[1] AS e",
        "SELECT [[1,NULL]]=[[1,NULL]] AS a, (1,[2,NULL])=(1,[2,NULL]) AS b",
        "SELECT {'a':1,'b':NULL}={'a':1,'b':NULL} AS a,"
        " {'a':1,'b':2}={'b':2,'a':1} AS b",
        "SELECT MAP([1],[NULL])=MAP([1],[NULL]) AS a,"
        " MAP([1,2],[10,20])=MAP([2,1],[20,10]) AS b,"
        " MAP([1],[10])=MAP([1,2],[10,20]) AS c,"
        " MAP([1],[NULL])=MAP([1],[10]) AS d",
        # sequential short-circuit: the FIRST non-TRUE element decides
        # (an early NULL is NOT overridden by a later definite
        # mismatch), and list length only decides after a TRUE prefix
        "SELECT (NULL,2)=(1,3) AS a, (1,NULL)=(2,3) AS b,"
        " [NULL,2]=[1,3] AS c, [2,NULL]=[3,NULL] AS d,"
        " [NULL,2]=[1] AS e, [1,NULL]=[1] AS f, [NULL]=[NULL,NULL] AS g",
        "SELECT MAP([1,2],[NULL,5])=MAP([1,9],[3,5]) AS a,"
        " MAP([1],[NULL])=MAP([1,2],[10,20]) AS b",
        # context split (probed, duck 1.x): COLUMN comparisons are 3VL
        # in PROJECTION position but 2VL total-order in FILTER
        # position (Spark-native there); pure literals constant-fold
        # to 3VL everywhere
        "CREATE OR REPLACE TABLE probe_comp AS SELECT * FROM (VALUES"
        " (1, [1,2], [1,2]), (2, [1,NULL], [1,NULL]),"
        " (3, [1,NULL], [1,2]), (4, [2,NULL], [1])) t(k, a, b)",
        "SELECT k, a = b AS e, a <> b AS ne FROM probe_comp ORDER BY k",
        "SELECT k FROM probe_comp WHERE a = b ORDER BY k",
        "SELECT k FROM probe_comp WHERE a = [1,NULL] ORDER BY k",
        "SELECT k, CASE WHEN a = b THEN 1 ELSE 0 END AS c"
        " FROM probe_comp ORDER BY k",
        "SELECT k, a IN ([1,NULL]) AS e, a NOT IN ([1,2]) AS ne"
        " FROM probe_comp ORDER BY k",
        "SELECT k FROM probe_comp WHERE a IN ([1,NULL]) ORDER BY k",
        "SELECT k, a = [1,NULL] AS e FROM probe_comp ORDER BY k",
        "DROP TABLE probe_comp",
        "SELECT 1 AS one WHERE [1,NULL] = [1,NULL]",
        "SELECT (1,NULL) IN ((1,NULL),(2,3)) AS a,"
        " (1,2) IN ((1,NULL),(2,3)) AS b, (1,2) IN ((1,2),(2,3)) AS c,"
        " (1,NULL) IN ((2,3),(4,5)) AS d",
        "SELECT (1,2) NOT IN ((1,NULL),(2,3)) AS a,"
        " [1,NULL] IN ([1,NULL]) AS b",
        "SELECT n_name FROM nation WHERE (n_regionkey, NULL) ="
        " (n_regionkey, NULL) ORDER BY n_name",
        # projection-position IN-subquery is 3VL in DuckDB; Spark
        # folds UNKNOWN→FALSE there (closed r11 by
        # compat._rewrite_projection_in_subq; WHERE-position was
        # already green)
        "SELECT 1 IN (SELECT NULL) AS a, 1 IN (SELECT 1) AS b,"
        " 1 IN (SELECT 2 WHERE FALSE) AS c, NULL IN (SELECT 1) AS d,"
        " NULL IN (SELECT 2 WHERE FALSE) AS e",
        "SELECT 1 NOT IN (SELECT NULL) AS a, 1 NOT IN (SELECT 1) AS b,"
        " 5 NOT IN (SELECT 2 WHERE FALSE) AS c",
        "SELECT n_name, n_regionkey IN (SELECT r_regionkey FROM region"
        " WHERE r_name LIKE 'A%') AS m FROM nation ORDER BY n_name",
        # strptime year defaults/pivot (r10 sweep residue, closed r11):
        # no year directive → 1900 (C strptime), %y uses the 69-99 →
        # 19xx C pivot (Java 'yy' is base-2000)
        "SELECT strptime('03-15', '%m-%d') AS a, strptime('15', '%d') AS b,"
        " strptime('12:30', '%H:%M') AS c",
        "SELECT strptime('99 03-15', '%y %m-%d') AS a,"
        " strptime('69 03-15', '%y %m-%d') AS b,"
        " strptime('68 03-15', '%y %m-%d') AS c,"
        " strptime('00 03-15', '%y %m-%d') AS d",
        "SELECT try_strptime('03-15', '%m-%d') AS a,"
        " try_strptime('bogus', '%m-%d') AS b",
        # composite ::VARCHAR renders duck-style inside a query
        # (closed r11 by compat.rewrite_composite_varchar →
        # duck_varchar UDF; previously Spark's {1} render)
        "SELECT {'a': 1, 'b': [1,2]}::VARCHAR AS a, [1,2]::VARCHAR AS b,"
        " (1, 'x')::VARCHAR AS c",
        "SELECT MAP([1,2],['x','y'])::VARCHAR AS a,"
        " ['a b', NULL, '']::VARCHAR AS b, {'a': NULL}::VARCHAR AS c",
        "SELECT list_zip([1,2],[3,4])::VARCHAR AS a,"
        " [DATE '2024-01-01']::VARCHAR AS b, [true, false]::VARCHAR AS c",
        "SELECT CAST([1.5, NULL] AS VARCHAR) AS a,"
        " CAST({'k': 'v'} AS VARCHAR) AS b, length([1,2]::VARCHAR) AS c",
    ],
    "r11_float_edges": [
        # float-edge sweep (r11): NaN/-0.0/inf across comparisons,
        # grouping, ordering, aggregation — 20/21 matched natively;
        # the floor/ceil-on-DOUBLE divergence is closed by
        # compat.rewrite_double_floor_ceil
        "SELECT 'NaN'::DOUBLE = 'NaN'::DOUBLE AS a,"
        " 'NaN'::DOUBLE > 1e308 AS b, 'NaN'::DOUBLE < 'inf'::DOUBLE AS c",
        "SELECT count(DISTINCT x) AS c FROM (VALUES ('NaN'::DOUBLE),"
        " ('NaN'::DOUBLE), (CAST(1.0 AS DOUBLE))) t(x)",
        "SELECT x FROM (VALUES (CAST(1.0 AS DOUBLE)), ('NaN'::DOUBLE),"
        " ('inf'::DOUBLE), ('-inf'::DOUBLE), (CAST(NULL AS DOUBLE))) t(x)"
        " ORDER BY x",
        "SELECT max(x) AS m, min(x) AS n, sum(x) AS s FROM (VALUES"
        " (CAST(1.0 AS DOUBLE)), ('NaN'::DOUBLE)) t(x)",
        "SELECT 'inf'::DOUBLE + 1 AS a, 'inf'::DOUBLE - 'inf'::DOUBLE AS b,"
        " 0.0 * 'inf'::DOUBLE AS c, nullif('NaN'::DOUBLE, 'NaN'::DOUBLE) AS d",
        "SELECT greatest(CAST(1.0 AS DOUBLE), 'NaN'::DOUBLE) AS g,"
        " least(CAST(1.0 AS DOUBLE), 'NaN'::DOUBLE) AS l",
        "CREATE OR REPLACE TABLE probe_fe AS SELECT * FROM (VALUES"
        " (1, 2.7::DOUBLE), (2, -2.7::DOUBLE), (3, 'NaN'::DOUBLE),"
        " (4, 'inf'::DOUBLE), (5, NULL::DOUBLE), (6, 1e300::DOUBLE))"
        " t(k, x)",
        "SELECT k, floor(x) AS f, ceil(x) AS c FROM probe_fe ORDER BY k",
        "SELECT k, trunc(x) AS t FROM probe_fe ORDER BY k",
        "DROP TABLE probe_fe",
        "SELECT floor(2.7) AS f, ceil(2.2) AS c, round(2.5) AS r",
        # alias/limit sweep closures (r11): LIMIT ALL, OFFSET-first
        # spelling, ORDER/GROUP BY ALL were already green; the
        # OFFSET n LIMIT m order is swapped by _rewrite_offset_limit
        "SELECT n_name FROM nation ORDER BY n_name OFFSET 2 LIMIT 3",
        "SELECT n_name FROM nation ORDER BY n_name LIMIT ALL OFFSET 22",
    ],
    "r14_closures": [
        # Grisu3 float32 text (the certification-failure class)
        "SELECT 46977.5625::FLOAT::VARCHAR AS a,"
        " 3948464128.0::FLOAT::VARCHAR AS b,"
        " 1.00390625::FLOAT::VARCHAR AS c, 0.1::FLOAT::VARCHAR AS d",
        "SELECT CAST(1e20 AS VARCHAR) AS a,"
        " CAST(46977.5625::FLOAT AS VARCHAR) AS b",
        # TIME ± INTERVAL mod-24h wrap + colon interval shorthand
        "SELECT TIME '23:30:00' + INTERVAL 1 HOUR AS a,"
        " TIME '00:30:00' - INTERVAL 1 HOUR AS b,"
        " TIME '12:00:00' + INTERVAL 36 HOUR AS c",
        "SELECT TIME '12:00:00' + INTERVAL '1 day 2 hours' AS a,"
        " INTERVAL 1 HOUR + TIME '23:30:00' AS b,"
        " CAST('23:30:00' AS TIME) + INTERVAL '2:45:00' AS c",
        # interval ::VARCHAR duck text, both spellings
        "SELECT CAST(INTERVAL 14 MONTH AS VARCHAR) AS a,"
        " INTERVAL '1 year 1 month'::VARCHAR AS b,"
        " (INTERVAL 24 MONTH)::VARCHAR AS c",
        "SELECT (INTERVAL 3 DAY)::VARCHAR AS a,"
        " (INTERVAL 25 HOUR)::VARCHAR AS b,"
        " (INTERVAL '3 days 4 hours')::VARCHAR AS c,"
        " (INTERVAL '0:00:00.5')::VARCHAR AS d",
        # ym interval RESULT columns render duck text on the wire
        "SELECT INTERVAL 14 MONTH AS ym, INTERVAL '2 years' AS y2",
        # typed printf/format over columns: accepted kinds
        "SELECT printf('%s', d_date) AS a FROM"
        " (SELECT DATE '2024-01-02' AS d_date) t",
        "SELECT printf('%d', true) AS a, format('{}', 42) AS b",
        # BIT select items carry OID 1560 (values compare as text)
        "SELECT '0101'::BIT AS b, '0101'::BIT & '0011'::BIT AS a",
        # format generic {} renders duck SQL text
        "SELECT format('{}', DATE '2024-01-02') AS a,"
        " format('{} {}', DATE '2024-01-02', true) AS b,"
        " format('{}', 1e20) AS c",
        # scalar special-typed column VARCHAR casts + || concat
        "SELECT (l_extendedprice * 1e15)::VARCHAR AS a,"
        " 'v=' || (l_extendedprice * 1e15) AS b"
        " FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 3",
    ],
    "r15_closures": [
        # || precedence: duck binds arithmetic tighter than ||; Spark
        # parses || in the +/- tier — these errored or printed Java text
        "SELECT 'x' || 2 + 1 AS a, 'x' || 2 - 1 AS b,"
        " 'x' || 2.5 * 2 + 1 AS c",
        "SELECT 'x' || l_extendedprice * 1e15 AS a,"
        " l_extendedprice * 1e15 || '!' AS b"
        " FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 3",
        "SELECT 'x' || 1e19 * 2 AS a, 1e19 * 2 || 'y' AS b",
        # interval operands of || render duck interval text
        "SELECT 'x' || INTERVAL 25 HOUR AS a,"
        " INTERVAL '1' DAY || 'x' AS b, 'x' || INTERVAL 14 MONTH AS c",
        # literal-only interval arithmetic folds with duck's component
        # semantics (never renormalized; '/' truncates per component)
        "SELECT (INTERVAL 25 HOUR + INTERVAL 0 DAY)::VARCHAR AS a,"
        " (INTERVAL '2 days' - INTERVAL '26 hours')::VARCHAR AS b,"
        " (INTERVAL 36 HOUR / 2)::VARCHAR AS c,"
        " (INTERVAL '3 days' / 2)::VARCHAR AS d",
        # fractional interval quantities (Spark's parser refuses these)
        "SELECT (INTERVAL '1.5 days')::VARCHAR AS a,"
        " (INTERVAL '1.5 months')::VARCHAR AS b,"
        " (INTERVAL '1.04 years')::VARCHAR AS c,"
        " 'x' || INTERVAL '1.5 days' AS d",
        # mixed-width float cast tails: REAL on a sub-operand is DOUBLE
        "SELECT CAST(0.1::DOUBLE + 0.2::REAL AS VARCHAR) AS a,"
        " CAST((0.1::DOUBLE + 0.2)::REAL AS VARCHAR) AS b",
        # FLOAT×INT arithmetic renders float32 text (duck keeps FLOAT
        # where Spark widens to DOUBLE)
        "SELECT (0.1::FLOAT * 2)::VARCHAR AS a,"
        " CAST(0.1::FLOAT / 2 AS VARCHAR) AS b,"
        " 'x' || 0.1::FLOAT * 2 AS c, format('{}', 0.1::FLOAT * 2) AS d",
        # printf typed mismatch is QUIET on zero-row input (runtime
        # per-row dispatch, not analysis-time)
        "SELECT printf('%d', d) AS a FROM"
        " (SELECT DATE '2024-01-02' AS d) t WHERE 1 = 0",
        # bit-involving items that are NOT bit-typed keep native OIDs
        "SELECT '0101'::BIT = '0101'::BIT AS eq,"
        " ('101'::BIT)::VARCHAR AS v",
        # interval∪varchar set-op branches widen to VARCHAR with
        # duck's interval text (literal arithmetic keeps duck's
        # component provenance via the fold)
        "SELECT INTERVAL '2 days' - INTERVAL '26 hours' AS c"
        " UNION ALL SELECT 'x' AS c",
        "SELECT INTERVAL 7 HOUR + INTERVAL 0 DAY AS c"
        " UNION ALL SELECT 'y' AS c ORDER BY c",
        # || with NO string side: duck stringifies both operands
        # unless both are lists
        "SELECT 1e20 || 1.5 AS a, 1 || 2 AS b,"
        " INTERVAL 1 DAY || INTERVAL 2 HOUR AS c,"
        " [1,2] || 3 AS d, 1e20 || [1,2] AS e, [1,2] || [3] AS f",
        "SELECT l_extendedprice * 1e15 || l_linenumber AS a"
        " FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 3",
        # user concat_ws value args stringify duck-style
        "SELECT concat_ws('-', 'x', 1e19 * 2) AS a,"
        " concat_ws(',', 'a', INTERVAL 25 HOUR) AS b",
        # duck LIST||LIST skips NULL operands; chains adjacent to a
        # non-list operand stringify the COMBINED list
        "SELECT [1,2] || [3] || 'z' AS a, [7] || NULL::INT[] AS b,"
        " NULL::INT[] || [7] AS c, NULL::INT[] || NULL::INT[] AS d",
        # element-wise VARCHAR[] casts render duck text per element
        "SELECT ([1e20, 1.5])::VARCHAR[] AS a,"
        " CAST([1e20, NULL] AS VARCHAR[]) AS b,"
        " ([INTERVAL 25 HOUR])::VARCHAR[] AS c,"
        " ([0.25::FLOAT])::VARCHAR[] AS d",
        # fractional interval literals in arithmetic positions
        "SELECT TIMESTAMP '2024-01-01 00:00:00'"
        " + INTERVAL '1.5 days' AS a,"
        " DATE '2024-01-01' + INTERVAL '1.5 days' AS b,"
        " INTERVAL '1.5 days' > INTERVAL '1 day' AS c,"
        " (INTERVAL '1.5' DAY)::VARCHAR AS d,"
        " (INTERVAL '1.99' SECOND)::VARCHAR AS e",
        # string COLUMN adjacency: s || special renders duck text
        "SELECT n_name || l_extendedprice * 1e15 AS a"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
        " JOIN nation ON c_nationkey = n_nationkey"
        " ORDER BY l_orderkey, l_linenumber LIMIT 3",
    ],
    "r17_f32_fn_tier": [
        # round/trunc/ceil/floor keep FLOAT over f32 operands (typer
        # tier, VERDICT r16 item 2); the type-blind cast-unit leg
        # drives these — no catalog column needed
        "SELECT CAST(round(0.15::FLOAT * 2, 1) AS DOUBLE) AS v",
        "SELECT CAST(round(2.675::FLOAT, 2) AS DOUBLE) AS v",
        "SELECT round(CAST(-0.2 AS FLOAT)) AS v",
        "SELECT round(123456.789::FLOAT, -2) AS v",
        "SELECT trunc(CAST(-2.7 AS FLOAT)) AS v",
        "SELECT trunc(0.7::FLOAT * 5) AS v",
        "SELECT ceil(0.1::FLOAT * 3) AS v",
        "SELECT floor(CAST(-0.7 AS FLOAT)) AS v",
        "SELECT (round(0.1::FLOAT * 3, 1) = 0.3) AS a,"
        " (ceil(2.5::FLOAT) = 3) AS b",
        # greatest/least widen to DOUBLE whenever a FLOAT operand is
        # present; f32 arithmetic inside operands narrows first
        "SELECT greatest(0.1::FLOAT * 3, 0.3) AS v",
        "SELECT least(0.1::FLOAT * 3, 0.3) AS v",
        "SELECT greatest(0.1::FLOAT, 1) AS v",
        # window value functions keep the argument's FLOAT; lag/lead
        # DEFAULT casts to the value type (alias-kind propagation
        # types f in the derived table)
        "SELECT i, CAST(lag(f) OVER (ORDER BY i) AS DOUBLE) AS v FROM"
        " (SELECT 1 AS i, 0.1::FLOAT AS f UNION ALL SELECT 2,"
        " 0.3::FLOAT) t ORDER BY i",
        "SELECT i, CAST(lag(f * 2, 1, 0.123) OVER (ORDER BY i) AS DOUBLE)"
        " AS v FROM (SELECT 1 AS i, 0.1::FLOAT AS f UNION ALL SELECT 2,"
        " 0.3::FLOAT) t ORDER BY i",
        "SELECT i, CAST(first_value(f * 3) OVER (ORDER BY i) AS DOUBLE)"
        " AS v FROM (SELECT 1 AS i, 0.1::FLOAT AS f UNION ALL SELECT 2,"
        " 0.3::FLOAT) t ORDER BY i",
        # SIGNED decimal literal in the functional CAST form takes
        # duck's unscaled/10^scale model (wire-DML test find)
        "SELECT CAST(CAST(-7.31271505355835 AS FLOAT) AS DOUBLE) AS v",
        "SELECT CAST(-0.333333333333333 AS FLOAT) = -0.1::FLOAT * 3"
        " AS a",
    ],
}


def norm_cell(v: object) -> str | None:
    """DuckDB Python value → the text the WIRE would render for the
    same value (r8: routed through the server's own encode_text so
    list/bool/float/Infinity representation artifacts stop counting as
    mismatches — only genuine value differences remain)."""
    if v is None:
        return None
    from duckdb_pgwire_spark.server.typemap import encode_text

    if isinstance(v, tuple):  # duckdb renders ARRAY[n] values as tuples
        v = list(v)
    if (
        isinstance(v, dict)
        and set(v.keys()) == {"key", "value"}
        and isinstance(v.get("key"), list)
        and isinstance(v.get("value"), list)
        and len(v["key"]) == len(v["value"])
    ):
        # duckdb's python client returns MAP cells as the columnar
        # {'key': [...], 'value': [...]} shape — fold to a real dict
        # so it encodes like the wire's map render. A genuine STRUCT
        # spelled {'key': .., 'value': ..} or a map with unhashable
        # (list) keys stays as-is (review r10)
        try:
            v = dict(zip(v["key"], v["value"]))
        except TypeError:
            pass
    return encode_text(v)


# Cases where a DIFF is understood and accepted, with the reason —
# counted as 'known' so the mismatch census only surfaces NEW drift.
KNOWN_DIFFS: dict[str, str] = {
    "SELECT INTERVAL 14 MONTH AS ym, INTERVAL '2 years' AS y2":
        "duckdb python client renders ym intervals as 30-day "
        "timedeltas (420 days); the engine's own text is "
        "'1 year 2 months' (proved by the ::VARCHAR probes, r14) — "
        "same class as the documented age() artifact",
    "SELECT current_schema() AS cs": "identity: Spark default db answers",
    "SELECT current_database() AS cd": "identity: Spark default db answers",
    "SELECT version() AS v": "identity: PG-compatible banner",
    "SELECT * FROM region USING SAMPLE 2 ROWS": "random sample",
    "SELECT list_distinct([1, 1, 2]) AS ld":
        "unordered result (DuckDB hash order vs Spark first-occurrence)",
    "SELECT list_intersect([1, 2, 3], [2, 3, 4]) AS li":
        "unordered result (DuckDB hash order vs Spark first-occurrence)",
    "SELECT age(TIMESTAMP '2024-03-05', TIMESTAMP '2023-01-04') AS ag":
        "python API yields timedelta; wire matches DuckDB's interval text",
    "SELECT row(1, 'x') AS r": "python API yields tuple; wire renders json",
    "SELECT list_zip([1, 2], [3, 4]) AS lz":
        "python API yields tuples; wire renders struct json",
    # (the map/histogram dict-of-lists entries retired r10: norm_cell
    # folds duckdb's columnar map repr, so they value-match now)
}

_DML_WORDS = ("CREATE", "INSERT", "UPDATE", "DELETE", "DROP", "ALTER")


def rows_equal(wire_rows: list[list[str | None]], duck_rows: list[tuple]) -> bool:
    if len(wire_rows) != len(duck_rows):
        return False
    for wr, dr in zip(wire_rows, duck_rows):
        if len(wr) != len(dr):
            return False
        for wc, dc in zip(wr, dr):
            dn = norm_cell(dc)
            if wc == dn:
                continue
            # tolerant float compare
            try:
                if wc is not None and dn is not None and abs(float(wc) - float(dn)) <= 1e-9 * max(1.0, abs(float(dn))):
                    continue
            except (TypeError, ValueError):
                pass
            return False
    return True


def main() -> None:
    cats = sys.argv[1:] or list(BATTERY)
    # the CREATE OR REPLACE probes leave managed-table dirs that a
    # FRESH process can't re-create over (LOCATION_ALREADY_EXISTS, the
    # stale-warehouse trap — r14): clean our probe tables first
    import shutil

    for d in Path("spark-warehouse").glob("probe_*"):
        shutil.rmtree(d, ignore_errors=True)
    spark = build_session(app_name="probe", cpus=8)
    register_views(spark, SF_DIR)
    register_udfs(spark)

    server = PgWireServer(spark, host="127.0.0.1", port=0)
    loop = asyncio.new_event_loop()
    started = threading.Event()
    holder: dict[str, int] = {}

    async def run():
        await server.start()
        holder["port"] = server._server.sockets[0].getsockname()[1]
        started.set()

    def thread_main():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(run())
        loop.run_forever()

    t = threading.Thread(target=thread_main, daemon=True)
    t.start()
    assert started.wait(60)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "pgwire_client", REPO / "scripts" / "pgwire_client.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    client = mod.PgClient(port=holder["port"])

    duck = duckdb.connect()
    for name in TABLES:
        p = table_path(SF_DIR, name)
        if Path(p).exists():
            duck.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    counts = {"ok": 0, "gap": 0, "mismatch": 0, "duck_err": 0, "both_err": 0}
    for cat in cats:
        for sql in BATTERY[cat]:
            try:
                duck_rows = duck.execute(sql).fetchall()
                duck_err = None
            except Exception as e:  # noqa: BLE001
                duck_rows, duck_err = None, f"{type(e).__name__}: {e}"
            try:
                results = client.query(sql)
                wire_err = None
                for r in results:
                    if "error" in r:
                        wire_err = r["error"]
                wire_rows = results[-1].get("rows") if results else []
            except Exception as e:  # noqa: BLE001
                wire_err, wire_rows = f"CLIENT {type(e).__name__}: {e}", None
                client = mod.PgClient(port=holder["port"])

            if duck_err and wire_err:
                counts["both_err"] += 1
            elif duck_err:
                counts["duck_err"] += 1
                print(f"DUCK-ERR [{cat}] {sql}\n    duck: {duck_err}")
            elif wire_err:
                counts["gap"] += 1
                print(f"GAP  [{cat}] {sql}\n    wire: {str(wire_err)[:300]}")
            elif duck_rows is not None and not rows_equal(wire_rows or [], duck_rows):
                if sql in KNOWN_DIFFS:
                    counts["known"] = counts.get("known", 0) + 1
                elif (
                    not wire_rows
                    and sql.split(None, 1)[0].upper() in _DML_WORDS
                ):
                    # wire DML answers with a command tag, duckdb's
                    # python API with a rowcount row — not a diff
                    counts["ok"] += 1
                else:
                    counts["mismatch"] += 1
                    print(
                        f"DIFF [{cat}] {sql}\n    wire: {str(wire_rows)[:200]}\n"
                        f"    duck: {str(duck_rows)[:200]}"
                    )
            else:
                counts["ok"] += 1
    print("\nSUMMARY", counts)
    client.close()
    asyncio.run_coroutine_threadsafe(server.stop(), loop).result(10)
    loop.call_soon_threadsafe(loop.stop)
    spark.stop()


if __name__ == "__main__":
    main()
