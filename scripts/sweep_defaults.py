#!/usr/bin/env python
"""Default-semantics sweep: expressions BOTH engines parse, where the
DEFAULTS may differ (the census probes spellings; this probes values).

Method of record (NOTES.md r10): raw duckdb vs rewrite()+spark.sql over
a candidate list per function family; real divergences get a compat fix
plus a census probe plus a battery entry.

Usage: python scripts/sweep_defaults.py [family ...]

Advisory tool — findings feed shims/tests; not part of the suite.
Output classes:
  MISMATCH  both engines return values, values differ  <- the target
  GAP       duckdb ok, spark errors
  DUCK-ERR  duckdb errors, spark returns a value (overflow semantics!)
  ok        values match
"""

from __future__ import annotations

import datetime as dt
import math
import sys
from decimal import Decimal
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

FAMILIES: dict[str, list[str]] = {
    "strings": [
        "SELECT repeat('ab', -1) AS r, repeat('ab', 0) AS r0",
        "SELECT lpad('abc', 2, 'x') AS l1, rpad('abc', 2, 'x') AS r1",
        "SELECT lpad('abc', -1, 'x') AS l2, rpad('abc', -1, 'x') AS r2",
        "SELECT lpad('a', 5, 'xy') AS l3, rpad('a', 5, 'xy') AS r3",
        "SELECT lpad('abc', 5, '') AS l4",
        "SELECT trim('xxabcxx', 'x') AS t1, ltrim('xab', 'x') AS t2,"
        " rtrim('abx', 'x') AS t3",
        "SELECT trim('  a  ') AS t4",
        "SELECT split_part('a,b,c', ',', 2) AS s1,"
        " split_part('a,b,c', ',', 9) AS s2",
        "SELECT split_part('a,b,c', ',', -1) AS s3",
        "SELECT split_part('a,b,c', '', 1) AS s4",
        "SELECT string_split('a,b,,c', ',') AS ss",
        "SELECT string_split('abc', '') AS ss2",
        "SELECT string_to_array('a b', ' ') AS sa",
        "SELECT instr('abcb', 'b') AS i1, instr('abc', 'z') AS i2,"
        " instr('abc', '') AS i3",
        "SELECT position('b' IN 'abc') AS p1",
        "SELECT replace('aaa', '', 'x') AS rp1,"
        " replace('aaa', 'a', '') AS rp2",
        "SELECT translate('abcb', 'bc', 'x') AS tr1,"
        " translate('abc', '', 'x') AS tr2",
        "SELECT reverse('abc') AS rv1",
        "SELECT ascii('abc') AS a1, ascii('') AS a2",
        "SELECT chr(97) AS c1, chr(960) AS c2",
        "SELECT ord('a') AS o1, unicode('') AS u1",
        "SELECT length('héllo') AS l1, strlen('héllo') AS l2,"
        " bit_length('ab') AS bl, octet_length('héllo') AS ol",
        "SELECT upper('straße') AS up, lower('ÀBC') AS lo",
        "SELECT levenshtein('kitten', 'sitting') AS lv,"
        " editdist3('kitten', 'sitting') AS e3",
        "SELECT damerau_levenshtein('ab', 'ba') AS dl",
        "SELECT jaccard('duck', 'luck') AS jc",
        "SELECT jaro_similarity('duck', 'luck') AS js,"
        " jaro_winkler_similarity('duck', 'luck') AS jw",
        "SELECT mismatches('abc', 'abd') AS mm",
        "SELECT hamming('abc', 'abd') AS hm",
        "SELECT ngrams('abcd', 2) AS ng",
        "SELECT strip_accents('âéïõü') AS sa",
        "SELECT to_base(255, 16) AS tb1, to_base(255, 2) AS tb2",
        "SELECT bin(10) AS b1, hex(255) AS h1, unhex('ff') AS uh",
        "SELECT to_base64('ab'::BLOB) AS b64,"
        " from_base64('YWI=') AS fb64",
        "SELECT md5('abc') AS m5, sha1('abc') AS s1a, sha256('abc') AS s2",
        "SELECT md5_number_lower('abc') AS mnl,"
        " md5_number_upper('abc') AS mnu",
        "SELECT hash('abc') AS h",
        "SELECT starts_with('abc', 'ab') AS sw, ends_with('abc', 'bc')"
        " AS ew, suffix('abc', 'bc') AS sf, prefix('abc', 'ab') AS pf,"
        " contains('abc', 'b') AS ct",
        "SELECT format_bytes(1000000) AS fb,"
        " formatReadableDecimalSize(1000000) AS fd",
        "SELECT bar(3, 0, 10, 10) AS br",
        "SELECT printf('%5.2f|%d|%s', 3.14159, 42, 'x') AS pf",
        "SELECT printf('%x|%o', 255, 8) AS pf2",
        "SELECT format('{:.2f}|{}', 3.14159, 42) AS f1",
        "SELECT format('{0} {0}', 'a') AS f2",
        "SELECT concat_ws(',', 'a', NULL, 'b') AS cw,"
        " concat_ws(NULL, 'a', 'b') AS cw2",
        "SELECT 'a' || NULL AS o1, NULL || 'b' AS o2",
        "SELECT substring('abcdef', 2) AS s1,"
        " substring('abcdef', -2) AS s2",
        "SELECT substring('abcdef', 2, 100) AS s3,"
        " substring('abcdef', -99, 100) AS s4",
        "SELECT substr('abcdef', 3, -1) AS sneg",
        "SELECT 'abcdef'[2:4] AS sl1, 'abcdef'[:3] AS sl2,"
        " 'abcdef'[4:] AS sl3, 'abcdef'[-3:] AS sl4",
        "SELECT char_length(NULL) AS cl",
        "SELECT nfc_normalize('é') AS nn",
        "SELECT like_escape('a%c', 'a$%c', '$') AS le",
        "SELECT regexp_escape('a.b') AS re",
    ],
    "math": [
        "SELECT round(2.5) AS r1, round(3.5) AS r2, round(-2.5) AS r3",
        "SELECT round(2.5::DOUBLE) AS r1, round(3.5::DOUBLE) AS r2,"
        " round(-2.5::DOUBLE) AS r3",
        "SELECT round(1234.5678, -2) AS rn, round(1234.5678, 2) AS rp",
        "SELECT round(1234.5678::DOUBLE, -2) AS rn2",
        "SELECT round_even(2.5) AS re1, round_even(3.5) AS re2",
        "SELECT ceil(2.1) AS c1, floor(-2.1) AS f1, ceiling(2.0) AS c2",
        "SELECT trunc(2.7) AS t1, trunc(-2.7) AS t2",
        "SELECT ln(0.0) AS l0",
        "SELECT ln(-1.0) AS ln1",
        "SELECT log(0.0) AS lg0",
        "SELECT log10(100.0) AS lg10, log2(8.0) AS lg2",
        "SELECT log(2, 8.0) AS lgb",
        "SELECT sqrt(-1.0) AS sq",
        "SELECT pow(0, 0) AS p1, power(2, -1) AS p2",
        "SELECT cbrt(27.0) AS cb",
        "SELECT exp(1.0) AS ex",
        "SELECT mod(7, 3) AS m1, mod(-7, 3) AS m2, mod(7, -3) AS m3",
        "SELECT mod(7.5, 2) AS mf",
        "SELECT fmod(7.5, 2) AS fm1, fmod(-7.5, 2) AS fm2",
        "SELECT fdiv(7.5, 2) AS fd1, fdiv(-7.5, 2) AS fd2",
        "SELECT 7.5 % 2 AS pm, -7 % 3 AS pm2",
        "SELECT gamma(5) AS g1, lgamma(5) AS lg",
        "SELECT factorial(0) AS f0, factorial(10) AS f10",
        "SELECT gcd(12, 18) AS gc, lcm(4, 6) AS lc",
        "SELECT gcd(-12, 18) AS gcn, gcd(0, 0) AS gc0",
        "SELECT isnan('nan'::DOUBLE) AS n1, isinf('inf'::DOUBLE) AS i1,"
        " isfinite(1.0) AS f1",
        "SELECT isfinite('nan'::DOUBLE) AS f2",
        "SELECT atan2(1.0, 2.0) AS a2",
        "SELECT degrees(pi()) AS dg, radians(180.0) AS rd",
        "SELECT bit_count(255) AS bc, bit_count(-1::TINYINT) AS bcn",
        "SELECT even(2.5) AS e1, even(-2.5) AS e2",
        "SELECT signbit(-0.0) AS sb1, signbit(0.0) AS sb2",
        "SELECT nextafter(1.0, 2.0) AS na",
        "SELECT cot(1.0) AS ct",
        "SELECT acos(2.0) AS ac",
        "SELECT asin(-2.0) AS asn",
        "SELECT sin(pi()) AS sp, cos(0) AS cz, tan(0) AS tz",
        "SELECT sinh(1.0) AS sh, cosh(1.0) AS ch, tanh(1.0) AS th",
        "SELECT asinh(1.0) AS ash, acosh(1.0) AS ach, atanh(0.5) AS ath",
        "SELECT greatest(1, NULL, 3) AS g, least(1, NULL, 3) AS l",
        "SELECT greatest('a', 'b') AS gs, least(1.5, 2) AS lm",
        "SELECT abs(-2147483648::INTEGER) AS ab",
        "SELECT @(-4.5) AS aop",
    ],
    "overflow": [
        "SELECT 127::TINYINT + 1::TINYINT AS t",
        "SELECT 120::TINYINT + 120::TINYINT AS t2",
        "SELECT 32767::SMALLINT + 1::SMALLINT AS s",
        "SELECT 2147483647 + 1 AS i",
        "SELECT 2147483647::INTEGER + 1::INTEGER AS i2",
        "SELECT 9223372036854775807 + 1 AS b",
        "SELECT 127::TINYINT * 2::TINYINT AS m",
        "SELECT -128::TINYINT AS neg",
        "SELECT (-128)::TINYINT - 1::TINYINT AS u",
        "SELECT 255::UTINYINT + 1::UTINYINT AS ut",
        "SELECT 100000::INTEGER * 100000::INTEGER AS sq",
        "SELECT 3000000000::BIGINT * 3000000000::BIGINT AS bsq",
        "SELECT sum(x) AS s FROM (VALUES (9223372036854775807),"
        " (1)) t(x)",
        "SELECT 1::TINYINT + 1 AS promote",
        "SELECT typeof(1::TINYINT + 1::TINYINT) AS ty",
        "SELECT typeof(1::INTEGER + 1::INTEGER) AS ty2",
    ],
    "casts": [
        "SELECT ' 42 '::INTEGER AS i1",
        "SELECT '42'::INTEGER AS i2, '+42'::INTEGER AS i3",
        "SELECT '1.5'::INTEGER AS f2i",
        "SELECT TRY_CAST('1.5' AS INTEGER) AS tf2i",
        "SELECT '1e3'::INTEGER AS e2i",
        "SELECT '0x1A'::INTEGER AS h2i",
        "SELECT 'true'::BOOLEAN AS b1, 't'::BOOLEAN AS b2,"
        " '1'::BOOLEAN AS b3, 'yes'::BOOLEAN AS b4",
        "SELECT 'T'::BOOLEAN AS b5, 'FALSE'::BOOLEAN AS b6,"
        " 'f'::BOOLEAN AS b7, '0'::BOOLEAN AS b8",
        "SELECT 1::BOOLEAN AS ib, 0::BOOLEAN AS ib0, 5::BOOLEAN AS ib5",
        "SELECT true::INTEGER AS bi, false::INTEGER AS bi0",
        "SELECT 1.999::DOUBLE::INTEGER AS d2i,"
        " (-1.999)::DOUBLE::INTEGER AS d2in",
        "SELECT 1.5::DECIMAL(4,1)::INTEGER AS dec2i,"
        " 2.5::DECIMAL(4,1)::INTEGER AS dec2i2",
        "SELECT (0.1 + 0.2)::VARCHAR AS f2s",
        "SELECT 1e20::VARCHAR AS big, 1e-7::DOUBLE::VARCHAR AS small",
        "SELECT 0.000001::DOUBLE::VARCHAR AS sm2,"
        " 123456789.123::DOUBLE::VARCHAR AS md",
        "SELECT 1.0::DOUBLE::VARCHAR AS one,"
        " (-0.0)::DOUBLE::VARCHAR AS nz",
        "SELECT 'inf'::DOUBLE::VARCHAR AS inf,"
        " 'nan'::DOUBLE::VARCHAR AS nan",
        "SELECT 1.5::FLOAT::VARCHAR AS f32",
        "SELECT 100::DOUBLE::VARCHAR AS hundred",
        "SELECT 1.5::DECIMAL(10,4)::VARCHAR AS dec4",
        "SELECT 10/4 AS div1, 10.0/4 AS div2, 10/4.0 AS div3",
        "SELECT typeof(10/4) AS tdiv",
        "SELECT 1.5::DECIMAL(4,1) + 2.25::DECIMAL(4,2) AS decadd",
        "SELECT typeof(1.5::DECIMAL(4,1) * 2.25::DECIMAL(4,2)) AS tmul",
        "SELECT '2024-1-2'::DATE AS d1",
        "SELECT '2024/01/02'::DATE AS d2",
        "SELECT TRY_CAST('2024-13-01' AS DATE) AS badm",
        "SELECT '2024-01-02 03:04:05'::TIMESTAMP AS ts1,"
        " '2024-01-02T03:04:05'::TIMESTAMP AS ts2",
        "SELECT '2024-01-02'::TIMESTAMP AS ts3",
        "SELECT '03:04:05'::TIME AS tm1, '3:4:5'::TIME AS tm2",
        "SELECT '1 day'::INTERVAL AS iv1, '2 hours 3 minutes'::INTERVAL"
        " AS iv2",
        "SELECT '1:02:03'::INTERVAL AS iv3",
        "SELECT INTERVAL '90' SECOND AS iv4",
        "SELECT DATE '2024-02-29'::VARCHAR AS dv",
        "SELECT TIMESTAMP '2024-01-02 03:04:05.123'::VARCHAR AS tsv",
        "SELECT TIMESTAMP '2024-01-02 03:04:05.000'::VARCHAR AS tsv0",
        "SELECT (DATE '2024-01-02')::TIMESTAMP::VARCHAR AS d2ts",
        "SELECT 65::VARCHAR AS i2s, (-3.5)::VARCHAR AS n2s",
        "SELECT ''::VARCHAR::BLOB AS eb, 'ab'::BLOB::VARCHAR AS bs",
        "SELECT TRY_CAST('' AS INTEGER) AS empty",
        "SELECT TRY_CAST('  ' AS DOUBLE) AS blank",
        "SELECT [1, 2]::VARCHAR AS lv",
        "SELECT {'a': 1}::VARCHAR AS sv",
        "SELECT MAP([1], ['x'])::VARCHAR AS mv",
        "SELECT '[1, 2]'::INTEGER[] AS s2l",
        "SELECT TRY_CAST('[1, x]' AS INTEGER[]) AS badl",
    ],
    "lists": [
        "SELECT ([1, 2, 3])[-1] AS neg, ([1, 2, 3])[0] AS zero",
        "SELECT ([1, 2, 3])[9] AS oob",
        "SELECT ([1, 2, 3])[1.9] AS frac",
        "SELECT ([1, 2, 3, 4])[2:3] AS sl1, ([1, 2, 3, 4])[:2] AS sl2,"
        " ([1, 2, 3, 4])[3:] AS sl3",
        "SELECT ([1, 2, 3, 4])[-2:] AS sl4, ([1, 2, 3, 4])[:-2] AS sl5",
        "SELECT ([1, 2, 3, 4])[5:9] AS sl6, ([1, 2, 3, 4])[3:2] AS sl7",
        "SELECT ([1, 2, 3, 4, 5])[1:5:2] AS step",
        "SELECT list_slice([1, 2, 3, 4], 2, 3) AS ls",
        "SELECT array_slice('abcdef', 2, 4) AS stsl",
        "SELECT list_concat([1], NULL) AS lc1,"
        " list_concat(NULL, [2]) AS lc2",
        "SELECT list_concat([1], [NULL, 2]) AS lc3",
        "SELECT array_cat([1], [2]) AS ac",
        "SELECT [1] || [2, 3] AS lop",
        "SELECT [1, 2] || NULL AS lopn",
        "SELECT list_contains([1, NULL, 2], NULL) AS lcn,"
        " list_contains([1, 2], 9) AS lcf,"
        " list_contains([1, NULL], 9) AS lcm",
        "SELECT list_has_any([1, 2], [2, 3]) AS ha,"
        " list_has_any([1], []) AS ha2,"
        " list_has_all([1, 2, 3], [1, 3]) AS hl,"
        " list_has_all([1], []) AS hl2",
        "SELECT list_position([1, NULL, 2], NULL) AS lp1,"
        " list_position([1, 2], 9) AS lp2, list_indexof([5, 6], 6) AS li",
        "SELECT len([1, 2, 3]) AS ln1, array_length([1, 2]) AS ln2,"
        " cardinality(MAP([1], ['a'])) AS cd",
        "SELECT flatten([[1, 2], NULL, [3]]) AS fl",
        "SELECT flatten([[[1]], [[2]]]) AS fl2",
        "SELECT list_zip([1, 2, 3], ['a']) AS lz",
        "SELECT list_zip([1], [2], [3]) AS lz3",
        "SELECT list_transform([1, 2, 3], x -> x * 2) AS lt",
        "SELECT list_transform([1, NULL], x -> x + 1) AS ltn",
        "SELECT list_filter([1, 2, 3, NULL], x -> x > 1) AS lf",
        "SELECT list_reduce([1, 2, 3], (a, b) -> a + b) AS lr",
        "SELECT list_reduce([1, 2, 3], (a, b) -> a + b, 10) AS lri",
        "SELECT list_aggregate([1, 2, NULL], 'sum') AS la1,"
        " list_aggregate([1, 2], 'max') AS la2,"
        " list_aggr([1, 2], 'string_agg', '-') AS la3",
        "SELECT list_sum([1, NULL, 2]) AS lsum,"
        " list_avg([1, 2, NULL]) AS lavg,"
        " list_min([3, 1]) AS lmin, list_max([3, 1]) AS lmax,"
        " list_count([1, NULL]) AS lcnt",
        "SELECT list_append([1], 2) AS lap, list_prepend(0, [1]) AS lpp,"
        " array_append([1], NULL) AS lan",
        "SELECT array_push_back([1], 2) AS pb,"
        " array_push_front([1], 0) AS pfr",
        "SELECT list_resize([1, 2], 4) AS lrs1,"
        " list_resize([1, 2], 4, 9) AS lrs2, list_resize([1, 2], 1) AS lrs3",
        "SELECT range(5) AS r1, range(2, 5) AS r2, range(5, 2, -1) AS r3",
        "SELECT range(2, 2) AS re, range(5, 2) AS rneg",
        "SELECT generate_series(5) AS g0, generate_series(2, 5) AS g1,"
        " generate_series(5, 2, -2) AS g2",
        "SELECT list_value(1, NULL, 2) AS lv, list_pack(3, 4) AS lp",
        "SELECT array_value(1, 2) AS av",
        "SELECT list_reverse([1, 2, 3]) AS lrv",
        "SELECT list_rotate([1, 2, 3], 1) AS lro",
        "SELECT list_grade_up([30, 10, 20]) AS lgu",
        "SELECT list_select([10, 20, 30], [3, 1]) AS lsel",
        "SELECT list_where([10, 20, 30], [true, false, true]) AS lwh",
        "SELECT repeat([1, 2], 2) AS lrep",
        "SELECT list_dot_product([1.0, 2.0], [3.0, 4.0]) AS ldp,"
        " list_cosine_similarity([1.0, 0.0], [0.0, 1.0]) AS lcs,"
        " list_distance([0.0, 0.0], [3.0, 4.0]) AS ld",
        "SELECT list_unique([1, 1, NULL, NULL, 2]) AS lu",
        "SELECT array_distinct([2, 2, NULL, 1]) AS ad",
        "SELECT list_intersect([1, 2, NULL], [2, NULL, 3]) AS li",
        "SELECT unnest([1, NULL, 2]) AS u ORDER BY 1",
        "SELECT unnest([]) AS u",
        "SELECT unnest(NULL::INTEGER[]) AS u",
        "SELECT [x FOR x IN [1, 2, 3] IF x > 1] AS comp",
    ],
    "maps_structs": [
        "SELECT map_extract(MAP([1, 2], ['a', 'b']), 1) AS me",
        "SELECT element_at(MAP([1], ['a']), 1) AS ea",
        "SELECT element_at(MAP([1], ['a']), 9) AS miss",
        "SELECT map_contains(MAP([1], ['a']), 1) AS mc1,"
        " map_contains(MAP([1], ['a']), 9) AS mc2",
        "SELECT map_keys(MAP([2, 1], ['a', 'b'])) AS mk,"
        " map_values(MAP([2, 1], ['a', 'b'])) AS mv",
        "SELECT map_entries(MAP([1], ['a'])) AS men",
        "SELECT map_from_entries([{'k': 1, 'v': 'a'}]) AS mfe",
        "SELECT map_concat(MAP([1], ['a']), MAP([2], ['b'])) AS mcc",
        "SELECT map_concat(MAP([1], ['a']), MAP([1], ['z'])) AS mdup",
        "SELECT MAP() AS empty",
        "SELECT MAP([1, 1], ['a', 'b']) AS dupkey",
        "SELECT MAP([NULL], ['a']) AS nullkey",
        "SELECT MAP([1], [NULL]) AS nullval",
        "SELECT {'a': 1, 'b': 'x'} AS s",
        "SELECT struct_extract({'a': 1}, 'a') AS se",
        "SELECT ({'a': 1}).a AS dot",
        "SELECT ({'A': 1}).a AS caseins",
        "SELECT struct_extract({'a': 1, 'b': 2}, 'A') AS seci",
        "SELECT struct_pack(x := 1, y := 'a') AS sp",
        "SELECT row(1, 'a') AS r",
        "SELECT {'a': 1} = {'a': 1} AS eq1,"
        " {'a': 1} < {'a': 2} AS lt1",
        "SELECT [{'a': 1}, {'a': 2}] AS los",
        "SELECT struct_insert({'a': 1}, b := 2) AS si",
        "SELECT remap_struct({'a': 1, 'b': 2}, NULL) IS NOT NULL AS rs",
    ],
    "json": [
        "SELECT '{\"a\": 1}'::JSON AS j",
        "SELECT json_extract('{\"a\": {\"b\": 7}}', '$.a.b') AS je,"
        " json_extract('{\"a\": 1}', '$.missing') AS jm",
        "SELECT json_extract('[1, 2, 3]', '$[1]') AS ja,"
        " json_extract('[1, 2, 3]', '$[-1]') AS jneg",
        "SELECT json_extract('{\"a\": 1}', 'a') AS jbare",
        "SELECT json_extract_string('{\"a\": \"x\"}', '$.a') AS js,"
        " json_extract('{\"a\": \"x\"}', '$.a') AS jq",
        "SELECT '{\"a\": null}'::JSON ->> 'a' AS jn",
        "SELECT '{\"a\": [1, 2]}' -> 'a' ->> 1 AS chain",
        "SELECT json_array_length('[1, 2, 3]') AS jal,"
        " json_array_length('{}') AS jal2",
        "SELECT json_type('123') AS t1, json_type('\"x\"') AS t2,"
        " json_type('[1]') AS t3, json_type('{}') AS t4,"
        " json_type('null') AS t5, json_type('1.5') AS t6,"
        " json_type('true') AS t7",
        "SELECT json_valid('{\"a\": 1}') AS v1, json_valid('{a: 1}') AS v2",
        "SELECT json_keys('{\"b\": 1, \"a\": 2}') AS jk",
        "SELECT json_merge_patch('{\"a\": 1, \"b\": 2}',"
        " '{\"b\": null, \"c\": 3}') AS jmp",
        "SELECT json_array(1, 'a', NULL) AS jar",
        "SELECT json_object('a', 1, 'b', NULL) AS job",
        "SELECT json_quote('x') AS jq2",
        "SELECT to_json([1, 2]) AS tj1, to_json({'a': 1}) AS tj2,"
        " to_json(MAP(['k'], [1])) AS tj3",
        "SELECT from_json('[1,2]', '[\"INTEGER\"]') AS fj",
        "SELECT json_structure('{\"a\": [1, 2]}') AS jst",
        "SELECT json_contains('{\"a\": 1}', '1') AS jc",
        "SELECT '{\"a\":1}'::JSON = '{\"a\": 1}'::JSON AS jeq",
        "SELECT json_group_array(x) AS g FROM (VALUES (1), (2)) t(x)",
        "SELECT json_group_object(k, v) AS g FROM (VALUES ('a', 1),"
        " ('b', 2)) t(k, v)",
        "SELECT len('[1, 2]'::JSON) AS jl",
    ],
    "datetime": [
        "SELECT date_trunc('week', DATE '2024-01-01') AS w1,"
        " date_trunc('week', DATE '2024-01-07') AS w2",
        "SELECT last_day(DATE '2024-02-05') AS ld,"
        " last_day(DATE '2023-02-05') AS ld2",
        "SELECT date_add(DATE '2024-01-31', INTERVAL 1 MONTH) AS da",
        "SELECT DATE '2024-01-31' + INTERVAL 1 MONTH AS m1,"
        " DATE '2024-03-31' - INTERVAL 1 MONTH AS m2",
        "SELECT age(DATE '2024-03-01', DATE '2024-01-31') AS ag",
        "SELECT datediff('day', DATE '2024-01-01', DATE '2024-02-01') AS dd",
        "SELECT date_diff('month', DATE '2024-01-31', DATE '2024-02-01') AS dm",
        "SELECT monthname(DATE '2024-01-15') AS mn, dayname(DATE '2024-01-15') AS dn",
        "SELECT dayofweek(DATE '2024-01-15') AS dw, isodow(DATE '2024-01-15') AS iso,"
        " weekofyear(DATE '2024-01-01') AS wy, yearweek(DATE '2024-01-01') AS yw",
        "SELECT week(DATE '2024-01-01') AS w, weekday(DATE '2024-01-15') AS wd",
        "SELECT dayofyear(DATE '2024-03-01') AS dy, quarter(DATE '2024-05-05') AS q",
        "SELECT extract(dow FROM DATE '2024-01-15') AS dow,"
        " extract(isodow FROM DATE '2024-01-15') AS idow,"
        " extract(doy FROM DATE '2024-03-01') AS doy",
        "SELECT extract(epoch FROM TIMESTAMP '2024-01-01 00:00:01.5') AS ep",
        "SELECT extract(microseconds FROM TIMESTAMP '2024-01-01 00:00:01.5') AS us,"
        " extract(milliseconds FROM TIMESTAMP '2024-01-01 00:00:01.5') AS ms",
        "SELECT extract(second FROM TIMESTAMP '2024-01-01 00:00:01.5') AS s",
        "SELECT strftime(TIMESTAMP '2024-01-02 03:04:05', '%Y-%m-%d %H:%M:%S') AS sf",
        "SELECT strftime(DATE '2024-01-02', '%a %A %b %B') AS names",
        "SELECT strftime(TIMESTAMP '2024-01-02 03:04:05.123', '%g') AS g",
        "SELECT strptime('2024-01-02', '%Y-%m-%d') AS sp",
        "SELECT strptime('02/01/2024 3:04 PM', '%d/%m/%Y %I:%M %p') AS sp2",
        "SELECT try_strptime('bogus', '%Y-%m-%d') AS ts",
        "SELECT make_date(2024, 2, 29) AS md, make_timestamp(2024, 1, 2, 3, 4, 5.5) AS mt",
        "SELECT make_time(13, 30, 59.5) AS mk",
        "SELECT time_bucket(INTERVAL '15 minutes', TIMESTAMP '2024-01-01 00:22:00') AS tb",
        "SELECT to_timestamp(1700000000) AS tt",
        "SELECT epoch_ms(1700000000000) AS em",
        "SELECT date_part('hour', TIME '13:45:30') AS hp,"
        " extract(minute FROM TIME '13:45:30') AS mp",
        "SELECT TIMESTAMP '2024-01-01 12:00:00' - TIMESTAMP '2024-01-01 10:30:00' AS td",
        "SELECT DATE '2024-02-01' - DATE '2024-01-01' AS dd2",
        "SELECT DATE '2024-01-01' + 5 AS dplus",
        "SELECT TIME '23:00:00' + INTERVAL 2 HOUR AS tw",
        "SELECT greatest(DATE '2024-01-01', DATE '2023-01-01') AS g",
        "SELECT timezone('UTC', TIMESTAMP '2024-01-01 00:00:00') AS tz",
        "SELECT century(DATE '2001-01-01') AS c1, century(DATE '2000-12-31') AS c0",
        "SELECT epoch_us(TIMESTAMP '2024-01-01 00:00:00.000001') AS eu,"
        " epoch_ns(TIMESTAMP '2024-01-01 00:00:00.000001') AS en",
        "SELECT julian(DATE '2024-01-01') AS j",
        "SELECT isoyear(DATE '2024-12-30') AS iy",
        "SELECT era(DATE '2024-01-01') AS e",
        "SELECT current_date = today() AS t",
        "SELECT date_trunc('quarter', DATE '2024-05-05') AS q2,"
        " date_trunc('decade', DATE '2024-05-05') AS de",
        "SELECT generate_series(DATE '2024-01-01', DATE '2024-01-03', INTERVAL 1 DAY) AS gs",
    ],
    "regex": [
        "SELECT regexp_matches('abc', 'a') AS m1, regexp_matches('abc', '^a$') AS m2",
        "SELECT regexp_full_match('abc', 'a.c') AS fm, regexp_full_match('abc', 'a') AS fm2",
        "SELECT regexp_extract('abc123def', '[0-9]+') AS e0",
        "SELECT regexp_extract('abc123', '([a-z]+)([0-9]+)', 1) AS e1,"
        " regexp_extract('abc123', '([a-z]+)([0-9]+)', 2) AS e2",
        "SELECT regexp_extract('abc123', '([a-z]+)([0-9]+)', 9) AS e9",
        "SELECT regexp_extract('abc', 'x') AS emiss",
        "SELECT regexp_extract_all('a1b22c333', '[0-9]+') AS ea",
        "SELECT regexp_extract_all('a1b22', '([a-z])([0-9]+)', 2) AS eg",
        "SELECT regexp_replace('aaa', 'a', 'b') AS r1",
        "SELECT regexp_replace('abc', '(b)', '[\\1]') AS bref",
        "SELECT regexp_replace('aAa', 'a', 'x', 'gi') AS gi",
        "SELECT regexp_replace('a.a', '.', 'x', 's') AS dotall",
        "SELECT regexp_matches('AB', 'ab', 'i') AS ci",
        "SELECT regexp_extract('a\nb', 'a.b', 's') AS sflag",
        "SELECT regexp_split_to_array('a1b22c', '[0-9]+') AS sp",
        "SELECT 'abc' SIMILAR TO '(a|z)bc' AS st",
        "SELECT regexp_extract('name=Tom age=30', 'name=(\\w+)', 1) AS named",
        "SELECT regexp_extract('2024-01-02', '(\\d+)-(\\d+)-(\\d+)', ['y', 'm', 'd']) AS grp",
    ],
    "bits_blobs": [
        "SELECT 5 & 3 AS a, 5 | 3 AS o, xor(5, 3) AS x, ~5 AS n",
        "SELECT 1 << 10 AS shl, 1024 >> 3 AS shr",
        "SELECT 5.0::INT & 3 AS mixed",
        "SELECT get_bit('0101'::BIT, 1) AS gb",
        "SELECT '0101'::BIT::VARCHAR AS bits",
        "SELECT bit_count('0101'::BIT) AS bc",
        "SELECT encode('héllo') AS enc",
        "SELECT decode('abc'::BLOB) AS dec",
        "SELECT octet_length('abc'::BLOB) AS ol, length('abc'::BLOB) AS bl",
        "SELECT 'ab' || 'cd'::BLOB AS cat",
        "SELECT 'abc'::BLOB = 'abc'::BLOB AS beq",
        "SELECT substring('abcdef'::BLOB, 2, 3) AS bsub",
        "SELECT hex('abc'::BLOB) AS bh, base64('abc'::BLOB) AS b64",
        "SELECT unhex('616263')::VARCHAR AS uh",
        "SELECT repeat('ab'::BLOB, 2) AS brep",
        # r13 additions: BIT emulation + declared-width bit_count
        "SELECT set_bit('0101'::BIT, 2, 1)::VARCHAR AS sb",
        "SELECT bit_length('0101'::BIT) AS bl2",
        "SELECT bitstring('0101', 8)::VARCHAR AS bs8",
        "SELECT ('01'::BIT || '10'::BIT)::VARCHAR AS bcat",
        "SELECT '0101'::BIT < '011'::BIT AS blt",
        "SELECT bit_count(-1::TINYINT) AS w8, bit_count(-1::SMALLINT)"
        " AS w16, bit_count(-1::INT) AS w32, bit_count(-1) AS wd",
        "SELECT bit_count(set_bit('0101'::BIT, 0, 1)) AS nested",
    ],
    "agg_edges": [
        "SELECT count(*) AS a, count(x) AS b, sum(x) AS s, avg(x) AS av FROM (VALUES (1),(NULL),(3)) t(x)",
        "SELECT sum(x) AS s, avg(x) AS a FROM (VALUES (NULL::INT)) t(x)",
        "SELECT any_value(x) AS av FROM (VALUES (NULL),(2)) t(x)",
        "SELECT arbitrary(x) AS ar FROM (VALUES (NULL),(2)) t(x)",
        "SELECT array_agg(x) AS aa, list(x) AS l FROM (VALUES (1),(NULL),(2)) t(x)",
        "SELECT median(x) AS m FROM (VALUES (1),(2)) t(x)",
        "SELECT mode(x) AS m FROM (VALUES (1),(2),(2)) t(x)",
        "SELECT var_samp(x) AS vs FROM (VALUES (1.0)) t(x)",
        "SELECT regr_slope(y, x) AS s, regr_intercept(y, x) AS i,"
        " regr_r2(y, x) AS r FROM (VALUES (1.0, 2.0),(2.0, 4.0),(3.0, 5.0)) t(x, y)",
        "SELECT bit_and(x) AS ba, bit_or(x) AS bo, bit_xor(x) AS bx"
        " FROM (VALUES (5),(3)) t(x)",
        "SELECT string_agg(x) AS sa FROM (VALUES ('a'),(NULL),('b')) t(x)",
        "SELECT quantile_disc(x, 0.5) AS q FROM (VALUES (1),(2),(3),(4)) t(x)",
        "SELECT count(*) FILTER (x > 1) AS cf FROM (VALUES (1),(2),(3)) t(x)",
        "SELECT x, lag(x) OVER (ORDER BY x) AS lg, lead(x, 2, -1)"
        " OVER (ORDER BY x) AS ld FROM (VALUES (1),(2),(3)) t(x) ORDER BY x",
        "SELECT x, nth_value(x, 2) OVER (ORDER BY x) AS nv"
        " FROM (VALUES (1),(2),(3)) t(x) ORDER BY x",
        "SELECT product(x) AS p FROM (VALUES (2.0),(3.0)) t(x)",
        "SELECT skewness(x) AS sk, kurtosis(x) AS k"
        " FROM (VALUES (1.0),(2.0),(4.0),(9.0)) t(x)",
    ],
    "comparison": [
        "SELECT 'nan'::DOUBLE = 'nan'::DOUBLE AS ne,"
        " 'nan'::DOUBLE > 1e308 AS ng",
        "SELECT 'nan'::DOUBLE IN ('nan'::DOUBLE) AS nin",
        "SELECT x FROM (VALUES (1.0), ('nan'::DOUBLE), ('inf'::DOUBLE),"
        " (NULL)) t(x) ORDER BY x",
        "SELECT DISTINCT x FROM (VALUES ('nan'::DOUBLE),"
        " ('nan'::DOUBLE)) t(x)",
        "SELECT -0.0::DOUBLE = 0.0::DOUBLE AS zeq",
        "SELECT count(DISTINCT x) AS c FROM (VALUES (0.0::DOUBLE),"
        " (-0.0::DOUBLE)) t(x)",
        "SELECT 1 IN (2, NULL) AS innull, 2 IN (2, NULL) AS inhit,"
        " NULL IN (1) AS nullin",
        "SELECT 1 NOT IN (2, NULL) AS notin",
        "SELECT (1, 2) < (1, 3) AS rc1, (1, 2) = (1, 2) AS rc2",
        "SELECT (1, NULL) = (1, NULL) AS rcn",
        "SELECT [1, 2] < [1, 3] AS lc1, [1] < [1, 0] AS lc2,"
        " [2] > [1, 9] AS lc3",
        "SELECT [1, NULL] = [1, NULL] AS lceq",
        "SELECT NULL = NULL AS e1, NULL IS NOT DISTINCT FROM NULL AS e2",
        "SELECT false AND NULL AS an, true OR NULL AS orn",
        "SELECT NOT NULL AS nn",
        "SELECT 1 BETWEEN NULL AND 2 AS bn",
        "SELECT 'b' BETWEEN 'a' AND 'c' AS sb",
        "SELECT DATE '2024-01-02' = TIMESTAMP '2024-01-02 00:00:00' AS dteq",
        "SELECT '5'::VARCHAR = 5 AS coerce",
        "SELECT true = 1 AS booleq",
        "SELECT 'abc' LIKE 'ABC' AS lk1, 'abc' ILIKE 'ABC' AS lk2",
        "SELECT 'a_c' LIKE 'a\\_c' AS esc",
        "SELECT 'a%c' LIKE 'a$%c' ESCAPE '$' AS esc2",
        "SELECT 'abc' BETWEEN SYMMETRIC 'c' AND 'a' AS bsym",
        "SELECT 5 BETWEEN SYMMETRIC 10 AND 1 AS bsym2",
    ],
    "collation": [
        # string comparison order: duck default = binary UTF-8 memcmp;
        # mixed case, accents, astral plane, NUL-adjacent, length ties
        "SELECT x FROM (VALUES ('a'), ('B'), ('b'), ('A'), ('Z'), ('z'))"
        " t(x) ORDER BY x",
        "SELECT x FROM (VALUES ('e'), ('\u00e9'), ('E'), ('\u00c9'),"
        " ('f')) t(x) ORDER BY x",
        "SELECT x FROM (VALUES ('abc'), ('ab'), ('abcd'), ('abd'), (''))"
        " t(x) ORDER BY x",
        "SELECT x FROM (VALUES ('\U0001F600'), ('z'), ('\uFFFD'),"
        " ('\u4E2D')) t(x) ORDER BY x",
        "SELECT 'a' < 'B' AS c1, 'A' < 'a' AS c2, '\u00e9' > 'z' AS c3",
        "SELECT min(x) AS mn, max(x) AS mx FROM (VALUES ('a'), ('B'),"
        " ('\u00e9')) t(x)",
        "SELECT greatest('a', 'B', '\u00e9') AS g,"
        " least('a', 'B', '\u00e9') AS l",
        "SELECT x FROM (VALUES ('a'), ('a ')) t(x) ORDER BY x",
        "SELECT 'a ' = 'a' AS pad, 'a' < 'a ' AS padlt",
        "SELECT x FROM (VALUES ('10'), ('9'), ('100')) t(x) ORDER BY x",
        "SELECT rank() OVER (ORDER BY x) AS r, x FROM (VALUES ('B'),"
        " ('a')) t(x) ORDER BY x",
        "SELECT string_agg(x, ',' ORDER BY x) AS s FROM (VALUES ('b'),"
        " ('A'), ('\u00e9'), ('Z')) t(x)",
        "SELECT array_agg(x ORDER BY x) AS s FROM (VALUES ('\u00df'),"
        " ('ss'), ('s')) t(x)",
        "SELECT x FROM (VALUES ('a\u0301'), ('\u00e1'), ('b')) t(x)"
        " ORDER BY x",  # NFC vs NFD forms: binary order, no normalize
        "SELECT 'a\u0301' = '\u00e1' AS nfdeq",
        "SELECT x, count(*) AS c FROM (VALUES ('a\u0301'), ('\u00e1'))"
        " t(x) GROUP BY x ORDER BY x",
        "SELECT contains('ss', '\u00df') AS ct, strpos('xy\u00e9z',"
        " '\u00e9') AS sp",
        "SELECT upper('i') AS ui, lower('I') AS li",  # no locale (tr)
    ],
    "tz_epoch": [
        "SELECT epoch(TIMESTAMP '2024-03-15 12:30:45') AS e",
        "SELECT epoch_ms(TIMESTAMP '2024-03-15 12:30:45.123') AS em",
        "SELECT epoch_us(TIMESTAMP '2024-03-15 12:30:45.123456') AS eu",
        "SELECT to_timestamp(1710505845) AS t1",
        "SELECT make_timestamp(2024, 3, 15, 12, 30, 45.5) AS mt",
        "SELECT make_timestamp(1710505845123456) AS mtu",
        "SELECT epoch(DATE '2024-03-15') AS ed",
        "SELECT TIMESTAMP '2024-03-15 12:30:45' AT TIME ZONE 'UTC' AS atz",
        "SELECT date_part('epoch', TIMESTAMP '2024-03-15 12:30:45') AS dpe",
        "SELECT extract(epoch FROM INTERVAL '90' SECOND) AS ie",
        "SELECT epoch(TIMESTAMP '1969-12-31 23:59:59') AS neg",
        "SELECT to_timestamp(-1.5) AS tneg",
        "SELECT age(TIMESTAMP '2024-03-15', TIMESTAMP '2024-03-14 23:00:00') AS ag",
        "SELECT date_diff('second', TIMESTAMP '2024-01-01 00:00:00',"
        " TIMESTAMP '2024-01-01 00:01:30') AS dd",
        "SELECT date_diff('month', DATE '2024-01-31', DATE '2024-02-29') AS dm",
        "SELECT date_sub('month', DATE '2024-01-31', DATE '2024-02-29') AS ds",
        "SELECT timezone('UTC', TIMESTAMP '2024-03-15 12:00:00') AS tz1",
        "SELECT century(DATE '2000-01-01') AS c1, century(DATE '2001-01-01') AS c2",
        "SELECT epoch_ns(TIMESTAMP '2024-03-15 12:30:45.123456') AS en",
        "SELECT time_bucket(INTERVAL '15' MINUTE,"
        " TIMESTAMP '2024-03-15 12:37:45') AS tb",
        "SELECT time_bucket(INTERVAL '1' DAY, DATE '2024-03-15') AS tbd",
        "SELECT last_day(DATE '2024-02-15') AS ld, last_day(DATE '2023-02-15') AS ld2",
        "SELECT monthname(DATE '2024-03-15') AS mn, dayname(DATE '2024-03-15') AS dn",
        "SELECT week(DATE '2024-01-01') AS w1, weekofyear(DATE '2024-01-01') AS w2,"
        " isodow(DATE '2024-01-01') AS iso",
        "SELECT julian(DATE '2024-03-15') AS jd",
    ],
    "printf_edges": [
        "SELECT printf('%d', 42) AS a, printf('%5d', 42) AS b,"
        " printf('%-5d|', 42) AS c, printf('%05d', 42) AS d",
        "SELECT printf('%x', 255) AS a, printf('%X', 255) AS b,"
        " printf('%o', 8) AS c, printf('%#x', 255) AS d",
        "SELECT printf('%f', 1.5) AS a, printf('%.2f', 1.005) AS b,"
        " printf('%.0f', 0.5) AS c, printf('%.0f', 1.5) AS d",
        "SELECT printf('%e', 12345.678) AS a, printf('%g', 12345.678)"
        " AS b, printf('%g', 0.000012345) AS c",
        "SELECT printf('%s', 1.5) AS a, printf('%s', DATE '2024-01-02')"
        " AS b",
        "SELECT printf('%+d', 5) AS a, printf('% d', 5) AS b",
        "SELECT printf('%.3s', 'abcdef') AS trunc",
        "SELECT printf('%10.3f', 3.14159) AS a,"
        " printf('%-10.3f|', 3.14159) AS b",
        "SELECT printf('%%') AS pct, printf('%s %s', 'a', 'b') AS two",
        "SELECT printf('%f', 'inf'::DOUBLE) AS a,"
        " printf('%f', 'nan'::DOUBLE) AS b,"
        " printf('%f', '-inf'::DOUBLE) AS c",
        "SELECT printf('%d', -2147483648) AS a,"
        " printf('%d', 9223372036854775807) AS b",
        "SELECT format('{:.2f}', 1.005) AS a, format('{:>6}', 'ab') AS b",
        "SELECT printf('%f', 0.1) AS a, printf('%.17g', 0.1) AS b",
    ],
    "windows": [
        "SELECT v, row_number() OVER (ORDER BY k) AS rn"
        " FROM (VALUES (1, 1), (2, NULL), (3, 2)) t(v, k) ORDER BY v",
        "SELECT v, sum(v) OVER (ORDER BY k) AS s"
        " FROM (VALUES (1, 1), (2, NULL), (3, 2)) t(v, k) ORDER BY v",
        "SELECT v, lead(v) OVER (ORDER BY v) AS ld,"
        " lag(v) OVER (ORDER BY v) AS lg"
        " FROM (VALUES (1), (2), (3)) t(v) ORDER BY v",
        "SELECT v, lead(v, 2, -1) OVER (ORDER BY v) AS ld2,"
        " lag(v, -1) OVER (ORDER BY v) AS lgneg"
        " FROM (VALUES (1), (2), (3)) t(v) ORDER BY v",
        "SELECT v, ntile(3) OVER (ORDER BY v) AS nt"
        " FROM (VALUES (1), (2)) t(v) ORDER BY v",
        "SELECT v, percent_rank() OVER (ORDER BY v) AS pr,"
        " cume_dist() OVER (ORDER BY v) AS cd"
        " FROM (VALUES (1)) t(v)",
        "SELECT v, nth_value(v, 2) OVER (ORDER BY v) AS nv"
        " FROM (VALUES (1), (2), (3)) t(v) ORDER BY v",
        "SELECT v, first_value(v) OVER (ORDER BY k) AS fv,"
        " last_value(v) OVER (ORDER BY k) AS lv"
        " FROM (VALUES (1, 2), (2, 1), (3, NULL)) t(v, k) ORDER BY v",
        "SELECT v, count(*) OVER (ORDER BY v RANGE BETWEEN 1 PRECEDING"
        " AND 1 FOLLOWING) AS c"
        " FROM (VALUES (1), (2), (4)) t(v) ORDER BY v",
        "SELECT v, rank() OVER (ORDER BY k) AS r, dense_rank() OVER"
        " (ORDER BY k) AS dr"
        " FROM (VALUES (1, 1), (2, 1), (3, 2)) t(v, k) ORDER BY v",
        "SELECT v, avg(v) OVER (ORDER BY v ROWS BETWEEN 1 PRECEDING"
        " AND CURRENT ROW) AS a"
        " FROM (VALUES (1), (2), (5)) t(v) ORDER BY v",
    ],
    "series": [
        "SELECT generate_series(1, 5) AS g",
        "SELECT generate_series(1, 5, 2) AS g2",
        "SELECT generate_series(1, 0) AS ge",
        "SELECT generate_series(5, 1, -2) AS gd",
        "SELECT range(1, 5) AS r",
        "SELECT range(1, 5, 2) AS r2",
        "SELECT range(5, 1, -2) AS rd",
        "SELECT range(3) AS r1",
        "SELECT * FROM range(4) ORDER BY 1",
        "SELECT * FROM range(5, 1, -2) ORDER BY 1",
        "SELECT * FROM generate_series(1, 4) ORDER BY 1",
        "SELECT * FROM generate_series(4, 1, -1) ORDER BY 1",
        "SELECT * FROM generate_series(DATE '2024-01-01',"
        " DATE '2024-01-05', INTERVAL 2 DAY) ORDER BY 1",
        "SELECT * FROM range(TIMESTAMP '2024-01-01 00:00:00',"
        " TIMESTAMP '2024-01-01 03:00:00', INTERVAL 1 HOUR) ORDER BY 1",
        "SELECT * FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',"
        " TIMESTAMP '2024-01-01 02:00:00', INTERVAL 1 HOUR) ORDER BY 1",
    ],
    "intervals": [
        "SELECT DATE '2023-01-31' + INTERVAL 1 MONTH AS eom",
        "SELECT DATE '2024-02-29' + INTERVAL 1 YEAR AS leap",
        "SELECT TIMESTAMP '2024-03-31 12:00:00' - INTERVAL 1 MONTH AS back",
        "SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '90' SECOND AS s90",
        "SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '1:02:03' HOUR"
        " TO SECOND AS hms",
        "SELECT DATE '2024-01-01' + INTERVAL '1-2' YEAR TO MONTH AS ym",
        "SELECT date_diff('month', DATE '2024-01-31', DATE '2024-02-01') AS b1",
        "SELECT date_diff('year', DATE '2024-12-31', DATE '2025-01-01') AS b2",
        "SELECT date_diff('day', DATE '2024-01-05', DATE '2024-01-01') AS neg",
        "SELECT date_sub('month', DATE '2024-01-31', DATE '2024-02-01') AS c1",
        "SELECT date_sub('year', DATE '2024-12-31', DATE '2025-01-01') AS c2",
        "SELECT date_diff('hour', TIMESTAMP '2024-01-01 23:59:00',"
        " TIMESTAMP '2024-01-02 00:01:00') AS hb",
        "SELECT datediff('day', DATE '2024-01-01', DATE '2024-01-05') AS dd",
        "SELECT age(TIMESTAMP '2024-03-15 00:00:00',"
        " TIMESTAMP '2024-01-10 00:00:00') AS ag",
        "SELECT (TIMESTAMP '2024-01-02 03:00:00' - TIMESTAMP"
        " '2024-01-01 00:00:00') AS tsdiff",
        "SELECT to_days(5) + DATE '2024-01-01' AS td,"
        " to_months(2) + DATE '2024-01-01' AS tm",
    ],
    "numeric_text": [
        "SELECT (1.50)::VARCHAR AS d1, (0.5)::VARCHAR AS d2,"
        " (-0.05)::VARCHAR AS d3",
        "SELECT CAST(1.5 AS DECIMAL(10, 4))::VARCHAR AS d4",
        "SELECT (1/3)::VARCHAR AS div1, (7//2)::VARCHAR AS div2",
        "SELECT concat('v=', 2.50) AS c1, 'v=' || 1.0 AS c2",
        "SELECT concat('x', 1e-7) AS tiny, concat('x', 1e15) AS big",
        "SELECT round(2.5) AS r1, round(-2.5) AS r2, round(1.45, 1) AS r3",
        "SELECT round(2.5e0) AS rd1, round(3.5e0) AS rd2",
        "SELECT ceil(-0.5)::VARCHAR AS cz, floor(0.5) AS fz",
        "SELECT 'nan'::DOUBLE = 'nan'::DOUBLE AS nane,"
        " 'nan'::DOUBLE > 1e308 AS nangt",
        "SELECT isnan('nan'::DOUBLE) AS n1, isinf('inf'::DOUBLE) AS i1",
        "SELECT greatest(1e0, 'nan'::DOUBLE) AS gn,"
        " least(1e0, 'nan'::DOUBLE) AS ln2",
        "SELECT greatest(NULL, 1) AS g1, least(NULL, 1) AS l1,"
        " greatest(NULL, NULL) AS g2",
        "SELECT (0.1::FLOAT4)::VARCHAR AS f1, (2.5::FLOAT4 * 2)::VARCHAR AS f2",
        "SELECT 10 % 3 AS m1, -10 % 3 AS m2, 10 % -3 AS m3",
        "SELECT mod(-10, 3) AS md1, fmod(-10.5, 3) AS fd1",
        "SELECT sign(-2.5) AS s1, sign(0) AS s2, sign('nan'::DOUBLE) AS s3",
        "SELECT trunc(2.7) AS t1, trunc(-2.7) AS t2",
        "SELECT 3.14::VARCHAR AS pi1, (-3.14)::VARCHAR AS pi2",
    ],
    "complex_compare": [
        "SELECT [1, 2] < [1, 3] AS c1, [1] < [1, 2] AS c2,"
        " [2] > [1, 9] AS c3",
        "SELECT (1, 2) < (1, 3) AS s1, (2, 0) > (1, 9) AS s2",
        "SELECT max(x) AS mx FROM (VALUES ([1, 2]), ([1, 3])) t(x)",
        "SELECT min(x) AS mn FROM (VALUES ([2]), ([1, 9])) t(x)",
        "SELECT x FROM (VALUES ([2]), ([1, 3]), ([1])) t(x) ORDER BY x",
        "SELECT DISTINCT x FROM (VALUES ([1, 2]), ([1, 2])) t(x)",
        "SELECT count(DISTINCT x) AS c FROM (VALUES ([1, NULL]),"
        " ([1, NULL]), ([2])) t(x)",
        "SELECT list_sort([[2], [1, 9], [1]]) AS ls",
        "SELECT array_position([1, NULL, 2], NULL) AS ap",
        "SELECT list_position([1, NULL, 2], 2) AS lp",
        "SELECT [1, 2] = [1, 2] AS eq1, [1, 2] = [1] AS eq2",
        "SELECT {'a': 1, 'b': 2} = {'a': 1, 'b': 2} AS se",
        "SELECT x FROM (VALUES ({'a': 2, 'b': 1}), ({'a': 1, 'b': 9}))"
        " t(x) ORDER BY x",
    ],
    "struct_fns": [
        "SELECT struct_extract({'a': 1, 'b': 2}, 'b') AS se",
        "SELECT struct_pack(a := 1, b := 'x') AS sp",
        "SELECT ({'a': 1, 'b': 2}).b AS fb, ({'a': {'c': 3}}).a.c AS fc",
        "SELECT ({'A b': 5}).\"A b\" AS qf",
        "SELECT union_value(k := 5) AS uv,"
        " union_tag(union_value(k := 5)) AS ut",
    ],
    "list_spellings": [
        "SELECT list_has_any([1, 2], [2, 3]) AS ha,"
        " list_has_all([1, 2, 3], [1, 3]) AS hl",
        "SELECT list_sort(list_intersect([1, 2, 3], [2, 3, 4])) AS li,"
        " list_concat([1], [2]) AS lc",
        "SELECT list_append([1, 2], 3) AS la, list_prepend(0, [1, 2]) AS lp",
        "SELECT len([1, 2, 3]) AS ln2, array_length([1, 2]) AS al,"
        " list_pack(1, 2, 3) AS pk",
        "SELECT list_position([1, 2], 2) AS po, list_indexof([1, 2], 2) AS io",
        "SELECT list_aggregate([1, 2, 3], 'min') AS ag,"
        " list_aggr([1, 2, 3], 'max') AS ag2",
        "SELECT list_sort([2, 1, NULL], 'DESC', 'NULLS FIRST') AS ls",
        "SELECT list_slice([1, 2, 3, 4], 2, 3) AS sl,"
        " list_element([1, 2], 2) AS el, list_extract([1, 2], 2) AS ex",
        "SELECT array_pop_back([1, 2, 3]) AS pb,"
        " array_pop_front([1, 2, 3]) AS pf",
        "SELECT list_value(1, 2) AS lv",
        "SELECT list_min([3, 1, 2]) AS mn, list_max([3, 1, 2]) AS mx,"
        " list_median([1, 2, 3, 4]) AS md",
        "SELECT round(list_entropy([1, 1, 2]), 9) AS en,"
        " list_mode([1, 2, 2]) AS mo",
        "SELECT round(list_kurtosis([1.0, 2.0, 3.0, 9.0]), 9) AS ku,"
        " round(list_skewness([1.0, 2.0, 4.0]), 9) AS sk",
        "SELECT list_bool_or([false, true]) AS bo,"
        " list_bool_and([true, true]) AS ba,"
        " list_first([1, 2]) AS lf, list_last([1, 2]) AS ll",
        "SELECT list_product([2.0, 3.0]) AS pr,"
        " list_string_agg(['a', 'b']) AS sa",
        "SELECT list_count([1, NULL, 2]) AS lc2",
        "SELECT array_pop_back([1]) AS p1, array_pop_front([]) AS p0,"
        " list_pop_back([1, 2, 3]) AS p3",
        "SELECT list_element([1, 2], -1) AS en, list_extract([1, 2], 9) AS eo,"
        " list_extract('abc', 2) AS es",
        "SELECT list_slice([1, 2, 3, 4, 5], 2, 4, 2) AS ss,"
        " list_slice('abcde', 2, 4) AS st",
        "SELECT list_histogram([2, 1, 1]) AS lh",
        "SELECT round(list_var_pop([1.0, 2.0, 3.0]), 9) AS vp,"
        " round(list_aggregate([1.0, 2.0, 3.0], 'stddev'), 9) AS sd",
        "SELECT list_any_value([NULL, 7]) AS av,"
        " list_aggregate([1, 2], 'product') AS pr2",
        "SELECT list_skewness([1.0, 1.0, 1.0]) AS sz,"
        " list_kurtosis([NULL, 1.0, 2.0, 3.0, 9.0]) AS kn",
    ],
    "hof_lambdas": [
        "SELECT list_transform([10, 20], (x, i) -> i) AS ti",
        "SELECT list_filter([10, 20, 30], (x, i) -> i % 2 = 1) AS fi",
        "SELECT filter([10, 20, 30], (x, i) -> i = 3) AS f3",
        "SELECT apply([10, 20], (x, i) -> x + i) AS ap",
        "SELECT list_transform([1, 2, 3], x -> x * 2) AS t2",
        "SELECT list_reduce([1, 2, 3], (a, b) -> a + b) AS lr",
        "SELECT list_reduce([5], (a, b) -> a + b) AS lr1",
        "SELECT list_where([10, 20, 30], [true, false, true]) AS lw",
        "SELECT list_grade_up([3, 1, 2]) AS gu",
        "SELECT list_select([10, 20, 30], [3, 1]) AS ls",
        "SELECT list_cosine_similarity([1.0, 0.0], [0.0, 1.0]) AS cs,"
        " list_dot_product([1.0, 2.0], [3.0, 4.0]) AS dp",
        "SELECT list_zip([1, 2], [3, 4]) AS lz2",
        "SELECT array_reverse([1, 2, 3]) AS ar,"
        " list_reverse([4, 5]) AS lrv",
    ],
    "datetime_edges": [
        "SELECT week(DATE '2024-01-01') AS w1, week(DATE '2023-01-01') AS w2,"
        " week(DATE '2021-01-03') AS w3",
        "SELECT weekofyear(DATE '2016-01-03') AS wy",
        "SELECT date_part('week', DATE '2024-12-30') AS wb1,"
        " date_part('week', DATE '2025-01-01') AS wb2",
        "SELECT strftime(DATE '2024-01-07', '%V') AS v,"
        " strftime(DATE '2024-01-07', '%U') AS u,"
        " strftime(DATE '2024-01-07', '%w') AS lw,"
        " strftime(DATE '2024-01-07', '%u') AS lu",
        "SELECT strftime(DATE '2024-01-01', '%U') AS u0,"
        " strftime(DATE '2024-12-31', '%U') AS u52,"
        " strftime(DATE '2016-01-03', '%W') AS w00,"
        " strftime(DATE '2024-12-31', '%W') AS w53",
        "SELECT strftime(DATE '2024-12-31', '%G-W%V-%u') AS iso,"
        " strftime(DATE '2016-01-03', '%G') AS gy",
        "SELECT last_day(DATE '2024-02-05') AS ld,"
        " last_day(TIMESTAMP '2023-02-05 10:00:00') AS lt",
        "SELECT make_date(2024, 2, 29) AS md,"
        " make_timestamp(2024, 2, 29, 23, 59, 59.5) AS mt",
        "SELECT date_part('dow', DATE '2024-01-07') AS dw,"
        " date_part('isodow', DATE '2024-01-07') AS iw",
        "SELECT time_bucket(INTERVAL '15 minutes',"
        " TIMESTAMP '2024-01-01 10:22:00') AS tb",
        "SELECT timezone_hour(TIMESTAMP '2024-01-01 00:00:00') AS th,"
        " timezone_minute(TIMESTAMP '2024-01-01 00:00:00') AS tm",
        "SELECT greatest(DATE '2024-01-01', DATE '2023-06-01') AS g,"
        " least(TIMESTAMP '2024-01-01 00:00:00',"
        " TIMESTAMP '2023-01-01 00:00:00') AS l",
        "SELECT nextafter(1.0, 2.0) AS na, nextafter(1.0, 0.0) AS nb",
    ],
    "coercions": [
        "SELECT '2' = 2 AS a, 2 = '2' AS b, '2.5' = 2.5 AS c,"
        " '02' = 2 AS d",
        "SELECT '2' < 10 AS lt, '10' < '9' AS ls",
        "SELECT 2 IN ('2', '3') AS i",
        "SELECT DATE '2024-01-01' = '2024-01-01' AS de,"
        " '2024-01-02' > DATE '2024-01-01' AS dg",
        "SELECT TIMESTAMP '2024-01-01 00:00:00' = '2024-01-01 00:00:00'"
        " AS te",
        "SELECT 1.0 = 1 AS ne, 1.5e0 = 1.5 AS fe",
        "SELECT DATE '2024-01-01' < TIMESTAMP '2024-01-01 00:00:01' AS dt",
        "SELECT 127::TINYINT = 127::BIGINT AS we",
        "SELECT 1 BETWEEN '0' AND '2' AS bw",
        "SELECT greatest('5', 10) AS g, least(5, '10') AS l",
        "SELECT CASE WHEN 1 THEN 'a' ELSE 'b' END AS ci",
        "SELECT NOT 1 AS n1, NOT 0 AS n0",
        "SELECT 1 AND true AS ab",
    ],
    "recursive_cte": [
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t"
        " WHERE n < 5) SELECT * FROM t ORDER BY n",
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION SELECT (n % 3) + 1"
        " FROM t) SELECT * FROM t ORDER BY n",
        "WITH RECURSIVE f(i, x) AS (SELECT 1, 1 UNION ALL"
        " SELECT i + 1, x * (i + 1) FROM f WHERE i < 8)"
        " SELECT max(x) AS fact FROM f",
        "WITH RECURSIVE p(s) AS (SELECT 'a' UNION ALL"
        " SELECT s || 'b' FROM p WHERE length(s) < 4)"
        " SELECT * FROM p ORDER BY s",
        "WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM r"
        " WHERE n < 10), e AS (SELECT n FROM r WHERE n % 2 = 0)"
        " SELECT sum(n) AS s FROM e",
        "WITH RECURSIVE reach(src, dst) AS ("
        " SELECT * FROM (VALUES (1, 2), (2, 3), (3, 4)) e(s, d)"
        " UNION SELECT r.src, e.d FROM reach r"
        " JOIN (VALUES (1, 2), (2, 3), (3, 4)) e(s, d) ON r.dst = e.s)"
        " SELECT * FROM reach ORDER BY src, dst",
    ],
    "null_logic": [
        "SELECT 1 IN (2, NULL) AS i1, 1 IN (1, NULL) AS i2,"
        " NULL IN (1) AS i3",
        "SELECT 1 NOT IN (2, NULL) AS n1, 1 NOT IN (1, NULL) AS n2",
        "SELECT 1 = ANY(SELECT * FROM (VALUES (2), (NULL)) t(x)) AS a1",
        "SELECT 1 = ANY(SELECT * FROM (VALUES (1), (NULL)) t(x)) AS a2",
        "SELECT 1 = ALL(SELECT * FROM (VALUES (1), (NULL)) t(x)) AS l1",
        "SELECT 1 = ALL(SELECT x FROM (VALUES (1)) t(x) WHERE false) AS l2",
        "SELECT 1 <> ALL(SELECT * FROM (VALUES (2), (3)) t(x)) AS l3",
        "SELECT 5 > ANY(SELECT * FROM (VALUES (3), (NULL)) t(x)) AS g1",
        "SELECT 1 IN (SELECT x FROM (VALUES (NULL)) t(x)) AS s1",
        "SELECT 1 NOT IN (SELECT x FROM (VALUES (NULL)) t(x)) AS s2",
        "SELECT EXISTS(SELECT NULL) AS e1,"
        " NOT EXISTS(SELECT 1 WHERE false) AS e2",
        "SELECT NULL AND false AS af, NULL AND true AS at,"
        " NULL OR true AS ot, NULL OR false AS onf",
        "SELECT NOT NULL AS nn",
        "SELECT CASE NULL WHEN NULL THEN 1 ELSE 2 END AS cw",
        "SELECT 1 BETWEEN NULL AND 2 AS b1, 3 BETWEEN NULL AND 2 AS b2",
        "SELECT NULL IS DISTINCT FROM NULL AS d1,"
        " 1 IS NOT DISTINCT FROM NULL AS d2",
        "SELECT NULLIF(NULL, 1) AS nf, COALESCE(NULL, NULL) AS co",
    ],
    "stats_aggs": [
        "SELECT corr(x, y) AS c FROM (VALUES (1.0, 2.0)) t(x, y)",
        "SELECT covar_samp(x, y) AS cs FROM (VALUES (1.0, 2.0)) t(x, y)",
        "SELECT covar_pop(x, y) AS cp FROM (VALUES (1.0, 2.0)) t(x, y)",
        "SELECT stddev(x) AS sd, var_samp(x) AS vs FROM (VALUES (1.0)) t(x)",
        "SELECT stddev_pop(x) AS sp, var_pop(x) AS vp FROM (VALUES (1.0)) t(x)",
        "SELECT corr(x, y) AS czero FROM (VALUES (1.0, 2.0), (1.0, 3.0)) t(x, y)",
        "SELECT corr(x, y) AS cnull FROM (VALUES (1.0, NULL),"
        " (2.0, 3.0)) t(x, y)",
        "SELECT round(corr(x, y), 9) AS cr FROM (VALUES (1.0, 2.0),"
        " (2.0, 3.0), (3.0, 5.0)) t(x, y)",
        "SELECT regr_slope(y, x) AS rs, regr_intercept(y, x) AS ri"
        " FROM (VALUES (1.0, 2.0), (2.0, 4.0)) t(x, y)",
        "SELECT regr_slope(y, x) AS rsv FROM (VALUES (1.0, 2.0),"
        " (1.0, 4.0)) t(x, y)",
        "SELECT round(regr_r2(y, x), 9) AS r2, regr_count(y, x) AS rc"
        " FROM (VALUES (1.0, 2.0), (2.0, 3.0), (3.0, 5.0)) t(x, y)",
        "SELECT regr_avgx(y, x) AS ax, regr_avgy(y, x) AS ay,"
        " regr_sxx(y, x) AS sxx, regr_syy(y, x) AS syy,"
        " regr_sxy(y, x) AS sxy FROM (VALUES (1.0, 2.0), (2.0, 5.0)) t(x, y)",
        "SELECT skewness(x) AS sk FROM (VALUES (1.0), (2.0)) t(x)",
        "SELECT kurtosis(x) AS ku FROM (VALUES (1.0), (2.0), (3.0)) t(x)",
        "SELECT round(kurtosis_pop(x), 6) AS kp FROM (VALUES (1.0),"
        " (2.0), (3.0)) t(x)",
        "SELECT round(entropy(x), 9) AS e FROM (VALUES (1), (1), (2)) t(x)",
        "SELECT mad(x) AS m FROM (VALUES (1.0), (2.0), (4.0)) t(x)",
        "SELECT bit_and(x) AS ba, bit_or(x) AS bo, bit_xor(x) AS bx"
        " FROM (VALUES (6), (3)) t(x)",
        "SELECT product(x) AS p FROM (VALUES (2.0), (3.0)) t(x)",
        "SELECT round(skewness(x), 9) AS sk3 FROM (VALUES (1.0), (2.0),"
        " (4.0)) t(x)",
        "SELECT round(kurtosis(x), 9) AS ku4 FROM (VALUES (1.0), (2.0),"
        " (4.0), (9.0)) t(x)",
    ],
    "grouping_marks": [
        "SELECT k, grouping(k) AS g, count(*) AS c FROM (VALUES (1),"
        " (NULL)) t(k) GROUP BY ROLLUP(k) ORDER BY g, k",
        "SELECT a, b, grouping(a) AS ga, grouping(b) AS gb, count(*) AS c"
        " FROM (VALUES (1, 'x'), (1, 'y')) t(a, b)"
        " GROUP BY CUBE(a, b) ORDER BY ga, gb, a, b",
        "SELECT sum(v) AS s, count(v) AS c, avg(v) AS a, min(v) AS mn,"
        " max(v) AS mx FROM (VALUES (1)) t(v) WHERE false",
        "SELECT array_agg(v) AS aa FROM (VALUES (1)) t(v) WHERE false",
        "SELECT list(v) AS l FROM (VALUES (1)) t(v) WHERE false",
        "SELECT string_agg(v, ',') AS sa FROM (VALUES ('a')) t(v) WHERE false",
        "SELECT bool_and(v) AS ba, bool_or(v) AS bo FROM (VALUES (true))"
        " t(v) WHERE false",
        "SELECT count(*) AS c FROM (VALUES (1)) t(v) WHERE false",
        "SELECT sum(v) FILTER (WHERE false) AS s, count(*) AS c"
        " FROM (VALUES (1), (2)) t(v)",
        "SELECT avg(DISTINCT v) AS ad, sum(DISTINCT v) AS sd"
        " FROM (VALUES (1), (1), (2), (NULL)) t(v)",
        "SELECT count(DISTINCT (a, b)) AS cd FROM (VALUES (1, 2), (1, 2),"
        " (1, 3)) t(a, b)",
        "SELECT k, count(*) AS c FROM (VALUES (NULL), (NULL), (1)) t(k)"
        " GROUP BY k ORDER BY k",
        "SELECT first(v ORDER BY k) AS f, last(v ORDER BY k) AS l"
        " FROM (VALUES (10, 2), (20, 1), (30, NULL)) t(v, k)",
    ],
}


def canon(v, depth=0):
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        if v == int(v) and abs(v) < 2**52:
            return int(v)
        return float(f"{v:.9g}")
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, dt.time):
        return v.isoformat()
    if isinstance(v, dt.timedelta):
        return f"td:{v.total_seconds()}"
    if hasattr(v, "asDict") and depth > 0:
        return tuple(
            sorted((k, canon(x, depth + 1)) for k, x in v.asDict().items())
        )
    if isinstance(v, (list, tuple)):
        return tuple(canon(x, depth + 1) for x in v)
    if isinstance(v, dict):
        if set(v.keys()) == {"key", "value"} and isinstance(
            v.get("key"), list
        ):
            return tuple(
                sorted(
                    (str(k), canon(x, depth + 1))
                    for k, x in zip(v["key"], v["value"])
                )
            )
        return tuple(
            sorted((str(k), canon(x, depth + 1)) for k, x in v.items())
        )
    if isinstance(v, bytes):
        return v.hex()
    return v


def main() -> None:
    from duckdb_pgwire_spark.functions.udfs import register_udfs
    from duckdb_pgwire_spark.server.compat import rewrite
    from duckdb_pgwire_spark.session import build_session, register_views

    wanted = sys.argv[1:] or list(FAMILIES)
    spark = build_session(app_name="sweep-defaults")
    register_views(spark, "/root/testdata/sf0.01")
    register_udfs(spark)
    duck = duckdb.connect()

    counts = {"ok": 0, "MISMATCH": 0, "GAP": 0, "DUCK-ERR": 0, "BOTH-ERR": 0}
    for fam in wanted:
        print(f"== {fam} ==", flush=True)
        for sql in FAMILIES[fam]:
            try:
                want = sorted(canon(tuple(r)) for r in duck.execute(sql).fetchall())
                derr = None
            except Exception as exc:  # noqa: BLE001
                want, derr = None, str(exc).split("\n")[0][:160]
            try:
                rows = spark.sql(rewrite(sql)).collect()
                have = sorted(canon(tuple(r)) for r in rows)
                serr = None
            except Exception as exc:  # noqa: BLE001
                have, serr = None, str(exc).replace("\n", " ")[:160]
            if derr and serr:
                counts["BOTH-ERR"] += 1
            elif derr:
                counts["DUCK-ERR"] += 1
                print(f"DUCK-ERR {sql}\n  duck: {derr}\n  spark: {have!r}")
            elif serr:
                counts["GAP"] += 1
                print(f"GAP      {sql}\n  duck: {want!r}\n  spark: {serr}")
            elif want != have:
                counts["MISMATCH"] += 1
                print(f"MISMATCH {sql}\n  duck:  {want!r}\n  spark: {have!r}")
            else:
                counts["ok"] += 1
    print("totals:", counts)


if __name__ == "__main__":
    main()
