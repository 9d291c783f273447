"""String function group (SURVEY.md §2.10)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import load_table


@query(
    "fn_string_basic",
    oracle="""
    SELECT
        p_partkey,
        lower(p_name)                        AS lo,
        upper(p_name)                        AS up,
        length(p_name)                       AS len,
        substring(p_name, 3, 5)              AS sub,
        trim('  ' || p_name || ' ')          AS trimmed,
        ltrim(' x' || p_name, ' x')          AS l_trimmed,
        rtrim(p_name || 'zz', 'z')           AS r_trimmed,
        replace(p_name, 'a', '@')            AS repl,
        p_name || '/' || p_brand             AS joined,
        reverse(p_name)                      AS rev,
        repeat(p_brand, 2)                   AS rep2,
        lpad(p_brand, 12, '.')               AS padded_l,
        rpad(p_brand, 12, '.')               AS padded_r
    FROM part
    """,
    tags=("string",),
)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string transforms — all JVM built-ins, zero UDFs."""
    p = load_table(spark, sf_dir, "part")
    name, brand = F.col("p_name"), F.col("p_brand")
    return p.select(
        "p_partkey",
        F.lower(name).alias("lo"),
        F.upper(name).alias("up"),
        F.length(name).alias("len"),
        F.substring(name, 3, 5).alias("sub"),
        F.trim(F.concat(F.lit("  "), name, F.lit(" "))).alias("trimmed"),
        F.expr("trim(LEADING ' x' FROM concat(' x', p_name))").alias("l_trimmed"),
        F.expr("trim(TRAILING 'z' FROM concat(p_name, 'zz'))").alias("r_trimmed"),
        F.replace(name, F.lit("a"), F.lit("@")).alias("repl"),
        F.concat_ws("/", name, brand).alias("joined"),
        F.reverse(name).alias("rev"),
        F.repeat(brand, 2).alias("rep2"),
        F.lpad(brand, 12, ".").alias("padded_l"),
        F.rpad(brand, 12, ".").alias("padded_r"),
    )


@query(
    "fn_string_search",
    oracle="""
    SELECT
        doc_id,
        split_part(text, ' ', 2)                 AS second_word,
        instr(text, 'spark')                     AS spark_pos,
        starts_with(text, 'the')                 AS starts_the,
        contains(text, 'vector')                 AS has_vector,
        left(text, 10)                           AS head10,
        right(text, 10)                          AS tail10,
        levenshtein(left(text, 8), 'the fast')   AS lev_head,
        md5(text)                                AS digest,
        regexp_matches(text, 'join.*merge')      AS joins_then_merges,
        regexp_extract(text, '([a-z]+) join', 1) AS word_before_join,
        regexp_replace(text, '\\s+', '_', 'g')   AS underscored
    FROM documents
    WHERE doc_id < 100
    """,
    tags=("string", "regex"),
)
def fn_string_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search/regex family. Spark regexp_replace is global by default;
    DuckDB needs the 'g' flag — dialect delta handled in the oracle."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    t = F.col("text")
    return d.select(
        "doc_id",
        F.split_part(t, F.lit(" "), F.lit(2)).alias("second_word"),
        F.instr(t, "spark").alias("spark_pos"),
        F.startswith(t, F.lit("the")).alias("starts_the"),
        F.contains(t, F.lit("vector")).alias("has_vector"),
        F.expr("left(text, 10)").alias("head10"),
        F.expr("right(text, 10)").alias("tail10"),
        F.levenshtein(F.expr("left(text, 8)"), F.lit("the fast")).alias("lev_head"),
        F.md5(t).alias("digest"),
        t.rlike("join.*merge").alias("joins_then_merges"),
        F.regexp_extract(t, "([a-z]+) join", 1).alias("word_before_join"),
        F.regexp_replace(t, r"\s+", "_").alias("underscored"),
    )


@query(
    "fn_string_distance",
    oracle="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS lev,
           (levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) <= 20)
               AS near_match
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    WHERE a.doc_id < 100
    """,
    tags=("function", "string", "distance"),
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity (levenshtein) between neighboring
    documents' prefixes — the fuzzy-matching primitive behind
    record-linkage / near-dup candidate verification. Both engines
    implement the identical unit-cost Levenshtein, so values match
    exactly. The adjacent-pair join keys on doc_id (equi-join, no
    cross product); the distance itself is a JVM built-in, no UDF.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("prefix")
    )
    a = d.filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("doc_a"), F.col("prefix").alias("pa")
    )
    b = d.select((F.col("doc_id") - 1).alias("doc_a"), F.col("prefix").alias("pb"),
                 F.col("doc_id").alias("doc_b"))
    lev = F.levenshtein("pa", "pb")
    return a.join(b, "doc_a").select(
        "doc_a",
        "doc_b",
        lev.alias("lev"),
        (lev <= 20).alias("near_match"),
    )


@query(
    "fn_string_parts",
    oracle="""
    SELECT doc_id,
           split_part(text, ' ', 1)          AS first_word,
           split_part(text, ' ', 3)          AS third_word,
           translate(left(text, 20), 'aeiou', '*****') AS devoweled,
           ascii(left(text, 1))              AS first_code,
           chr(65 + CAST(doc_id % 26 AS INT)) AS doc_letter,
           right(text, 6)                    AS tail6
    FROM documents
    WHERE doc_id < 500
    """,
    tags=("string",),
)
def fn_string_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split_part / translate / ascii / chr / left / right —
    the PG-and-DuckDB string spellings with direct Spark twins (all
    whole-stage-codegen column expressions, pure map)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return d.select(
        "doc_id",
        F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(3)).alias("third_word"),
        F.translate(F.expr("left(text, 20)"), "aeiou", "*****").alias("devoweled"),
        F.ascii(F.expr("left(text, 1)")).alias("first_code"),
        F.chr(65 + (F.col("doc_id") % 26).cast("int")).alias("doc_letter"),
        F.expr("right(text, 6)").alias("tail6"),
    )
