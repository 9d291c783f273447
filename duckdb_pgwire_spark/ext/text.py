"""[EXT] Text analysis operators over the ``documents`` corpus.

Language ID (stopword-overlap heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and rolling-hash-style document
fingerprinting. All pure column expressions — whole-stage codegen, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import load_table, load_table_parallel

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# The fixture corpus is synthetic word soup, so predictions are about
# deterministic operator semantics, not linguistic accuracy.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "zu"),
    "fr": ("le", "la", "de", "et", "un"),
    "es": ("el", "la", "de", "y", "un"),
}

# BPE-ish token pattern: runs of letters, runs of digits, or single
# non-alphanumeric-non-space characters.
TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


@query(
    "text_quality_score",
    oracle="""
    SELECT
        doc_id,
        len(string_split(text, ' '))                          AS n_words,
        length(text)                                          AS n_chars_check,
        ROUND(CAST(length(text) AS DOUBLE)
              / len(string_split(text, ' ')), 4)              AS avg_word_len,
        len(list_distinct(string_split(text, ' ')))           AS n_uniq_words,
        ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / len(string_split(text, ' ')), 4)              AS uniq_ratio,
        len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))        AS n_punct,
        (length(text) BETWEEN 50 AND 10000
         AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) > 0.2)            AS passes_quality
    FROM documents
    """,
    tags=("ext", "text"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristics: length band, word stats, uniqueness
    ratio, punctuation count, composite pass/fail — the standard
    pre-training corpus filter shape (C4/Gopher-style rules)."""
    d = load_table_parallel(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_words = F.size(words)
    n_uniq = F.size(F.array_distinct(words))
    uniq_ratio = n_uniq.cast("double") / n_words
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.length("text").alias("n_chars_check"),
        F.round(F.length("text").cast("double") / n_words, 4).alias("avg_word_len"),
        n_uniq.alias("n_uniq_words"),
        F.round(uniq_ratio, 4).alias("uniq_ratio"),
        F.regexp_count("text", F.lit("[^a-zA-Z0-9 ]")).alias("n_punct"),
        (F.length("text").between(50, 10000) & (uniq_ratio > 0.2)).alias("passes_quality"),
    )


def _lang_scores_sql(dialect: str) -> dict[str, str]:
    """Per-language stopword-hit counts as SQL expressions."""
    out = {}
    for lang, words in STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        if dialect == "duckdb":
            out[lang] = (
                f"len(list_filter(string_split(text, ' '), w -> list_contains([{lst}], w)))"
            )
        else:
            out[lang] = (
                f"size(filter(split(text, ' '), w -> array_contains(array({lst}), w)))"
            )
    return out


def _lang_id_sql(dialect: str) -> str:
    s = _lang_scores_sql(dialect)
    langs = list(STOPWORDS)
    # argmax with deterministic tie-break: first language in fixed order
    # strictly greater than all later ones wins.
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} >= s_{other}" for other in langs[:i]] + [
            f"s_{lang} > s_{other}" for other in langs[i + 1 :]
        ]
        cases.append(f"WHEN {' AND '.join(conds) or 'true'} THEN '{lang}'")
    score_cols = ", ".join(f"{expr} AS s_{lang}" for lang, expr in s.items())
    src = "documents" if dialect == "duckdb" else "documents_par"
    return f"""
        WITH scored AS (SELECT doc_id, lang, {score_cols} FROM {src})
        SELECT doc_id, lang AS labeled_lang,
               CASE {' '.join(cases)} ELSE 'unknown' END AS predicted_lang,
               s_en, s_de, s_fr, s_es
        FROM scored
    """


@query("text_lang_id", oracle=_lang_id_sql("duckdb"), tags=("ext", "text", "langid"))
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language ID with deterministic argmax tie-break.

    Pure map stage (no shuffle); real corpora would swap the stopword
    lists for char-n-gram profiles — same plan shape."""
    load_table_parallel(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_par"
    )
    return spark.sql(_lang_id_sql("spark"))


@query(
    "text_token_count",
    oracle=f"""
    SELECT
        doc_id,
        len(string_split(text, ' '))                    AS ws_tokens,
        len(regexp_extract_all(text, '{TOKEN_RE}'))     AS bpe_ish_tokens,
        CAST(CEIL(length(text) / 4.0) AS BIGINT)        AS est_tokens_len4
    FROM documents
    """,
    tags=("ext", "text", "tokens"),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, BPE-ish regex, chars/4
    heuristic — the standard budget estimators for training-data
    pipelines."""
    d = load_table_parallel(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.regexp_count("text", F.lit(TOKEN_RE)).alias("bpe_ish_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("est_tokens_len4"),
    )


@query(
    "text_fingerprint",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        WHERE len(w) >= 3
    )
    SELECT doc_id,
           md5(list_aggregate(
                 list_sort(list_transform(shingles, s -> md5(s)))[1:4],
                 'string_agg', ',')) AS fingerprint
    FROM sh
    """,
    tags=("ext", "text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint: md5 each 3-gram shingle,
    keep the 4 smallest hashes, hash their concatenation. Two documents
    share a fingerprint iff their smallest shingle-hashes agree — a
    locality-sensitive content signature that tolerates local edits."""
    d = load_table_parallel(spark, sf_dir, "documents")
    words = F.split("text", " ")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(words, i),
                F.element_at(words, i + 1),
                F.element_at(words, i + 2),
            ),
        )
    )
    return (
        d.filter(F.size(words) >= 3)
        .select("doc_id", shingles.alias("shingles"))
        .select(
            "doc_id",
            F.md5(
                F.array_join(
                    F.slice(F.array_sort(F.transform("shingles", F.md5)), 1, 4), ","
                )
            ).alias("fingerprint"),
        )
    )


@query(
    "sample_hash_deterministic",
    oracle="""
    SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS first_id
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
    GROUP BY lang
    """,
    tags=("ext", "text", "sampling"),
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~12.5% sample (md5(doc_id) first hex in {0,1}).

    TABLESAMPLE/rand() are nondeterministic across engines, runs, and
    partitionings — useless for reproducible training-data splits. A
    content-hash predicate gives the same sample everywhere, composes
    with pushdown (it's just a filter), and extends to weighted or
    stratified variants by widening the hex range per stratum.
    """
    d = load_table(spark, sf_dir, "documents")
    keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
    return (
        d.filter(keep)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"), F.min("doc_id").alias("first_id"))
    )
