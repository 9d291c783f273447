"""[EXT] Text analysis operators over the ``documents`` corpus.

Language ID (stopword-overlap heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and rolling-hash-style document
fingerprinting. All pure column expressions — whole-stage codegen, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..session import load_table, load_table_parallel, table_row_count

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


@query(
    "text_repetition_ratio",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               list_transform(range(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        WHERE len(w) >= 3
    )
    SELECT doc_id,
           len(s)                                            AS n_3grams,
           len(list_distinct(s))                             AS n_uniq_3grams,
           ROUND(CAST(len(s) - len(list_distinct(s)) AS DOUBLE)
                 / len(s), 4)                                AS dup_ratio,
           (CAST(len(s) - len(list_distinct(s)) AS DOUBLE)
                 / len(s)) <= 0.5                            AS passes_repetition
    FROM sh
    """,
    tags=("ext", "text", "quality"),
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition filter (Gopher-style): the fraction of
    3-gram occurrences that are duplicates of an earlier 3-gram in the
    SAME document. Boilerplate / template / looping-generation text
    scores high and is dropped before training.

    Pure per-row column expressions — no shuffle at all, whole-stage
    codegen, trivially parallel at any corpus size.
    """
    d = load_table_parallel(spark, sf_dir, "documents")
    words = F.split("text", " ")
    sh = F.transform(  # NON-distinct shingles: repetition is the signal
        F.sequence(F.lit(1), F.size(words) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(words, i),
            F.element_at(words, i + 1),
            F.element_at(words, i + 2),
        ),
    )
    n = F.size(sh)
    n_uniq = F.size(F.array_distinct(sh))
    dup = (n - n_uniq).cast("double") / n
    return d.filter(F.size(words) >= 3).select(
        "doc_id",
        n.alias("n_3grams"),
        n_uniq.alias("n_uniq_3grams"),
        F.round(dup, 4).alias("dup_ratio"),
        (dup <= 0.5).alias("passes_repetition"),
    )


@query(
    "text_contamination_check",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        WHERE len(w) >= 3
    ),
    bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
    probe AS (
        SELECT doc_id, len(s) AS n_sh, unnest(s) AS g
        FROM sh WHERE doc_id % 97 <> 0
    )
    SELECT p.doc_id,
           COUNT(*)                                    AS n_overlap,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MIN(p.n_sh), 4) AS contamination
    FROM probe p JOIN bench b ON p.g = b.g
    GROUP BY p.doc_id
    """,
    tags=("ext", "text", "contamination"),
)
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: which corpus documents share a
    3-gram shingle with the held-out "benchmark" set (here: every 97th
    doc), and how much of the document overlaps.

    Scale design: the benchmark side is small and bounded (eval sets are
    thousands of docs, not billions) — its distinct shingle set is
    BROADCAST, so the corpus side never shuffles its shingles; the only
    shuffle is the per-doc overlap count, which carries matching
    shingles only. This is the standard pre-training decontamination
    join (e.g. GPT-3 appendix C / PaLM-style 3-gram overlap checks).
    """
    from .dedup import _shingles

    d = load_table_parallel(spark, sf_dir, "documents")
    words = F.split("text", " ")
    sh = d.filter(F.size(words) >= 3).select(
        "doc_id", _shingles(words).alias("s")
    )
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("s").alias("g"))
        .distinct()
    )
    probe = sh.filter(F.col("doc_id") % 97 != 0).select(
        "doc_id", F.size("s").alias("n_sh"), F.explode("s").alias("g")
    )
    return (
        probe.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_overlap"),
            F.round(F.count("*").cast("double") / F.min("n_sh"), 4).alias(
                "contamination"
            ),
        )
    )


@query(
    "pipeline_corpus_curation",
    oracle="""
    WITH base AS (
        SELECT doc_id, lang, text, string_split(text, ' ') AS w FROM documents
    ),
    sh AS (
        SELECT doc_id, lang, text, w,
               list_transform(range(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS s
        FROM base WHERE len(w) >= 3
    ),
    q AS (
        SELECT doc_id, lang, text FROM sh
        WHERE length(text) BETWEEN 50 AND 10000
          AND CAST(len(list_distinct(w)) AS DOUBLE) / len(w) > 0.2
          AND CAST(len(s) - len(list_distinct(s)) AS DOUBLE) / len(s) <= 0.5
    ),
    dedup AS (
        SELECT doc_id, lang, text,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM q
    ),
    sampled AS (
        SELECT doc_id, lang, text FROM dedup
        WHERE rn = 1
          AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
              IN ('0','1','2','3','4','5','6','7')
    )
    SELECT lang, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM sampled GROUP BY lang
    """,
    tags=("ext", "text", "pipeline"),
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation in ONE declarative plan: quality
    filter (length band + uniqueness) → repetition filter (duplicate
    3-gram ratio) → exact dedup keeping the lowest doc_id per content
    hash → deterministic 50% hash sample → per-language stats.

    This is the composition story: each stage is the same logic as its
    standalone operator (text_quality_score / text_repetition_ratio /
    dedup_exact / sample_hash_deterministic), but expressed as one
    DataFrame so Catalyst fuses the three map-side filters into a
    single scan pass — the only shuffles are the dedup window on
    md5(text) and the final tiny groupBy(lang). At 100 TB that is scan
    → filter (fused, pushdown-friendly) → one content-hash shuffle →
    O(langs) rows out.
    """
    d = load_table_parallel(spark, sf_dir, "documents")
    words = F.split("text", " ")
    sh = F.transform(
        F.sequence(F.lit(1), F.size(words) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(words, i),
            F.element_at(words, i + 1),
            F.element_at(words, i + 2),
        ),
    )
    uniq_ratio = F.size(F.array_distinct(words)).cast("double") / F.size(words)
    dup_ratio = (F.size(sh) - F.size(F.array_distinct(sh))).cast("double") / F.size(sh)
    from pyspark.sql import Window

    w_hash = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        d.filter(
            (F.size(words) >= 3)
            & F.length("text").between(50, 10000)
            & (uniq_ratio > 0.2)
            & (dup_ratio <= 0.5)
        )
        .withColumn("rn", F.row_number().over(w_hash))
        .filter(
            (F.col("rn") == 1)
            & F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
                *"01234567"
            )
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.sum(F.length("text")).alias("total_chars"),
        )
    )


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH tokens AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tokens GROUP BY doc_id, word),
    df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY word),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.word,
               tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS score
        FROM tf JOIN df USING (word) CROSS JOIN n
    )
    SELECT doc_id, word, ROUND(score, 6) AS tfidf
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, word) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
    tags=("ext", "text", "tfidf"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic corpus-statistics
    pipeline (keyword extraction / topic tagging ahead of training-data
    curation).

    Scale design: term frequencies shuffle on (doc, word) with map-side
    partial aggregation; document frequencies aggregate to O(vocab)
    rows and join back BROADCAST (a natural-language vocabulary is
    bounded — low millions of terms — regardless of corpus size); the
    corpus-size scalar joins the same way, keeping everything
    distributed with no driver-side collect. Top-k per doc is the
    single-shuffle WindowGroupLimit plan, not a self-join.
    """
    from pyspark.sql import Window

    d = load_table_parallel(spark, sf_dir, "documents")
    tokens = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = tokens.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    # document frequency FROM tf, not from a second explode of the
    # corpus (r17, guide §2.4): tf has exactly one row per distinct
    # (doc_id, word), so counting its rows per word IS
    # countDistinct(doc_id) — and when the df branch plans the
    # identical (doc_id, word) exchange the tf side already needs, AQE
    # ReusedExchange collapses them: the corpus is scanned + exploded
    # ONCE instead of twice. The tf > 0 filter is a tautology (a
    # COUNT(*) per existing group is >= 1) whose only job is to
    # REFERENCE tf: without it RemoveRedundantAggregates prunes the
    # lower aggregate to a bare distinct (functions=[]), the partial
    # aggregates stop being canonically equal, and the exchange is not
    # reused (verified on the final AQE plan both ways).
    df = (
        tf.filter(F.col("tf") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("df"))
    )
    # corpus cardinality from parquet FOOTER metadata (r18, the r17
    # sim_knn trick — guide §1.2/§5): `d.agg(count)` scheduled a whole
    # column-pruned scan job per execution for one number the footers
    # already carry exactly. Same integer, zero jobs, and the broadcast
    # single-row join becomes a literal.
    n_docs = table_row_count(sf_dir, "documents")
    scored = tf.join(F.broadcast(df), "word").withColumn(
        "score",
        F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("word"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "word", F.round("score", 6).alias("tfidf"))
    )


@query(
    "text_scrub_patterns",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\b(the|and|der|und|le|et|el|y)\b'))
               AS n_scrubbed,
           md5(regexp_replace(text, '\b(the|and|der|und|le|et|el|y)\b',
                              '[TERM]', 'g')) AS scrubbed_hash
    FROM documents
    """,
    tags=("ext", "text", "scrub"),
)
def text_scrub_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern scrubbing (the PII-redaction shape): regex-replace every
    match of a term set with a placeholder and count the redactions.
    Real pipelines swap the pattern for emails/phones/SSNs — same plan:
    a pure per-row map stage (regexp_replace + regexp_count), zero
    shuffle, trivially parallel. The scrubbed text is emitted as its
    md5 (compact deterministic witness that both engines produced the
    identical redacted string).

    Dialect note: DuckDB's regexp_replace is first-match-only without
    the 'g' flag; Spark's replaces all matches — the oracle passes 'g'
    so semantics agree.
    """
    pattern = r"\b(the|and|der|und|le|et|el|y)\b"
    d = load_table_parallel(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(pattern)).alias("n_scrubbed"),
        F.md5(F.regexp_replace("text", pattern, "[TERM]")).alias("scrubbed_hash"),
    )


# ------------------------------------------------------ document chunking

CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16
_CHUNK_STEP = CHUNK_TOKENS - CHUNK_OVERLAP


@query(
    "text_chunk_documents",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), n AS (
        SELECT doc_id, words,
               GREATEST(1, CAST(ceil((len(words) - {CHUNK_OVERLAP})
                                     / {_CHUNK_STEP}.0) AS BIGINT)) AS n_chunks
        FROM w
    )
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
           array_to_string(words[i * {_CHUNK_STEP} + 1 :
                                 i * {_CHUNK_STEP} + {CHUNK_TOKENS}], ' ')
               AS chunk_text,
           len(words[i * {_CHUNK_STEP} + 1 :
                     i * {_CHUNK_STEP} + {CHUNK_TOKENS}]) AS n_tokens
    FROM n CROSS JOIN unnest(range(0, n_chunks)) AS t(i)
    """,
    tags=("ext", "text", "chunking"),
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: {CHUNK_TOKENS}-token chunks
    with {CHUNK_OVERLAP}-token overlap — the standard pre-tokenization
    step of every LLM training/RAG pipeline (long documents must become
    budget-sized pieces without losing cross-boundary context).

    Pure JVM column HOFs: split once, then transform(sequence(...)) +
    slice + posexplode fan the chunks out INSIDE the row before a
    zero-shuffle projection — no join, no window, no Python. At 100 TB
    this is an embarrassingly parallel map whose output partitioning
    follows the input's.
    """
    d = load_table_parallel(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size(words) - CHUNK_OVERLAP) / float(_CHUNK_STEP)).cast("long"),
    )
    chunk = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.array_join(
                F.slice(words, i * _CHUNK_STEP + 1, CHUNK_TOKENS), " "
            ).alias("chunk_text"),
            F.size(F.slice(words, i * _CHUNK_STEP + 1, CHUNK_TOKENS)).alias(
                "n_tokens"
            ),
        ),
    )
    return (
        d.select("doc_id", F.explode(chunk).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_tokens").cast("bigint").alias("n_tokens"),
        )
    )


STRATUM_QUOTA = 50


@query(
    "sample_stratified_by_source",
    oracle=f"""
    SELECT source, doc_id
    FROM (
        SELECT source, doc_id,
               row_number() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS rk
        FROM documents
    ) ranked
    WHERE rk <= {STRATUM_QUOTA}
    """,
    tags=("ext", "sampling"),
)
def sample_stratified_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with a per-stratum quota: up to
    {STRATUM_QUOTA} documents per source, chosen by md5-rank — the
    corpus-mixing primitive (cap every source's contribution so one
    crawl doesn't dominate the training mix) with a DETERMINISTIC,
    engine-independent selection (hash order, not RNG state).

    Scale shape: one window shuffle keyed on the stratum; the md5 rank
    is computed map-side. Skewed strata cost one sort each —
    WindowGroupLimit pushes the quota below the sort at the partition
    level, so no stratum materializes beyond its top-{STRATUM_QUOTA}."""
    d = load_table_parallel(spark, sf_dir, "documents", parts=8)
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= STRATUM_QUOTA)
        .select("source", "doc_id")
    )


@query(
    "text_unigram_lm_score",
    oracle="""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), tot AS (
        SELECT COUNT(*) AS n FROM w
    ), vocab AS (
        SELECT word, COUNT(*) AS c FROM w GROUP BY word
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           ROUND(AVG(ln(c / (SELECT n FROM tot))), 4) AS avg_logprob
    FROM w JOIN vocab USING (word)
    GROUP BY doc_id
    """,
    tags=("ext", "text", "lm"),
)
def text_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring: every document's average
    log-probability under the corpus's own unigram distribution — the
    pseudo-perplexity signal quality-filtering pipelines threshold on
    (gibberish and boilerplate both sit in the tails).

    Scale shape: token counts are ONE shuffle with map-side combine
    (vocabulary is Zipf-bounded); scoring joins the exploded tokens to
    the vocabulary on the word key (AQE picks broadcast while the vocab
    fits, shuffle join beyond) and aggregates per document. The corpus
    total rides along as a broadcast single-row frame, exactly like the
    oracle's scalar subquery."""
    d = load_table_parallel(spark, sf_dir, "documents")
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    vocab = w.groupBy("word").agg(F.count("*").alias("c"))
    # corpus token total FROM vocab, not from a third explode of the
    # corpus (r17, guide §2.4): Σ c over the vocabulary IS COUNT(*)
    # over the exploded tokens (exact integer), and the vocab branch's
    # exchange is reused for it — corpus explodes per run: 3 → 2 (the
    # score-side token stream still needs its own pass, it carries
    # doc_id into the final per-document aggregate).
    tot = vocab.agg(F.sum("c").alias("n"))
    return (
        w.join(vocab, "word")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("c") / F.col("n"))), 4).alias("avg_logprob"),
        )
    )


# Cross-document boilerplate: a bigram in >= this many documents is
# shared scaffolding, not content (the C4-style "line seen in N pages"
# rule at phrase granularity — the fixture's texts have no newlines).
BOILERPLATE_MIN_DF = 40


@query(
    "text_boilerplate_phrases",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh AS (SELECT doc_id, array_to_string(list_slice(ws, i, i + 1), ' ') AS phrase
           FROM w, unnest(range(1, len(ws))) AS t(i))
    SELECT phrase, COUNT(DISTINCT doc_id) AS df
    FROM sh GROUP BY phrase
    HAVING df >= {BOILERPLATE_MIN_DF}
    ORDER BY df DESC, phrase
    """,
    tags=("ext", "text", "boilerplate"),
)
def text_boilerplate_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection: phrases (bigrams) whose
    document frequency exceeds a threshold — the phrase-level analogue
    of C4's "drop any line that appears on 3+ pages" cleaning rule
    (headers, footers, cookie banners at web scale).

    Scale shape: explode to (doc, bigram) pairs — pure JVM string ops,
    zero Python — then ONE shuffle for the distinct-count on the phrase
    key. Distinct (phrase, doc) pairs partial-aggregate map-side first,
    so the shuffle carries near-distinct pairs, not raw occurrences;
    the surviving report is tiny (df-thresholded) at any corpus size.
    The removal step is then a broadcast filter of this set against the
    corpus, same as text_scrub_patterns.
    """
    d = load_table_parallel(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(ws, i), F.element_at(ws, i + F.lit(1))
        ),
    )
    return (
        # size >= 2 guard: a one-word document makes sequence(1, 0) count
        # DOWN in Spark ([1, 0]) and element_at(ws, 0) then throws — the
        # oracle's range(1, len) is simply empty, so filtering changes
        # nothing for matching rows
        d.filter(F.size(ws) >= 2)
        .select("doc_id", F.explode(bigrams).alias("phrase"))
        .groupBy("phrase")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= BOILERPLATE_MIN_DF)
        .orderBy(F.col("df").desc(), "phrase")
    )


# Sequence packing: training context budget (tokens per packed sequence).
PACK_CONTEXT = 512


@query(
    "text_pack_sequences",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ), packed AS (
        SELECT doc_id, source, n_tokens,
               CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source
                                               ORDER BY doc_id
                                               ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW)
                           - n_tokens) / {PACK_CONTEXT}) AS BIGINT) AS bin_id
        FROM sized
    )
    SELECT source, bin_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed
    GROUP BY source, bin_id
    ORDER BY source, bin_id
    """,
    tags=("ext", "text", "packing"),
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed-budget training
    sequences ({PACK_CONTEXT} tokens) — the step between chunking and
    batch assembly in every LLM data pipeline (padding waste is the
    enemy; packing several short documents per sequence reclaims it).

    The bin id is floor(exclusive-prefix-sum / budget) within each
    source stream — a deterministic streaming pack that needs ONE
    window cumsum, no driver loop, no Python. (A document longer than
    the budget still advances the cursor — real pipelines chunk first;
    compose with text_chunk_documents.) At 100 TB: the window
    partitions by source shard, so state is one running sum per
    partition; output is the per-bin manifest the batcher consumes.
    """
    d = load_table_parallel(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = sized.withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_CONTEXT),
    )
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .orderBy("source", "bin_id")
    )


MIX_TOKENS_PER_WEIGHT = 300


@query(
    "text_mix_token_budget",
    oracle=f"""
    WITH t AS (
        SELECT source, doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) AS rk,
               (1 + CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 3)
                   * {MIX_TOKENS_PER_WEIGHT} AS quota
        FROM documents
    ), c AS (
        SELECT source, doc_id, n_tokens, quota,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY rk
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT source, doc_id, n_tokens FROM c WHERE cum <= quota
    """,
    tags=("ext", "text", "sampling", "mixing"),
)
def text_mix_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing to a TOKEN budget — the data-mixing step
    of a training pipeline: each source gets weight x budget tokens,
    documents admitted in a deterministic md5 order until the source's
    running token count hits its quota (so the mix is reproducible
    across runs and cluster sizes, unlike rand()-based sampling).

    Weights here derive from the fixture's source number (1 + n % 3); a
    real run passes a weights map the same way. Scale: one shuffle,
    keyed by source, one window cumsum per source partition — no
    collect, no global sort. A source hot enough to skew its partition
    is exactly the source you'd split into shards upstream; the
    admission rule is per-source, so sharding composes.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("rk"),
        (
            (1 + F.regexp_extract("source", "([0-9]+)", 1).cast("int") % 3)
            * MIX_TOKENS_PER_WEIGHT
        ).alias("quota"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.withColumn("cum", F.sum("n_tokens").over(w))
        .filter(F.col("cum") <= F.col("quota"))
        .select("source", "doc_id", "n_tokens")
    )


# ------------------------------------------------ deterministic epoch shuffle

SHUFFLE_SEED = 7  # epoch number: changing it re-permutes the whole corpus


@query(
    "sample_global_shuffle",
    oracle=f"""
    SELECT doc_id,
           row_number() OVER (
               ORDER BY md5({SHUFFLE_SEED} || ':' || CAST(doc_id AS VARCHAR)),
                        doc_id
           ) AS shuffle_pos
    FROM documents
    """,
    tags=("ext", "sampling", "shuffle"),
)
def sample_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle: assign every document a
    position in a pseudo-random permutation keyed by (epoch seed,
    doc_id) — the pre-training data-order primitive. Hash order instead
    of RNG state makes the permutation reproducible across engines,
    re-runs, and cluster sizes, and a new epoch is just a new seed.

    Scale shape: a global row_number window would single-partition the
    whole corpus — instead the rank is computed DISTRIBUTED in two
    passes: (1) bucket every row by the first md5 byte pair (the bucket
    id is a PREFIX of the sort key, so bucket order ≡ global order) and
    count each bucket — 256 metadata rows to the driver; (2) rank
    within each bucket (256-way parallel window) and add the bucket's
    broadcast cumulative offset. Identical positions to the global
    rank, no single-point sort. Writers then emit shards in
    shuffle_pos ranges, read sequentially at train time.
    """
    d = load_table_parallel(spark, sf_dir, "documents", parts=8)
    from pyspark.sql.window import Window

    key = F.md5(
        F.concat(F.lit(f"{SHUFFLE_SEED}:"), F.col("doc_id").cast("string"))
    )
    keyed = d.select("doc_id", key.alias("__k")).withColumn(
        "__b", F.substring("__k", 1, 2)
    )
    counts = sorted(
        (r["__b"], r["n"])
        for r in keyed.groupBy("__b").agg(F.count("*").alias("n")).collect()
    )
    offsets: dict[str, int] = {}
    acc = 0
    for b, n in counts:
        offsets[b] = acc
        acc += n
    # one parsed expression, not 512 F.lit Py4J round-trips (bucket ids
    # are md5 hex pairs — no quoting hazards); same plan-build hotspot
    # as the DSIR literal array (profiled r10)
    off_map = F.expr(
        "map(" + ",".join(f"'{b}',{off}L" for b, off in offsets.items()) + ")"
    )
    w = Window.partitionBy("__b").orderBy("__k", "doc_id")
    return keyed.select(
        "doc_id",
        (F.row_number().over(w) + off_map[F.col("__b")]).alias("shuffle_pos"),
    )


# --------------------------------------- temperature (alpha) source mixing

MIX_ALPHA = 0.5        # multinomial smoothing exponent (XLM-style)
MIX_TARGET_FRAC = 0.5  # expected fraction of total tokens kept


@query(
    "text_mix_temperature",
    oracle=f"""
    WITH tok AS (
        SELECT source, doc_id,
               len(string_split(text, ' ')) AS ntok
        FROM documents
    ), st AS (
        SELECT source, SUM(ntok) AS t FROM tok GROUP BY source
    ), g AS (
        SELECT ROUND(SUM(pow(t, {MIX_ALPHA})), 6) AS s,
               SUM(t) AS total
        FROM st
    ), p AS (
        SELECT st.source,
               ROUND(LEAST(1.0,
                   {MIX_TARGET_FRAC} * g.total
                   * (pow(st.t, {MIX_ALPHA}) / g.s) / st.t), 6) AS keep_p
        FROM st CROSS JOIN g
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN p ON p.source = d.source
    WHERE CAST(CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 13)
               AS BIGINT) AS DOUBLE) / 4503599627370496 < p.keep_p
    """,
    tags=("ext", "sampling", "mixing"),
)
def text_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed source mixing (the multinomial
    alpha-sampling of XLM / mBERT, public): per-source keep probability
    p_s ∝ t_s^alpha / t_s, so low-resource sources are UP-sampled
    relative to their size while the expected kept-token total stays at
    MIX_TARGET_FRAC of the corpus. Selection is a deterministic
    md5-uniform per doc (hash order, not RNG state) — reproducible
    across engines, re-runs, and cluster sizes; complements
    text_mix_token_budget's hard quotas with the probabilistic mix
    most pre-training recipes actually use.

    Scale shape: ONE map-side token count + per-source agg (#sources
    rows to the driver), probabilities broadcast as a literal map, then
    a ZERO-shuffle filter over the corpus. Cross-engine exactness: the
    driver mirrors the oracle's arithmetic operation-for-operation (the
    shared power-sum is rounded to 6 decimals on both sides, the
    uniform uses 52 hash bits so the double conversion is exact).
    """
    d = load_table_parallel(spark, sf_dir, "documents", parts=8)
    tok = d.select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("ntok")
    )
    st = tok.groupBy("source").agg(F.sum("ntok").alias("t")).collect()
    totals = {r["source"]: int(r["t"]) for r in st}
    total = sum(totals.values())
    s = round(sum(t ** MIX_ALPHA for t in totals.values()), 6)
    keep_p = {
        src: round(
            min(1.0, MIX_TARGET_FRAC * total * (t ** MIX_ALPHA / s) / t), 6
        )
        for src, t in totals.items()
    }
    p_map = F.create_map(*[F.lit(x) for kv in keep_p.items() for x in kv])
    uniform = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
        ).cast("double")
        / F.lit(4503599627370496.0)
    )
    return d.filter(uniform < p_map[F.col("source")]).select("doc_id", "source")


@query(
    "text_dup_span_fraction",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
    sp AS (
      SELECT doc_id, md5(unnest(list_transform(range(0, len(w)//10),
            i -> array_to_string(w[i*10+1:i*10+10], ' ')))) AS h
      FROM w WHERE len(w) >= 10
    ),
    freq AS (SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM sp GROUP BY h),
    per AS (
      SELECT sp.doc_id, COUNT(*) AS n_spans,
             SUM(CASE WHEN f.ndocs >= 2 THEN 1 ELSE 0 END) AS dup_spans
      FROM sp JOIN freq f USING (h) GROUP BY sp.doc_id
    )
    SELECT doc_id, n_spans, CAST(dup_spans AS BIGINT) AS dup_spans,
           ROUND(CAST(dup_spans AS DOUBLE)/n_spans, 4) AS dup_fraction,
           (CAST(dup_spans AS DOUBLE)/n_spans > 0.3) AS flagged
    FROM per
    """,
    tags=("ext", "text", "dedup", "quality"),
)
def text_dup_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-span fraction: per document, the share of its 10-word
    non-overlapping spans that also occur in at least one OTHER
    document — the Gopher/RefinedWeb "duplicate n-gram fraction"
    quality rule used to drop boilerplate-heavy pages.

    Scale design: spans are md5-hashed BEFORE the shuffle so the
    exchange carries 32-byte keys, not span text; the global frequency
    pass is a hash groupBy on the span hash (map-side partial) and the
    per-doc roll-up shuffles on doc_id. No all-pairs stage — cost is
    O(total spans), the same shape as exact dedup.
    """
    d = load_table_parallel(spark, sf_dir, "documents")
    w = F.split("text", " ")
    spans = F.transform(
        F.sequence(F.lit(0), (F.floor(F.size("w") / 10) - 1).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(F.col("w"), i * 10 + 1, 10)),
    )
    base = d.select("doc_id", w.alias("w")).filter(F.size("w") >= 10)
    sp = base.select("doc_id", F.explode(spans).alias("span")).select(
        "doc_id", F.md5("span").alias("h")
    )
    # Single evaluation of the span explode (r17 opt, guide §2.3/§3.3):
    # the old sp⋈freq self-join planned `sp` TWICE (split + md5 + explode
    # per side) and shuffled all span instances twice more (freq build +
    # join). One groupBy(h) now CARRIES the doc list through the same
    # exchange the frequency count used; duplicated-span instances flow
    # back as an explode of that list (only dup rows shuffle again), and
    # the per-doc span total comes straight from the scan projection
    # (floor(|w|/10) — no explode needed).
    byh = sp.groupBy("h").agg(F.collect_list("doc_id").alias("docs"))
    dup = (
        byh.filter(F.size(F.array_distinct("docs")) >= 2)
        .select(F.explode("docs").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("dup_spans"))
    )
    per = base.select(
        "doc_id", F.floor(F.size("w") / 10).cast("long").alias("n_spans")
    )
    return (
        per.join(dup, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce(F.col("dup_spans"), F.lit(0).cast("long")).alias(
                "dup_spans"
            ),
        )
        .select(
            "doc_id",
            "n_spans",
            "dup_spans",
            F.round(
                F.col("dup_spans").cast("double") / F.col("n_spans"), 4
            ).alias("dup_fraction"),
            (
                F.col("dup_spans").cast("double") / F.col("n_spans") > 0.3
            ).alias("flagged"),
        )
    )


@query(
    "text_strip_dup_spans",
    oracle="""
    WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS w
               FROM documents),
    sp AS (
      SELECT doc_id,
             unnest(range(0, len(w)//10)) AS i,
             unnest(list_transform(range(0, len(w)//10),
                 i -> md5(array_to_string(w[i*10+1:i*10+10], ' ')))) AS h
      FROM w WHERE len(w) >= 10
    ),
    freq AS (SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM sp GROUP BY h),
    drops AS (
      SELECT sp.doc_id, list(sp.i) AS drop_idx
      FROM sp JOIN freq f USING (h) WHERE f.ndocs >= 2
      GROUP BY sp.doc_id
    )
    SELECT w.doc_id,
           CASE WHEN d.drop_idx IS NULL THEN w.text
                ELSE COALESCE(array_to_string(list_filter(w.w,
                    (x, i) -> NOT list_contains(d.drop_idx, (i-1)//10)), ' '),
                    '')  -- duckdb 1.0: empty-list array_to_string is NULL
           END AS clean_text,
           CAST(COALESCE(len(d.drop_idx), 0) AS BIGINT) AS dropped_spans
    FROM w LEFT JOIN drops d USING (doc_id)
    """,
    tags=("ext", "text", "dedup", "transform"),
)
def text_strip_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document span REMOVAL (the RefinedWeb/Gopher line-dedup
    transform, not just the score): every 10-word span that also occurs
    in at least one OTHER document is stripped from the text, and the
    cleaned document is re-emitted. Complements text_dup_span_fraction,
    which only measures the duplicate share — this is the step a
    curation pipeline actually applies before training.

    Scale design: the exchange never carries span TEXT. Spans are
    md5-hashed in the scan projection; the frequency pass shuffles
    32-byte keys, the duplicated-span set flows back as (doc_id,
    span_index) pairs, and the rebuild is a doc_id-keyed join against
    the original scan followed by a JVM-side indexed array filter —
    words whose span index is in the per-doc drop list are removed,
    the <10-word tail (span index == n_spans) survives by
    construction. Cost is O(total spans) with two hash shuffles, the
    same shape as exact dedup; no all-pairs stage, no driver state.
    """
    d = load_table_parallel(spark, sf_dir, "documents")
    w = d.select("doc_id", "text", F.split("text", " ").alias("w"))
    n_spans = (F.floor(F.size("w") / 10) - 1).cast("int")
    span_hashes = F.transform(
        F.sequence(F.lit(0), n_spans),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("w"), i * 10 + 1, 10))),
    )
    sp = (
        w.filter(F.size("w") >= 10)
        .select("doc_id", F.posexplode(span_hashes).alias("i", "h"))
    )
    # Single evaluation of the span explode (r17 opt, guide §2.3/§3.3):
    # the old sp⋈freq self-join planned `sp` TWICE (split + md5 + explode
    # per side). One groupBy(h) carries the (doc_id, i) locations through
    # the same exchange the distinct-doc count used; only locations of
    # genuinely duplicated spans (≥2 distinct docs) shuffle again for the
    # per-doc drop-set roll-up.
    byh = sp.groupBy("h").agg(
        F.collect_list(F.struct("doc_id", "i")).alias("locs")
    )
    drops = (
        byh.filter(F.size(F.array_distinct(F.col("locs.doc_id"))) >= 2)
        .select(F.explode("locs").alias("loc"))
        .select(F.col("loc.doc_id").alias("doc_id"), F.col("loc.i").alias("i"))
        .groupBy("doc_id")
        .agg(F.collect_set("i").alias("drop_idx"))
    )
    kept = F.filter(
        F.col("w"),
        lambda x, i: ~F.array_contains(
            F.col("drop_idx"), F.floor(i / 10).cast("int")
        ),
    )
    return w.join(drops, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("drop_idx").isNull(), F.col("text"))
        .otherwise(F.array_join(kept, " "))
        .alias("clean_text"),
        F.when(F.col("drop_idx").isNull(), F.lit(0))
        .otherwise(F.size("drop_idx"))
        .cast("long")
        .alias("dropped_spans"),
    )


# DSIR feature-space size: hashed-bigram buckets. 256 keeps the two
# distribution vectors driver-held metadata (like text_mix_temperature's
# ~20 source totals) while still separating domains on this corpus; a
# production run would use 10k buckets — the plan shape is unchanged,
# only the broadcast literal grows.
DSIR_BUCKETS = 256

# (sf_dir, corpus fingerprint) → micro-nat ln-ratio table. The bigram
# distributions are per-corpus-EPOCH metadata, same argument as the IVF
# centroid cache (similarity.corpus_with_centroids): a deployed system
# estimates them once per ingestion epoch and scores many batches, so
# rebuilding them per query is not the steady-state cost. Deterministic:
# the cached table is exactly what a rebuild would produce.
_DSIR_RATIOS: dict[tuple, list[int]] = {}


def _dsir_ratios(spark: SparkSession, sf_dir: str, bk: DataFrame) -> list[int]:
    import math

    fp = (
        load_table(spark, sf_dir, "documents")
        .agg(
            F.count("*").alias("n"),
            F.sum("doc_id").alias("sid"),
            # content term: an in-place text edit at equal cardinality
            # and identical ids must still rebuild (the IVF centroid
            # cache's s1 precedent; code review r7)
            F.sum(F.length("text")).alias("schars"),
        )
        .first()
    )
    key = (sf_dir, int(fp["n"]), int(fp["sid"] or 0), int(fp["schars"] or 0))
    cached = _DSIR_RATIOS.get(key)
    if cached is not None:
        return cached
    cnt = (
        bk.groupBy("b")
        .agg(
            F.sum(F.when(F.col("doc_id") % 97 == 0, 1).otherwise(0)).alias("ct"),
            F.sum(F.when(F.col("doc_id") % 97 != 0, 1).otherwise(0)).alias("cr"),
        )
        .collect()
    )
    ct = {r["b"]: int(r["ct"]) for r in cnt}
    cr = {r["b"]: int(r["cr"]) for r in cnt}
    tt, tr = sum(ct.values()), sum(cr.values())
    lr = [
        int(
            round(
                math.log(
                    ((ct.get(b, 0) + 1.0) / (tt + DSIR_BUCKETS))
                    / ((cr.get(b, 0) + 1.0) / (tr + DSIR_BUCKETS))
                )
                * 1000000
            )
        )
        for b in range(DSIR_BUCKETS)
    ]
    _DSIR_RATIOS[key] = lr
    return lr


def _dsir_doc_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, logw_micro) for every RAW doc — the shared
    DSIR scoring pipeline (see text_dsir_weights for the design)."""
    d = load_table_parallel(spark, sf_dir, "documents")
    w = F.split("text", " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), (F.size("w") - 1).cast("int")),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("w"), i), F.element_at(F.col("w"), i + 1)
        ),
    )
    bk = (
        d.select("doc_id", w.alias("w"))
        .filter(F.size("w") >= 2)
        .select("doc_id", F.explode(bigrams).alias("g"))
        .select(
            "doc_id",
            (
                F.conv(F.substring(F.md5("g"), 1, 4), 16, 10).cast("int")
                % DSIR_BUCKETS
            ).alias("b"),
        )
    )
    lr = _dsir_ratios(spark, sf_dir, bk)
    # ONE parsed expression, not 256 F.lit Py4J round-trips: building
    # the literal array column-by-column cost ~0.7 s of plan
    # CONSTRUCTION per call — more than the query's execution (profiled
    # r10; the driver re-calls the query fn every bench run, so plan
    # build is on the measured path)
    lr_arr = F.expr(
        "array(" + ",".join(f"{v}L" for v in lr) + ")"
    )
    return (
        bk.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", F.element_at(lr_arr, F.col("b") + 1).alias("lr"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("lr").alias("logw_micro"),
        )
    )



# the full DSIR weight pipeline as a reusable SQL CTE chain (mirrors
# _dsir_doc_weights) — interpolated into the weights, gumbel-top-k and
# streaming-filter oracles so the distribution SQL exists exactly once
_DSIR_SQL_CTES = f"""
    w AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
    bk AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(unnest(list_transform(range(1, len(w)),
                 i -> w[i] || ' ' || w[i+1]))), 1, 4)) AS INT) % {DSIR_BUCKETS} AS b
      FROM w WHERE len(w) >= 2
    ),
    tot AS (
      SELECT SUM(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) AS tt,
             SUM(CASE WHEN doc_id % 97 <> 0 THEN 1 ELSE 0 END) AS tr
      FROM bk
    ),
    cnt AS (
      SELECT b,
             SUM(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) AS ct,
             SUM(CASE WHEN doc_id % 97 <> 0 THEN 1 ELSE 0 END) AS cr
      FROM bk GROUP BY b
    ),
    r AS (
      SELECT gs.b, CAST(ROUND(LN(
                 ((COALESCE(cnt.ct, 0) + 1.0) / (tot.tt + {DSIR_BUCKETS}))
               / ((COALESCE(cnt.cr, 0) + 1.0) / (tot.tr + {DSIR_BUCKETS}))
             ) * 1000000) AS BIGINT) AS lr
      FROM (SELECT unnest(range(0, {DSIR_BUCKETS})) AS b) gs
      CROSS JOIN tot LEFT JOIN cnt ON cnt.b = gs.b
    ),
    per AS (
      SELECT bk.doc_id, COUNT(*) AS n_bigrams,
             CAST(SUM(r.lr) AS BIGINT) AS logw_micro
      FROM bk JOIN r ON r.b = bk.b
      WHERE bk.doc_id % 97 <> 0 GROUP BY bk.doc_id
    )"""


@query(
    "text_dsir_weights",
    oracle=f"""
    WITH {_DSIR_SQL_CTES}
    SELECT doc_id, n_bigrams, logw_micro,
           ROUND(CAST(logw_micro AS DOUBLE) / 1e6 / n_bigrams, 4) AS avg_lw
    FROM per
    """,
    tags=("ext", "text", "sampling", "dsir"),
)
def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    score raw-corpus documents by how target-like their hashed-bigram
    distribution is — log importance weight = Σ over bigram instances
    of ln(p_target(bucket)/p_raw(bucket)), add-1 smoothed. Target here
    is the held-out benchmark-like slice (doc_id % 97 = 0, the same
    split text_contamination_check uses); importance resampling then
    keeps raw docs with the highest weights.

    Cross-engine float rule (ext/vectorized.py): the per-bucket
    ln-ratios are rounded to integer MICRO-nats on both engines, so the
    per-doc reduction is an exact integer SUM — order-independent,
    hash-stable. The distributions are {DSIR_BUCKETS}-row driver-held
    metadata (bounded like text_mix_temperature's source totals); the
    per-instance lookup is a literal-array element_at, so the scoring
    plan's only shuffle is the per-doc roll-up — no join against the
    corpus. The distribution build is a once-per-corpus-epoch cost
    (cached like the IVF centroids; visible as index_warmup_sec in
    bench output).
    """
    return _dsir_doc_weights(spark, sf_dir).select(
        "doc_id",
        "n_bigrams",
        "logw_micro",
        F.round(
            F.col("logw_micro").cast("double") / 1e6 / F.col("n_bigrams"), 4
        ).alias("avg_lw"),
    )


# resample size: fixture-scale constant; a production run sets it to
# the target token budget. TakeOrdered top-k — never a global sort.
DSIR_KEEP = 40

@query(
    "sample_dsir_gumbel_topk",
    oracle=f"""
    WITH {_DSIR_SQL_CTES},
    keyed AS (
      SELECT doc_id, logw_micro,
             CAST(logw_micro + ROUND(-LN(-LN(
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_dsir'), 1, 13))
                     AS BIGINT) / 4503599627370496.0
             )) * 1000000) AS BIGINT) AS score_micro
      FROM per
    )
    SELECT doc_id, logw_micro, score_micro FROM keyed
    ORDER BY score_micro DESC, doc_id LIMIT {DSIR_KEEP}
    """,
    tags=("ext", "text", "sampling", "dsir"),
)
def sample_dsir_gumbel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance RESAMPLING via deterministic Gumbel-top-k
    (the sampling-without-replacement step of arXiv:2302.03169 §2:
    adding Gumbel noise to log-weights and taking the top-k draws k
    docs proportionally to their importance weights, without
    replacement).

    Determinism + cross-engine exactness: the Gumbel perturbation's
    uniform comes from md5(doc_id||'_dsir') (the repo's standard
    hash-uniform), and -ln(-ln(u)) is rounded to integer micro-nats on
    both engines — the sort key is exact integer arithmetic, ties
    broken by doc_id. Scale: the plan is the weight pipeline + ONE
    TakeOrdered top-k (no global sort, no single-partition window);
    the k boundary never shuffles more than k rows per partition.
    """
    wdf = _dsir_doc_weights(spark, sf_dir)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("_dsir"))),
                1, 13,
            ),
            16, 10,
        ).cast("double")
        / F.lit(4503599627370496.0)
    )
    gumbel_micro = F.round(-F.log(-F.log(u)) * 1000000.0).cast("long")
    return (
        wdf.select(
            "doc_id",
            "logw_micro",
            (F.col("logw_micro") + gumbel_micro).alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(DSIR_KEEP)
    )


# ------------------------------------------------------------------ PII scrub
# Training-data pipelines mask contact strings before anything else
# touches the text. The fixture corpus is synthetic word soup with no
# real PII, so the op INJECTS deterministic doc_id-derived tokens
# (email, IPv4, phone) into the text on BOTH engines first — the regex
# machinery is then tested against guaranteed non-zero matches, and
# `masked_clean` proves the scrub converges (zero residual matches).
# Conservative RE2-and-Java-safe patterns: no lookarounds, no \p
# classes beyond what both engines share.
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IP_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
PII_PHONE_RE = "\\+\\d{1,2}-\\d{3}-\\d{4}"

# doc_id-derived augmentation, duck SQL spelling (the Spark side
# builds the same string with F.concat)
_PII_AUG_SQL = (
    "text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex'"
    " || CAST(doc_id % 7 AS VARCHAR) || '.com from 10.'"
    " || CAST(doc_id % 256 AS VARCHAR) || '.0.'"
    " || CAST(doc_id % 100 AS VARCHAR) || ' call +1-555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents),
    masked AS (
      SELECT doc_id, t,
             regexp_replace(regexp_replace(regexp_replace(t,
                 '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{PII_IP_RE}', '<IP>', 'g'),
                 '{PII_PHONE_RE}', '<PHONE>', 'g') AS m
      FROM aug
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{PII_EMAIL_RE}'))  AS n_emails,
           len(regexp_extract_all(t, '{PII_IP_RE}'))     AS n_ips,
           len(regexp_extract_all(t, '{PII_PHONE_RE}'))  AS n_phones,
           m                                             AS masked,
           (len(regexp_extract_all(m, '{PII_EMAIL_RE}'))
            + len(regexp_extract_all(m, '{PII_IP_RE}'))
            + len(regexp_extract_all(m, '{PII_PHONE_RE}')) = 0)
                                                         AS masked_clean
    FROM masked
    """,
    tags=("ext", "text", "pii"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking + counting — the standard first pass of a training
    corpus pipeline (emails, IPv4s, phone numbers → typed mask
    tokens). Deepens ``text_scrub_patterns`` (the generic single-
    pattern redaction shape): real multi-pattern chained masking with
    guaranteed matches, full masked-text value compare (not an md5
    witness), and a convergence check.
    Pure JVM regexp_count/regexp_replace column expressions:
    whole-stage codegen, row-local, ZERO shuffle at any corpus size —
    a 100 TB scrub is exactly as parallel as the parquet scan. The
    deterministic doc_id-derived injection gives every row non-zero
    matches (a zero-match corpus would vacuously pass), and
    ``masked_clean`` re-runs all three patterns over the masked text
    to prove convergence. The one exchange is load_table_parallel's
    deliberate scan-widening repartition — the fixture parquet is a
    single row group, so without it six regexp passes over the corpus
    run on ONE core (measured 0.69 s vs 0.17 s at sf0.1); at 100 TB
    the scan's own file splits provide the width and the repartition
    is a no-op to remove."""
    d = load_table_parallel(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact u"), F.col("doc_id").cast("string"),
        F.lit("@ex"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".com from 10."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."), (F.col("doc_id") % 100).cast("string"),
        F.lit(" call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    t = d.select("doc_id", aug.alias("t"))
    m = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), PII_EMAIL_RE, "<EMAIL>"),
            PII_IP_RE, "<IP>",
        ),
        PII_PHONE_RE, "<PHONE>",
    )
    masked = t.select("doc_id", "t", m.alias("m"))
    return masked.select(
        "doc_id",
        F.regexp_count("t", F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("t", F.lit(PII_IP_RE)).alias("n_ips"),
        F.regexp_count("t", F.lit(PII_PHONE_RE)).alias("n_phones"),
        F.col("m").alias("masked"),
        (
            (
                F.regexp_count("m", F.lit(PII_EMAIL_RE))
                + F.regexp_count("m", F.lit(PII_IP_RE))
                + F.regexp_count("m", F.lit(PII_PHONE_RE))
            )
            == 0
        ).alias("masked_clean"),
    )
