"""[EXT] Similarity search over the ``embeddings`` vector column.

- ``sim_topk_bruteforce`` — exact cosine top-k: the correctness baseline.
- ``sim_lsh_bucketed`` — random-hyperplane LSH bucketing: the scale path
  (candidates come from one bucket instead of the full corpus).

Both engines compute cosine with the same operation order (sequential
double dot product / norms), so rounded scores hash-match. The LSH
hyperplanes are derived from md5 — deterministic and identical across
engines, no RNG state to ship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..session import load_table

QUERY_IDS = (0, 1, 2)
TOP_K = 10
# Multi-table (banded) LSH: L tables of B random hyperplanes each.
# P(candidate) = 1 - (1 - p^B)^L where p = 1 - theta/pi; B=6/L=6 gives
# ~20% recall per true top-10 pair even on near-random vectors
# (cos ~0.3) while probing only ~L/2^B = ~9% of the corpus per query.
N_TABLES = 6
N_BITS = 6
DIM = 64


def _dot(x, y):
    return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda a, z: a + z)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


@query(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id IN {QUERY_IDS}
    ), scored AS (
        SELECT q.query_id, v.vec_id,
               list_aggregate(list_transform(range(1, {DIM + 1}), i -> qe[i] * e[i]), 'sum')
               / (sqrt(list_aggregate(list_transform(range(1, {DIM + 1}), i -> qe[i] * qe[i]), 'sum'))
                * sqrt(list_aggregate(list_transform(range(1, {DIM + 1}), i -> e[i] * e[i]), 'sum')))
               AS cos_raw
        FROM q CROSS JOIN v
        WHERE v.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, ROUND(cos_raw, 6) AS cos_sim
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_raw DESC, vec_id) <= {TOP_K}
    """,
    tags=("ext", "similarity", "topk"),
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k per query vector (brute force).

    Plan: broadcast the (tiny) query set against the corpus scan —
    embarrassingly parallel scoring, then the standard top-k-per-group
    window. At 100 TB the scoring pass is a single map stage; only
    k rows per query reach the shuffle (partial TakeOrdered via AQE).
    """
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("e")
    )
    q = v.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos_raw",
            _dot(F.col("qe"), F.col("e"))
            / (F.sqrt(_dot(F.col("qe"), F.col("qe"))) * F.sqrt(_dot(F.col("e"), F.col("e")))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id", F.round("cos_raw", 6).alias("cos_sim"))
    )


def _proj_sql(dialect: str, vec: str, plane: int) -> str:
    """Signed projection of `vec` onto deterministic pseudo-random
    hyperplane `plane`: weights ±1 from md5(plane_i) — same hex, same
    signs, on both engines."""
    if dialect == "duckdb":
        return (
            f"list_aggregate(list_transform(range(1, {DIM + 1}), "
            f"i -> {vec}[i] * (CASE WHEN substr(md5('{plane}_' || CAST(i AS VARCHAR)), 1, 1) >= '8' "
            f"THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END)), 'sum')"
        )
    return (
        f"aggregate(transform(sequence(1, {DIM}), "
        f"i -> element_at({vec}, i) * (CASE WHEN substr(md5(concat('{plane}_', CAST(i AS STRING))), 1, 1) >= '8' "
        f"THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )


def _bucket_sql(dialect: str, vec: str, table: int) -> str:
    """Bucket id for one LSH table: B sign bits packed into an int.
    Plane ids are globally unique (table*B + bit) so tables are
    independent hash functions."""
    return " + ".join(
        f"(CASE WHEN {_proj_sql(dialect, vec, table * N_BITS + b)} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(N_BITS)
    )


def _lsh_query_sql(dialect: str) -> str:
    """Full multi-table LSH candidate-count query, portable across both
    engines. Signatures are computed once per vector (map stage), then
    exploded to (vec_id, tbl, bucket) rows so candidate retrieval is a
    single equi-join on (tbl, bucket) — one shuffle regardless of L,
    instead of L separate joins. UNION-distinct collapses a pair found
    by several tables."""
    if dialect == "duckdb":
        v = "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings"
        explode = " UNION ALL ".join(
            f"SELECT vec_id, {t} AS tbl, {_bucket_sql('duckdb', 'e', t)} AS bucket FROM v"
            for t in range(N_TABLES)
        )
    else:
        v = "SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings"
        buckets = ", ".join(_bucket_sql("spark", "e", t) for t in range(N_TABLES))
        explode = (
            f"SELECT vec_id, pos AS tbl, bucket FROM v "
            f"LATERAL VIEW posexplode(array({buckets})) AS pos, bucket"
        )
    return f"""
        WITH v AS ({v}),
        sig AS ({explode}),
        cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
            FROM sig q JOIN sig c ON q.tbl = c.tbl AND q.bucket = c.bucket
            WHERE q.vec_id IN {QUERY_IDS} AND c.vec_id <> q.vec_id
        )
        SELECT query_id, COUNT(*) AS n_candidates
        FROM cand GROUP BY query_id
    """


@query("sim_lsh_bucketed", oracle=_lsh_query_sql("duckdb"), tags=("ext", "similarity", "lsh"))
def sim_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table (banded) LSH ANN candidate generation.

    Each vector gets L={N_TABLES} independent bucket ids (B={N_BITS}
    sign bits of projections onto md5-derived ±1 hyperplanes); a pair is
    a candidate if ANY table buckets them together — the standard
    recall-boosting OR-construction.

    Scale: signatures are a pure map stage over the corpus scan (no
    Python, all codegen'd higher-order functions); candidate retrieval
    is ONE equi-join on (tbl, bucket) over the exploded signature table
    — per-query probe cost ~L/2^B of the corpus vs. the brute-force
    full cross join. Recall vs. exact top-k asserted in tests/test_ext.py.
    """
    from ..session import register_views

    register_views(spark, sf_dir)
    return spark.sql(_lsh_query_sql("spark"))
