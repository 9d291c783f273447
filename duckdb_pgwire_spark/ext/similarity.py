"""[EXT] Similarity search over the ``embeddings`` vector column.

- ``sim_topk_bruteforce`` — exact cosine top-k: the correctness baseline.
- ``sim_lsh_bucketed`` — multi-table random-hyperplane LSH bucketing:
  the scale path (candidates come from L small buckets instead of the
  full corpus).

Spark side computes vector math in Arrow-batched pandas_udf kernels
(vectorized.py) whose float accumulation order is bit-identical to the
oracle's SQL left-folds, so rounded scores hash-match. The LSH
hyperplanes are ±1 weights derived from md5 — deterministic and
identical across engines, no RNG state to ship.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..session import load_table_parallel
from .vectorized import cosine_seq_udf, make_lsh_buckets_udf

QUERY_IDS = (0, 1, 2)
TOP_K = 10
# Multi-table (banded) LSH: L tables of B random hyperplanes each.
# P(candidate) = 1 - (1 - p^B)^L where p = 1 - theta/pi; B=6/L=6 gives
# ~20% recall per true top-10 pair even on near-random vectors
# (cos ~0.3) while probing only ~L/2^B = ~9% of the corpus per query.
N_TABLES = 6
N_BITS = 6
DIM = 64


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
    embarrassingly parallel scoring in one Arrow-batched kernel
    (vectorized.py: sequential-over-dims accumulation, bit-identical to
    the oracle's fold), then the standard top-k-per-group window. At
    100 TB the scoring pass is a single map stage; only k rows per query
    reach the shuffle.
    """
    v = load_table_parallel(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = v.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    scored = v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).withColumn(
        "cos_raw", cosine_seq_udf()(F.col("qe"), F.col("embedding"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id", F.round("cos_raw", 6).alias("cos_sim"))
    )


def _plane_signs(plane: int) -> list[int]:
    """Deterministic ±1 weights for hyperplane `plane`: sign of
    md5('{plane}_{i}') first hex digit. Computed ONCE in Python and
    embedded as literals (oracle SQL) / a numpy matrix (Spark kernel) —
    the naive form (md5 inside a per-element SQL lambda) recomputes
    DIM*planes constant hashes per row and dominated the runtime."""
    import hashlib

    return [
        1 if hashlib.md5(f"{plane}_{i}".encode()).hexdigest()[0] >= "8" else -1
        for i in range(1, DIM + 1)
    ]


def plane_weights() -> np.ndarray:
    """(DIM, N_TABLES*N_BITS) ±1 weight matrix; column t*N_BITS+b is
    hyperplane b of table t."""
    return np.array(
        [_plane_signs(p) for p in range(N_TABLES * N_BITS)], dtype=np.float64
    ).T


import functools


@functools.cache
def _lsh_buckets():
    return make_lsh_buckets_udf(plane_weights(), N_TABLES, N_BITS)


def _proj_sql_duckdb(vec: str, plane: int) -> str:
    """Oracle-side signed projection: dot against the literal weight
    list, sequential left fold — the order the Spark kernel replicates."""
    w = ", ".join(f"{s}.0" for s in _plane_signs(plane))
    return (
        f"list_aggregate(list_transform(range(1, {DIM + 1}), "
        f"i -> {vec}[i] * ([{w}])[i]), 'sum')"
    )


def _bucket_sql_duckdb(vec: str, table: int) -> str:
    """Bucket id for one LSH table: B sign bits packed into an int.
    Plane ids are globally unique (table*B + bit) so tables are
    independent hash functions."""
    return " + ".join(
        f"(CASE WHEN {_proj_sql_duckdb(vec, table * N_BITS + b)} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(N_BITS)
    )


_LSH_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    sig AS ({" UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {{b{t}}} AS bucket FROM v" for t in range(N_TABLES)
    )}),
    cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
        FROM sig q JOIN sig c ON q.tbl = c.tbl AND q.bucket = c.bucket
        WHERE q.vec_id IN {QUERY_IDS} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, COUNT(*) AS n_candidates
    FROM cand GROUP BY query_id
""".format(**{f"b{t}": _bucket_sql_duckdb("e", t) for t in range(N_TABLES)})


def lsh_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, tbl, bucket) rows: each vector's bucket id in each of the
    L hash tables — one Arrow-batched map stage over the corpus scan."""
    v = load_table_parallel(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return v.select(
        "vec_id", F.posexplode(_lsh_buckets()("embedding")).alias("tbl", "bucket")
    )


@query("sim_lsh_bucketed", oracle=_LSH_ORACLE, tags=("ext", "similarity", "lsh"))
def sim_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table (banded) LSH ANN candidate generation.

    Each vector gets L=N_TABLES independent bucket ids (B=N_BITS sign
    bits of projections onto md5-derived ±1 hyperplanes); a pair is a
    candidate if ANY table buckets them together — the standard
    recall-boosting OR-construction.

    Scale: signatures are one Arrow-batched map stage over the corpus
    scan; candidate retrieval is ONE equi-join on (tbl, bucket) over the
    exploded signature rows — per-query probe cost ~L/2^B of the corpus
    vs. the brute-force full cross join. The query side is pruned by
    predicate pushdown (isin before the explode) and broadcast. Recall
    vs. exact top-k asserted in tests/test_ext.py.
    """
    sig = lsh_signatures(spark, sf_dir)
    q = sig.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "tbl", "bucket"
    )
    cand = (
        F.broadcast(q)
        .join(sig.withColumnRenamed("vec_id", "cand_id"), ["tbl", "bucket"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    return cand.groupBy("query_id").agg(F.count("*").alias("n_candidates"))


# --------------------------------------------------------------- IVF variant

N_CENTROIDS = 8
N_PROBE = 2

_IVF_DOT = (
    "list_aggregate(list_transform(range(1, {dim}), i -> {a}[i] * {b}[i]), 'sum')"
)


_IVF_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ), cent AS (
        SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {N_CENTROIDS}
    ), affin AS (
        SELECT v.vec_id, c.cid,
               {_IVF_DOT.format(dim=DIM + 1, a="v.e", b="c.ce")}
               / (sqrt({_IVF_DOT.format(dim=DIM + 1, a="v.e", b="v.e")})
                * sqrt({_IVF_DOT.format(dim=DIM + 1, a="c.ce", b="c.ce")})) AS sim
        FROM v CROSS JOIN cent c
    ), assigned AS (
        SELECT vec_id, cid FROM affin
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) = 1
    ), probes AS (
        SELECT vec_id AS query_id, cid FROM affin
        WHERE vec_id IN {QUERY_IDS}
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) <= {N_PROBE}
    )
    SELECT p.query_id, COUNT(*) AS n_candidates
    FROM probes p
    JOIN assigned a ON a.cid = p.cid
    WHERE a.vec_id <> p.query_id
    GROUP BY p.query_id
"""


def _make_ivf_assign_udf(centroids):
    """pandas_udf: embedding → (assigned cell, N_PROBE nearest cells).

    ``centroids`` is a (k, DIM) float64 array captured in the closure
    (the "index": metadata-scale, shipped with the task like any
    broadcast). Cosines accumulate sequentially over dims, matching the
    oracle's fold order bit-for-bit; ties break to the smallest cid via
    a stable lexsort, matching ORDER BY sim DESC, cid.
    """
    from pyspark.sql.functions import pandas_udf

    C = centroids
    cnorm = None

    @pandas_udf("assigned INT, probes ARRAY<INT>")
    def ivf_assign(e: pd.Series) -> pd.DataFrame:
        nonlocal cnorm
        if len(e) == 0:
            return pd.DataFrame({"assigned": [], "probes": []})
        E = np.stack(e.to_numpy()).astype(np.float64)
        n, d = E.shape
        k = C.shape[0]
        S = np.zeros((n, k))
        en = np.zeros(n)
        if cnorm is None:
            cn = np.zeros(k)
            for i in range(d):
                cn += C[:, i] * C[:, i]
            cnorm = np.sqrt(cn)
        for i in range(d):
            S += E[:, i : i + 1] * C[:, i][None, :]
            en += E[:, i] * E[:, i]
        S = S / (np.sqrt(en)[:, None] * cnorm[None, :])
        assigned = []
        probes = []
        cids = np.arange(k)
        for r in range(n):
            order = np.lexsort((cids, -S[r]))  # sim desc, cid asc
            assigned.append(int(order[0]))
            probes.append([int(c) for c in order[:N_PROBE]])
        return pd.DataFrame({"assigned": assigned, "probes": probes})

    return ivf_assign


@query("sim_ivf_probe", oracle=_IVF_ORACLE, tags=("ext", "similarity", "ivf"))
def sim_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN candidate generation — the second scale
    path next to LSH banding.

    Index build = fetch the k centroids (here the first N_CENTROIDS
    vectors — deterministic stand-in for k-means, which would only
    change the centroid matrix) once at plan time; every corpus vector
    then computes its cell assignment AND its probe list in a SINGLE
    Arrow-batched map stage — no centroid cross join, no per-vector
    window shuffle. Query = probe the N_PROBE nearest cells only:
    candidate cost ~N_PROBE/N_CENTROIDS of the corpus. At 100 TB the
    assignment pass is embarrassingly parallel and the per-cell
    candidate lists are the partition layout for the probe join.
    """
    import numpy as np

    v = load_table_parallel(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent_rows = (
        v.filter(F.col("vec_id") < N_CENTROIDS).orderBy("vec_id").collect()
    )  # index build: k rows of metadata, not data-scale
    C = np.array([list(r.embedding) for r in cent_rows], dtype=np.float64)
    assign = _make_ivf_assign_udf(C)
    x = v.select("vec_id", assign("embedding").alias("x"))
    assigned = x.select("vec_id", F.col("x.assigned").alias("cid"))
    probes = (
        x.filter(F.col("vec_id").isin(*QUERY_IDS))
        .select(F.col("vec_id").alias("query_id"), F.explode("x.probes").alias("cid"))
    )
    return (
        F.broadcast(probes)
        .join(assigned, "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id")
        .agg(F.count("*").alias("n_candidates"))
    )
