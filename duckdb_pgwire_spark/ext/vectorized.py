"""Arrow-batched (pandas_udf) kernels for the compute-heavy [EXT] ops.

Why UDFs here, when the rule is "built-ins first": the minhash / cosine /
LSH inner loops are per-element work over arrays (md5 per shingle, 64-dim
float folds per plane). Expressed as nested higher-order-function lambdas
they run in Catalyst's *interpreted* expression path (HOF lambdas don't
compile into whole-stage codegen) and generate enough transient garbage
to destabilize the JVM — measured 3-30x run-to-run swings. The same
kernels as vectorized numpy/hashlib over Arrow batches are faster AND
deterministic in runtime.

Determinism contract with the DuckDB oracle: every float reduction below
accumulates SEQUENTIALLY over the element index (`acc += x[i] * y[i]`,
vectorized across rows, ordered across dims) — the exact IEEE-754
operation order of a SQL left-fold (`list_aggregate(..., 'sum')` /
`aggregate(zip_with(...))`) — so results hash-match bit-for-bit, not just
approximately. Never replace these loops with `np.dot`/BLAS: pairwise
summation changes the rounding and can flip a sign at an LSH boundary.
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np
import pandas as pd

N_MINHASH = 8  # minhash signature length (must match dedup.py oracle)

# One 60-bit base hash per shingle (first 15 hex chars of md5 — both
# engines parse it identically), then N_MINHASH xor-folds against fixed
# seeds: h_j(x) = h(x) XOR R_j, the standard cheap minhash family. Round
# 1 ran a full md5 per (shingle, seed) — 8x the hashing for no extra
# independence (VERDICT.md r1 perf item).
MINHASH_SEEDS = tuple(
    int(hashlib.md5(f"seed{j}".encode()).hexdigest()[:15], 16)
    for j in range(1, N_MINHASH + 1)
)

# NB: pandas_udf() resolves its DDL return type against the active
# SparkSession, so every udf below is built lazily (first use, after the
# session exists) instead of at import time.


@functools.cache
def minhash_sig_udf():
    """8-slot MinHash signature: min over shingles of h(s) XOR seed_j.

    Mirrors the oracle SQL exactly: words = split on single space,
    3-word shingles, ONE md5 per shingle (60-bit int from the first 15
    hex chars), then per-seed xor-fold minima. Rows with < 3 words must
    be filtered out upstream.
    """
    from pyspark.sql.functions import pandas_udf

    seeds = np.array(MINHASH_SEEDS, dtype=np.int64)

    @pandas_udf("array<long>")
    def minhash_sig(text: pd.Series) -> pd.Series:
        out: list[list[int]] = []
        for t in text:
            words = t.split(" ")
            shingles = {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}
            hs = np.fromiter(
                (int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in shingles),
                dtype=np.int64,
                count=len(shingles),
            )
            out.append([int(v) for v in np.min(hs[:, None] ^ seeds[None, :], axis=0)])
        return pd.Series(out, dtype=object)

    return minhash_sig


@functools.cache
def cosine_seq_udf():
    """Cosine similarity with sequential-over-dims accumulation.

    dot/norms each fold left-to-right over the element index, matching
    the SQL ``aggregate(zip_with(a, b, (p,q) -> p*q), 0.0, (acc,x) ->
    acc+x)`` form used by the DuckDB oracle — bit-identical doubles.
    """
    return _cosine_seq_pandas()


@functools.cache
def cosine_seq_nd_udf():
    """cosine_seq_udf marked non-deterministic (optimization guide
    §4.4): in the ``withColumn(cos) → filter(cos > th) → project``
    verify tails, Catalyst pushes the filter below the projection and
    ends up evaluating the Arrow kernel TWICE per surviving pair (once
    for the pushed filter, once for the projected value). The kernel is
    genuinely deterministic; the marker only forbids the optimizer from
    duplicating/reordering it, yielding a single evaluation. Separate
    cached instance — ``asNondeterministic()`` mutates the UDF object,
    so the deterministic sites must not share it.
    """
    return _cosine_seq_pandas().asNondeterministic()


def _cosine_seq_pandas():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cosine_seq(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        n, d = A.shape
        dot = np.zeros(n)
        na = np.zeros(n)
        nb = np.zeros(n)
        for i in range(d):
            dot += A[:, i] * B[:, i]
            na += A[:, i] * A[:, i]
            nb += B[:, i] * B[:, i]
        return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))

    return cosine_seq


def make_lsh_buckets_udf(weights: np.ndarray, n_tables: int, n_bits: int):
    """Build a pandas_udf mapping an embedding to its per-table LSH
    bucket ids. ``weights`` is (DIM, n_tables*n_bits) of ±1; projections
    accumulate sequentially over dims (see module docstring). Lazy like
    the rest: call only once a SparkSession exists.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def lsh_buckets(e: pd.Series) -> pd.Series:
        if len(e) == 0:
            return pd.Series([], dtype=object)
        E = np.stack(e.to_numpy()).astype(np.float64)
        n, d = E.shape
        P = np.zeros((n, weights.shape[1]))
        for i in range(d):
            P += E[:, i : i + 1] * weights[i]
        bits = P > 0
        out = []
        for r in bits:
            out.append(
                [
                    int(sum(1 << b for b in range(n_bits) if r[t * n_bits + b]))
                    for t in range(n_tables)
                ]
            )
        return pd.Series(out, dtype=object)

    return lsh_buckets
