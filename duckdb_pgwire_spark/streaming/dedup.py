"""Streaming near-duplicate detection: MinHash-LSH bucket
representatives over a document STREAM.

[EXT] surface — the streaming counterpart of ext/dedup's batch MinHash
pipeline: as documents arrive, each is shingled, minhash-signed (the
same Arrow kernel the batch path uses — pandas UDFs run unchanged in
Structured Streaming), exploded into LSH band keys, and aggregated to
one representative (min doc_id) per bucket. Buckets that accumulate
2+ members are near-duplicate groups; the representative is the
canonical survivor.

Scale: per-bucket state is two numbers (min, count) in the state
store, partitioned by band key — the stream never buffers documents,
and a 100 TB/day firehose costs O(buckets touched) state, not O(docs).
The bucket cap mirrors the batch path: over-cap buckets are
boilerplate explosions, excluded there and here.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ext.dedup import _MINHASH_CTES, LSH_BUCKET_CAP, N_BANDS
from ..registry import query
from ..session import table_path

_STREAM_ORACLE = f"""
    WITH {_MINHASH_CTES}
    SELECT band_idx, band_val,
           MIN(doc_id) AS representative,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM bands
    GROUP BY band_idx, band_val
    HAVING COUNT(*) BETWEEN 2 AND {LSH_BUCKET_CAP}
"""


def _read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream the documents fixture (symlinked into a dir — the
    FileStreamSource needs a directory, same trick as the events
    stream)."""
    stream_dir = tempfile.mkdtemp(prefix="docs_stream_")
    os.symlink(
        table_path(sf_dir, "documents"), os.path.join(stream_dir, "documents.parquet")
    )
    schema = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    return spark.readStream.schema(schema).parquet(stream_dir)


@query(
    "stream_minhash_bucket_dedup",
    oracle=_STREAM_ORACLE,
    tags=("streaming", "dedup", "minhash"),
)
def stream_minhash_bucket_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENUINE streaming near-dedup: minhash-sign each arriving doc,
    aggregate (min doc_id, count) per LSH band bucket in complete mode,
    surface buckets with 2..cap members — the same groups the batch
    LSH path pairs up, computed incrementally with O(1) per-bucket
    state. The oracle recomputes the identical signatures and grouping
    in SQL over the static fixture."""
    from ..ext.vectorized import minhash_sig_udf

    stream = _read_documents_stream(spark, sf_dir)
    words = F.split("text", " ")
    sig = stream.filter(F.size(words) >= 3).select(
        "doc_id", minhash_sig_udf()("text").alias("sig")
    )
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "_", F.element_at("sig", 2 * i - 1), F.element_at("sig", 2 * i)
                    )
                    for i in range(1, N_BANDS + 1)
                ]
            )
        ).alias("band_idx0", "band_val"),
    )
    agg = (
        bands.groupBy((F.col("band_idx0") + 1).alias("band_idx"), "band_val")
        .agg(
            F.min("doc_id").alias("representative"),
            F.count("*").alias("n_members"),
        )
        .filter(F.col("n_members").between(2, LSH_BUCKET_CAP))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_lsh_buckets")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("stream_lsh_buckets")


def _dsir_stream_oracle() -> str:
    # built at decoration time; the local import keeps module import
    # order flexible (ext.text ↔ streaming have no cycle today)
    from ..ext.text import _DSIR_SQL_CTES

    return f"""
    WITH {_DSIR_SQL_CTES}
    SELECT doc_id, logw_micro FROM per WHERE logw_micro > 0
    """


@query(
    "stream_dsir_score_filter",
    oracle=_dsir_stream_oracle(),
    tags=("streaming", "text", "dsir"),
)
def stream_dsir_score_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DSIR quality gate: score each ARRIVING document's
    hashed-bigram stream against the per-epoch target/raw distributions
    and keep target-leaning docs (log importance weight > 0).

    Deployment shape: the distributions are estimated OFFLINE per
    corpus epoch (the cached _dsir_ratios build — exactly what the
    batch op uses) and shipped to the stream as a literal array, so the
    online path is a stateless projection + per-doc aggregation: no
    joins, no state beyond the per-doc counter. Complete mode + the
    per-doc groupBy is the fixture-scale harness; a production stream
    would watermark on event time and emit per-doc scores append-mode.
    The oracle recomputes the identical integer micro-nat pipeline in
    SQL over the static fixture."""
    from ..ext.text import DSIR_BUCKETS, _dsir_ratios
    from ..session import load_table_parallel

    d = load_table_parallel(spark, sf_dir, "documents")
    w = F.split("text", " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), (F.size("w") - 1).cast("int")),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("w"), i), F.element_at(F.col("w"), i + 1)
        ),
    )
    bucket = (
        F.conv(F.substring(F.md5("g"), 1, 4), 16, 10).cast("int") % DSIR_BUCKETS
    )
    bk = (
        d.select("doc_id", w.alias("w"))
        .filter(F.size("w") >= 2)
        .select("doc_id", F.explode(bigrams).alias("g"))
        .select("doc_id", bucket.alias("b"))
    )
    # epoch distribution build (batch, cached) — the exact bk pipeline
    # the batch op uses, so stream scores and oracle agree bit-exact
    lr = _dsir_ratios(spark, sf_dir, bk)
    # one parsed expression, not 256 F.lit round-trips (see
    # ext/text.py _dsir_doc_weights — plan-build cost, profiled r10)
    lr_arr = F.expr("array(" + ",".join(f"{v}L" for v in lr) + ")")

    stream = _read_documents_stream(spark, sf_dir)
    sbk = (
        stream.select("doc_id", F.split("text", " ").alias("w"))
        .filter((F.size("w") >= 2) & (F.col("doc_id") % 97 != 0))
        .select("doc_id", F.explode(bigrams).alias("g"))
        .select("doc_id", F.element_at(lr_arr, bucket + 1).alias("lr"))
    )
    agg = (
        sbk.groupBy("doc_id")
        .agg(F.sum("lr").alias("logw_micro"))
        .filter(F.col("logw_micro") > 0)
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_dsir_scores")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("stream_dsir_scores")
