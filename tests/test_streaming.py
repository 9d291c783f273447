"""Streaming semantics: the genuine Structured Streaming queries must
agree with their batch equivalents once the full fixture is processed
(no late data beyond the watermark in a replay of a static file)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_pgwire_spark.session import load_table
from duckdb_pgwire_spark.streaming.windows import (
    stream_dedup_watermark,
    stream_watermark_agg,
)

from .conftest import SF_DIR


def test_watermark_agg_matches_batch(spark):
    streamed = {
        (r.window_start, r.event_type): r.n
        for r in stream_watermark_agg(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    batch = {
        (r.window_start, r.event_type): r.n
        for r in ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
        .collect()
    }
    assert streamed == batch


def test_stream_dedup_keeps_unique_ids(spark):
    out = stream_dedup_watermark(spark, SF_DIR)
    total = out.count()
    uniq = out.select("event_id").distinct().count()
    n_src = load_table(spark, SF_DIR, "events").select("event_id").distinct().count()
    assert total == uniq == n_src
