"""Stream-stream join: time-bounded click→purchase attribution.

The reference has no streaming (SURVEY.md §2.11) — [EXT] surface. A
stream-stream inner join requires watermarks on BOTH sides plus an
event-time bound in the join condition; that bound is what lets Spark
evict buffered state (each side keeps only rows newer than the other
side's watermark minus the interval), so executor state stays bounded
at any input rate — the non-negotiable property at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query

ATTRIBUTION_WINDOW = "30 minutes"


def attribution_pairs(events_stream: DataFrame) -> DataFrame:
    """(purchase event, click by same user in the preceding 30 min) pairs."""
    clicks = (
        events_stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    purchases = (
        events_stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    return purchases.join(
        clicks,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}"))
        & (F.col("c_ts") < F.col("p_ts")),
        "inner",
    ).select("purchase_id", "click_id")


@query(
    "stream_stream_join_attribution",
    oracle=f"""
    SELECT p.event_id AS purchase_id, COUNT(*) AS n_clicks
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts
    GROUP BY p.event_id
    """,
    tags=("streaming", "join"),
)
def stream_stream_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENUINE stream-stream join driven to completion on the events
    file stream; matched pairs land in a memory sink and the per-purchase
    click count is taken batch-side. The oracle is the equivalent batch
    interval join — identical pairs because the whole fixture fits one
    microbatch and the inner join emits exactly the matched set.
    """
    from .windows import _read_events_stream

    pairs = attribution_pairs(_read_events_stream(spark, sf_dir))
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_pairs_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table("attr_pairs_out")
        .groupBy("purchase_id")
        .agg(F.count("*").alias("n_clicks"))
    )
