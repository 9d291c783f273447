"""Date/time function group (SURVEY.md §2.10).

Dialect deltas handled here (documented per column):
- DuckDB ``dow`` is 0=Sunday; Spark ``dayofweek`` is 1=Sunday → −1.
- DuckDB ``strftime`` patterns → Java ``date_format`` patterns.
- DuckDB ``date_diff('day', a, b)`` = b−a; Spark ``datediff(end, start)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import load_table


@query(
    "fn_date_extract",
    oracle="""
    SELECT
        event_id,
        date_part('year', ts)     AS y,
        date_part('month', ts)    AS mo,
        date_part('day', ts)      AS d,
        date_part('hour', ts)     AS h,
        date_part('minute', ts)   AS mi,
        date_part('second', ts)   AS s,
        date_part('dow', ts)      AS dow,
        date_part('doy', ts)      AS doy,
        date_part('week', ts)     AS wk,
        date_part('quarter', ts)  AS q
    FROM events
    """,
    tags=("date",),
)
def fn_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTRACT/date_part field family."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts")
    return ev.select(
        "event_id",
        F.year(ts).alias("y"),
        F.month(ts).alias("mo"),
        F.dayofmonth(ts).alias("d"),
        F.hour(ts).alias("h"),
        F.minute(ts).alias("mi"),
        F.second(ts).alias("s"),
        (F.dayofweek(ts) - 1).alias("dow"),  # Spark 1=Sun → DuckDB 0=Sun
        F.dayofyear(ts).alias("doy"),
        F.weekofyear(ts).alias("wk"),
        F.quarter(ts).alias("q"),
    )


@query(
    "fn_date_arith",
    oracle="""
    SELECT
        o_orderkey,
        -- DuckDB date_trunc at day+ granularity returns DATE; Spark keeps TIMESTAMP
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        CAST(date_trunc('day',   o_orderdate) AS TIMESTAMP) AS day_start,
        o_orderdate + INTERVAL 3 DAY                      AS plus3d,
        o_orderdate - INTERVAL 2 MONTH                    AS minus2mo,
        date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
        make_date(2024, 2, 29)                            AS leap_day,
        make_timestamp(2024, 2, 29, 12, 30, 0)            AS leap_noon,
        epoch_ms(o_orderdate)                             AS epoch_millis
    FROM orders
    WHERE o_orderkey < 2000
    """,
    tags=("date",),
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc, interval arithmetic, date_diff, make_date/timestamp,
    epoch."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", od).alias("month_start"),
        F.date_trunc("day", od).alias("day_start"),
        (od + F.expr("INTERVAL 3 DAY")).alias("plus3d"),
        (od - F.expr("INTERVAL 2 MONTH")).alias("minus2mo"),
        F.datediff(F.lit("2000-01-01").cast("date"), od.cast("date")).alias("days_to_y2k"),
        F.make_date(F.lit(2024), F.lit(2), F.lit(29)).alias("leap_day"),
        F.expr("make_timestamp(2024, 2, 29, 12, 30, 0)").alias("leap_noon"),
        # parquet timestamp[ms] (not UTC-adjusted) reads as TIMESTAMP_NTZ;
        # unix_millis needs TIMESTAMP — cast is shift-free under UTC session tz
        F.unix_millis(od.cast("timestamp")).alias("epoch_millis"),
    )


@query(
    "fn_date_format_parse",
    oracle="""
    SELECT
        event_id,
        strftime(ts, '%Y-%m-%d %H:%M')                        AS formatted,
        strftime(ts, '%Y/%j')                                 AS year_doy,
        strptime('2024-03-05 10:20:30', '%Y-%m-%d %H:%M:%S')  AS parsed,
        CAST(ts AS DATE)                                      AS just_date
    FROM events WHERE event_id < 200
    """,
    tags=("date",),
)
def fn_date_format_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """strftime→date_format / strptime→to_timestamp with pattern
    translation (%Y→yyyy, %m→MM, %d→dd, %H→HH, %M→mm, %S→ss, %j→DDD)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    ts = F.col("ts")
    return ev.select(
        "event_id",
        F.date_format(ts, "yyyy-MM-dd HH:mm").alias("formatted"),
        F.date_format(ts, "yyyy/DDD").alias("year_doy"),
        F.to_timestamp(F.lit("2024-03-05 10:20:30"), "yyyy-MM-dd HH:mm:ss").alias("parsed"),
        ts.cast("date").alias("just_date"),
    )


@query(
    "fn_ts_series_time_bucket",
    oracle="""
    SELECT ts_slot,
           time_bucket(INTERVAL 6 HOUR, ts_slot)   AS bucket6h,
           time_bucket(INTERVAL 15 MINUTE,
                       ts_slot + INTERVAL 38 MINUTE) AS bucket15m
    FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
                         TIMESTAMP '2024-01-03 00:00:00',
                         INTERVAL 95 MINUTE) AS t(ts_slot)
    """,
    tags=("date", "series"),
)
def fn_ts_series_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp series generation + time_bucket alignment — the
    backbone of every time-grid query (gap-fill, rollup, SLA buckets).

    Spark-first: ``sequence(start, stop, interval)`` generates the grid
    JVM-side (exploded in the scan stage, zero shuffle); time_bucket
    has no Spark builtin, so it is epoch-arithmetic —
    ``timestamp_seconds(unix - unix % width)`` — which matches DuckDB's
    epoch-aligned flooring exactly for day-divisible widths."""
    grid = F.explode(
        F.sequence(
            F.lit("2024-01-01 00:00:00").cast("timestamp"),
            F.lit("2024-01-03 00:00:00").cast("timestamp"),
            F.expr("INTERVAL 95 MINUTES"),
        )
    ).alias("ts_slot")

    def bucket(col, seconds):
        u = F.unix_timestamp(col)
        return F.timestamp_seconds(u - u % seconds)

    shifted = F.col("ts_slot") + F.expr("INTERVAL 38 MINUTES")
    return (
        spark.range(1)
        .select(grid)
        .select(
            "ts_slot",
            bucket(F.col("ts_slot"), 6 * 3600).alias("bucket6h"),
            bucket(shifted, 15 * 60).alias("bucket15m"),
        )
    )
