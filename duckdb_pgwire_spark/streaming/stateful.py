"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY.md §2.11) — this is [EXT]
surface: the Spark-native way to write an operator whose state outlives
a microbatch (per-key accumulators, custom sessionization, CDC merge...)
when the built-in windowed aggs can't express it.

Scale: state lives in the executors' state store, partitioned by the
grouping key — per-key state must stay O(1) (here: two numbers). The
update function receives Arrow batches per key, never row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import query

OUTPUT_SCHEMA = "user_id LONG, n_events LONG, total_value DOUBLE"
STATE_SCHEMA = "n LONG, total DOUBLE"


def _update_user_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Running per-user totals: state = (event count, value sum); emits
    the updated totals once per microbatch the user appears in."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def user_totals_stream(events_stream: DataFrame) -> DataFrame:
    """Attach the stateful operator to any events-shaped stream."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@query(
    "stream_stateful_user_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENUINE stateful streaming: per-user running totals through
    ``applyInPandasWithState``, driven to completion on the events file
    stream.

    Oracle note: the fixture is one parquet file → exactly one
    microbatch (FileStreamSource batches by file), so the single emitted
    update per user equals the batch GROUP BY — which is what the SQL
    oracle checks. Cross-batch accumulation (the actual point of state)
    is exercised in tests/test_streaming.py with a two-file stream.
    """
    from .windows import _read_events_stream

    out = user_totals_stream(_read_events_stream(spark, sf_dir))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_totals_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("stateful_totals_out")
