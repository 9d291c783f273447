"""JSON function group (SURVEY.md §2.10).

``events.props`` is a JSON string column (``{"k": 87}`` shape). DuckDB's
autoloaded json extension ↔ Spark's built-in get_json_object/from_json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import load_table


@query(
    "fn_json",
    oracle="""
    SELECT
        event_id,
        json_extract_string(props, '$.k')            AS k_str,
        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        json_extract_string(props, '$.missing')      AS missing,
        json_array_length('[1,2,3]')                 AS arr_len,
        json_extract_string('{"a": {"b": "deep"}}', '$.a.b') AS nested
    FROM events
    WHERE event_id < 300
    """,
    tags=("json",),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object / typed extraction via from_json / nested paths."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    props = F.col("props")
    return ev.select(
        "event_id",
        F.get_json_object(props, "$.k").alias("k_str"),
        F.from_json(props, "k INT").getField("k").alias("k_int"),
        F.get_json_object(props, "$.missing").alias("missing"),
        F.json_array_length(F.lit("[1,2,3]")).alias("arr_len"),
        F.get_json_object(F.lit('{"a": {"b": "deep"}}'), "$.a.b").alias("nested"),
    )
