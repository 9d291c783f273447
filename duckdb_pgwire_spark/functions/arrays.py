"""Array / list / map / struct function group (SURVEY.md §2.10).

Runs over the ``embeddings`` table (ArrayType(FloatType), 64-dim).
Both engines index lists 1-BASED (Spark ``element_at`` / DuckDB ``[i]``).
All float math is upcast to DOUBLE on both sides before arithmetic so the
engines share precision, then rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import load_table


@query(
    "fn_array_basic",
    oracle="""
    SELECT
        vec_id,
        len(embedding)                                       AS dim,
        ROUND(CAST(embedding[1] AS DOUBLE), 6)               AS first_elem,
        ROUND(CAST(embedding[64] AS DOUBLE), 6)              AS last_elem,
        list_contains(list_transform(embedding, x -> x > 0.5), true) AS has_big,
        len(list_filter(embedding, x -> x > 0))              AS n_positive,
        ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 6)
                                                             AS vec_sum,
        -- arrays emitted as fixed-decimal CSV text: the driver's
        -- canonicalizer cannot sort list cells
        array_to_string(
            list_sort(list_transform(embedding[1:3],
                x -> CAST(CAST(ROUND(CAST(x AS DOUBLE), 4) AS DECIMAL(18,4)) AS VARCHAR))),
            ',')                                             AS head3_sorted,
        array_to_string(range(1, 6), ',')                    AS one_to_five
    FROM embeddings
    WHERE vec_id < 100
    """,
    tags=("array",),
)
def fn_array_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / element_at (1-based) / higher-order transform, filter,
    aggregate / array_sort / slice / sequence."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_elem"),
        F.round(F.element_at(emb, 64).cast("double"), 6).alias("last_elem"),
        F.array_contains(F.transform(emb, lambda x: x > 0.5), F.lit(True)).alias("has_big"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 6
        ).alias("vec_sum"),
        F.array_join(
            F.array_sort(
                F.transform(
                    F.slice(emb, 1, 3),
                    lambda x: F.round(x.cast("double"), 4).cast("decimal(18,4)").cast("string"),
                )
            ),
            ",",
        ).alias("head3_sorted"),
        F.array_join(F.sequence(F.lit(1), F.lit(5)), ",").alias("one_to_five"),
    )


@query(
    "fn_array_setops",
    oracle="""
    SELECT
        n_nationkey,
        array_to_string(
            list_sort(list_distinct([n_regionkey, n_regionkey + 1, 0])), ',') AS dedup_sorted,
        array_to_string(
            list_sort(list_concat([n_nationkey], [100, 200])), ',')          AS concatenated,
        -- literals cast to DOUBLE: bare 1.0 is DECIMAL in DuckDB, and a
        -- Decimal result would not value-hash-match Spark's float
        ROUND(list_aggregate(
              list_transform(range(1, 4),
                             i -> (CAST([1.0, 2.0, 3.0][i] AS DOUBLE))
                                  * (CAST([4.0, 5.0, 6.0][i] AS DOUBLE))),
              'sum'), 4)                                               AS dot_123_456
    FROM nation
    """,
    tags=("array",),
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_distinct / concat / zip_with-style pairwise math.

    DuckDB has no zip_with — the oracle zips to structs and transforms;
    Spark uses the native higher-order ``zip_with``.
    """
    n = load_table(spark, sf_dir, "nation")
    a = F.array(F.lit(1.0), F.lit(2.0), F.lit(3.0))
    b = F.array(F.lit(4.0), F.lit(5.0), F.lit(6.0))
    return n.select(
        "n_nationkey",
        F.array_join(
            F.array_sort(
                F.array_distinct(
                    F.array(F.col("n_regionkey"), F.col("n_regionkey") + 1, F.lit(0))
                )
            ),
            ",",
        ).alias("dedup_sorted"),
        F.array_join(
            F.array_sort(
                F.concat(
                    F.array(F.col("n_nationkey").cast("int")), F.array(F.lit(100), F.lit(200))
                )
            ),
            ",",
        ).alias("concatenated"),
        F.round(
            F.aggregate(
                F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
            ),
            4,
        ).alias("dot_123_456"),
    )


@query(
    "fn_map_struct",
    oracle="""
    SELECT
        r_regionkey,
        map(['key', 'name'], [CAST(r_regionkey AS VARCHAR), r_name])['name'][1] AS from_map,
        struct_pack(k := r_regionkey, nm := r_name).nm                          AS from_struct,
        struct_pack(k := r_regionkey, nm := r_name).k + 10                      AS struct_math
    FROM region
    """,
    tags=("map", "struct"),
)
def fn_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_map + element_at, struct + field access.

    DuckDB v1.0 map extraction returns a LIST (hence ``[1]`` in the
    oracle); Spark ``element_at(map, k)`` returns the value directly.
    """
    r = load_table(spark, sf_dir, "region")
    m = F.create_map(
        F.lit("key"), F.col("r_regionkey").cast("string"), F.lit("name"), F.col("r_name")
    )
    s = F.struct(F.col("r_regionkey").alias("k"), F.col("r_name").alias("nm"))
    return r.select(
        "r_regionkey",
        F.element_at(m, "name").alias("from_map"),
        s.getField("nm").alias("from_struct"),
        (s.getField("k") + 10).alias("struct_math"),
    )
