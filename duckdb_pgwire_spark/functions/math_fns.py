"""Math function group (SURVEY.md §2.10).

Type-width deltas documented inline: Spark ``ceil``/``floor`` on DOUBLE
return BIGINT, DuckDB return DOUBLE → both sides cast to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import load_table


@query(
    "fn_math",
    oracle="""
    SELECT
        l_orderkey,
        l_linenumber,
        ABS(l_discount - 0.05)                       AS abs_diff,
        CAST(CEIL(l_extendedprice) AS BIGINT)        AS ceil_price,
        CAST(FLOOR(l_extendedprice) AS BIGINT)       AS floor_price,
        ROUND(l_extendedprice, 1)                    AS round1,
        ROUND(SQRT(l_quantity), 6)                   AS sqrt_qty,
        ROUND(CBRT(l_quantity), 6)                   AS cbrt_qty,
        ROUND(EXP(l_discount), 6)                    AS exp_disc,
        ROUND(LN(l_extendedprice), 6)                AS ln_price,
        ROUND(LOG10(l_extendedprice), 6)             AS log10_price,
        ROUND(LOG2(l_quantity), 6)                   AS log2_qty,
        ROUND(POW(l_quantity, 2), 2)                 AS qty_sq,
        CAST(l_orderkey % 7 AS BIGINT)               AS key_mod7,
        CAST(SIGN(l_discount - 0.05) AS INT)         AS disc_sign,
        ROUND(PI(), 6)                               AS pi_val,
        -- Spark isnan(NULL) → false; DuckDB propagates NULL → coalesce
        COALESCE(ISNAN(l_quantity / NULLIF(l_quantity - l_quantity, 0.0)), false) AS nan_check,
        ROUND(GREATEST(l_tax, l_discount), 2)        AS max_rate,
        ROUND(LEAST(l_tax, l_discount), 2)           AS min_rate
    FROM lineitem
    WHERE l_orderkey < 3000
    """,
    tags=("math",),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar family. NaN check: x/NULLIF(0,0) → NULL in both engines
    (division by NULL), so ISNAN(NULL) → NULL on both — the delta-prone
    sqrt(-1) (NaN in Spark, error in DuckDB) is deliberately avoided."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000)
    q, ep, d, t = (
        F.col("l_quantity"),
        F.col("l_extendedprice"),
        F.col("l_discount"),
        F.col("l_tax"),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(d - 0.05).alias("abs_diff"),
        F.ceil(ep).cast("bigint").alias("ceil_price"),
        F.floor(ep).cast("bigint").alias("floor_price"),
        F.round(ep, 1).alias("round1"),
        F.round(F.sqrt(q), 6).alias("sqrt_qty"),
        F.round(F.cbrt(q), 6).alias("cbrt_qty"),
        F.round(F.exp(d), 6).alias("exp_disc"),
        F.round(F.log(ep), 6).alias("ln_price"),
        F.round(F.log10(ep), 6).alias("log10_price"),
        F.round(F.log2(q), 6).alias("log2_qty"),
        F.round(F.pow(q, 2), 2).alias("qty_sq"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod7"),
        F.signum(d - 0.05).cast("int").alias("disc_sign"),
        F.round(F.expr("pi()"), 6).alias("pi_val"),
        F.isnan(q / F.nullif(q - q, F.lit(0.0))).alias("nan_check"),
        F.round(F.greatest(t, d), 2).alias("max_rate"),
        F.round(F.least(t, d), 2).alias("min_rate"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255          AS band,
           o_orderkey | 4096         AS bor,
           xor(o_orderkey, 1365)     AS bxor,
           o_orderkey << 2           AS shl,
           o_orderkey >> 3           AS shr,
           ~o_orderkey               AS bnot
    FROM orders WHERE o_orderkey < 2000
    """,
    tags=("function", "math", "bitwise"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator family (AND/OR/XOR/shifts/NOT) — all codegen'd
    integer ops; the spellings differ (DuckDB infix `xor()`, `<<`;
    Spark `^`, `shiftleft`), the semantics match on BIGINT."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(F.lit(1365)).alias("bxor"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.expr("~o_orderkey").alias("bnot"),
    )
