"""Aggregation surface (SURVEY.md §2.6).

Everything DuckDB's hash aggregate provides through delegated SQL
(``src/duckdb_pgwire_extension.cpp:52``): core aggs, DISTINCT aggs,
approximate sketches, statistical moments, ordered-set aggs, grouping
sets/cube/rollup, HAVING, FILTER clauses.

Scale: all of these are partial+final hash aggregates in Spark — shuffle
volume is O(groups), with AQE coalescing tiny post-agg partitions. The
one intrinsically heavy op is exact COUNT(DISTINCT) (a second shuffle on
(group, value)); approx_count_distinct is the 100 TB-scale alternative
and is benchmarked next to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import load_table, register_views


@query(
    "agg_global",
    oracle="""
    SELECT
        COUNT(*)                                   AS n_rows,
        COUNT(DISTINCT l_orderkey)                 AS n_orders,
        ROUND(SUM(l_extendedprice), 2)             AS total_price,
        ROUND(MIN(l_extendedprice), 2)             AS min_price,
        ROUND(MAX(l_extendedprice), 2)             AS max_price,
        ROUND(AVG(l_quantity), 4)                  AS avg_qty
    FROM lineitem
    """,
    tags=("agg",),
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no GROUP BY) aggregation — single-row result via partial
    aggs on every partition + one final reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT
        l_returnflag,
        COUNT(DISTINCT l_suppkey)                  AS n_supp,
        ROUND(SUM(DISTINCT l_quantity), 2)         AS sum_distinct_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) / SUM(DISTINCT) — Catalyst expands to a two-phase
    agg over (group, value) pairs."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_distinct_qty"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT
        l_returnflag,
        -- each engine runs its own HLL sketch; the portable contract is
        -- the accuracy bound, so both sides emit the bound-check result
        (ABS(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
            <= 0.1 * COUNT(DISTINCT l_partkey)) AS approx_within_10pct,
        COUNT(DISTINCT l_partkey)               AS exact_nd
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++). Estimates are engine-specific,
    so the oracle checks the shared contract — estimate within 10% of
    exact — rather than the raw sketch value. At 100 TB this replaces
    exact COUNT(DISTINCT): mergeable fixed-size sketches, no second
    shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (
            F.abs(
                F.approx_count_distinct("l_partkey") - F.countDistinct("l_partkey")
            )
            <= 0.1 * F.countDistinct("l_partkey")
        ).alias("approx_within_10pct"),
        F.countDistinct("l_partkey").alias("exact_nd"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT
        l_returnflag,
        ROUND(stddev_samp(l_quantity), 4)          AS sd_samp,
        ROUND(stddev_pop(l_quantity), 4)           AS sd_pop,
        ROUND(var_samp(l_quantity), 4)             AS v_samp,
        ROUND(var_pop(l_quantity), 4)              AS v_pop,
        ROUND(corr(l_quantity, l_extendedprice), 4)      AS cor,
        ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS cov_s,
        ROUND(covar_pop(l_quantity, l_extendedprice), 2)  AS cov_p
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (matching textbook definitions in both
    engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp(q), 4).alias("sd_samp"),
        F.round(F.stddev_pop(q), 4).alias("sd_pop"),
        F.round(F.var_samp(q), 4).alias("v_samp"),
        F.round(F.var_pop(q), 4).alias("v_pop"),
        F.round(F.corr(q, p), 4).alias("cor"),
        F.round(F.covar_samp(q, p), 2).alias("cov_s"),
        F.round(F.covar_pop(q, p), 2).alias("cov_p"),
    )


@query(
    "agg_skew_kurtosis",
    oracle="""
    -- Spark's skewness/kurtosis are POPULATION moments (g1, g2 = m4/m2^2-3);
    -- DuckDB's are the sample-corrected versions, so the oracle computes the
    -- population formulas explicitly from central moments.
    WITH mu AS (
        SELECT l_returnflag AS k, AVG(l_quantity) AS m FROM lineitem GROUP BY 1
    )
    SELECT
        k AS l_returnflag,
        ROUND((SUM(POW(l_quantity - m, 3)) / COUNT(*))
              / POW(SUM(POW(l_quantity - m, 2)) / COUNT(*), 1.5), 4) AS skew,
        ROUND((SUM(POW(l_quantity - m, 4)) / COUNT(*))
              / POW(SUM(POW(l_quantity - m, 2)) / COUNT(*), 2) - 3, 4) AS kurt
    FROM lineitem JOIN mu ON l_returnflag = mu.k
    GROUP BY k, m
    """,
    tags=("agg", "stats"),
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """skewness / kurtosis — definition drift documented in the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.skewness("l_quantity"), 4).alias("skew"),
        F.round(F.kurtosis("l_quantity"), 4).alias("kurt"),
    )


@query(
    "agg_median_quantile",
    oracle="""
    SELECT
        l_linestatus,
        ROUND(median(l_extendedprice), 4) AS med_price,
        -- arrays are emitted as fixed-decimal CSV text: the driver's
        -- canonicalizer cannot sort list cells (round-1 red row)
        array_to_string(
            list_transform(quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]),
                           x -> CAST(CAST(ROUND(x, 4) AS DECIMAL(18,4)) AS VARCHAR)),
            ',') AS quartiles
    FROM lineitem
    GROUP BY l_linestatus
    """,
    tags=("agg", "stats"),
)
def agg_median_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + continuous quantiles (linear interpolation in both
    engines). Exact percentile is a sort-based agg — at 100 TB prefer
    percentile_approx (t-digest, mergeable); see bench."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.median("l_extendedprice"), 4).alias("med_price"),
        F.array_join(
            F.transform(
                F.percentile("l_extendedprice", F.lit([0.25, 0.5, 0.75])),
                lambda x: F.round(x, 4).cast("decimal(18,4)").cast("string"),
            ),
            ",",
        ).alias("quartiles"),
    )


@query(
    "agg_ordered_collect",
    oracle="""
    SELECT
        n_nationkey,
        string_agg(c_name, ',' ORDER BY c_name)    AS names_csv,
        array_to_string(list_sort(list(c_custkey)), ',') AS custkeys,
        bool_and(c_acctbal > -1000)                AS all_above_min,
        bool_or(c_acctbal > 9000)                  AS any_rich,
        min_by(c_name, c_custkey)                  AS first_by_key,
        max_by(c_name, c_custkey)                  AS last_by_key
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
    tags=("agg",),
)
def agg_ordered_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string_agg / array_agg (order pinned for determinism), bool_and/or,
    min_by/max_by (arg-min/arg-max). collect_list order is partition-
    dependent in Spark → always sort the collected array."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("names_csv"),
            F.array_join(F.array_sort(F.collect_list("c_custkey")), ",").alias("custkeys"),
            F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_min"),
            F.bool_or(F.col("c_acctbal") > 9000).alias("any_rich"),
            F.min_by("c_name", "c_custkey").alias("first_by_key"),
            F.max_by("c_name", "c_custkey").alias("last_by_key"),
        )
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT
        l_returnflag, l_linestatus,
        GROUPING(l_returnflag)  AS g_rf,
        GROUPING(l_linestatus)  AS g_ls,
        COUNT(*)                AS n,
        ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy with GROUPING() indicators."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").alias("g_rf"),
        F.grouping("l_linestatus").alias("g_ls"),
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all grouping-set combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, ROUND(SUM(l_extendedprice), 2) AS total
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SQL path — same Catalyst Expand plan)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, ROUND(SUM(l_extendedprice), 2) AS total
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_having_filter",
    oracle="""
    SELECT
        o_orderpriority,
        COUNT(*)                                            AS n_orders,
        COUNT(*) FILTER (WHERE o_orderstatus = 'F')         AS n_finished,
        ROUND(SUM(o_totalprice) FILTER (WHERE o_totalprice > 200000), 2) AS big_total
    FROM orders
    GROUP BY o_orderpriority
    HAVING COUNT(*) > 100 AND AVG(o_totalprice) > 100000
    """,
    tags=("agg",),
)
def agg_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING + per-aggregate FILTER (WHERE …) clauses (SQL path)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT
            o_orderpriority,
            COUNT(*)                                            AS n_orders,
            COUNT(*) FILTER (WHERE o_orderstatus = 'F')         AS n_finished,
            ROUND(SUM(o_totalprice) FILTER (WHERE o_totalprice > 200000), 2) AS big_total
        FROM orders
        GROUP BY o_orderpriority
        HAVING COUNT(*) > 100 AND AVG(o_totalprice) > 100000
        """
    )


@query(
    "agg_any_value",
    oracle="""
    SELECT c_mktsegment,
           MIN(upper(c_mktsegment)) AS seg_upper,  -- constant per group ≡ any_value
           COUNT(*) AS n
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg",),
)
def agg_any_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``any_value`` surface (DuckDB exposes it; SURVEY §2.6).

    any_value is nondeterministic on varying inputs, so the checkable
    form aggregates an expression that is CONSTANT within each group —
    'any' is then 'the' value and the oracle can use MIN. Spark executes
    a genuine AnyValue aggregate (first non-null, partial+final)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.any_value(F.upper("c_mktsegment")).alias("seg_upper"),
        F.count("*").alias("n"),
    )


@query(
    "agg_funnel_conversion",
    oracle="""
    WITH stage AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END)     AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END)    AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT
        COUNT(*) AS n_users,
        CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
        CAST(SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)   AS clicked_after_view,
        CAST(SUM(CASE WHEN t_click > t_view AND t_purchase > t_click
                 THEN 1 ELSE 0 END) AS BIGINT)              AS purchased_in_order
    FROM stage
    """,
    tags=("agg", "funnel"),
)
def agg_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel / sequential-pattern analysis: per-user first-touch times
    for view → click → purchase, rolled into ordered-conversion counts.

    The classic product-analytics (and event-log curation) shape done
    as CONDITIONAL AGGREGATION: one shuffle on user_id with map-side
    partial MINs, then a scalar rollup — never a per-stage self-join,
    which is the naive funnel implementation that re-shuffles the event
    log once per funnel step. NULL comparisons drop non-converters on
    both engines identically (NULL > NULL is NULL → CASE falls through).
    """
    ev = load_table(spark, sf_dir, "events")

    def first_touch(et: str, alias: str):
        return F.min(F.when(F.col("event_type") == et, F.col("ts"))).alias(alias)

    stage = ev.groupBy("user_id").agg(
        first_touch("view", "t_view"),
        first_touch("click", "t_click"),
        first_touch("purchase", "t_purchase"),
    )
    ordered = F.col("t_click") > F.col("t_view")
    full = ordered & (F.col("t_purchase") > F.col("t_click"))
    return stage.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("viewed"),
        F.sum(F.when(ordered, 1).otherwise(0)).alias("clicked_after_view"),
        F.sum(F.when(full, 1).otherwise(0)).alias("purchased_in_order"),
    )


@query(
    "agg_cohort_retention",
    oracle="""
    WITH activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events
    ),
    first_wk AS (SELECT user_id, MIN(wk) AS cohort FROM activity GROUP BY user_id)
    SELECT f.cohort,
           date_diff('day', f.cohort, a.wk) // 7 AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM activity a JOIN first_wk f ON a.user_id = f.user_id
    GROUP BY f.cohort, week_offset
    """,
    tags=("agg", "cohort"),
)
def agg_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted
    per week-offset of return activity — the standard retention matrix.

    Scale design: activity dedups to (user, week) — one shuffle with
    map-side partials; the first-week table derives from the SAME
    clustering (groupBy user on already-user-clustered rows); the
    cohort join keys on user_id; the output is O(weeks²) rows at any
    corpus size. Week truncation (Monday start) and day-difference
    arithmetic agree across engines by construction — offsets are
    exact multiples of 7 days.
    """
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    first_wk = activity.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (
        activity.join(first_wk, "user_id")
        .select(
            "cohort",
            (F.datediff("wk", "cohort") / 7).cast("long").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "agg_histogram_width_bucket",
    oracle="""
    -- DuckDB has no width_bucket; the PG/Spark semantics spelled out:
    -- [lo,hi) split into n equal buckets 1..n, 0/n+1 = under/overflow
    SELECT CASE WHEN o_totalprice < 0.0 THEN 0
                WHEN o_totalprice >= 500000.0 THEN 11
                ELSE 1 + CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT)
           END AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY bucket
    """,
    tags=("agg", "histogram"),
)
def agg_histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket (identical bucket edge
    semantics on both engines: n+2 buckets with 0/n+1 as under/over-
    flow). The distribution-profiling primitive — one scan, map-side
    partials, O(buckets) shuffle rows at any data size.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(500000.0), F.lit(10)).alias(
                "bucket"
            )
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "agg_approx_quantile",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS exact_median,
           -- each engine runs its own sketch (t-digest vs KLL-ish); the
           -- portable contract is the accuracy band, as in agg_approx_distinct
           (ABS(approx_quantile(l_extendedprice, 0.5)
                - quantile_cont(l_extendedprice, 0.5))
              <= 0.05 * quantile_cont(l_extendedprice, 0.5)) AS approx_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx — the mergeable-sketch percentile that replaces
    exact (sort-based) quantiles at 100 TB. Sketch values are
    engine-specific, so the oracle checks the shared contract: the
    approximation lands within 5% of the exact median (the same
    bound-check pattern as agg_approx_distinct)."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = F.expr("percentile(l_extendedprice, 0.5)")
    approx = F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000))
    return li.groupBy("l_returnflag").agg(
        F.round(exact, 4).alias("exact_median"),
        (F.abs(approx - exact) <= 0.05 * exact).alias("approx_within_5pct"),
    )


@query(
    "agg_mode_count_if",
    oracle="""
    SELECT l_returnflag,
           mode(l_linestatus)                  AS mode_status,
           CAST(count_if(l_quantity > 25) AS BIGINT) AS n_big,
           CAST(count_if(l_discount = 0) AS BIGINT)  AS n_undiscounted
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_mode_count_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mode() (most frequent value) and count_if() — DuckDB spellings
    with direct Spark twins (F.mode, F.count_if). mode ties are not an
    issue on this fixture (strict frequency winner per group); both are
    single-pass partial-aggregable, shuffle O(groups)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.mode("l_linestatus").alias("mode_status"),
        F.count_if(F.col("l_quantity") > 25).alias("n_big"),
        F.count_if(F.col("l_discount") == 0).alias("n_undiscounted"),
    )


@query(
    "agg_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY ALL
    """,
    tags=("agg", "sql"),
)
def agg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — the DuckDB convenience both engines now parse
    natively (Spark 3.4+): every non-aggregate select item becomes a
    grouping key. Executed through spark.sql to exercise the PARSER
    path, not a DataFrame translation."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
        FROM lineitem
        GROUP BY ALL
        """
    )


@query(
    "agg_quantile_disc",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.25) AS q25,
           quantile_disc(l_extendedprice, 0.5)  AS q50,
           quantile_disc(l_extendedprice, 0.75) AS q75
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "quantile"),
)
def agg_quantile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete quantiles (DuckDB quantile_disc: an ACTUAL element of
    the group, not an interpolation — Spark's percentile interpolates,
    so no direct twin exists).

    Spark-first rewrite: quantile_disc(x, p) selects the row with
    row_number == ceil(p*n) in the group's ordering (verified identical
    to DuckDB's definition). ONE window sort per group serves all three
    quantiles, then a conditional-max aggregation — a single sort
    shuffle, no collect_list materialization of the group (which is the
    scale trap for exact quantiles)."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    r = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("l_returnflag")).alias("n"),
    )
    def pick(p):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("long"),
                F.col("l_extendedprice"),
            )
        )
    return r.groupBy("l_returnflag").agg(
        pick(0.25).alias("q25"), pick(0.5).alias("q50"), pick(0.75).alias("q75")
    )


@query(
    "agg_hll_sketch_merge",
    oracle="""
    WITH per_nation AS (
        SELECT c_nationkey, COUNT(DISTINCT o_custkey) AS exact_nation
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    ), overall AS (
        SELECT COUNT(DISTINCT o_custkey) AS exact_total FROM orders
    )
    SELECT (SELECT COUNT(*) FROM per_nation)      AS n_groups,
           (SELECT exact_total FROM overall)      AS exact_total,
           true                                   AS merged_within_5pct
    """,
    tags=("agg", "approx", "sketch"),
)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-sketch distinct counting: build one HLL sketch PER
    GROUP (hll_sketch_agg), then merge the group sketches
    (hll_union_agg) to answer the global question WITHOUT rescanning
    the data — the at-scale pattern where sketches are stored per
    partition/day and unioned on read.

    Sketch bytes are engine-specific, so (as with agg_approx_distinct)
    the portable contract is the accuracy band: the estimate from the
    MERGED sketches must land within 5% of the exact global distinct —
    which also proves the merge is lossless across groups."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    sketches = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    )
    exact_total = o.select(
        F.countDistinct("o_custkey").alias("exact_total")
    )
    merged = sketches.agg(
        F.count("*").alias("n_groups"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_total"),
    )
    return (
        merged.join(F.broadcast(exact_total))
        .select(
            "n_groups",
            "exact_total",
            (
                F.abs(F.col("est_total") - F.col("exact_total"))
                <= 0.05 * F.col("exact_total")
            ).alias("merged_within_5pct"),
        )
    )
