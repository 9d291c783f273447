"""Headline analytical queries (TPC-H-shaped) — the engine's flagships.

These are the bench headliners: a wide scan-agg (Q1 shape), a
filter-join-agg-topk (Q3 shape), and a deep FK-chain join (Q5 shape).

Scale design: lineitem is the fact table (~600k rows at sf0.1, ~6B at a
100 TB-class SF). Every plan here keeps the fact table streaming —
dimension tables (region/nation/customer/supplier/part: thousands of
rows, bounded cardinality) are broadcast so no shuffle of the fact side
is needed for joins; the only shuffles are the final partial→final
aggregations on low-cardinality grouping keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..session import load_table


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        ROUND(SUM(l_quantity), 2)                                     AS sum_qty,
        ROUND(SUM(l_extendedprice), 2)                                AS sum_base_price,
        ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)             AS sum_disc_price,
        ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        ROUND(AVG(l_quantity), 4)                                     AS avg_qty,
        ROUND(AVG(l_extendedprice), 4)                                AS avg_price,
        ROUND(AVG(l_discount), 4)                                     AS avg_disc,
        COUNT(*)                                                      AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: wide scan + 8-way grouped aggregation.

    Reference capability: delegated grouped aggregation
    (``src/duckdb_pgwire_extension.cpp:52``). Spark plan: parquet scan with
    the shipdate predicate pushed down, partial aggregation map-side, one
    shuffle on the 2-value grouping key, final agg — survives any scale
    because the shuffle volume is O(groups), not O(rows).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        # Result cardinality is bounded (|returnflag|x|linestatus| = 6
        # groups at ANY scale), so present the ordering with a single-
        # partition sort: a global orderBy would add a RangePartitioning
        # exchange plus its sampling job just to sort 6 rows.
        .coalesce(1)
        .sortWithinPartitions("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT
        l_orderkey,
        ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        CAST(o_orderdate AS DATE)                         AS o_orderdate
    FROM customer
    JOIN orders    ON c_custkey = o_custkey
    JOIN lineitem  ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "flagship"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dim filter → fact join → agg → top-k.

    Scale design: customer and orders both scale with SF, so neither gets
    a hard broadcast hint — AQE switches the join to broadcast at small SF
    (post-filter sizes are below the threshold) and to shuffled hash/sort-
    merge on a cluster. Both joins are equi-joins on the FK columns, so
    they shuffle on the join key only when needed. ORDER BY+LIMIT compiles
    to TakeOrderedAndProject (no global sort).
    """
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(
            orders.join(cust, F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT
        n_name,
        ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND c_nationkey = s_nationkey
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
    tags=("join", "agg", "flagship"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: six-table FK-chain join through the star schema.

    Scale design: region (5 rows) and nation (25 rows) are constant-size →
    explicit broadcast; supplier/customer/orders scale with SF → no hint,
    AQE promotes them to broadcast only while they fit. The
    c_nationkey = s_nationkey local-supplier predicate is applied as part
    of the customer join condition, as in the TPC-H spec. Final shuffle is
    groupBy(n_name) — 25 groups, O(1) shuffle volume after partial aggs.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")

    # r17 opt (guide §3.1): joining supplier PRE-joined with nation
    # hid supplier's size behind a join-output estimate, so the planner
    # fell back to a SortMergeJoin that shuffled the whole li⋈orders
    # intermediate on l_suppkey (2 Exchanges + 2 Sorts, plans/r17pre).
    # Join supplier DIRECTLY — its scan-level size estimate lets the
    # planner broadcast it while it fits (and fall back by estimate on
    # a cluster where it doesn't: still no hard hint on an SF-scaling
    # table) — then the constant-size nation⋈region broadcast filters
    # to the ASIA region. Inner joins commute: same rows.
    nr = F.broadcast(
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nr, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            customer,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        # ≤25 nation groups at any scale — single-partition sort, not a
        # RangePartitioning exchange (see q1).
        .coalesce(1)
        .sortWithinPartitions(F.col("revenue").desc())
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "agg", "flagship"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with an extra join-side predicate,
    then a DOUBLE aggregation (per-customer order count → histogram of
    counts).

    Scale design: the left join keys both sides on custkey (one
    shuffle, or broadcast at small SF via AQE); the first aggregation
    reuses the join's clustering (groupBy on the same key — no second
    exchange); the histogram aggregation shuffles O(distinct counts)
    rows. The non-key predicate rides ON the join (not a post-filter) —
    filtering after a LEFT join would wrongly drop customers with only
    urgent orders.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        # histogram cardinality is O(max orders per customer) — bounded;
        # single-partition sort, not a RangePartitioning exchange (see q1)
        .coalesce(1)
        .sortWithinPartitions(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "filter", "flagship"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure selective scan-aggregate — the pushdown showcase.

    Every predicate (range on shipdate, between on discount, < on
    quantity) reaches the parquet reader as a pushed filter; the scan
    reads 4 columns of 16; the aggregate is a single global sum (partial
    per partition, one row to the driver). At 100 TB this is the
    min-possible-I/O plan: row groups outside the shipdate range are
    skipped by parquet statistics entirely.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 4) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg", "tpch"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping: bilateral trade volume between two
    nations by ship year.

    Scale shape: lineitem streams; supplier/customer/nation are
    broadcast (the two nation roles are two broadcasts of a 25-row
    table). The disjunctive nation-pair predicate is applied after the
    joins on broadcast-held columns — no fact-side shuffle at all until
    the final O(nations² × years) aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01 00:00:00").cast("timestamp"),
                F.lit("1997-12-31 00:00:00").cast("timestamp"),
            )
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .withColumn("volume", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 4).alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("join", "agg", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: one nation's share of regional
    revenue for one part type, by order year.

    Scale shape: the 8-way join keeps lineitem streaming — part,
    supplier, customer, both nation roles, and region are all broadcast
    dimensions; the conditional share is a single grouped aggregation
    over O(years) groups. The p_type filter prunes the part broadcast
    before the join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("volume", volume)
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: top-20 customers by revenue
    lost to returns in one quarter.

    Scale shape: both fact-side predicates (order date range, return
    flag) push into the scans before the join; customer/nation
    broadcast; the top-20 is TakeOrderedAndProject over the grouped
    result, not a global sort. Ordering ties break on c_custkey so the
    LIMIT cut is deterministic across engines (revenue is compared
    ROUNDED for the same reason).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(
        100.0 * SUM(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    tags=("join", "agg", "tpch"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: promo share of one month's revenue.

    Scale shape: shipdate range pushes into the lineitem scan; part is
    broadcast; the conditional ratio is one global aggregate — a single
    row leaves the executors.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", volume).otherwise(0.0))
                / F.sum(volume),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: orders whose total quantity
    exceeds a threshold, with their customers.

    Scale shape: the IN-subquery is a self-aggregation of lineitem
    (partial sums map-side) semi-joined back on the order key — at any
    scale the filter side is O(orders over threshold), which Spark
    executes as a shuffled semi join on the already-aggregated (small)
    side; customer is broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 300)
        .select(F.col("l_orderkey").alias("__big_key"))
    )
    return (
        li.join(big, F.col("l_orderkey") == F.col("__big_key"), "left_semi")
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("agg", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: the supplier(s) with the maximum revenue
    in a quarter (view + scalar subquery in the spec).

    Scale shape: revenue is one partial-agg shuffle keyed on supplier;
    the MAX is a 1-row scalar broadcast back onto the (already small)
    per-supplier aggregate; supplier joins broadcast. The equality
    compares 4-decimal ROUNDED revenues on both engines, so the
    max-picking can't flip on summation-order ulps.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("total_revenue")
        )
    )
    # r18 (guide §2.4, the q11 pattern): `revenue` is referenced twice
    # (rows + the scalar MAX), and each DataFrame reference re-plans and
    # re-executes the filtered lineitem scan + aggregation — AQE does
    # not reuse the exchange at runtime. Lazy localCheckpoint runs the
    # pipeline once (O(suppliers) rows cached): jobs 6 → 5, 16× replica
    # A/B 0.87×, rows identical at sf0.001/0.01/0.1/16×.
    revenue = revenue.localCheckpoint(eager=False)
    max_rev = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ----------------------------------------------------------------------
# Remaining TPC-H shapes (round 5). The fixture schema is TPC-H-ish but
# has no partsupp table and omits several columns (l_commitdate,
# l_shipmode, p_container, c_phone, ...), so each query below keeps its
# original OPERATOR SHAPE — the thing the engine must execute well — on
# the columns that exist, with the adaptation noted per query.
# Reference capability for all: delegated SQL execution
# (src/duckdb_pgwire_extension.cpp:52,97).


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ), best AS (
        SELECT l_partkey AS b_partkey, MIN(unit_cost) AS best_cost
        FROM costs GROUP BY l_partkey
    )
    SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_name,
           ROUND(c.unit_cost, 4) AS unit_cost
    FROM costs c
    JOIN best ON b_partkey = c.l_partkey AND c.unit_cost = best_cost
    JOIN part ON p_partkey = c.l_partkey
    JOIN supplier ON s_suppkey = c.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_size BETWEEN 10 AND 15 AND p_type = 'STANDARD'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("join", "subquery", "flagship"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier per part): correlated-MIN
    subquery decorrelated into agg + equality-join-back. No partsupp in
    the fixture, so "supply cost" is the supplier's best observed unit
    price MIN(l_extendedprice/l_quantity) from lineitem.

    Scale: the part predicate is pushed AHEAD of the cost aggregation
    as a broadcast semi join (per-part costs are independent, so
    pre-filtering parts cannot change the surviving rows — the oracle
    filters after for SQL clarity; first measurement without this ran
    9.2x wall for 10x data, with it the aggregation touches ~1% of
    lineitem). Both aggregations then shuffle on l_partkey(+l_suppkey),
    the argmin join-back reuses the key, and AQE broadcasts the
    |parts|-row best table. The float-equality join is exact: both
    sides are MINs over the identical double set.
    """
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 15) & (F.col("p_type") == "STANDARD")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(p.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    # r18 (guide §2.4, the q11 pattern): `costs` is referenced twice
    # (argmin join probe + the `best` re-aggregation), and the `best`
    # exchange keys on l_partkey while costs' keys on (l_partkey,
    # l_suppkey) — no distribution reuse possible, so the semi-filtered
    # lineitem aggregation ran twice per execution. Lazy localCheckpoint
    # runs it once (O(part×supplier combos seen) rows): jobs 9 → 8, 16×
    # replica A/B 0.83×, rows identical at sf0.001/0.01/0.1/16×.
    costs = costs.localCheckpoint(eager=False)
    best = costs.groupBy("l_partkey").agg(F.min("unit_cost").alias("best_cost")).select(
        F.col("l_partkey").alias("b_partkey"), "best_cost"
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        costs.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_cost") == F.col("best_cost")),
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "semi", "flagship"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): correlated EXISTS → LEFT SEMI
    join, then a tiny grouped count. The fixture has no l_commitdate/
    l_receiptdate, so "late" is l_shipdate > o_orderdate + 30 days —
    same correlated non-equi EXISTS shape.

    Scale: the correlated EXISTS(line with d > bound) is exactly
    max(d) > bound, so the big side pre-aggregates to ONE row per
    orderkey (map-side combine shrinks the shuffle from raw lines to
    near-|orders| rows) before joining the quarter-filtered orders —
    a naive semi join instead shuffles every lineitem row on orderkey
    (measured 3.8x wall for 10x data; this shape is ~2x). The implied
    constant bound (ships after min(o_orderdate) + 30 days) also pushes
    into the parquet scan. Output groups are 5 rows at any SF.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    max_ship = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1996-07-31 00:00:00").cast("timestamp"))
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_ship"))
    )
    return (
        o.join(max_ship, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("max_ship") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .coalesce(1)
        .sortWithinPartitions("o_orderpriority")
    )


@query(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           -- per-term DECIMAL cast → exact, order-independent summation
           -- (a double sum here lands on a .xx5 cent boundary and
           -- rounds differently between engines)
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18, 4))) AS DOUBLE), 2) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%widget%'
    -- positional: the alias "nation" would collide with the TABLE name
    -- in DuckDB's binder
    GROUP BY 1, 2
    ORDER BY 1, 2 DESC
    """,
    tags=("join", "agg", "flagship"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit by nation and year). No
    ps_supplycost in the fixture → profit is discounted revenue; the
    shape (5-table star join over a LIKE-filtered part set, grouped by
    nation × year) is intact.

    Scale: part (LIKE-pruned), supplier, nation broadcast; orders joins
    on the fact's orderkey — the one scaling join — and AQE picks its
    strategy. One shuffle for the nation×year rollup, O(25 × years)
    groups at any SF.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ).cast("double"),
                2,
            ).alias("profit")
        )
        .coalesce(1)
        .sortWithinPartitions(F.col("nation"), F.col("o_year").desc())
    )


@query(
    "q11_important_part_share",
    oracle="""
    WITH val AS (
        -- per-term DECIMAL cast: exact, order-independent sums (same
        -- cross-engine .xx5-boundary hazard q9 hit)
        SELECT l_partkey,
               SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18, 4))) AS value_dec
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE n_name IN ('NATION_3', 'NATION_7')
        GROUP BY l_partkey
    )
    -- threshold comparison stays in DECIMAL on BOTH engines (r5 ADVICE:
    -- a double SUM's partial-agg order is nondeterministic and a part
    -- within ULPs of the 0.1% cutoff could flip); value*1000 > total is
    -- exact — no division/scale rules involved
    SELECT l_partkey AS partkey, ROUND(CAST(value_dec AS DOUBLE), 2) AS value
    FROM val
    WHERE value_dec * 1000 > (SELECT SUM(value_dec) FROM val)
    ORDER BY value DESC, partkey
    """,
    tags=("agg", "subquery", "flagship"),
)
def q11_important_part_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): grouped value per part filtered
    against a GLOBAL scalar fraction of the same aggregate. No partsupp
    → value is the part's discounted revenue through suppliers of two
    nations; the grouped-vs-global-scalar comparison shape is intact.

    Scale: ONE shuffle builds the per-part values; the global total is a
    1-row re-aggregation of that (cached) result broadcast back as a
    cross join — the corpus is never read twice.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    val = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("value_dec")
        )
    )
    # r18 (guide §2.4 / VERDICT r17 item 4): `val` is referenced twice
    # (rows + the global total), and the DataFrame API re-plans the
    # whole lineitem⋈supplier⋈nation + groupBy subtree per reference —
    # AQE's exchange reuse does NOT fire here at runtime (measured: 10
    # jobs, two full fact scans; the two exchanges stop canonical-
    # matching once the total branch's final agg prunes l_partkey from
    # its result). A lazy localCheckpoint materializes val ONCE —
    # O(parts) rows, the same data the exchange already wrote to disk —
    # and both consumers read the cached blocks: jobs 10 → 7, 16×
    # replica 1.37 s → 1.00 s (plans/r18/q11_*). Rows bit-identical at
    # sf0.001/0.1/16× (verified old-vs-new).
    val = val.localCheckpoint(eager=False)
    # DECIMAL threshold on both engines (see oracle comment): exact
    # value*1000 vs exact total — immune to double partial-sum order
    total = val.agg(F.sum("value_dec").alias("total_dec"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") * 1000 > F.col("total_dec"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("value_dec").cast("double"), 2).alias("value"),
        )
        .orderBy(F.col("value").desc(), "partkey")
    )


@query(
    "q12_priority_shipclass",
    oracle="""
    SELECT l_returnflag AS shipclass,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY shipclass
    ORDER BY shipclass
    """,
    tags=("join", "agg", "flagship"),
)
def q12_priority_shipclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / priority split): conditional
    aggregation over a fact-fact join. No l_shipmode in the fixture →
    classes come from l_returnflag; the CASE-inside-SUM shape is intact.

    Scale: the date filter pushes into the lineitem scan; the join
    shuffles both sides on orderkey (AQE may broadcast the pruned
    lineitem side at small SF); 3 output groups at any SF.
    """
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_returnflag").alias("shipclass"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
        .coalesce(1)
        .sortWithinPartitions("shipclass")
    )


@query(
    "q16_parts_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("join", "anti", "agg", "flagship"),
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): DISTINCT-count of
    suppliers per part class, excluding a NOT IN supplier set. No
    partsupp → the supplier-part relation comes from lineitem; the
    anti-join + COUNT DISTINCT shape is intact.

    Scale: the excluded-supplier set is a broadcast anti join (s_suppkey
    is non-null, so NOT IN ≡ anti join); part is a broadcast; the only
    shuffle is the distinct-count on (brand, type, size, suppkey).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad_s = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad_s), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18, 4))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    tags=("join", "subquery", "flagship"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): per-part correlated AVG
    threshold. Decorrelated the classic way: per-part averages via one
    aggregation, joined back to the fact rows (p_container doesn't
    exist, so the part filter is brand-only).

    Scale: the per-part avg table is |parts|-sized → broadcast back; the
    fact is scanned once for the avg and once for the probe (a cluster
    would cache the brand-pruned slice — it is part-pruned to ~4% of
    lineitem by the broadcast join). The threshold compare is exact:
    quantities are integer-valued doubles, so AVG's sum is exact in
    both engines regardless of order.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li = load_table(spark, sf_dir, "lineitem")
    branded = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    avgs = branded.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        branded.join(F.broadcast(avgs), F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(18, 4))) AS DOUBLE), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "filter", "flagship"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): an OR of
    conjunct groups that each span BOTH join sides (no p_container/
    l_shipmode → brand/size/quantity carry the disjunction).

    Scale: Catalyst factors the part-only disjuncts (brand+size) into a
    pushable pre-filter on the broadcast side, keeps the mixed residual
    on the join, and the lineitem side is never shuffled. One global
    agg row out.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ).cast("double"),
                2,
            ).alias("revenue")
        )
    )


@query(
    "q20_promotion_suppliers",
    oracle="""
    SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 300)
    ORDER BY s_name
    """,
    tags=("join", "semi", "subquery", "flagship"),
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): IN over a HAVING-filtered
    aggregate → semi join. No partsupp → the "has excess stock" notion
    becomes "shipped > 300 units of small-parts in the year".

    Scale: the inner aggregate shuffles on l_suppkey only (part is a
    broadcast, the date filter is pushed); its output is ≤ |suppliers|
    rows, so the IN becomes a broadcast semi join against supplier. The
    HAVING sum is exact (integer-valued doubles).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = load_table(spark, sf_dir, "supplier")
    qualified = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(qualified), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("join", "semi", "anti", "flagship"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): the double
    correlated EXISTS / NOT EXISTS on the same fact table. No
    l_receiptdate/l_commitdate → "the one who kept the order waiting"
    is the supplier whose line shipped strictly LAST among multi-
    supplier finished orders.

    Scale: the naive plan (semi + anti self-joins) shuffles lineitem
    THREE times on orderkey; this implementation folds both correlated
    quantifiers into ONE pass. Per (order, supplier) aggregate the max
    ship date plus the date list (map-side combined, one shuffle);
    a shared window over l_orderkey yields each supplier's
    "max ship date among the OTHER suppliers" (r17: from the order max
    + tie count + best-below-max — unordered window aggregates, no
    rank sort), and the EXISTS/NOT EXISTS pair collapses to: other
    suppliers exist AND line date >= max_other — counted with an array
    filter, no join back to the fact. Measured 6.5 s → 4.2 s at sf1 vs
    the semi/anti plan; supplier is broadcast, rollup
    |suppliers|-bounded.

    Tie note: every top-date tie case yields the same max_other as the
    old (sup_max DESC, l_suppkey) top-2 selection — deterministic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    s = load_table(spark, sf_dir, "supplier")
    # r17 opt (guide §2.4 share one exchange): the groupBy keyed
    # (l_orderkey, l_suppkey) and the window keyed l_orderkey each
    # planned their own full-data Exchange. Repartitioning ONCE on
    # l_orderkey satisfies both (hash partitioning on a subset of the
    # grouping keys is a valid clustered distribution), so the
    # aggregation runs complete-mode in place and the window follows
    # with just a local sort — one Exchange instead of two. Bytes are
    # a wash: collect_list has no map-side reduction, so the partial-agg
    # shuffle carried every ship date anyway.
    ps = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max("l_shipdate").alias("sup_max"),
            F.collect_list("l_shipdate").alias("dates"),
        )
    )
    # r17 opt: "max ship date among the OTHER suppliers" needs no
    # rank sort — two UNORDERED window passes (max/count, then the
    # mx-derived tie markers) replace the four Window ops + Sort of the
    # row_number top-2 trick. Equivalence: for a supplier below the
    # order max, max_other = mx; at the max with a tie (>=2 rows at
    # mx), the "other" side also holds mx; at a unique max, max_other
    # is the best among the strictly-lower rest — exactly the old
    # top1/top2 selection for every tie case.
    wo = Window.partitionBy("l_orderkey")
    ranked = (
        ps.withColumn("mx", F.max("sup_max").over(wo))
        .withColumn("n_sup", F.count("*").over(wo))
        .withColumn(
            "n_at_mx",
            F.sum(
                F.when(F.col("sup_max") == F.col("mx"), 1).otherwise(0)
            ).over(wo),
        )
        .withColumn(
            "max_below",
            F.max(
                F.when(F.col("sup_max") < F.col("mx"), F.col("sup_max"))
            ).over(wo),
        )
    )
    cand = (
        ranked.filter(F.col("n_sup") >= 2)
        .withColumn(
            "max_other",
            F.when(F.col("sup_max") < F.col("mx"), F.col("mx"))
            .when(F.col("n_at_mx") >= 2, F.col("mx"))
            .otherwise(F.col("max_below")),
        )
        .withColumn(
            "nhit", F.size(F.filter(F.col("dates"), lambda d: d >= F.col("max_other")))
        )
        .filter(F.col("nhit") > 0)
    )
    return (
        cand.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("nhit").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q22_sales_opportunity",
    oracle="""
    SELECT c_mktsegment AS segment, COUNT(*) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY segment
    ORDER BY segment
    """,
    tags=("anti", "subquery", "agg", "flagship"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers with no recent orders. No c_phone → grouping by market
    segment instead of country code; the scalar-subquery threshold +
    anti join shape is intact.

    Scale: the AVG is a 1-row broadcast; the anti join carries the
    custkey equi key (date filter pushed into the orders scan);
    the rollup is O(segments).
    """
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .coalesce(1)
        .sortWithinPartitions("segment")
    )
