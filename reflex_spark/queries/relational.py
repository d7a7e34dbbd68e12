"""Relational surface over the TPC-H-ish fixtures (SURVEY.md §2.2).

Covers: scans, projection, filter, equi/semi/anti/broadcast joins,
hash aggregation (partial+final via Tungsten), distinct agg, rollup/cube/
grouping sets, window functions (ranking/analytic/frames), sort/top-k,
set ops, and the as-of join (reference has no relational layer — these are
the engine's Spark built-ins; see SURVEY.md §2.2 table for the mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from reflex_spark.operators.relational import asof_join, top_k
from reflex_spark.queries import query
from reflex_spark.queries.helpers import DEC, dsum, davg, sql_dsum, sql_davg
from reflex_spark.tables import load_tables


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan → filter (pushed to parquet) → hash agg (partial+final)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           CAST(o_orderdate AS DATE) AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective joins + agg + top-k (TakeOrdered, no full sort)."""
    t = load_tables(spark, sf_dir)
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    joined = (
        t["customer"]
        .where(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"].where(F.col("o_orderdate") < cutoff), F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"].where(F.col("l_shipdate") > cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )
    return top_k(agg, 10, F.col("revenue").desc(), F.col("l_orderkey")).select(
        "l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("orderdate")
    )


@query(
    "q5_region_revenue",
    oracle=f"""
    SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: star join with broadcast dims (supplier/nation/region)."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    return (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@query(
    "join_semi_customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (reference analogue: FK existence checks in consumers)."""
    t = load_tables(spark, sf_dir)
    open_orders = t["orders"].where(F.col("o_orderstatus") == "O")
    return (
        t["customer"]
        .join(open_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_acctbal")
    )


@query(
    "join_outer_order_counts",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 0) AS DOUBLE) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def join_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join + agg: per-customer order count incl. zero-order rows."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast(DEC)), F.lit(0).cast("decimal(18,6)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject — no full sort at scale."""
    orders = load_tables(spark, sf_dir)["orders"]
    return top_k(orders, 10, F.col("o_totalprice").desc(), F.col("o_orderkey")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "window_order_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders)
    WHERE rnk <= 3
    """,
)
def window_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window function: top-3 orders per customer."""
    orders = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


@query(
    "window_order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                LAG(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
                                                     ORDER BY o_orderdate, o_orderkey),
                CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
    FROM orders
    """,
)
def window_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window function (lag): days since customer's previous order."""
    orders = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(d, F.lag(d).over(w)).cast("long").alias("gap_days"),
    )


@query(
    "rollup_status_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'total_price')}
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (subtotals + grand total)."""
    orders = load_tables(spark, sf_dir)["orders"]
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_price")
    )


@query(
    "cube_returnflag_linestatus",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           {sql_dsum('l_quantity', 'total_qty')}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (all grouping-set combinations)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"), dsum("l_quantity", "total_qty")
    )


@query(
    "unpivot_flag_measures",
    # Wide-to-long reshape: three aggregate measure columns melt into
    # (key, measure, value) rows — Spark's unpivot/melt operator vs the
    # relational UNION ALL equivalent.
    oracle=f"""
    WITH agg AS (
      SELECT l_returnflag,
             {sql_dsum('l_extendedprice', 'sum_price')},
             {sql_dsum('l_discount', 'sum_disc')},
             {sql_dsum('l_tax', 'sum_tax')}
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_tax', sum_tax FROM agg
    """,
)
def unpivot_flag_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): per-returnflag decimal-sum aggregates reshape from
    three measure columns to (key, measure, value) rows — the inverse of
    the pivot path, as Spark's native unpivot operator (one Expand node,
    no join/union re-scan; the oracle is the UNION ALL it replaces)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    agg = li.groupBy("l_returnflag").agg(
        dsum("l_extendedprice", "sum_price"),
        dsum("l_discount", "sum_disc"),
        dsum("l_tax", "sum_tax"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["sum_price", "sum_disc", "sum_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@query(
    "grouping_sets_brand_type",
    oracle=f"""
    SELECT p_brand, p_type,
           COUNT(*) AS n_parts,
           {sql_davg('p_retailprice', 'avg_price')}
    FROM part
    GROUP BY GROUPING SETS ((p_brand), (p_type))
    """,
)
def grouping_sets_brand_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (prefixed temp view so the
    caller's own view names are never clobbered)."""
    load_tables(spark, sf_dir)["part"].createOrReplaceTempView("__reflex_spark_part")
    return spark.sql(
        f"""
        SELECT p_brand, p_type,
               COUNT(*) AS n_parts,
               {sql_davg('p_retailprice', 'avg_price')}
        FROM __reflex_spark_part
        GROUP BY GROUPING SETS ((p_brand), (p_type))
        """
    )


@query(
    "scalar_funcs_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           upper(substr(o_orderpriority, 3)) AS priority_name,
           CAST(length(o_orderstatus) AS INT) AS status_len,
           round(o_totalprice / 1000.0, 2) AS price_k,
           concat(CAST(o_custkey AS VARCHAR), ':', o_orderstatus) AS cust_tag
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
)
def scalar_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar functions (all JVM-side, codegen'd)."""
    orders = load_tables(spark, sf_dir)["orders"]
    return orders.where(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.upper(F.substring("o_orderpriority", 3, 2_000_000)).alias("priority_name"),
        F.length("o_orderstatus").cast("int").alias("status_len"),
        F.round(F.col("o_totalprice") / 1000.0, 2).alias("price_k"),
        F.concat(F.col("o_custkey").cast("string"), F.lit(":"), F.col("o_orderstatus")).alias(
            "cust_tag"
        ),
    )


@query(
    "asof_join_latest_order",
    oracle="""
    SELECT event_id, user_id, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate
    FROM (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e JOIN orders o
        ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
    WHERE rn = 1
    """,
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the latest order at or before it.

    Reference analogue: consumers resolving an event's foreign_id against
    mutable state "as of" the event (SURVEY.md §2.2 joins row).
    """
    t = load_tables(spark, sf_dir)
    joined = asof_join(
        t["events"],
        t["orders"],
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_tiebreak="o_orderkey",
        left_row_id="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("orderdate"),
    )


@query(
    "union_all_keys",
    oracle="""
    SELECT CAST(k AS BIGINT) AS entity_key, src FROM (
      SELECT o_custkey AS k, 'orders' AS src FROM orders
      UNION ALL
      SELECT c_custkey AS k, 'customer' AS src FROM customer)
    """,
)
def union_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL set op with provenance column."""
    t = load_tables(spark, sf_dir)
    a = t["orders"].select(F.col("o_custkey").cast("long").alias("entity_key"), F.lit("orders").alias("src"))
    b = t["customer"].select(F.col("c_custkey").cast("long").alias("entity_key"), F.lit("customer").alias("src"))
    return a.unionByName(b)
