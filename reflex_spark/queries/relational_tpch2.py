"""Second batch of TPC-H-style analogues adapted to the fixture schema
(SURVEY.md §2.2 join/aggregation/subquery rows), plus embedding-cosine
near-dup dedup (north-star dedup family).

The fixtures lack ``partsupp`` and several TPC-H columns (``l_shipmode``,
``l_commitdate``, ``l_receiptdate``, ``p_container``, ``c_phone``), so
Q2/Q9/Q11/Q12/Q16/Q20 have no faithful analogue; the remaining query
*shapes* are preserved: Q7 (two-sided dimension join + year rollup), Q8
(market-share ratio), Q13 (outer-join count distribution), Q15 (view +
max-equality subquery), Q17 (correlated avg threshold), Q19 (disjunctive
multi-predicate join), Q21 (multi-supplier late-order anti pattern), Q22
(scalar-subquery threshold + anti join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reflex_spark.operators.similarity import cosine_pairs_blocked, sql_cosine
from reflex_spark.queries import query
from reflex_spark.queries.helpers import dsum, sql_dsum
from reflex_spark.tables import load_tables


@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {sql_dsum('volume', 'revenue')}
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
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations per year.

    Both nation joins broadcast (25 rows); the disjunctive nation-pair
    predicate prunes before the fact-side shuffle joins.
    """
    t = load_tables(spark, sf_dir)
    n1 = F.broadcast(t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    joined = (
        t["supplier"]
        .join(t["lineitem"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("volume", "revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           round(CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END
                     AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share
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
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'PROMO')
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of EUROPE promo-part volume per year.

    Conditional-aggregate ratio over a 7-table star join; all dimension
    sides (part-filtered, nation, region, supplier) broadcast so the only
    shuffles key on the fact tables' join keys.
    """
    t = load_tables(spark, sf_dir)
    part = F.broadcast(t["part"].where(F.col("p_type") == "PROMO").select("p_partkey"))
    n1 = F.broadcast(t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")))
    n2 = F.broadcast(t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")))
    region = F.broadcast(t["region"].where(F.col("r_name") == "EUROPE"))
    joined = (
        t["lineitem"]
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("c_nk"))
        .join(region, F.col("c_rk") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("s_nk"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_vol = F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0)
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            nat_vol.alias("nation_volume"),
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.col("nation_volume").cast("decimal(18,6)")).cast("double")
                / F.sum(F.col("volume").cast("decimal(18,6)")).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer including zeros
    (left outer join, COUNT of the nullable side, double aggregation)."""
    t = load_tables(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum('l_extendedprice * (1 - l_discount)', 'total_revenue')}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue (aggregated view +
    scalar max-equality subquery; exact because revenue is a decimal sum)."""
    t = load_tables(spark, sf_dir)
    revenue = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    top = F.broadcast(revenue.agg(F.max("total_revenue").alias("__max_rev")))
    return (
        t["supplier"]
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(top, F.col("total_revenue") == F.col("__max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 6)
             AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN (SELECT l_partkey AS t_partkey,
                   0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                          / COUNT(*)) AS qty_threshold
            FROM lineitem GROUP BY l_partkey) t
        ON p_partkey = t_partkey
    WHERE p_brand = 'Brand#4' AND l_quantity < qty_threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems below 20% of their part's average quantity
    (correlated scalar subquery decorrelated into a per-part aggregate join).
    The threshold is decimal-sum/count * 0.2 so both engines compute the
    identical double before the comparison.
    """
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            0.2
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_threshold")
    )
    return (
        li.join(
            F.broadcast(t["part"].where(F.col("p_brand") == "Brand#4")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(thresholds, F.col("p_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / 7.0,
                6,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive brand/size/quantity predicate bands over
    a part join (adapted: no p_container/l_shipmode in the fixture). The
    part side pre-filters to the union of brand bands and broadcasts.
    """
    t = load_tables(spark, sf_dir)
    part = F.broadcast(
        t["part"].where(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
    )
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        t["lineitem"]
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                 THEN 1 ELSE 0 END) AS is_late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey),
    per_order AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_supp,
             CAST(SUM(is_late) AS BIGINT) AS n_late
      FROM late GROUP BY l_orderkey)
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late
      JOIN per_order USING (l_orderkey)
      JOIN supplier ON s_suppkey = l_suppkey
    WHERE is_late = 1 AND n_supp > 1 AND n_late = 1
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the sole late supplier on a
    finished multi-supplier order (adapted: late = shipped >90 days after
    order date; the fixture has no commit/receipt dates).

    The EXISTS/NOT-EXISTS pair decorrelates into one per-(order, supplier)
    aggregate plus one per-order aggregate — two shuffles on l_orderkey
    that AQE can chain without re-partitioning, instead of two extra
    self-join passes over lineitem.
    """
    t = load_tables(spark, sf_dir)
    late = (
        t["lineitem"]
        .join(
            t["orders"].where(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    per_order = late.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    return (
        late.join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .where((F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q22_idle_rich_customers",
    oracle=f"""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           {sql_dsum('c_acctbal', 'totacctbal')}
    FROM customer
    WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
            FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no orders,
    rolled up by market segment (adapted: segment replaces the phone
    country code). Scalar-subquery threshold broadcast; anti join against
    orders prunes to the o_custkey column before shuffling.
    """
    t = load_tables(spark, sf_dir)
    avg_bal = F.broadcast(
        t["customer"]
        .where(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("__avg_bal")
        )
    )
    return (
        t["customer"]
        .join(avg_bal)
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(
            t["orders"].select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal", "totacctbal"))
    )


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH dup AS (
      SELECT DISTINCT b.vec_id AS dup_id
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE {sql_cosine('a.embedding', 'b.embedding')} >= 0.4)
    SELECT e.vec_id, e.label
    FROM embeddings e LEFT JOIN dup ON e.vec_id = dup.dup_id
    WHERE dup.dup_id IS NULL
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup removal: drop any vector whose cosine to a
    lower-id vector is >= 0.4; survivors are the canonical (min-id) reps.

    Keep-min-id over pairwise edges is deterministic and SQL-expressible
    (unlike connected components) and is the standard first pass for
    embedding dedup of training corpora. Pair generation reuses the
    blocked-GEMM kernel (cosine_pairs_blocked).
    """
    emb = load_tables(spark, sf_dir)["embeddings"]
    dup_ids = cosine_pairs_blocked(emb, threshold=0.4).select(
        F.col("id_b").alias("dup_id")
    ).distinct()
    return emb.join(
        dup_ids, emb["vec_id"] == dup_ids["dup_id"], "left_anti"
    ).select("vec_id", "label")
