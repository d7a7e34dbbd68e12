"""Additional TPC-H-style queries adapted to the fixture schema, plus
TF-IDF text analytics (SURVEY.md §2.2 'text analysis' row)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from reflex_spark.operators.relational import top_k
from reflex_spark.queries import query
from reflex_spark.queries.helpers import dsum, sql_dsum
from reflex_spark.tables import load_tables


@query(
    "q6_revenue_change",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue_delta')},
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+agg — every predicate pushes to parquet."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue_delta"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q4_late_shipment_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS (semi join with correlated range predicate)
    then aggregate."""
    t = load_tables(spark, sf_dir)
    late = t["orders"].join(
        t["lineitem"],
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'lost_revenue')}
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer, top-20."""
    t = load_tables(spark, sf_dir)
    agg = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(
            t["lineitem"].where(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "lost_revenue"))
    )
    return top_k(agg, 20, F.col("lost_revenue").desc(), F.col("c_custkey"))


@query(
    "q14_promo_revenue_pct",
    oracle=f"""
    SELECT round(
             100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                        THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                        AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
           6) AS promo_pct,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-09-01 00:00:00'
    """,
)
def q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio (promo revenue share)."""
    t = load_tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-09-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(promo.cast("decimal(18,6)")).cast("double")
                / F.sum(rev.cast("decimal(18,6)")).cast("double"),
                6,
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q18_large_orders",
    oracle=f"""
    SELECT c_custkey, o_orderkey, {sql_dsum('l_quantity', 'total_qty')}
    FROM orders
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, o_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate, filter on the aggregate (HAVING over a
    decimal sum), with the customer join."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "o_orderkey")
        .agg(dsum("l_quantity", "total_qty"))
        .where(F.col("total_qty") > 300)
    )


@query(
    "correlated_max_order",
    oracle="""
    SELECT c_custkey, max_order FROM (
      SELECT o_custkey AS c_custkey,
             CAST(MAX(o_totalprice) AS DOUBLE) AS max_order
      FROM orders GROUP BY o_custkey)
    WHERE max_order > 400000
    """,
)
def correlated_max_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose largest order exceeds a threshold (correlated-max
    filter decorrelated into agg+filter; max is exact so no rounding)."""
    orders = load_tables(spark, sf_dir)["orders"]
    return (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.max("o_totalprice").cast("double").alias("max_order"))
        .where(F.col("max_order") > 400000)
    )


@query(
    "monthly_revenue_trend",
    oracle=f"""
    SELECT month_start, revenue,
           round(revenue - LAG(revenue) OVER (ORDER BY month_start), 6) AS mom_delta
    FROM (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             {sql_dsum('o_totalprice', 'revenue')}
      FROM orders
      GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE))
    """,
)
def monthly_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregate + analytic window over the rollup (month
    grain means the unpartitioned window is tiny — safe at any scale)."""
    orders = load_tables(spark, sf_dir)["orders"]
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start")
    ).agg(dsum("o_totalprice", "revenue"))
    w = Window.orderBy("month_start")
    return monthly.select(
        "month_start",
        "revenue",
        F.round(F.col("revenue") - F.lag("revenue").over(w), 6).alias("mom_delta"),
    )


@query(
    "tfidf_top_terms",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
      FROM documents),
    tf AS (
      SELECT doc_id, lang, term, COUNT(*) AS tf
      FROM tokens GROUP BY doc_id, lang, term),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df
      FROM tokens GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
    SELECT doc_id, term, tfidf FROM (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rn
      FROM scored)
    WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: explode terms → tf per doc, df across corpus, idf = ln(N/df);
    top-3 terms per doc. All shuffles key on term/doc — linear in corpus."""
    docs = load_tables(spark, sf_dir)["documents"]
    tokens = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tokens.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


@query(
    "top_terms_per_lang",
    oracle="""
    WITH tokens AS (
      SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
    SELECT lang, term, n FROM (
      SELECT lang, term, n,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rn
      FROM (SELECT lang, term, COUNT(*) AS n FROM tokens GROUP BY lang, term))
    WHERE rn <= 5
    """,
)
def top_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent terms per language (explode → count → windowed top-k)."""
    docs = load_tables(spark, sf_dir)["documents"]
    counts = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "term")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("lang", "term", "n")
    )
