"""Judged graph queries: numerically ITERATIVE algorithms with bit-exact
DuckDB oracles.

The trick that makes a floating-point fixpoint iteration oracle-checkable:
per-iteration neighbor sums go through DECIMAL(38,18) (exact, associative,
order-independent — shuffle layout cannot change the result), while the
scalar ops both engines share (rank/degree division, damping multiply)
stay single IEEE operations on identical inputs. Five iterations unroll
into five chained CTEs on the DuckDB side. This closes the assumption
that iterative numeric algorithms are inherently rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reflex_spark.queries import query
from reflex_spark.tables import load_tables

_ITERS = 5


def _pagerank_oracle() -> str:
    ctes = [
        """ut AS (SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS a,
                        't:' || CAST(event_type AS VARCHAR) AS b FROM events),
    edges AS (SELECT a, b FROM ut UNION ALL SELECT b, a FROM ut),
    deg AS (SELECT a, COUNT(*) AS deg FROM edges GROUP BY a),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    r0 AS (SELECT a AS node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank
           FROM deg)"""
    ]
    for i in range(1, _ITERS + 1):
        ctes.append(
            f"""r{i} AS (
      SELECT e.b AS node,
             CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
               + CAST(0.85 AS DOUBLE)
                 * CAST(SUM(CAST(r.rank / d.deg AS DECIMAL(38,18))) AS DOUBLE)
               AS rank
      FROM edges e
      JOIN r{i-1} r ON e.a = r.node
      JOIN deg d ON e.a = d.a
      GROUP BY e.b)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, round(rank, 6) AS rank FROM r{_ITERS}"
    )


@query("graph_pagerank_bipartite", oracle=_pagerank_oracle())
def graph_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 5 iterations) over the symmetric bipartite
    user↔event-type graph — a numeric FIXPOINT iteration judged bit-exact
    against 5 unrolled CTEs in DuckDB. Exactness recipe: per-node
    contribution = rank / degree (one IEEE division, identical in both
    engines), neighbor aggregation = SUM over DECIMAL(38,18) casts (exact
    and order-independent, so partitioning cannot perturb it), damping =
    one IEEE multiply + add on identical doubles. Per-round cost is one
    join + one aggregation shuffle, lineage truncated by localCheckpoint
    — the same iterative plan shape as connected_components_star, so the
    scale posture carries over (rounds × one shuffle, never a collect of
    the rank vector)."""
    ev = load_tables(spark, sf_dir)["events"]
    ut = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("a"),
        F.concat(F.lit("t:"), F.col("event_type").cast("string")).alias("b"),
    ).distinct()
    edges = ut.unionByName(
        ut.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    src = edges.join(deg, "a").localCheckpoint()  # (a, b, deg), static
    n_nodes = deg.count()  # control-plane scalar
    ranks = deg.select(
        F.col("a").alias("node"), F.lit(1.0 / n_nodes).alias("rank")
    ).localCheckpoint()
    for _ in range(_ITERS):
        contrib = src.join(ranks, src["a"] == ranks["node"]).select(
            src["b"].alias("node"), (ranks["rank"] / src["deg"]).alias("c")
        )
        ranks = (
            contrib.groupBy("node")
            .agg(F.sum(F.col("c").cast("decimal(38,18)")).cast("double").alias("s"))
            .select(
                "node",
                (F.lit(0.15 / n_nodes) + F.lit(0.85) * F.col("s")).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))
