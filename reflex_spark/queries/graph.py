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


@query(
    "graph_triangle_count",
    # Triangle count is permutation-invariant, so the oracle can use the
    # canonical u<v<w two-join form while the engine runs the degree-
    # ordered node-iterator — identical count, different join volume.
    oracle="""
    WITH m AS (
      SELECT DISTINCT event_type,
             date_trunc('minute', CAST(ts AS TIMESTAMP)) AS h,
             user_id
      FROM events),
    e AS (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM m a JOIN m b ON a.event_type = b.event_type AND a.h = b.h
      WHERE a.user_id < b.user_id),
    nodes AS (SELECT DISTINCT u AS node FROM e UNION SELECT DISTINCT v FROM e)
    SELECT CAST((SELECT COUNT(*) FROM nodes) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*)
                 FROM e e1 JOIN e e2 ON e2.u = e1.v
                           JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
                AS BIGINT) AS n_triangles
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the user co-occurrence graph (users sharing
    an (event_type, minute) cell — minute, not hour: the cell width sets
    the graph's density, and an hour cell made edge count grow ~SF², a
    self-inflicted scale-killer), via the DEGREE-ORDERED node-iterator
    (Schank & Wagner 2005; the MapReduce formulation of Suri & Vassilvitskii
    WWW'11): orient every edge from its lower-(degree, id) endpoint to the
    higher one, join wedges center-out, then probe the closing edge. Each
    triangle is counted exactly once, and every wedge list is bounded by
    O(sqrt(m)) out-degree — the skew-killer that lets the same plan close
    triangles at 100 TB where the naive u<v orientation dies on hub nodes.
    Three shuffles total (degree agg, wedge join, closing-edge join); all
    JVM, no UDFs."""
    ev = load_tables(spark, sf_dir)["events"]
    m = ev.select(
        "event_type",
        F.date_trunc("minute", F.col("ts").cast("timestamp")).alias("h"),
        "user_id",
    ).distinct()
    b = m.select("event_type", "h", F.col("user_id").alias("v_id"))
    edges = (
        m.join(b, ["event_type", "h"])
        .where(F.col("user_id") < F.col("v_id"))
        .select(F.col("user_id").alias("u"), F.col("v_id").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    # orient low-(deg, id) -> high-(deg, id)
    ranked = edges.join(du, "u").join(dv, "v")
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    e1 = oriented.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = oriented.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y").where(F.col("x") != F.col("z"))
    closing = oriented.select(
        F.col("a").alias("cx"), F.col("b").alias("cz")
    ).unionByName(oriented.select(F.col("b").alias("cx"), F.col("a").alias("cz")))
    tris = wedges.join(
        closing, (F.col("x") == F.col("cx")) & (F.col("z") == F.col("cz"))
    )
    # one lazy plan, no driver-side counts: the three scalar aggregates
    # run as a single job when the caller acts
    return (
        deg.agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(edges.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(tris.agg(F.count(F.lit(1)).alias("n_triangles")))
    )


@query(
    "graph_clustering_coefficient",
    # Local clustering coefficient over the 5-minute co-occurrence graph
    # (integer epoch-millis // 300000 bucketing — DuckDB's epoch() is a
    # DOUBLE whose ::BIGINT cast ROUNDS while Spark truncates, so the
    # integer-milliseconds form is the engine-identical one — and a
    # cell width that keeps the graph non-empty at sf0.001 without the
    # hour-cell SF^2 blowup). Oracle counts per-node triangles from the
    # canonical u<v<w form; cc = 2T / (d(d-1)) is one IEEE division.
    oracle="""
    WITH m AS (
      SELECT DISTINCT event_type,
             epoch_ms(CAST(ts AS TIMESTAMP)) // 300000 AS h,
             user_id
      FROM events),
    e AS (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM m a JOIN m b ON a.event_type = b.event_type AND a.h = b.h
      WHERE a.user_id < b.user_id),
    tri AS (
      SELECT e1.u, e1.v, e2.v AS w
      FROM e e1 JOIN e e2 ON e2.u = e1.v
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
    tn AS (SELECT u AS node FROM tri
           UNION ALL SELECT v FROM tri
           UNION ALL SELECT w FROM tri),
    tcount AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
               FROM tn GROUP BY node),
    degs AS (SELECT node, COUNT(*) AS deg FROM
             (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
             GROUP BY node)
    SELECT d.node, CAST(d.deg AS BIGINT) AS degree,
           COALESCE(t.n_tri, 0) AS n_tri,
           round(CAST(2 * COALESCE(t.n_tri, 0) AS DOUBLE)
                 / CAST(d.deg * (d.deg - 1) AS DOUBLE), 6) AS cc
    FROM degs d LEFT JOIN tcount t USING (node)
    WHERE d.deg >= 2
    ORDER BY cc DESC, d.node LIMIT 10
    """,
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient — how tightly each user's co-occurrence
    neighborhood closes: cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)), top-10
    nodes (ties by id) among deg >= 2. Triangles come from the SAME
    degree-ordered wedge join as graph_triangle_count (Schank & Wagner
    2005 orientation — O(sqrt m) wedge lists kill hub skew), with each
    found triangle attributed to its three nodes by one explode; the
    oracle recounts per-node triangles from the canonical u<v<w form.
    The 5-minute cell (epoch-millis div 300000 — integer in both
    engines; DuckDB's epoch() double would ROUND where Spark truncates)
    keeps the
    graph non-empty at sf0.001 where the minute cell of the triangle
    query is all-isolated. One extra shuffle over the triangle plan
    (the per-node attribution groupBy); cc itself is one IEEE division."""
    from reflex_spark.operators.relational import top_k

    ev = load_tables(spark, sf_dir)["events"]
    m = ev.select(
        "event_type",
        F.expr("unix_millis(CAST(ts AS TIMESTAMP)) div 300000").alias("h"),
        "user_id",
    ).distinct()
    b = m.select("event_type", "h", F.col("user_id").alias("v_id"))
    edges = (
        m.join(b, ["event_type", "h"])
        .where(F.col("user_id") < F.col("v_id"))
        .select(F.col("user_id").alias("u"), F.col("v_id").alias("v"))
        .distinct()
        .localCheckpoint()  # reused by degrees, orientation and closing join
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ranked = edges.join(du, "u").join(dv, "v")
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    e1 = oriented.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = oriented.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y").where(F.col("x") != F.col("z"))
    closing = oriented.select(
        F.col("a").alias("cx"), F.col("b").alias("cz")
    ).unionByName(oriented.select(F.col("b").alias("cx"), F.col("a").alias("cz")))
    tris = wedges.join(
        closing, (F.col("x") == F.col("cx")) & (F.col("z") == F.col("cz"))
    ).select("x", "y", "z")
    tcount = (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    cc = (
        deg.where(F.col("deg") >= 2)
        .join(tcount, "node", "left")
        .select(
            "node",
            F.col("deg").cast("long").alias("degree"),
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
            F.round(
                (F.lit(2) * F.coalesce(F.col("n_tri"), F.lit(0))).cast("double")
                / (F.col("deg") * (F.col("deg") - 1)).cast("double"),
                6,
            ).alias("cc"),
        )
    )
    return top_k(cc, 10, F.col("cc").desc(), F.col("node"))


def _kcore_oracle(k: int = 2, rounds: int = 6) -> str:
    """Unrolled k-core peel: each round keeps the subgraph induced by the
    previous survivors and drops nodes with induced degree < k. CTEs are
    MATERIALIZED — without it DuckDB inlines the recursive references
    and the scan count explodes exponentially with rounds (found
    empirically: 'Too many open files' at 6 rounds)."""
    parts = [
        """m AS MATERIALIZED (
      SELECT DISTINCT event_type,
             epoch_ms(CAST(ts AS TIMESTAMP)) // 300000 AS h, user_id
      FROM events),
    e0 AS MATERIALIZED (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM m a JOIN m b ON a.event_type = b.event_type AND a.h = b.h
      WHERE a.user_id < b.user_id),
    a0 AS MATERIALIZED (
      SELECT DISTINCT node FROM
        (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0))"""
    ]
    for i in range(1, rounds + 1):
        parts.append(f"""e{i} AS MATERIALIZED (
      SELECT e.u, e.v FROM e0 e
      JOIN a{i-1} x ON e.u = x.node
      JOIN a{i-1} y ON e.v = y.node),
    d{i} AS MATERIALIZED (
      SELECT node, COUNT(*) AS deg FROM
        (SELECT u AS node FROM e{i} UNION ALL SELECT v FROM e{i})
      GROUP BY node),
    a{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= {k})""")
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT d.node, CAST(d.deg AS BIGINT) AS core_degree
    FROM d{rounds} d JOIN a{rounds} USING (node)"""
    )


@query("graph_kcore_2core", oracle=_kcore_oracle(2, 6))
def graph_kcore_2core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=2, 6 unrolled peel rounds) over the same
    5-minute co-occurrence graph as the triangle/clustering queries —
    the classic graph-sparsification pass (drop degree-deficient nodes,
    cascade, repeat) that bounds downstream triangle/community work to
    the dense core. At sf0.001 the cascade is real (12 → 6 → 5 nodes,
    converged); judged output = survivors of round 6 with their
    qualifying induced degree.

    Scale shape: each round is edges ⋈ survivors (two semi-join-shaped
    equi-joins) + one map-side-combinable degree count — survivor and
    degree relations are node-cardinality, only the induced edge
    relation is edge-cardinality; localCheckpoint flattens the 6-round
    lineage (k-means recipe). A production run would iterate to
    fixpoint with the same per-round plan; the fixed unroll is what
    makes the whole thing one oracle-checkable expression."""
    ev = load_tables(spark, sf_dir)["events"]
    m = ev.select(
        "event_type",
        F.expr("unix_millis(CAST(ts AS TIMESTAMP)) div 300000").alias("h"),
        "user_id",
    ).distinct()
    b = m.select("event_type", "h", F.col("user_id").alias("v_id"))
    edges = (
        m.join(b, ["event_type", "h"])
        .where(F.col("user_id") < F.col("v_id"))
        .select(F.col("user_id").alias("u"), F.col("v_id").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    alive = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .distinct()
    )
    deg = None
    for _ in range(6):
        au = alive.select(F.col("node").alias("u"))
        av = alive.select(F.col("node").alias("v"))
        induced = edges.join(au, "u", "semi").join(av, "v", "semi")
        deg = (
            induced.select(F.col("u").alias("node"))
            .unionByName(induced.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .localCheckpoint()
        )
        alive = deg.where(F.col("deg") >= 2).select("node")
    return alive.join(deg, "node").select(
        "node", F.col("deg").cast("long").alias("core_degree")
    )


def _bfs_oracle(rounds: int = 4) -> str:
    """Unrolled BFS relaxation: d_{i} = min(d_{i-1} ∪ neighbors+1) per
    node. MATERIALIZED for the same reason as the k-core oracle —
    inlined recursive references explode the scan count."""
    parts = [
        """m AS MATERIALIZED (
      SELECT DISTINCT event_type,
             epoch_ms(CAST(ts AS TIMESTAMP)) // 300000 AS h, user_id
      FROM events),
    e0 AS MATERIALIZED (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM m a JOIN m b ON a.event_type = b.event_type AND a.h = b.h
      WHERE a.user_id < b.user_id),
    ed AS MATERIALIZED (
      SELECT u AS a, v AS b FROM e0 UNION ALL SELECT v AS a, u AS b FROM e0),
    s AS (SELECT MIN(a) AS src FROM ed),
    d0 AS MATERIALIZED (SELECT src AS node, 0 AS hop FROM s)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(f"""d{i} AS MATERIALIZED (
      SELECT node, MIN(hop) AS hop FROM (
        SELECT node, hop FROM d{i-1}
        UNION ALL
        SELECT e.b AS node, d.hop + 1 AS hop
        FROM ed e JOIN d{i-1} d ON e.a = d.node)
      GROUP BY node)""")
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT node, CAST(hop AS BIGINT) AS hops FROM d{rounds}"
    )


@query("graph_bfs_hops", oracle=_bfs_oracle(4))
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS shortest-path hops (4 unrolled relaxation
    rounds) over the 5-minute co-occurrence graph, source = the
    minimum node id — the frontier-expansion algorithm family
    (reachability, hop-distance, influence radius) the graph suite
    did not yet cover: CC/k-core peel SETS, PageRank iterates a
    NUMERIC fixpoint; BFS propagates an ORDERED semilattice value
    (min hops) along edges.

    Exactness: hop counts are integers and min() is an idempotent,
    associative, commutative merge — shuffle layout, duplicate edges
    between rounds, and re-relaxation of already-settled nodes cannot
    change the result (relaxing a settled node re-derives the same
    min). That idempotence is why the judged form can re-relax the
    WHOLE distance relation each round instead of tracking a frontier
    delta: d_i = min(d_{i-1} ∪ expand(d_{i-1})) is one equi-join +
    one map-side-combinable min per round. A production run at 100 TB
    iterates the same plan to fixpoint with a frontier filter
    (hop = i-1 rows only — the delta is what's new, everything else
    re-derives itself) and stops when the frontier empties; the fixed
    unroll is what makes the whole computation one oracle-checkable
    expression. localCheckpoint truncates the per-round lineage
    exactly as in the k-core/PageRank loops."""
    ev = load_tables(spark, sf_dir)["events"]
    m = ev.select(
        "event_type",
        F.expr("unix_millis(CAST(ts AS TIMESTAMP)) div 300000").alias("h"),
        "user_id",
    ).distinct()
    b = m.select("event_type", "h", F.col("user_id").alias("v_id"))
    e0 = (
        m.join(b, ["event_type", "h"])
        .where(F.col("user_id") < F.col("v_id"))
        .select(F.col("user_id").alias("u"), F.col("v_id").alias("v"))
        .distinct()
    )
    ed = e0.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
        e0.select(F.col("v").alias("a"), F.col("u").alias("b"))
    ).localCheckpoint()
    src = ed.agg(F.min("a")).collect()[0][0]  # control-plane scalar
    dist = spark.createDataFrame([(int(src), 0)], "node long, hop int")
    for _ in range(4):
        nxt = ed.join(dist, ed["a"] == dist["node"]).select(
            ed["b"].alias("node"), (dist["hop"] + 1).alias("hop")
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("hop").alias("hop"))
            .localCheckpoint()
        )
    return dist.select("node", F.col("hop").cast("long").alias("hops"))


def _lpa_oracle(rounds: int = 3) -> str:
    """Unrolled synchronous label propagation: l_i(v) = the most frequent
    label among v's neighbors under l_{i-1}, ties to the SMALLEST label
    (the deterministic replacement for classic LPA's random tie-break);
    seed l_0(v) = v. MATERIALIZED per round like the k-core/BFS oracles."""
    parts = [
        """m AS MATERIALIZED (
      SELECT DISTINCT event_type,
             epoch_ms(CAST(ts AS TIMESTAMP)) // 300000 AS h, user_id
      FROM events),
    e0 AS MATERIALIZED (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM m a JOIN m b ON a.event_type = b.event_type AND a.h = b.h
      WHERE a.user_id < b.user_id),
    ed AS MATERIALIZED (
      SELECT u AS a, v AS b FROM e0 UNION ALL SELECT v AS a, u AS b FROM e0),
    l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lab FROM ed)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(f"""l{i} AS MATERIALIZED (
      SELECT node, lab FROM (
        SELECT e.a AS node, l.lab AS lab, COUNT(*) AS c
        FROM ed e JOIN l{i-1} l ON e.b = l.node
        GROUP BY e.a, l.lab)
      QUALIFY ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lab) = 1)""")
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT node, CAST(lab AS BIGINT) AS label FROM l{rounds}"
    )


@query("graph_label_propagation", oracle=_lpa_oracle(3))
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007), determinized: every node starts labeled with its own id,
    and each round adopts the most frequent label among its neighbors
    with ties broken toward the SMALLEST label — the random tie-break of
    classic LPA replaced by an order so the fixture result is unique and
    oracle-checkable. 3 unrolled synchronous rounds over the 5-minute
    co-occurrence graph (the suite's shared graph; see
    graph_triangle_count for why minute-cells keep density linear-ish).

    Plan per round: one equi-join (edges x labels, shuffle on the label
    side's node key), one (node, label) count with map-side combine, one
    row_number window per node — all JVM, lineage truncated per round
    with localCheckpoint exactly like the PageRank/k-core/BFS loops. At
    100 TB this is the canonical iterate: labels are a node-sized
    relation, edges stream through the join, and the per-round argmax is
    a partial-aggregable count + a bounded per-node top-1."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir)["events"]
    m = ev.select(
        "event_type",
        F.expr("unix_millis(CAST(ts AS TIMESTAMP)) div 300000").alias("h"),
        "user_id",
    ).distinct()
    b = m.select("event_type", "h", F.col("user_id").alias("v_id"))
    e0 = (
        m.join(b, ["event_type", "h"])
        .where(F.col("user_id") < F.col("v_id"))
        .select(F.col("user_id").alias("u"), F.col("v_id").alias("v"))
        .distinct()
    )
    ed = (
        e0.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionByName(e0.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .localCheckpoint()
    )
    labels = ed.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    top = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("lab"))
    for _ in range(3):
        votes = (
            ed.join(labels, ed["b"] == labels["node"])
            .select(ed["a"].alias("node"), "lab")
            .groupBy("node", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.withColumn("__rn", F.row_number().over(top))
            .where(F.col("__rn") == 1)
            .select("node", "lab")
            .localCheckpoint()
        )
    return labels.select("node", F.col("lab").cast("long").alias("label"))


_HITS_ITERS = 3


def _hits_oracle() -> str:
    ctes = [
        """edges AS (SELECT DISTINCT user_id AS u, event_type AS t FROM events),
    h0 AS (SELECT DISTINCT u, CAST(1 AS DOUBLE) AS h FROM edges)"""
    ]
    for i in range(1, _HITS_ITERS + 1):
        ctes.append(
            f"""ar{i} AS (
      SELECT e.t, CAST(SUM(CAST(p.h AS DECIMAL(38,18))) AS DOUBLE) AS a
      FROM edges e JOIN h{i-1} p ON e.u = p.u GROUP BY e.t),
    an{i} AS (SELECT sqrt(CAST(SUM(CAST(a * a AS DECIMAL(38,18)))
                               AS DOUBLE)) AS nr FROM ar{i}),
    a{i} AS (SELECT t, a / (SELECT nr FROM an{i}) AS a FROM ar{i}),
    hr{i} AS (
      SELECT e.u, CAST(SUM(CAST(q.a AS DECIMAL(38,18))) AS DOUBLE) AS h
      FROM edges e JOIN a{i} q ON e.t = q.t GROUP BY e.u),
    hn{i} AS (SELECT sqrt(CAST(SUM(CAST(h * h AS DECIMAL(38,18)))
                               AS DOUBLE)) AS nr FROM hr{i}),
    h{i} AS (SELECT u, h / (SELECT nr FROM hn{i}) AS h FROM hr{i})"""
        )
    n = _HITS_ITERS
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT 'hub' AS side, 'u:' || CAST(u AS VARCHAR) AS node,
           round(h, 6) AS score
    FROM h{n}
    UNION ALL
    SELECT 'authority' AS side, 't:' || t AS node, round(a, 6) AS score
    FROM a{n}"""
    )


@query("graph_hits_hubs_authorities", oracle=_hits_oracle())
def graph_hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg hubs & authorities, 3 iterations, L2-normalized)
    over the directed bipartite user→event-type graph — the second
    judged eigenvector-style fixpoint after PageRank, using the same
    bit-exactness recipe: neighbor sums through DECIMAL(38,18) (exact,
    order-independent), normalization as one exact decimal sum of IEEE
    squares followed by a correctly-rounded sqrt and one division per
    node.  The per-iteration norm is a 1-row aggregate crossJoin-
    broadcast back into the plan (the oracle's scalar subquery) — no
    driver round-trip in the loop, unlike the control-plane n_nodes
    scalar PageRank reads once up front.

    Scale: each iteration is two broadcast-able joins + two aggregations
    with lineage truncated by localCheckpoint; the score vectors are
    O(nodes), never collected."""
    ev = load_tables(spark, sf_dir)["events"]
    edges = (
        ev.select(F.col("user_id").alias("u"), F.col("event_type").alias("t"))
        .distinct()
        .localCheckpoint()
    )
    h = edges.select("u").distinct().select("u", F.lit(1.0).alias("h"))
    a = None
    for _ in range(_HITS_ITERS):
        ar = (
            edges.join(h, "u")
            .groupBy("t")
            .agg(F.sum(F.col("h").cast("decimal(38,18)")).cast("double").alias("a"))
        )
        an = ar.agg(
            F.sqrt(
                F.sum((F.col("a") * F.col("a")).cast("decimal(38,18)")).cast("double")
            ).alias("nr")
        )
        a = ar.crossJoin(F.broadcast(an)).select(
            "t", (F.col("a") / F.col("nr")).alias("a")
        )
        hr = (
            edges.join(a, "t")
            .groupBy("u")
            .agg(F.sum(F.col("a").cast("decimal(38,18)")).cast("double").alias("h"))
        )
        hn = hr.agg(
            F.sqrt(
                F.sum((F.col("h") * F.col("h")).cast("decimal(38,18)")).cast("double")
            ).alias("nr")
        )
        h = (
            hr.crossJoin(F.broadcast(hn))
            .select("u", (F.col("h") / F.col("nr")).alias("h"))
            .localCheckpoint()
        )
        a = a.localCheckpoint()
    hubs = h.select(
        F.lit("hub").alias("side"),
        F.concat(F.lit("u:"), F.col("u").cast("string")).alias("node"),
        F.round("h", 6).alias("score"),
    )
    auths = a.select(
        F.lit("authority").alias("side"),
        F.concat(F.lit("t:"), F.col("t")).alias("node"),
        F.round("a", 6).alias("score"),
    )
    return hubs.unionByName(auths)
