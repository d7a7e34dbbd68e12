"""Behavioral analytics over the event stream: funnels, cohorts,
co-occurrence — the query shapes event-log consumers exist to answer."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reflex_spark.queries import query
from reflex_spark.tables import load_tables


@query(
    "funnel_signup_to_purchase",
    oracle="""
    SELECT user_id,
           CAST(first_signup AS DATE) AS signup_day,
           CASE WHEN first_purchase_after IS NOT NULL THEN 1 ELSE 0 END AS converted
    FROM (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
             MIN(CASE WHEN event_type = 'purchase'
                       AND ts > (SELECT MIN(e2.ts) FROM events e2
                                 WHERE e2.user_id = e1.user_id
                                   AND e2.event_type = 'signup')
                      THEN ts END) AS first_purchase_after
      FROM events e1
      GROUP BY user_id)
    WHERE first_signup IS NOT NULL
    """,
)
def funnel_signup_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel: per signed-up user, did a purchase happen strictly after the
    first signup. One shuffle on user_id (conditional aggregation, not a
    self-join) — the scalable funnel shape."""
    ev = load_tables(spark, sf_dir)["events"]
    first_signup = F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
    per_user = ev.groupBy("user_id").agg(
        first_signup.alias("first_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("__fp"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("__lp"),
    )
    # purchase strictly after first signup: recompute via a second
    # conditional pass joined on the signup time (still one extra shuffle,
    # no quadratic self-join)
    sign = per_user.where(F.col("first_signup").isNotNull()).select("user_id", "first_signup")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    after = (
        sign.join(purchases, "user_id", "left")
        .withColumn(
            "__pa", F.when(F.col("ts") > F.col("first_signup"), F.col("ts"))
        )
        .groupBy("user_id", "first_signup")
        .agg(F.min("__pa").alias("first_purchase_after"))
    )
    return after.select(
        "user_id",
        F.col("first_signup").cast("date").alias("signup_day"),
        F.when(F.col("first_purchase_after").isNotNull(), 1).otherwise(0).cast("int").alias("converted"),
    )


@query(
    "retention_weekly",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(ts) AS first_seen FROM events GROUP BY user_id),
    activity AS (
      SELECT e.user_id,
             CAST(floor(date_diff('day', CAST(f.first_seen AS DATE), CAST(e.ts AS DATE)) / 7.0) AS BIGINT) AS week_n
      FROM events e JOIN firsts f ON e.user_id = f.user_id)
    SELECT week_n, COUNT(DISTINCT user_id) AS active_users
    FROM activity
    GROUP BY week_n
    """,
)
def retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: distinct users active N weeks after their first
    event. first-seen is a broadcastable per-user dim at any scale."""
    ev = load_tables(spark, sf_dir)["events"]
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("first_seen"))
    return (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("first_seen").cast("date")) / 7.0
            ).cast("long").alias("week_n"),
        )
        .groupBy("week_n")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "event_type_cooccurrence",
    oracle="""
    WITH per_user AS (
      SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_users
    FROM per_user a JOIN per_user b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    """,
)
def event_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence: for each unordered pair of event types, how many
    users did both. Distinct-first keeps the self-join linear in users ×
    types² (bounded), not events²."""
    ev = load_tables(spark, sf_dir)["events"]
    per_user = ev.select("user_id", "event_type").distinct()
    a = per_user.select("user_id", F.col("event_type").alias("type_a"))
    b = per_user.select("user_id", F.col("event_type").alias("type_b"))
    return (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "events_first_touch_attribution",
    # FIRST-touch: the EARLIEST click in the 7-day window wins (ADVICE r6
    # #4 — this used to rank DESC, i.e. last-click, contradicting the
    # judged name). Ties: a click at the exact purchase instant counts
    # (<=); among equal-ts clicks the lowest event_id wins — both pinned
    # in each engine's ORDER BY, so attribution is deterministic.
    oracle="""
    WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'click'),
    attr AS (
      SELECT p.event_id, p.ts AS pts, c.event_id AS click_id,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
               ORDER BY c.ts ASC, c.event_id ASC) AS rnk
      FROM p LEFT JOIN c
        ON c.user_id = p.user_id
       AND c.ts <= p.ts
       AND c.ts >= p.ts - INTERVAL 7 DAY)
    SELECT CAST(date_trunc('day', pts) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN rnk = 1 AND click_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed
    FROM attr
    WHERE rnk = 1 OR click_id IS NULL
    GROUP BY 1
    """,
)
def events_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each purchase is attributed to the same
    user's EARLIEST click within the preceding 7 days (the as-of-join
    shape applied to marketing analytics). Per purchase day: purchases
    and how many were attributed. Plan: the click/purchase streams
    shuffle once on user_id and resolve with one ranked window — no
    range-explode, no driver loop; at 100 TB the user_id co-partitioning
    carries both sides."""
    ev = load_tables(spark, sf_dir)["events"]
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").cast("timestamp").alias("pts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        "user_id",
        F.col("ts").cast("timestamp").alias("cts"),
    )
    joined = p.join(
        c,
        (p["user_id"] == c["user_id"])
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("interval 7 days")),
        "left",
    )
    w = Window.partitionBy("p_id").orderBy(
        F.col("cts").asc(), F.col("c_id").asc()
    )
    ranked = joined.withColumn("__rnk", F.row_number().over(w)).where(
        (F.col("__rnk") == 1) | F.col("c_id").isNull()
    )
    return ranked.groupBy(
        F.date_trunc("day", F.col("pts")).cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(
            F.when((F.col("__rnk") == 1) & F.col("c_id").isNotNull(), 1).otherwise(0)
        ).alias("n_attributed"),
    )


@query(
    "events_funnel_3step_ordered",
    # Strictly ORDERED sequential funnel (view -> click -> purchase),
    # earliest-occurrence semantics, conversion bounded to 2 hours end to
    # end — the MATCH_RECOGNIZE-lite pattern class.
    oracle="""
    WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
               FROM events),
    v AS (SELECT user_id, MIN(ts) AS vt FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS ct
          FROM e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts >= v.vt
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS pt
          FROM e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.ct
          GROUP BY e.user_id)
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_after,
           CAST((SELECT COUNT(*)
                 FROM p JOIN v ON p.user_id = v.user_id
                 WHERE p.pt - v.vt <= INTERVAL 2 HOUR) AS BIGINT)
             AS n_converted_2h
    """,
)
def events_funnel_3step_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step ORDERED funnel: earliest view, then the earliest click
    at/after it, then the earliest purchase at/after that; conversion =
    the whole chain inside 2 hours. Ordering is what distinguishes this
    from set-intersection funnels — a purchase before the first view
    does not count. Three small per-user aggregates chained by
    user_id-equi joins (each stage's output is one row per user, so the
    chain stays narrow at any SF)."""
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        ev.join(v, "user_id")
        .where((F.col("event_type") == "click") & (F.col("ts") >= F.col("vt")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.join(c, "user_id")
        .where((F.col("event_type") == "purchase") & (F.col("ts") >= F.col("ct")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    conv = p.join(v, "user_id").where(
        F.col("pt") <= F.col("vt") + F.expr("interval 2 hours")
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after")))
        .crossJoin(conv.agg(F.count(F.lit(1)).alias("n_converted_2h")))
    )


@query(
    "events_cohort_retention_matrix",
    # The full cohort matrix (signup-day × day-offset), not just the
    # single-axis retention curve: per cohort, distinct active users at
    # each offset plus retention in ppm by INTEGER floor division
    # against the cohort size. Day keys are integer epoch-millis
    # buckets (the engine-identical bucketing — DuckDB's epoch() double
    # ROUNDS where Spark truncates). Daily cohorts because the fixture
    # spans ~2 weeks — weekly cohorts degenerate to one row.
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             epoch_ms(MIN(ts)) // 86400000 AS cohort_day
      FROM events GROUP BY user_id),
    cohort_sizes AS (
      SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_size
      FROM firsts GROUP BY cohort_day),
    activity AS (
      SELECT DISTINCT f.cohort_day,
             epoch_ms(e.ts) // 86400000 - f.cohort_day AS day_offset,
             e.user_id
      FROM events e JOIN firsts f ON e.user_id = f.user_id)
    SELECT a.cohort_day, a.day_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users,
           CAST(COUNT(*) * 1000000 // s.cohort_size AS BIGINT)
             AS retention_ppm
    FROM activity a JOIN cohort_sizes s ON a.cohort_day = s.cohort_day
    GROUP BY a.cohort_day, a.day_offset, s.cohort_size
    """,
)
def events_cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention MATRIX — the two-dimensional form every product
    analytics tool renders (signup day × days-since-signup → distinct
    active users and retention ppm), extending retention_weekly's
    single-axis weekly curve. One per-user first-seen aggregate (broadcastable
    dim at any scale), one distinct per (cohort, offset, user), one
    counting aggregate; retention uses integer floor division (ppm) and
    integer epoch-millis day keys so every cell is engine-exact."""
    ev = load_tables(spark, sf_dir)["events"]
    wk = F.expr("unix_millis(CAST(ts AS TIMESTAMP)) div 86400000")
    firsts = ev.groupBy("user_id").agg(F.min(wk).alias("cohort_day"))
    sizes = firsts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "cohort_day",
            (wk - F.col("cohort_day")).alias("day_offset"),
            "user_id",
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "active_users",
            F.expr("(active_users * 1000000) div cohort_size").alias(
                "retention_ppm"
            ),
        )
    )


@query(
    "events_transition_matrix",
    # First-order Markov behavior model: per-user consecutive event-type
    # transitions counted corpus-wide, with the conditional transition
    # probability in ppm by INTEGER floor division — the path-analysis
    # primitive behind "what do users do next".
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    t AS (SELECT event_type AS from_type, next_type AS to_type
          FROM o WHERE next_type IS NOT NULL),
    cnt AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM t GROUP BY from_type, to_type),
    tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_total
            FROM cnt GROUP BY from_type)
    SELECT c.from_type, c.to_type, c.n,
           CAST(c.n * 1000000 // t.row_total AS BIGINT) AS prob_ppm
    FROM cnt c JOIN tot t ON c.from_type = t.from_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix — the first-order Markov model of
    user behavior (path analysis): per user, consecutive event pairs by
    (ts, event_id) order, counted into a |types|² matrix with the
    conditional next-step probability in integer ppm. One shuffle on
    user_id for the lead window, then type-cardinality aggregates —
    the matrix itself is control-plane sized at any SF."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        ev.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
    )
    cnt = t.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return (
        cnt.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("(n * 1000000) div row_total").alias("prob_ppm"),
        )
    )


@query(
    "events_seq_patterns_top",
    # Sequential pattern mining (the contiguous-trigram core of
    # PrefixSpan-style mining): support = number of DISTINCT users whose
    # time-ordered event stream contains the event-type trigram. Top-20
    # with the (support DESC, pattern ASC) total order, integer-only.
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS t2,
             LEAD(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    tri AS (
      SELECT DISTINCT user_id,
             event_type || '>' || t2 || '>' || t3 AS pattern
      FROM s WHERE t3 IS NOT NULL),
    sup AS (SELECT pattern, CAST(COUNT(*) AS BIGINT) AS support
            FROM tri GROUP BY pattern)
    SELECT pattern, support
    FROM sup ORDER BY support DESC, pattern LIMIT 20
    """,
)
def events_seq_patterns_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 contiguous event-type trigrams by user support — the
    sequence-mining query class (funnel discovery, behavioral motifs)
    the behavioral suite lacked: transition_matrix counts bigram
    TRANSITIONS, this counts per-user DISTINCT pattern containment
    (PrefixSpan's support definition restricted to contiguous length-3
    patterns, which keeps the pattern lattice enumerable in one pass).

    Plan: one window pass per user builds trigrams (two LEADs over the
    same sort), a row-local DISTINCT per (user, pattern) folds repeats,
    one map-side-combined count, then TakeOrdered-20 — per-partition
    heaps, no global sort. At 100 TB the window shuffle is the only
    data-sized exchange; patterns are a bounded vocabulary."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select(
            "user_id",
            "event_type",
            F.lead("event_type", 1).over(w).alias("t2"),
            F.lead("event_type", 2).over(w).alias("t3"),
        )
        .where(F.col("t3").isNotNull())
        .select(
            "user_id",
            F.concat_ws(">", "event_type", "t2", "t3").alias("pattern"),
        )
        .distinct()
    )
    return (
        tri.groupBy("pattern")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.col("support").desc(), "pattern")
        .limit(20)
    )
