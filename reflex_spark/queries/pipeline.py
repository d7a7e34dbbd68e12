"""Judged queries: training-pipeline utilities (deterministic sampling,
map/conditional expressions) over the fixtures."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reflex_spark.operators.sampling import hash_sample, sql_bucket, stratified_hash_sample
from reflex_spark.queries import query
from reflex_spark.tables import load_tables


@query(
    "sample_documents_hash",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {sql_bucket('doc_id')} < CAST(0.25 * 65536 AS BIGINT)
    """,
)
def sample_documents_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25% sample by content hash: same rows every run, on
    any engine or cluster size (unlike seed-based df.sample)."""
    docs = load_tables(spark, sf_dir)["documents"]
    return hash_sample(docs, "doc_id", 0.25).select("doc_id", "lang")


@query(
    "sample_documents_stratified",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_kept
    FROM documents
    WHERE {sql_bucket('doc_id')} <
          CASE WHEN lang = 'en' THEN CAST(0.1 * 65536 AS BIGINT)
               ELSE CAST(0.5 * 65536 AS BIGINT) END
    GROUP BY lang
    """,
)
def sample_documents_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified hash sampling: downsample the dominant language (en→10%),
    keep the tail at 50% — the standard corpus-rebalancing op."""
    docs = load_tables(spark, sf_dir)["documents"]
    kept = stratified_hash_sample(docs, "doc_id", "lang", {"en": 0.1}, default_rate=0.5)
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


@query(
    "map_functions_events",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           2 AS n_keys,
           event_type AS type_via_map
    FROM events
    WHERE event_id % 100 = 0
    """,
)
def map_functions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column functions: parse the JSON payload into a map, then
    map_keys/element_at/map_concat (oracle computes expected values by
    plain expressions — the map plumbing is the Spark surface under test)."""
    ev = load_tables(spark, sf_dir)["events"]
    m = F.from_json("props", "map<string,string>")
    enriched = F.map_concat(m, F.create_map(F.lit("type"), F.col("event_type")))
    return ev.where(F.col("event_id") % 100 == 0).select(
        "event_id",
        F.element_at(m, "k").cast("long").alias("k_val"),
        F.size(F.map_keys(enriched)).cast("int").alias("n_keys"),
        F.element_at(enriched, "type").alias("type_via_map"),
    )


@query(
    "events_user_summary_pandas",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(MIN(event_id) AS BIGINT) AS first_event,
           round(MAX(value), 2) AS max_value
    FROM events
    GROUP BY user_id
    """,
)
def events_user_summary_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-map Pandas surface (applyInPandas): per-user summary computed
    in an Arrow-batched pandas function. Only exact-comparable stats
    (count/min/max) so the oracle check stays bit-exact; the point under
    test is the UDAF-like execution path, not the arithmetic."""
    import pandas as pd

    ev = load_tables(spark, sf_dir)["events"]

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "first_event": [pdf["event_id"].min()],
                "max_value": [round(pdf["value"].max(), 2)],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        summarize, "user_id long, n_events long, first_event long, max_value double"
    )


@query(
    "conditional_expressions_customers",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 1000 THEN 'low'
                ELSE 'healthy' END AS balance_band,
           coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'CAR') AS segment_alias,
           round(greatest(c_acctbal, 0.0), 2) AS floored_bal,
           round(least(c_acctbal, 5000.0), 2) AS capped_bal
    FROM customer
    """,
)
def conditional_expressions_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF/GREATEST/LEAST scalar conditionals."""
    cust = load_tables(spark, sf_dir)["customer"]
    bal = F.col("c_acctbal")
    return cust.select(
        "c_custkey",
        F.when(bal < 0, "overdrawn").when(bal < 1000, "low").otherwise("healthy").alias(
            "balance_band"
        ),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")), F.lit("CAR")).alias(
            "segment_alias"
        ),
        F.round(F.greatest(bal, F.lit(0.0)), 2).alias("floored_bal"),
        F.round(F.least(bal, F.lit(5000.0)), 2).alias("capped_bal"),
    )


@query(
    "sample_token_budget",
    # Greedy per-source token-budget fill in hash order; the doc crossing
    # the budget line is kept. Budgets derive deterministically from the
    # source number so the mixture varies (300/500/700 tokens).
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             300 + 200 * (CAST(substr(source, 4) AS INT) % 3) AS budget
      FROM documents),
    cums AS (
      SELECT source, n_tokens, budget,
             SUM(n_tokens) OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM toks)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept,
           CAST(MAX(budget) AS BIGINT) AS budget
    FROM cums
    WHERE cum - n_tokens < budget
    GROUP BY source
    """,
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture weighting: fill each source's token budget greedily
    in content-hash order (reproducible across engines and cluster
    sizes). The real pre-training op behind 'sample source X to N
    tokens'; per-source windows shuffle once on source and parallelize
    across sources at 100 TB."""
    from reflex_spark.operators.sampling import greedy_token_budget
    from reflex_spark.operators.text import token_count

    docs = load_tables(spark, sf_dir)["documents"]
    budget = (
        F.lit(300)
        + F.lit(200) * (F.expr("CAST(substring(source, 4) AS INT)") % 3)
    ).cast("long")
    kept = greedy_token_budget(
        docs.withColumn("n_tokens", token_count("text")).withColumn("budget", budget),
        "doc_id",
        F.col("n_tokens"),
        F.col("budget"),
        "source",
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("tokens_kept"),
        F.max("budget").cast("long").alias("budget"),
    )


@query(
    "text_sequence_packing",
    # Contiguous greedy packing into 256-token packs within 8 content-hash
    # shards; a doc belongs to the pack where its tokens start.
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT AS BIGINT) % 8 AS shard
      FROM documents),
    cums AS (
      SELECT shard, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY shard
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM toks)
    SELECT shard,
           CAST((cum - n_tokens) // 256 AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM cums
    GROUP BY shard, (cum - n_tokens) // 256
    """,
)
def text_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed-256-token packs by
    contiguous greedy chunking in content-hash order, per content-hash
    shard (8 here; cluster-parallelism-scaled in production — a GLOBAL
    cumulative sum would serialize into one task, per-shard windows scale
    linearly). Emits per-pack doc and token counts — the shape a
    tokenizer/writer stage consumes."""
    from reflex_spark.operators.sampling import pack_sequences
    from reflex_spark.operators.text import token_count

    docs = load_tables(spark, sf_dir)["documents"]
    packed = pack_sequences(
        docs.withColumn("n_tokens", token_count("text")),
        "doc_id",
        F.col("n_tokens"),
        seq_len=256,
        shards=8,
    )
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )


@query(
    "skew_salted_rollup",
    # The salted two-phase plan must produce EXACTLY the plain GROUP BY
    # result: partial sums stay DECIMAL so the re-merge is order-exact.
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def skew_salted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation, judged: the salted two-phase rollup
    (operators/skew.salted_agg — per-(key, salt) partials then per-key
    merge, capping any reducer at ~1/16 of a hot key) must be bit-exact
    with the plain GROUP BY oracle. Partial sums stay DECIMAL(18,6) so
    the two-phase merge is order-independent; one final cast to double.
    This is the hot-key escape hatch for 100 TB event_type skew that
    AQE's skew-join split does not cover (it only handles joins)."""
    from reflex_spark.operators.skew import salted_agg
    from reflex_spark.queries.helpers import DEC

    ev = load_tables(spark, sf_dir)["events"]
    return salted_agg(
        ev,
        ["event_type"],
        aggs=lambda: [
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast(DEC)).alias("ps"),
        ],
        merges=lambda: [
            F.sum("pn").cast("long").alias("n_events"),
            F.sum("ps").cast("double").alias("sum_value"),
        ],
        num_salts=16,
    )


@query(
    "sample_temperature_mixture",
    # z = Σ sqrt(n_s) goes through DECIMAL(38,18) (order-independent);
    # every other step is a fixed single-IEEE-op chain; the keep/drop
    # decision is the md5 bucket both engines share. floor(), not int
    # cast (DuckDB CAST(double AS INT) rounds).
    oracle=f"""
    WITH n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
               FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
                   CAST(SUM(CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(38,18)))
                        AS DOUBLE) AS z
            FROM n),
    thr AS (
      SELECT source, n,
             CAST(floor(
               LEAST(CAST(1.0 AS DOUBLE),
                     (CAST(0.5 AS DOUBLE) * CAST(total AS DOUBLE))
                       * (sqrt(CAST(n AS DOUBLE)) / z) / CAST(n AS DOUBLE))
               * 65536) AS BIGINT) AS bucket_threshold
      FROM n, tot)
    SELECT d.source,
           CAST(MAX(t.bucket_threshold) AS BIGINT) AS bucket_threshold,
           CAST(MAX(t.n) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN {sql_bucket('d.doc_id')} < t.bucket_threshold
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents d JOIN thr t USING (source)
    GROUP BY d.source
    """,
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture resampling (the multilingual-corpus
    balancing rule of mC4/PaLM: sample sources ∝ n^α, α=0.5, here sized
    to half the corpus): per-source keep rates are computed from counts
    (α-powered, normalized, capped at 1), converted to md5-bucket
    thresholds, and applied as deterministic content-hash sampling — the
    same doc always makes the same cut. The rate table is control-plane
    sized and broadcast; one count pass + one filtered count pass."""
    from reflex_spark.operators.sampling import _BUCKETS, _bucket

    docs = load_tables(spark, sf_dir)["documents"]
    n = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = n.agg(
        F.sum("n").alias("total"),
        F.sum(F.sqrt(F.col("n").cast("double")).cast("decimal(38,18)"))
        .cast("double")
        .alias("z"),
    )
    rate = F.least(
        F.lit(1.0),
        (F.lit(0.5) * F.col("total").cast("double"))
        * (F.sqrt(F.col("n").cast("double")) / F.col("z"))
        / F.col("n").cast("double"),
    )
    thr = n.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        F.floor(rate * _BUCKETS).cast("long").alias("bucket_threshold"),
    )
    return (
        docs.join(F.broadcast(thr), "source")
        .groupBy("source")
        .agg(
            F.max("bucket_threshold").alias("bucket_threshold"),
            F.max("n").alias("n_total"),
            F.sum(
                F.when(
                    _bucket(F.col("doc_id")) < F.col("bucket_threshold"), 1
                ).otherwise(0)
            ).alias("n_kept"),
        )
    )


@query(
    "skew_salted_join_revenue",
    # The salt must be RESULT-INVISIBLE: the oracle is the plain join.
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def skew_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted-join operator judged end-to-end: lineitem (big, salted)
    joins orders (replicated num_salts times) on the order key, then
    aggregates per priority. The salt is pure execution strategy — the
    hash check proves it never changes the join's row multiset (no lost
    buckets, no double matches). This is the manual skew weapon for when
    AQE's runtime skew split can't apply (e.g. pre-shuffle bucketing)."""
    from reflex_spark.operators.skew import salted_join

    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select(
        F.col("l_orderkey").alias("okey"), "l_extendedprice"
    )
    orders = t["orders"].select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, "okey", num_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_price"),
    )


@query(
    "sample_train_val_test_split",
    # 80/10/10 content-hash split; the md5 over the sorted id list pins
    # EXACT membership per (split, lang) cell, so overlap or drift between
    # splits — the bug class that silently leaks eval data — fails the
    # hash, not just the counts.
    oracle=f"""
    WITH tagged AS (
      SELECT doc_id, lang,
             -- thresholds as exact integer literals: CAST(0.8*65536 AS
             -- BIGINT) ROUNDS to 52429 in DuckDB while Python truncates
             CASE WHEN {sql_bucket('doc_id')} < 52428 THEN 'train'
                  WHEN {sql_bucket('doc_id')} < 58982 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents)
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS member_md5
    FROM tagged
    GROUP BY split, lang
    """,
)
def sample_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 train/val/test split by content hash: the
    same document lands in the same split on every run, engine, and
    cluster size (the property seed-based randomSplit lacks), and the
    manifest row per (split, lang) carries an md5 over the sorted member
    ids — exact membership is judged, which is what prevents silent
    train/eval leakage. One scan, one aggregate."""
    from reflex_spark.operators.sampling import _BUCKETS, _bucket

    docs = load_tables(spark, sf_dir)["documents"]
    b = _bucket(F.col("doc_id"))
    split = (
        F.when(b < int(0.8 * _BUCKETS), "train")
        .when(b < int(0.9 * _BUCKETS), "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.md5(
                F.array_join(
                    F.transform(
                        # struct sort => NUMERIC id order (a bare string
                        # sort would put "10" before "9")
                        F.array_sort(F.collect_list(F.struct(F.col("doc_id")))),
                        lambda r: r["doc_id"].cast("string"),
                    ),
                    ",",
                )
            ).alias("member_md5"),
        )
    )


@query(
    "sample_global_shuffle_manifest",
    # Seeded epoch reshuffle + sharding — the data-loading op a training
    # run performs every epoch: order = md5(seed || id) (a new seed is a
    # new permutation, membership unchanged), shard = order-hash mod 8.
    # The manifest pins each shard's exact contents AND order via an
    # md5-of-ordered-ids chain, so any divergence in permutation or
    # sharding fails the hash.
    oracle="""
    WITH h AS (
      SELECT doc_id, n_chars,
             md5('epoch7|' || CAST(doc_id AS VARCHAR)) AS hh
      FROM documents),
    s AS (
      SELECT doc_id, n_chars, hh,
             CAST(CAST(('0x' || substr(hh, 1, 8)) AS BIGINT) % 8
                  AS INTEGER) AS shard
      FROM h)
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY hh, doc_id))
             AS order_md5
    FROM s
    GROUP BY shard
    """,
)
def sample_global_shuffle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global seeded shuffle + sharding manifest — the per-epoch data
    loader op for training: every document gets a deterministic
    pseudo-random position (md5 of seed||id — changing the seed permutes
    order without touching membership) and a shard (top hash bytes mod
    8); the manifest emits per shard the doc count, char mass, and an
    md5 chain over the ids IN SHUFFLE ORDER, pinning the exact
    permutation each worker would read.

    Scale shape: one scan + one map-side-combinable aggregation keyed by
    shard; the within-shard order hash is computed per row (no global
    sort — a 100 TB loader would range-partition by the same hash and
    write shard files whose internal order is the hash order)."""
    docs = load_tables(spark, sf_dir)["documents"]
    hh = F.md5(F.concat(F.lit("epoch7|"), F.col("doc_id").cast("string")))
    s = docs.select("doc_id", "n_chars", hh.alias("hh")).withColumn(
        "shard", (F.conv(F.substring("hh", 1, 8), 16, 10).cast("long") % 8).cast("int")
    )
    return s.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("hh", F.col("doc_id")))
                    ),
                    lambda r: r["doc_id"].cast("string"),
                ),
            ).cast("binary")
        ).alias("order_md5"),
    )


@query(
    "sample_weighted_reservoir",
    # Weighted sampling WITHOUT replacement (Efraimidis-Spirakis) —
    # the sampling family's missing member (hash_sample is unweighted;
    # stratified fixes per-stratum rates). The libm-pow cross-engine
    # risk the key u**(1/w) normally carries is solved by POWER-OF-TWO
    # weight tiers: the key becomes an iterated sqrt — a fixed chain of
    # correctly-rounded IEEE ops both engines evaluate bit-identically
    # — so the oracle replays the ENTIRE draw, not a rounded summary.
    oracle="""
    WITH b AS (
      SELECT doc_id, n_chars, lang,
             LEAST(3, n_chars // 150) AS tier,
             CAST(('0x' || substr(md5('esample1|' || CAST(doc_id AS VARCHAR)),
                                  1, 13)) AS BIGINT) AS h
      FROM documents),
    kx AS (
      SELECT doc_id, lang,
             CASE tier WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END
               AS weight,
             CASE tier
               WHEN 0 THEN (CAST(h AS DOUBLE) + CAST(1 AS DOUBLE))
                           / CAST(4503599627370496 AS DOUBLE)
               WHEN 1 THEN sqrt((CAST(h AS DOUBLE) + CAST(1 AS DOUBLE))
                           / CAST(4503599627370496 AS DOUBLE))
               WHEN 2 THEN sqrt(sqrt((CAST(h AS DOUBLE) + CAST(1 AS DOUBLE))
                           / CAST(4503599627370496 AS DOUBLE)))
               ELSE sqrt(sqrt(sqrt((CAST(h AS DOUBLE) + CAST(1 AS DOUBLE))
                           / CAST(4503599627370496 AS DOUBLE))))
             END AS es_key
      FROM b)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id) AS INTEGER)
             AS draw_rank,
           doc_id, lang, CAST(weight AS INTEGER) AS weight, es_key
    FROM kx
    ORDER BY es_key DESC, doc_id
    LIMIT 16
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Judged weighted sampling without replacement over documents:
    weight tier = min(3, n_chars div 150) (longer docs up-weighted
    1/2/4/8 - the data-mixture knob a training pipeline turns), one
    deterministic uniform per doc from md5('esample1|' || doc_id), and
    the Efraimidis-Spirakis key u**(1/w) as an ITERATED SQRT (w = 2**
    tier), so P(doc drawn first) = w/sum(w) exactly and every arithmetic
    step is a correctly-rounded IEEE op both engines share bit-for-bit.

    k=16 draws; output is the full draw order (rank, doc, weight, key).
    Scale shape: one scan, JVM-only expressions, then TakeOrdered-16 —
    per-partition heaps + a 16-row merge; the permutation-not-sample
    twin is sample_global_shuffle_manifest. The statistical contract
    (selection frequency proportional to weight across seeds) is pinned
    by tests/test_weighted_sampling.py against a pure-numpy replica of
    the same formula."""
    from pyspark.sql import Window

    from reflex_spark.operators.sampling import weighted_sample_wor

    docs = load_tables(spark, sf_dir)["documents"]
    tier = F.least(F.lit(3), F.expr("n_chars div 150"))
    picked = weighted_sample_wor(
        docs.select("doc_id", "lang", "n_chars"),
        "doc_id",
        tier,
        k=16,
        seed="esample1",
    )
    w = Window.orderBy(F.col("__es_key").desc(), F.col("doc_id"))
    return picked.select(
        F.row_number().over(w).alias("draw_rank"),
        "doc_id",
        "lang",
        F.col("__w").alias("weight"),
        F.col("__es_key").alias("es_key"),
    )


@query(
    "pipeline_dsir_importance",
    # DSIR (Xie et al. 2023, "Data Selection for Language Models via
    # Importance Resampling"): hashed-unigram bucket distributions for a
    # target (eval-like) slice and the raw pool, per-doc average
    # log importance ratio.  Parity recipe: the bucket weight is ONE ln
    # over a fixed IEEE chain of correctly-rounded ops, per-token weights
    # sum through DECIMAL(38,18) (order-free), round(3) absorbs last-ulp
    # libm ln jitter, and `selected` compares the already-rounded score.
    oracle="""
    WITH tb AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(t), 1, 4))::INT AS BIGINT) % 256 AS b
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents)),
    counts AS (
      SELECT b,
             CAST(SUM(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ct,
             CAST(SUM(CASE WHEN doc_id % 97 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS cr
      FROM tb GROUP BY b),
    tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
                   CAST(SUM(cr) AS BIGINT) AS nr FROM counts),
    w AS (
      SELECT b,
             ln(((CAST(ct AS DOUBLE) + CAST(1.0 AS DOUBLE))
                 / (CAST(nt AS DOUBLE) + CAST(256.0 AS DOUBLE)))
                / ((CAST(cr AS DOUBLE) + CAST(1.0 AS DOUBLE))
                   / (CAST(nr AS DOUBLE) + CAST(256.0 AS DOUBLE)))) AS w
      FROM counts, tot),
    s AS (
      SELECT doc_id,
             CAST(SUM(CAST(w AS DECIMAL(38,18))) AS DOUBLE) AS s,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM tb JOIN w USING (b)
      WHERE doc_id % 97 <> 0
      GROUP BY doc_id)
    SELECT doc_id, k AS n_tokens,
           round(s / k, 3) AS avg_logratio,
           round(s / k, 3) > CAST(0.0 AS DOUBLE) AS selected
    FROM s
    """,
)
def pipeline_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting (Xie et al. 2023): score every raw-pool
    document by how target-like its hashed-unigram distribution is —
    avg over tokens of ln(p_target(bucket) / p_raw(bucket)), Laplace-
    smoothed over 256 md5 buckets — and flag docs whose (rounded) score
    is positive as selected for the target-matched training mixture.
    The target slice is the doc_id % 97 == 0 eval split (the same split
    decontamination uses), the raw pool is everything else.

    Plan: ONE token-bucket shuffle computes BOTH distributions
    (conditional partial aggregates — map-side combine, never two corpus
    scans), the 256-row weight table broadcasts into the scoring pass,
    and the per-doc aggregate is a second map-side-combined shuffle.  At
    100 TB the weight table is still 256 rows: the feature-distribution
    aggregate and the broadcast are corpus-size-free, which is exactly
    why DSIR uses hashed features instead of a vocabulary."""
    docs = load_tables(spark, sf_dir)["documents"]
    is_target = F.col("doc_id") % 97 == 0
    tb = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    ).select(
        "doc_id",
        (
            F.conv(F.substring(F.md5(F.col("t")), 1, 4), 16, 10).cast("long") % 256
        ).alias("b"),
    )
    counts = tb.groupBy("b").agg(
        F.sum(F.when(is_target, 1).otherwise(0)).alias("ct"),
        F.sum(F.when(~is_target, 1).otherwise(0)).alias("cr"),
    )
    tot = counts.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    w = counts.crossJoin(F.broadcast(tot)).select(
        "b",
        F.log(
            (
                (F.col("ct").cast("double") + F.lit(1.0))
                / (F.col("nt").cast("double") + F.lit(256.0))
            )
            / (
                (F.col("cr").cast("double") + F.lit(1.0))
                / (F.col("nr").cast("double") + F.lit(256.0))
            )
        ).alias("w"),
    )
    scored = (
        tb.where(~is_target)
        .join(F.broadcast(w), "b")
        .select("doc_id", F.col("w").cast("decimal(38,18)").alias("__w"))
    )
    avg = F.round(F.sum("__w").cast("double") / F.count(F.lit(1)), 3)
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        avg.alias("avg_logratio"),
        (avg > F.lit(0.0)).alias("selected"),
    )


@query(
    "pipeline_feature_normalize",
    # Winsorized z-scoring per language group — the standard feature-
    # normalization pass before training-data scoring/mixing. Exactness:
    # p10/p90 bounds are SELECTED data values at integer rank targets
    # (the (n*q + d - 1) // d ceil-division recipe, float-free), the
    # clip is integer LEAST/GREATEST, the moments sum through
    # DECIMAL(38,6) (order-free), and mean/var/z are the IDENTICAL fixed
    # chain of correctly-rounded IEEE ops in both engines; round(6) is
    # belt-and-braces.
    oracle="""
    WITH d AS (SELECT doc_id, lang, n_chars FROM documents),
    r AS (SELECT doc_id, lang, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY n_chars, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY lang) AS n
          FROM d),
    b AS (SELECT lang,
                 MAX(CASE WHEN rn = (n + 9) // 10 THEN n_chars END) AS lo,
                 MAX(CASE WHEN rn = (n * 9 + 9) // 10 THEN n_chars END) AS hi
          FROM r GROUP BY lang),
    wz AS (SELECT doc_id, d.lang,
                  LEAST(GREATEST(n_chars, lo), hi) AS w
           FROM d JOIN b ON d.lang = b.lang),
    s AS (SELECT lang,
                 CAST(SUM(CAST(w AS DECIMAL(38,6))) AS DOUBLE) AS sw,
                 CAST(SUM(CAST(w * w AS DECIMAL(38,6))) AS DOUBLE) AS sww,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM wz GROUP BY lang),
    st AS (SELECT lang, sw / n AS mean,
                  (sww / n) - (sw / n) * (sw / n) AS var FROM s)
    SELECT wz.doc_id, wz.lang, CAST(w AS BIGINT) AS winsorized,
           CASE WHEN var > CAST(0 AS DOUBLE)
                THEN round((CAST(w AS DOUBLE) - mean) / sqrt(var), 6)
                ELSE CAST(0 AS DOUBLE) END AS zscore
    FROM wz JOIN st ON wz.lang = st.lang
    """,
)
def pipeline_feature_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group (language) feature normalization: winsorize n_chars at
    the exact p10/p90 ranks, then z-score against the winsorized
    moments — the clip-then-standardize pass every feature pipeline runs
    before thresholding or mixing scores across heterogeneous groups.

    Plan: one window pass per group ranks values (the percentile bounds
    are selections, not interpolations — integer-exact), the tiny
    per-group bounds/moments tables broadcast back into the scan, and
    the z expression is JVM scalar math.  At 100 TB the ranks come from
    the same window (or a two-pass count + rank-target scan); the
    moments are one map-side-combined aggregate — nothing here holds
    more than O(groups) driver-side."""
    from pyspark.sql import Window

    docs = load_tables(spark, sf_dir)["documents"]
    d = docs.select("doc_id", "lang", "n_chars")
    w_rank = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    r = d.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("lang"))
    )
    b = r.groupBy("lang").agg(
        F.max(F.when(F.expr("rn = (n + 9) div 10"), F.col("n_chars"))).alias("lo"),
        F.max(F.when(F.expr("rn = (n * 9 + 9) div 10"), F.col("n_chars"))).alias("hi"),
    )
    wz = d.join(F.broadcast(b), "lang").select(
        "doc_id", "lang", F.least(F.greatest("n_chars", F.col("lo")), F.col("hi")).alias("w")
    )
    s = wz.groupBy("lang").agg(
        F.sum(F.col("w").cast("decimal(38,6)")).cast("double").alias("sw"),
        F.sum((F.col("w") * F.col("w")).cast("decimal(38,6)")).cast("double").alias("sww"),
        F.count(F.lit(1)).alias("n"),
    )
    st = s.select(
        "lang",
        (F.col("sw") / F.col("n")).alias("mean"),
        (
            (F.col("sww") / F.col("n"))
            - (F.col("sw") / F.col("n")) * (F.col("sw") / F.col("n"))
        ).alias("var"),
    )
    return wz.join(F.broadcast(st), "lang").select(
        "doc_id",
        "lang",
        F.col("w").cast("long").alias("winsorized"),
        F.when(
            F.col("var") > F.lit(0.0),
            F.round((F.col("w").cast("double") - F.col("mean")) / F.sqrt("var"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("zscore"),
    )


from reflex_spark.operators.sampling import group_split, sql_group_split  # noqa: E402
from reflex_spark.queries.helpers import sql_dsum  # noqa: E402

_SPLIT_FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


@query(
    "pipeline_group_split_leakage_free",
    # Group-aware train/val/test split (r12): every USER lands atomically
    # in one split — the property a row-level random split violates and
    # the one that actually protects an eval set from memorization. The
    # assignment is a salted md5 bucket of the group key (reproducible
    # on any engine/cluster), the oracle replays the identical CASE, and
    # the in-query pin proves zero leakage: no user appears in two
    # splits AND per-split distinct users sum exactly to the global
    # distinct count (a row-level split fails both within one fixture).
    oracle=f"""
    WITH s AS (
      SELECT user_id, value,
             {sql_group_split('user_id', {'train': 0.8, 'val': 0.1, 'test': 0.1})}
               AS split
      FROM events)
    SELECT split,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM s GROUP BY split
    """,
)
def pipeline_group_split_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free split assignment over events grouped by user
    (operators/sampling.group_split): 80/10/10 by salted content hash
    of user_id.  Distinct from sample_train_val_test_split (round 6):
    there the unit of rows IS the unit of splitting (one doc, one row),
    so group atomicity is vacuous; here each user owns MANY event rows
    and a row-level split would scatter them across train and eval —
    the leakage the audit below would catch.  In-query pins: (1) zero users straddle splits — the
    leakage audit itself, one distinct-count aggregate; (2) the three
    splits partition the user set exactly (sum of per-split distinct
    users == global distinct users).  Judged columns are the per-split
    exact user/event counts and decimal value sums.

    Scale: the hash decision is a pure JVM expression per row (no
    shuffle to ASSIGN); the leakage audit is one groupBy(user) —
    map-side-combinable — and would be run once per dataset release, not
    per batch."""
    ev = load_tables(spark, sf_dir)["events"]
    s = group_split(ev, "user_id", _SPLIT_FRACS).select(
        "user_id", "value", "split"
    )
    leak = (
        s.groupBy("user_id")
        .agg(F.countDistinct("split").alias("ns"))
        .where(F.col("ns") > 1)
        .count()
    )
    if leak:
        raise AssertionError(f"group split leaked {leak} users across splits")
    per = s.groupBy("split").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )
    tot = s.agg(F.countDistinct("user_id").alias("g")).collect()[0]["g"]
    ssum = per.agg(F.sum("n_users").alias("s")).collect()[0]["s"]
    if ssum != tot:
        raise AssertionError(
            f"splits do not partition users: sum {ssum} != global {tot}"
        )
    return per.select(
        "split",
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value",
    )


@query(
    "cogroup_click_purchase_attribution",
    # The COGROUP pandas surface (r12): groupBy().cogroup().applyInPandas
    # — the per-key two-sided merge no other UDF entry exercises
    # (completes the matrix: scalar pandas UDF, GROUPED_AGG UDAF,
    # mapInPandas, applyInPandas, applyInPandasWithState, UDTF). Each
    # user's purchases and clicks arrive as two aligned pandas frames;
    # the kernel counts purchases with >= 1 click in the preceding hour
    # (last-touch attribution) via numpy searchsorted over integer
    # microseconds — exact arithmetic, no float, so the oracle's EXISTS
    # subquery replays it bit-for-bit.
    oracle="""
    WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
          WHERE event_type = 'click')
    SELECT p.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN EXISTS (
                  SELECT 1 FROM c
                  WHERE c.user_id = p.user_id
                    AND c.ts <= p.ts
                    AND c.ts >= p.ts - INTERVAL 1 HOUR)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed
    FROM p GROUP BY p.user_id
    """,
)
def cogroup_click_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution through the cogrouped-map pandas API:
    purchases and clicks are grouped by user INDEPENDENTLY and handed to
    one Python kernel as two frames per key — the surface for per-entity
    two-stream logic (sessionized funnels, trade/quote alignment,
    label/feature joins) when the merge rule outgrows SQL.  Here the
    rule is deliberately SQL-expressible (count purchases with a click
    in the trailing hour) so the DuckDB EXISTS oracle can replay it —
    what is judged is the cogroup machinery: group alignment, two-sided
    Arrow transfer, empty-side handling (users with purchases but no
    clicks must still emit with n_attributed = 0).

    Exactness: timestamps compare as int64 microseconds via numpy
    searchsorted — pure integer arithmetic. Scale: one shuffle per side
    on user_id (co-partitioned by the cogroup), kernel memory = one
    user's rows; 100 TB posture is per-key boundedness, same as
    applyInPandas."""
    import pandas as pd

    from reflex_spark.operators.dedup import _spread_target

    ev = load_tables(spark, sf_dir)["events"]
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    # The cogroup's per-group work is Python, so its cost scales with
    # GROUP COUNT, not bytes — but AQE sizes the cogroup exchange by
    # bytes and coalesces the KB-sized shuffle to ONE partition,
    # serializing every group through a single worker (measured at
    # sf0.1: 8.9s @ 1 task; 1.4s @ 16). Explicit co-partitioning on the
    # grouping key is exempt from AQE coalescing and satisfies the
    # cogroup's required distribution (no extra exchange), so the spread
    # is free; per-group results are partitioning-invariant. The width
    # is estimate-driven (dedup._spread_target): the measured Python
    # sweet spot at small inputs, one task per ~32 MB at scale.
    n_spread = _spread_target(p.unionByName(c), sweet_spot=16)
    p = p.repartition(n_spread, "user_id")
    c = c.repartition(n_spread, "user_id")

    def attribute(purchases: pd.DataFrame, clicks: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if purchases.empty:
            # clicks-only users produce no output row (oracle groups on p)
            return pd.DataFrame(
                {"user_id": pd.Series(dtype="int64"),
                 "n_purchases": pd.Series(dtype="int64"),
                 "n_attributed": pd.Series(dtype="int64")}
            )
        pts = purchases["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        cts = np.sort(
            clicks["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        )
        # a purchase is attributed iff some click lands in [ts-1h, ts]:
        # count of clicks < ts-1h  <  count of clicks <= ts
        lo = np.searchsorted(cts, pts - 3_600_000_000, side="left")
        hi = np.searchsorted(cts, pts, side="right")
        return pd.DataFrame(
            {
                "user_id": [int(purchases["user_id"].iloc[0])],
                "n_purchases": [int(len(pts))],
                "n_attributed": [int((hi > lo).sum())],
            }
        )

    return (
        p.groupBy("user_id")
        .cogroup(c.groupBy("user_id"))
        .applyInPandas(
            attribute, "user_id long, n_purchases long, n_attributed long"
        )
    )


def _dq_expectations():
    """The shared expectation lists for the data-quality judged query —
    built once so the Spark plan and the generated oracle SQL cannot
    drift (operators/validate.sql_validate renders the SQL twin from the
    SAME objects)."""
    from reflex_spark.operators import validate as V

    orders_exps = [
        V.is_complete("o_custkey"),
        V.is_unique("o_orderkey"),
        V.has_min("o_totalprice", lo=0.0),
        V.has_mean("o_totalprice", lo=1000.0, hi=500000.0),
        V.in_set_ratio("o_orderstatus", ["F", "O", "P"], at_least=1.0),
        V.has_size(lo=1.0),
    ]
    docs_exps = [
        V.is_complete("text"),
        V.is_unique("doc_id"),
        # intentionally failing check: the fixture also contains zh/es —
        # pins that the report records failures instead of being
        # vacuously green
        V.in_set_ratio("lang", ["en", "de", "fr"], at_least=1.0),
        V.matches_ratio("source", "^src[0-9]+$", at_least=1.0),
        V.has_mean("n_chars", lo=1.0),
    ]
    return orders_exps, docs_exps


def _dq_oracle() -> str:
    from reflex_spark.operators.validate import sql_validate

    o, d = _dq_expectations()
    return f"""
    SELECT 'orders' AS table_name, * FROM ({sql_validate('orders', o)})
    UNION ALL
    SELECT 'documents' AS table_name, * FROM ({sql_validate('documents', d)})
    """


@query("pipeline_data_quality_report", oracle=_dq_oracle())
def pipeline_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative data validation in ONE aggregation pass per
    table (operators/validate): completeness, exact uniqueness, range,
    decimal-mean, set-membership ratio, regex-conformance ratio, and size
    expectations — each metric an algebraic aggregate whose partials
    combine map-side, so the 11-expectation suite costs exactly two scans
    (one per table), not eleven. One documents check (lang ⊆ {en,de,fr})
    intentionally FAILS on the fixture, pinning that the report surfaces
    failures. The oracle SQL is GENERATED from the same expectation
    objects (sql_validate), so Spark plan and oracle cannot drift.

    Reference scope: the reference validates events structurally at ingest
    (typed payload decode); this extends that contract to table-level
    expectations a training pipeline gates corpus releases on."""
    from reflex_spark.operators.validate import validate

    t = load_tables(spark, sf_dir)
    o, d = _dq_expectations()
    rep_o = validate(t["orders"], o).select(
        F.lit("orders").alias("table_name"), "*"
    )
    rep_d = validate(t["documents"], d).select(
        F.lit("documents").alias("table_name"), "*"
    )
    return rep_o.unionByName(rep_d)
