"""OLAP + training-pipeline utility operators: deterministic train/test
split, skew-safe heavy hitters, exact percentiles, and pivot.

These are engine-generic capabilities a 100 TB training-data pipeline needs
on top of the reference's serving surface. Each is chosen to have an exact
cross-engine oracle (md5 and linear-interpolation percentiles are
bit-identical between Spark and DuckDB — verified, not assumed).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.workload import register


def hash_bucket(col: F.Column, buckets: int = 100) -> F.Column:
    """Deterministic, engine-portable bucket in [0, buckets): first 8 hex
    chars of md5 of the id's decimal string. Stable across runs, engines,
    partitionings — the property a train/test split must have so that
    re-running the pipeline (or running it on another engine) never migrates
    a document across the split."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
    return (h % buckets).cast("int")


@register(
    "train_test_split",
    tags=("PIPE-split",),
    oracle="""
WITH b AS (
  SELECT doc_id, n_chars, lang,
         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              % 100 AS INT) AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train' ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
FROM b
GROUP BY 1
ORDER BY split
""",
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 train/test split by md5 hash-bucket of doc_id — deterministic
    and partition-independent (no rand(), no sampleBy): shuffling 100 TB
    never changes an example's split. The query reports per-split document
    counts as the verifiable projection of the assignment."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("bucket", hash_bucket(F.col("doc_id"), 100))
        .withColumn(
            "split", F.when(F.col("bucket") < 80, "train").otherwise("test")
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
        .orderBy("split")
    )


@register(
    "heavy_hitters_salted",
    tags=("A4", "G4", "SKEW"),
    oracle="""
SELECT user_id, count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
ORDER BY n_events DESC, user_id ASC
LIMIT 20
""",
)
def heavy_hitters_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via an explicit two-stage salted aggregate: stage 1
    groups by (user_id, salt) — a hot key's rows spread across 16 reducers —
    stage 2 merges the partials. Identical results to the direct group-by
    (the oracle IS the direct group-by); the point is the plan shape, which
    survives a key owning 10% of 100 TB. Spark's partial aggregation does
    this implicitly for simple sums; the explicit salt is the pattern for
    non-combinable aggregates and demonstrates the skew strategy AQE
    complements."""
    e = load_table(spark, sf_dir, "events")
    salted = (
        e.withColumn("salt", (F.pmod(F.xxhash64("event_id"), F.lit(16))).cast("int"))
        .groupBy("user_id", "salt")
        .agg(
            F.count("*").alias("pc"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("pv"),
        )
    )
    return (
        salted.groupBy("user_id")
        .agg(
            F.sum("pc").alias("n_events"),
            F.sum("pv").cast("double").alias("total_value"),
        )
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(20)
    )


@register(
    "value_percentiles",
    tags=("A4", "PCTL"),
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.90), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (Spark `percentile`
    == DuckDB `quantile_cont`, same interpolation — verified). Exact
    percentile is a sort-based aggregate; at 100 TB swap in
    `approx_percentile` (t-digest, mergeable, one pass) — same call shape,
    documented trade."""
    e = load_table(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.25, 0.5, 0.9, 0.99))")
    return (
        e.groupBy("event_type")
        .agg(pct.alias("p"))
        .select(
            "event_type",
            F.round(F.col("p")[0], 6).alias("p25"),
            F.round(F.col("p")[1], 6).alias("p50"),
            F.round(F.col("p")[2], 6).alias("p90"),
            F.round(F.col("p")[3], 6).alias("p99"),
        )
        .orderBy("event_type")
    )


@register(
    "event_type_pivot",
    tags=("PIVOT",),
    oracle="""
SELECT user_id,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS views,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS clicks,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchases,
       CAST(count(*) FILTER (event_type NOT IN ('view','click','purchase'))
            AS BIGINT) AS other
FROM events
GROUP BY user_id
""",
)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event types to columns via conditional aggregation — the
    fixed-vocabulary form that keeps the plan a single hash aggregate (no
    second pass to discover pivot values, which at 100 TB would be its own
    full scan)."""
    e = load_table(spark, sf_dir, "events")

    def cnt(pred):
        return F.sum(F.when(pred, 1).otherwise(0)).cast("long")

    t = F.col("event_type")
    return e.groupBy("user_id").agg(
        cnt(t == "view").alias("views"),
        cnt(t == "click").alias("clicks"),
        cnt(t == "purchase").alias("purchases"),
        cnt(~t.isin("view", "click", "purchase")).alias("other"),
    )


@register(
    "corpus_curation_pipeline",
    tags=("PIPE-e2e", "DD-exact", "TXT-quality", "PIPE-split"),
    oracle="""
WITH dedup AS (
  SELECT min_by(documents, doc_id) AS d FROM documents GROUP BY md5(text)
),
flat AS (
  SELECT d.doc_id AS doc_id, d.text AS text, d.lang AS lang FROM dedup
),
quality AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM flat
  WHERE len(string_split(text, ' ')) >= 20
),
split AS (
  SELECT lang, n_tokens,
         CASE WHEN CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 100 AS INT) < 80
              THEN 'train' ELSE 'test' END AS split
  FROM quality
)
SELECT split, lang,
       count(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(SUM(n_tokens) AS DOUBLE) / count(*), 6) AS avg_tokens
FROM split
GROUP BY split, lang
ORDER BY split, lang
""",
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus curation in ONE dataflow: exact dedup
    (content-hash, min-doc_id canonical) → quality gate (token floor) →
    deterministic hash-bucket train/test split → per-(split, lang) corpus
    stats. The whole pipeline is three narrow stages + two shuffles (dedup
    hash, final group-by); no stage carries document text past the point
    it's needed — at 100 TB the shuffle payload after dedup is (doc_id,
    lang, n_tokens), ~20 bytes/doc."""
    from topk_spark.ops.dedup import dedup_first_seen
    from topk_spark.workload.olap_queries import hash_bucket

    d = load_table(spark, sf_dir, "documents")
    deduped = dedup_first_seen(
        d.withColumn("text_md5", F.md5("text")),
        ["text_md5"],
        [F.col("doc_id").asc()],
    )
    quality = deduped.select(
        "doc_id", "lang", F.size(F.split("text", " ", -1)).cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") >= 20)
    split = quality.withColumn(
        "split",
        F.when(hash_bucket(F.col("doc_id"), 100) < 80, "train").otherwise("test"),
    )
    return (
        split.groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.sum("n_tokens").cast("double") / F.count("*"), 6).alias(
                "avg_tokens"
            ),
        )
        .orderBy("split", "lang")
    )


@register(
    "window_functions_suite",
    tags=("W-rank", "W-offset", "W-cume"),
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER w AS INT) AS rn,
       CAST(dense_rank() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderpriority) AS INT) AS prio_rank,
       round(percent_rank() OVER w, 6) AS pct_rank,
       CAST(lag(o_orderkey) OVER w AS BIGINT) AS prev_orderkey,
       CAST(lead(o_orderkey) OVER w AS BIGINT) AS next_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
FROM orders
WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-window surface beyond row_number: offset (lag/lead),
    rank-family (dense_rank, percent_rank), and a running frame — all
    sharing ONE partition sort where the spec allows (Catalyst collapses
    same-spec Window operators; the differently-keyed dense_rank gets its
    own). Running sum in decimal so accumulation order can't change the
    answer."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wprio = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("int").alias("rn"),
        F.dense_rank().over(wprio).cast("int").alias("prio_rank"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.lag("o_orderkey").over(w).cast("long").alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).cast("long").alias("next_orderkey"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .over(wrun)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "gap_fill_minutes",
    tags=("T3", "RESHAPE"),
    oracle="""
WITH mins AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-01 01:59:00',
                                INTERVAL 1 MINUTE)) AS minute
),
types AS (SELECT DISTINCT event_type FROM events),
grid AS (SELECT t.event_type, m.minute FROM types t CROSS JOIN mins m),
counts AS (
  SELECT event_type, date_trunc('minute', ts) AS minute,
         count(*) AS n, CAST(round(SUM(value), 2) AS DOUBLE) AS total_value
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <  TIMESTAMP '2024-01-01 02:00:00'
  GROUP BY event_type, date_trunc('minute', ts)
)
SELECT g.event_type, CAST(g.minute AS VARCHAR) AS minute,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n,
       coalesce(c.total_value, 0.0) AS total_value
FROM grid g LEFT JOIN counts c
  ON g.event_type = c.event_type AND g.minute = c.minute
""",
)
def gap_fill_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense time series from sparse events: a generated (type × minute)
    grid left-joined onto per-minute aggregates so silent minutes appear as
    explicit zeros (dashboards and anomaly detectors need the gaps). The
    grid is sequence()+explode — generated, never scanned — and is tiny
    relative to the fact, so the join broadcasts the aggregated side or the
    grid, never the raw events."""
    e = load_table(spark, sf_dir, "events")
    lo, hi = "2024-01-01 00:00:00", "2024-01-01 02:00:00"
    mins = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit(lo)),
                F.to_timestamp(F.lit("2024-01-01 01:59:00")),
                F.expr("INTERVAL 1 MINUTE"),
            )
        ).alias("minute")
    )
    types = e.select("event_type").distinct()
    grid = types.crossJoin(mins)
    counts = (
        e.filter(
            (F.col("ts") >= F.to_timestamp(F.lit(lo)))
            & (F.col("ts") < F.to_timestamp(F.lit(hi)))
        )
        .groupBy("event_type", F.date_trunc("minute", "ts").alias("minute"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).cast("double").alias("total_value"),
        )
    )
    return (
        grid.join(counts, ["event_type", "minute"], "left")
        .select(
            "event_type",
            F.col("minute").cast("string").alias("minute"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
    )


@register(
    "nation_revenue_share",
    tags=("A5", "W-share"),
    oracle="""
WITH rev AS (
  SELECT n.n_name AS nation,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT nation, revenue,
       round(CAST(revenue AS DOUBLE)
             / CAST((SELECT SUM(revenue) FROM rev) AS DOUBLE), 6) AS share
FROM rev
""",
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total contribution per nation. The global denominator is a
    one-row aggregate cross-joined (broadcast) onto the per-nation rows —
    NOT an empty-partition window (sum() OVER () collapses everything to a
    single task at scale). Dims broadcast onto the orders fact; two
    aggregates total."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("revenue")
        )
    )
    total = rev.agg(F.sum("revenue").alias("total"))
    return (
        rev.crossJoin(F.broadcast(total))
        .select(
            "nation",
            "revenue",
            F.round(
                F.col("revenue").cast("double") / F.col("total").cast("double"),
                6,
            ).alias("share"),
        )
    )


@register(
    "value_quantity_correlation",
    tags=("A-stats",),
    oracle="""
SELECT event_type,
       round(corr(CAST(json_extract(props, '$.k') AS INT), value), 6) AS corr_k_value,
       round(covar_samp(CAST(json_extract(props, '$.k') AS INT), value), 6)
         AS covar_k_value,
       round(stddev_samp(value), 6) AS stddev_value
FROM events
GROUP BY event_type
""",
)
def value_quantity_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group — Pearson correlation, sample
    covariance, sample stddev — as single-pass partial+final aggregates
    (Spark's moment accumulators merge associatively, so map-side combine
    works and no row leaves its partition unaggregated). The correlation
    feature screen every feature-engineering pass runs."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.round(F.corr(k, F.col("value")), 6).alias("corr_k_value"),
        F.round(F.covar_samp(k, F.col("value")), 6).alias("covar_k_value"),
        F.round(F.stddev_samp("value"), 6).alias("stddev_value"),
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence: bounded within-group self-join
# ---------------------------------------------------------------------------


@register(
    "copurchase_pairs",
    tags=("analytics", "pairs"),
    oracle="""
SELECT a.l_partkey AS part_a,
       b.l_partkey AS part_b,
       count(*) AS n_orders
FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
HAVING count(*) >= 2
""",
)
def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequently co-purchased part pairs: self-join WITHIN each order
    (equi-join on l_orderkey + a.part < b.part), then count pair
    occurrences across orders. The join is bounded by items-per-order
    (~O(7²) rows per order, independent of corpus size), so unlike a
    global pair join it scales linearly with order count — the same
    within-group-only pair expansion discipline as the LSH bucket joins
    in ops/fuzzy_dedup. Distinct (order, part) first so quantity-split
    line items don't double-count a pair."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(
        "l_orderkey", F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        "l_orderkey", F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


@register(
    "topk_with_ties",
    tags=("K2", "topk"),
    oracle="""
WITH freq AS (
  SELECT l_returnflag, l_quantity, count(*) AS cnt
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT *, RANK() OVER (PARTITION BY l_returnflag
                         ORDER BY cnt DESC) AS rnk
  FROM freq
)
SELECT l_returnflag, l_quantity, cnt, rnk
FROM ranked WHERE rnk <= 3
""",
)
def topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent order quantities per return flag, top-3 WITH TIES
    (`rank() <= k`): tied frequencies share a rank and all survive, so no
    arbitrary tiebreak ever drops a row that is genuinely top-k — the
    deterministic way to top-k a coarse integer metric
    (ops/topk.py:rank_topk_with_ties). Pre-aggregation shrinks the fact
    to (flag, quantity) groups before the window, so the rank pass sees
    O(flags × quantities) rows."""
    from topk_spark.ops.topk import rank_topk_with_ties

    li = load_table(spark, sf_dir, "lineitem")
    freq = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("cnt")
    )
    return rank_topk_with_ties(
        freq, ["l_returnflag"], [F.desc("cnt")], 3
    ).select("l_returnflag", "l_quantity", "cnt", "rnk")
