"""Source/sink format breadth: CSV and ORC round-trips through the same
layout-cache pattern as layout_queries.py (write once per (tmp, sf), read
many). The reference ingests JSON-over-Kafka and serves from Pinot
segments; a Spark engine replacing it must also read/write the warehouse
interchange formats losslessly. JSON is covered by `json_roundtrip`;
parquet is the native path everywhere else.

Schema discipline: CSV is read with an EXPLICIT schema (inference is a
full extra pass over 100 TB and non-deterministic under promotion), ORC
carries its own types. Timestamps round-trip through ISO-8601 text in CSV
— the query proves microsecond fidelity by aggregating on the parsed
value.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.ops.layout import materialize_once
from topk_spark.workload import register
from topk_spark.workload.layout_queries import _layout_root


def _csv_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → CSV (header, ISO timestamps) → read back with explicit
    schema. props (free text with commas) is quoted by the writer."""
    path = materialize_once(
        _layout_root(sf_dir, "events_csv"),
        lambda p: load_table(spark, sf_dir, "events")
        .repartition(8)
        .write.mode("overwrite")
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(p),
    )
    return spark.read.csv(
        path,
        header=True,
        schema="event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
        timestampFormat="yyyy-MM-dd HH:mm:ss.SSSSSS",
    )


def _orc_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = materialize_once(
        _layout_root(sf_dir, "lineitem_orc"),
        lambda p: load_table(spark, sf_dir, "lineitem")
        .repartition(8)
        .write.mode("overwrite")
        .orc(p),
    )
    return spark.read.orc(path)


@register(
    "csv_roundtrip_agg",
    tags=("io", "format"),
    oracle="""
SELECT event_type,
       count(*) AS n,
       count(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS sum_value_cents,
       min(ts) AS first_ts,
       max(ts) AS last_ts
FROM events
GROUP BY event_type
""",
)
def csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate per event_type from the CSV copy of events; the oracle
    recomputes from the parquet source, so a hash match proves the CSV
    round-trip preserves every type exactly — bigints, doubles, quoted
    free text, and microsecond timestamps (min/max ts are in the output
    on purpose). Explicit read schema keeps the scan single-pass."""
    c = _csv_events(spark, sf_dir)
    return c.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
        .cast("long")
        .alias("sum_value_cents"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@register(
    "orc_roundtrip_agg",
    tags=("io", "format"),
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       count(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * 100) AS BIGINT)
         AS sum_qty_cents,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT)
         AS sum_price_cents
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary-shaped aggregate from the ORC copy of lineitem
    (columnar like parquet: projection pushdown and predicate stats
    apply the same way — `.explain` shows the same PushedFilters
    machinery). Oracle recomputes from parquet; a hash match proves the
    ORC round-trip is lossless."""
    o = _orc_lineitem(spark, sf_dir)
    return o.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum((F.col("l_quantity").cast("decimal(18,2)") * 100).cast("long"))
        .cast("long")
        .alias("sum_qty_cents"),
        F.sum(
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
        )
        .cast("long")
        .alias("sum_price_cents"),
    )


# ---------------------------------------------------------------------------
# Schema evolution: mergeSchema across generations of a table
# ---------------------------------------------------------------------------

_EVO_CUTOVER = "2024-01-16"


def _evolved_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two generations of the events table on disk: v1 (before the
    cutover) lacks `event_type`; v2 carries it. Read back as one table
    with mergeSchema — the layout every long-lived 100 TB table ends up
    with after a column is added mid-life."""
    def build(p: str) -> None:
        e = load_table(spark, sf_dir, "events")
        (
            e.filter(F.to_date("ts") < F.lit(_EVO_CUTOVER))
            .select("event_id", "ts", "user_id", "value")
            .repartition(4)
            .write.mode("overwrite")
            .parquet(os.path.join(p, "gen=1"))
        )
        (
            e.filter(F.to_date("ts") >= F.lit(_EVO_CUTOVER))
            .select("event_id", "ts", "user_id", "value", "event_type")
            .repartition(4)
            .write.mode("overwrite")
            .parquet(os.path.join(p, "gen=2"))
        )
        open(os.path.join(p, "_SUCCESS"), "w").close()

    path = materialize_once(_layout_root(sf_dir, "events_evolved"), build)
    return spark.read.option("mergeSchema", True).parquet(
        os.path.join(path, "gen=1"), os.path.join(path, "gen=2")
    )


@register(
    "schema_evolution_read",
    tags=("io", "schema"),
    oracle=f"""
SELECT CASE WHEN CAST(ts AS DATE) < DATE '{_EVO_CUTOVER}'
            THEN '__legacy__' ELSE event_type END AS event_type,
       count(*) AS n,
       count(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
         AS sum_value_cents
FROM events
GROUP BY 1
""",
)
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate across both generations of the evolved layout:
    `mergeSchema` unifies the footers, rows from the pre-cutover
    generation surface `event_type` as NULL (mapped to '__legacy__'), and
    every other column keeps full fidelity — the oracle recomputes from
    the single-generation source with a CASE on the cutover date, so a
    hash match proves old files stay readable and correctly typed after
    the column add. At 100 TB, footer merging is a planning-time cost —
    cap generations by rewriting old partitions lazily, not by a big-bang
    migration."""
    ev = _evolved_events(spark, sf_dir)
    return (
        ev.select(
            F.coalesce(F.col("event_type"), F.lit("__legacy__")).alias(
                "event_type"
            ),
            "user_id",
            "value",
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("sum_value_cents"),
        )
    )


@register(
    "props_json_extract",
    tags=("io", "json"),
    oracle="""
SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
         AS sum_value_cents
FROM events
GROUP BY 1
""",
)
def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured mid-pipeline extraction: the free-form `props` JSON
    column is parsed with an explicit schema (`from_json` — JVM-side,
    no Python; schema-on-read, not inference) and the extracted field
    drives the aggregation. At 100 TB the discipline is the same as CSV:
    declare the fields you need, let the parser skip the rest, keep the
    raw string column prunable. Oracle extracts the same path with
    DuckDB's JSON functions."""
    e = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        e.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("sum_value_cents"),
        )
    )
