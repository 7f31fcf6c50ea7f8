"""Storage-encoding audits — round-2d layout batch: the queries a
columnar-store operator runs to SIZE encodings before committing a layout
(the Pinot/parquet question "will delta + RLE pay off on this sort
order?"), answered as distributed queries over the data itself.

- ``delta_bitwidth_stats``: per-user timestamp deltas under the
  (user_id, ts) sort order → bit-width histogram (length of the binary
  string — no float log2) plus the projected delta-encoding savings vs
  raw 64-bit storage, in exact ppm.
- ``rle_run_stats``: run-length statistics of event_type under the same
  sort order: runs, rows, mean run length (milli), RLE ratio (ppm) per
  type. A column whose runs/rows ppm is low is an RLE win.

Both reduce after ONE shuffle on the sort key prefix (user_id): the
windows are in-partition, and only (bitwidth | type)-level aggregates
leave the second stage. All metrics integer (bin-string lengths, BIGINT
floors) — hash-exact against DuckDB, whose bin() matches Spark's
(bin(0)='0', no leading zeros).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from topk_spark.io.sources import load_table
from topk_spark.workload import register

_DELTA_ORACLE = """
WITH s AS (
  SELECT user_id, epoch_ms(ts) AS ms, event_id,
         lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_ms(ts), event_id) AS prev
  FROM events
),
d AS (
  SELECT length(bin(ms - prev)) AS bitwidth FROM s WHERE prev IS NOT NULL
),
h AS (
  SELECT bitwidth, count(*)::BIGINT AS cnt FROM d GROUP BY bitwidth
),
tot AS (
  SELECT SUM(cnt) AS n, SUM(bitwidth * cnt) AS delta_bits FROM h
)
SELECT h.bitwidth::INT AS bitwidth, h.cnt,
       CAST(h.cnt * 1000000 // tot.n AS BIGINT) AS share_ppm,
       CAST((64 * tot.n - tot.delta_bits) * 1000000 // (64 * tot.n) AS BIGINT)
         AS total_savings_ppm
FROM h CROSS JOIN tot
ORDER BY bitwidth
"""


@register("delta_bitwidth_stats", tags=("LAYOUT-encode",), oracle=_DELTA_ORACLE)
def delta_bitwidth_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-width histogram of per-user timestamp deltas (the delta-encoding
    sizing audit). Bit width = length of the binary string — integer both
    engines, no float log2. total_savings_ppm repeats on every row (the
    single-number verdict riding along the histogram).

    100 TB posture: one shuffle on user_id, in-partition lag, then a
    ≤64-group aggregate; the cross-joined total is a broadcast scalar."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    s = e.select(
        "user_id",
        F.unix_millis("ts").alias("ms"),
        "event_id",
    ).withColumn("prev", F.lag(F.col("ms")).over(w))
    d = s.filter(F.col("prev").isNotNull()).select(
        F.length(F.bin(F.col("ms") - F.col("prev"))).alias("bitwidth")
    )
    h = d.groupBy("bitwidth").agg(F.count("*").alias("cnt"))
    tot = h.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("bitwidth") * F.col("cnt")).alias("delta_bits"),
    )
    return (
        h.crossJoin(F.broadcast(tot))
        .select(
            F.col("bitwidth").cast("int").alias("bitwidth"),
            "cnt",
            # integral div mirrors the oracle's exact '//' (decimal-widened
            # where cnt·1e6 outgrows 2^53 at full-corpus row counts)
            F.expr(
                "CAST(CAST(cnt AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)"
            ).alias("share_ppm"),
            F.expr(
                "CAST((64 * CAST(n AS DECIMAL(38,0)) - delta_bits) * 1000000"
                " div (64 * CAST(n AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("total_savings_ppm"),
        )
        .orderBy("bitwidth")
    )


_RLE_ORACLE = """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_ms(ts), event_id) AS prev
  FROM events
),
m AS (
  SELECT event_type,
         count(*)::BIGINT AS rows_,
         SUM(CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0
             END)::BIGINT AS runs
  FROM s GROUP BY event_type
)
SELECT event_type, rows_ AS n_rows, runs AS n_runs,
       CAST(rows_ * 1000 // runs AS BIGINT) AS mean_run_milli,
       CAST(runs * 1000000 // rows_ AS BIGINT) AS rle_ratio_ppm
FROM m
ORDER BY event_type
"""


@register("rle_run_stats", tags=("LAYOUT-encode",), oracle=_RLE_ORACLE)
def rle_run_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length statistics of event_type under the (user_id, ts) sort
    order — the RLE sizing audit: runs/rows ppm is the encoded-to-raw
    ratio. A run starts at a partition head or a value change (lag-based,
    in-partition after the one user_id shuffle)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    s = e.select("user_id", "event_type", F.unix_millis("ts").alias("ms"), "event_id")
    s = s.withColumn("prev", F.lag("event_type").over(w))
    m = s.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.sum(
            (
                F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
            ).cast("long")
        ).alias("n_runs"),
    )
    return m.select(
        "event_type",
        "n_rows",
        "n_runs",
        # integral div mirrors the oracle's exact '//' (decimal-widened)
        F.expr(
            "CAST(CAST(n_rows AS DECIMAL(38,0)) * 1000 div n_runs AS BIGINT)"
        ).alias("mean_run_milli"),
        F.expr(
            "CAST(CAST(n_runs AS DECIMAL(38,0)) * 1000000 div n_rows"
            " AS BIGINT)"
        ).alias("rle_ratio_ppm"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Dictionary-encoding benefit audit (completes the encoding trio)
# ---------------------------------------------------------------------------

# Dictionary encoding pays when cardinality ≪ rows: each value becomes an
# index of ceil(log2(card)) bits (binary-string length of card−1) plus the
# dictionary itself. Columns audited with their plain widths (bits/value
# as stored unencoded: strings ≈ 8·avg_len, bigints 64).
_DICT_ORACLE = """
WITH per_col AS (
  SELECT 'event_type' AS col, count(DISTINCT event_type)::BIGINT AS card,
         count(*)::BIGINT AS n_rows,
         CAST(8 * SUM(length(event_type)) // count(*) AS BIGINT) AS plain_bits
  FROM events
  UNION ALL
  SELECT 'user_id', count(DISTINCT user_id), count(*), 64 FROM events
  UNION ALL
  SELECT 'event_id', count(DISTINCT event_id), count(*), 64 FROM events
),
m AS (
  SELECT col, card, n_rows, plain_bits,
         CASE WHEN card <= 1 THEN 1
              ELSE length(bin(card - 1)) END AS index_bits
  FROM per_col
)
SELECT col, card, n_rows, plain_bits,
       CAST(index_bits AS INT) AS index_bits,
       CAST(card * 1000000 // n_rows AS BIGINT) AS card_ratio_ppm,
       (10 * card <= n_rows AND index_bits < plain_bits) AS dict_wins
FROM m
ORDER BY col
"""


@register("dict_encoding_audit", tags=("LAYOUT-encode",), oracle=_DICT_ORACLE)
def dict_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-encoding benefit per column: cardinality, index width
    (binary-string length of card−1 — no float log2), plain width, and a
    dict_wins verdict (cardinality ≤ 10% of rows AND narrower index).
    Completes the encoding-audit trio with delta_bitwidth_stats and
    rle_run_stats — together they answer parquet's three encoding choices
    from the data itself. One distinct-aggregate per audited column."""
    e = load_table(spark, sf_dir, "events")
    rows = []
    for col, plain in [("event_type", None), ("user_id", 64), ("event_id", 64)]:
        agg = e.agg(
            F.lit(col).alias("col"),
            F.countDistinct(col).alias("card"),
            F.count("*").alias("n_rows"),
            (
                F.floor(F.lit(8) * F.sum(F.length(col)) / F.count("*")).cast("long")
                if plain is None
                else F.lit(plain).cast("long")
            ).alias("plain_bits"),
        )
        rows.append(agg)
    per_col = rows[0]
    for r in rows[1:]:
        per_col = per_col.unionByName(r)
    m = per_col.withColumn(
        "index_bits",
        F.when(F.col("card") <= 1, F.lit(1)).otherwise(
            F.length(F.bin(F.col("card") - 1))
        ).cast("int"),
    )
    return m.select(
        "col",
        "card",
        "n_rows",
        "plain_bits",
        "index_bits",
        # integral div mirrors the oracle's exact '//' (decimal-widened)
        F.expr(
            "CAST(CAST(card AS DECIMAL(38,0)) * 1000000 div n_rows AS BIGINT)"
        ).alias("card_ratio_ppm"),
        (
            (10 * F.col("card") <= F.col("n_rows"))
            & (F.col("index_bits") < F.col("plain_bits"))
        ).alias("dict_wins"),
    ).orderBy("col")
