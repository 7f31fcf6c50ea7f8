"""Scalar time/derivation expressions shared across operators.

Pin down the reference's time semantics once, test them once, reuse everywhere:
- epoch-floored tumbling buckets (P7, KafkaConsumerTopKJob.kt:145-150) — Spark's
  `window()` uses identical epoch-aligned flooring;
- hour-of-day / ISO day-of-week (P8, TopKStreamingJob.kt:162-179): Spark's
  `dayofweek` is 1=Sunday, the reference uses java.time ISO 1=Monday → convert;
- 64-bit revenue arithmetic (P5): the reference multiplies Int×Int before
  widening in one site (KafkaConsumerTopKJob.kt:187, a latent overflow bug) —
  we standardize on widen-first.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def iso_dayofweek(ts: Column | str) -> Column:
    """ISO day-of-week 1=Mon..7=Sun (java.time semantics,
    TopKStreamingJob.kt:179). Spark's dayofweek is 1=Sun..7=Sat."""
    return ((F.dayofweek(ts) + F.lit(5)) % F.lit(7) + F.lit(1)).cast("int")


def hour_of_day(ts: Column | str) -> Column:
    """Hour 0-23 of the (UTC) session timezone (TopKStreamingJob.kt:162-167)."""
    return F.hour(ts).cast("int")


def epoch_ms(ts: Column | str) -> Column:
    """Timestamp → epoch millis long (the reference's native time type)."""
    return F.unix_millis(F.col(ts) if isinstance(ts, str) else ts)


def floor_to_window_ms(ts: Column | str, window_ms: int) -> Column:
    """Epoch-aligned tumbling bucket start in ms:
    (ts_ms / window) * window (P7, KafkaConsumerTopKJob.kt:145-150)."""
    ms = epoch_ms(ts)
    return (ms - ms % F.lit(window_ms)).cast("long")


def revenue_cents(quantity: Column | str, price_in_cents: Column | str) -> Column:
    """Overflow-safe revenue: widen to long BEFORE multiplying (P5/S8;
    orders_raw_upsert_table.json:54-59). Fixes the reference's Int×Int site."""
    q = F.col(quantity) if isinstance(quantity, str) else quantity
    p = F.col(price_in_cents) if isinstance(price_in_cents, str) else price_in_cents
    return (q.cast("long") * p.cast("long")).alias("revenue_cents")


def dec_sum(col: Column | str, scale: str = "decimal(18,2)") -> Column:
    """Sum a double column exactly: cast to decimal first (deterministic,
    order-independent), surface as double. Spark's float sums are
    partial-aggregation-order dependent; at 1000 executors that means
    run-to-run drift — decimal accumulation removes it."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double")
