"""SparkSession factory + session hardening.

The reference pins semantics that Spark does not default to:
- UTC wall-clock everywhere (reference uses ZoneId.systemDefault(),
  TopKStreamingJob.kt:165 — we pin UTC and document the divergence,
  SURVEY.md §7 risk 3).
- AQE on (runtime re-planning; skew-join mitigation at scale).
- Driver testdata stores `events.ts` as parquet TIMESTAMP(NANOS) which Spark
  cannot read natively → `spark.sql.legacy.parquet.nanosAsLong` + an explicit
  ns→timestamp conversion in io.sources.load_table.

``ensure_session_conf(spark)`` is called by every public query function so the
engine behaves identically under a driver-provided SparkSession.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs every query depends on.
_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    # testdata events.parquet uses TIMESTAMP(NANOS); read as long + convert.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow for every pandas_udf / applyInPandas / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}

# Set-at-build confs (best effort when the session already exists).
_BUILD_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
}


def ensure_session_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing (possibly driver-owned)
    session. Idempotent and cheap; called at the top of every query fn."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — session factory already set it
    return spark


def get_spark(app_name: str = "topk_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) a session configured for this engine.

    local[N] for tests/bench; on a real cluster the same confs apply —
    partitioning strategy is encoded in the operators, not the master URL.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for k, v in {**_BUILD_CONF, **_RUNTIME_CONF}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return ensure_session_conf(spark)
