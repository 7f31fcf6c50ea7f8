"""Driver contract for the spark-graft builder (PySpark target).

Re-exports the topk_spark workload registry:
- ``entry(spark)``      — flagship query at sf0.001 (smoke),
- ``queries()``         — name → (spark, sf_dir) -> DataFrame,
- ``oracle_sql()``      — name → DuckDB SQL. Every registered query is
                          oracled (zero rows-only entries since round 5),
                          so this dict covers ``queries()`` exactly.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from topk_spark.workload import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (top-10 by revenue, last 24h, raw events) on sf0.001."""
    registry = load_all()
    return registry["topk_revenue_raw_24h"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
