"""Workload registry: every implemented operator from SURVEY.md §2 exposed as
a named query (spark, sf_dir) -> DataFrame, paired (where SQL-expressible)
with an equivalent DuckDB oracle SQL string over the driver's testdata views.

The registry is what __spark_entry__.py re-exports to the driver harness.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # DuckDB SQL; None → driver runs rows-only check
    headline: bool = False  # included in bench.py
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
):
    def deco(fn):
        assert name not in REGISTRY, f"duplicate query name {name}"
        REGISTRY[name] = Query(fn=fn, oracle=oracle, headline=headline, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import all workload modules (side-effect: registration) and return the
    registry.

    Import order IS registration order, and the driver verifies queries in
    registration order under a cap (round 1 checked exactly the first 50).
    Round-2 ordering therefore front-loads (a) the new recall/error oracles
    for the approximate ops and (b) every module the round-1 driver snapshot
    never reached (VERDICT.md gap #1); the 50 already-hash-verified round-1
    queries register last.
    """
    from topk_spark.workload import (  # noqa: F401
        recall_queries,
        tpch2_queries,
        tpch3_queries,
        behavior_queries,
        hygiene_queries,
        olap_queries,
        relational_queries,
        profiling_queries,
        pipeline2_queries,
        events_queries,
        tpch_queries,
        text_queries,
        similarity_queries,
        serving_queries,
        fuzzy_queries,
        text2_queries,
        joins_queries,
    )

    return REGISTRY
