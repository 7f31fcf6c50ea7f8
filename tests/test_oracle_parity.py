"""Mirror of the driver's correctness gate: run every registered query on
Spark AND its DuckDB oracle on the same parquet tables, compare row count,
column names, and order-insensitive values.

Runs at sf0.01 BY DEFAULT — the driver's exact gate scale — so
tie-breaking/float-accumulation mismatches surface here before the driver
sees them (VERDICT.md round-1 item 5). Set SPARK_GRAFT_TEST_SF_DIR to
/root/testdata/sf0.001 for a fast smoke pass.
"""

from __future__ import annotations

import os

import pytest

from topk_spark.workload import load_all

# Module-local default: the driver's gate scale (other test modules keep the
# fast sf0.001 default from conftest).
PARITY_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def sf_dir() -> str:
    return PARITY_SF_DIR

REGISTRY = load_all()
ORACLED = [name for name, q in REGISTRY.items() if q.oracle is not None]
ROWS_ONLY = [name for name, q in REGISTRY.items() if q.oracle is None]


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, sf_dir, name):
    """Arrow-to-Arrow comparison via tests/driver_compare.compare — the
    faithful proxy for the driver's typed value hash. Stricter than the
    earlier fetchall() form: DuckDB fetchall converts HUGEINT to Python
    int LOSSLESSLY, hiding exactly the int64-vs-decimal128 drift that
    made `rolling_7d_revenue` go red at the round-2 gate while this suite
    stayed green. The Arrow path also checks type KINDS per column."""
    from tests.driver_compare import compare

    res = compare(spark, sf_dir, name, REGISTRY[name].fn, REGISTRY[name].oracle)
    assert res["status"] == "PASS", res


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    rows = sdf.collect()
    assert len(rows) >= 0
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    oracles = entrymod.oracle_sql()
    qs = entrymod.queries()
    assert set(oracles) <= set(qs)
