from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from topk_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# ---------------------------------------------------------------------------
# Fast tier by default (round-14 VERDICT #3): the full suite outgrew the
# driver's verify window (r13: truncated at ~93 % of 36 minutes, recorded as
# tests_ok:false with zero observed failures). Tests carrying
# @pytest.mark.slow — the restart matrices, multi-batch streaming drains and
# oracle sweeps, each individually worth running but collectively ~3/4 of
# the wall clock — are SKIPPED unless SPARK_GRAFT_FULL_TESTS=1 (the
# builder's pre-commit gate) or an explicit `-m slow` selects them. A plain
# `pytest tests/` (what the driver runs) stays a real gate — every operator
# family keeps fast coverage — and finishes inside the verify window.
# ---------------------------------------------------------------------------


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running tier (restart matrices, drain ladders, sweeps); "
        "skipped unless SPARK_GRAFT_FULL_TESTS=1 or -m slow",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    if "slow" in (config.getoption("-m") or ""):
        return  # explicit -m slow / -m "not slow": let the mark expr decide
    skip = pytest.mark.skip(
        reason="slow tier — set SPARK_GRAFT_FULL_TESTS=1 (builder gate) to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("topk_spark_tests", master="local[8]")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
