"""Gate-steering mechanics: the registry ordering that decides which queries
the driver's capped CORRECTNESS window verifies, and the output-type contract
that keeps its value hash trustworthy.

Round-5 verdict items 2 and 3:
- a driver row with ``hash_match: false`` must NOT count as verification —
  otherwise a red query parks in tier 2 forever and never faces the gate
  again (exactly what happened to `region_nation_rollup` at position 161);
- no registered oracle (or Spark query) may emit an Arrow decimal128 column:
  the driver's typed-value hash demonstrably normalizes decimals differently
  from the repo's replica (`tests/driver_compare.py`), so decimal outputs
  are un-pre-flightable. Convention: exact decimal arithmetic INTERNALLY,
  BIGINT cents or DOUBLE at the surface.
"""

from __future__ import annotations

import json
import os

import duckdb
import pytest

from topk_spark.workload import (
    _FORCE_RESAMPLE,
    _driver_rounds,
    _ordered_names,
    load_all,
)

REGISTRY = load_all()
ORACLED = [name for name, q in REGISTRY.items() if q.oracle is not None]


def _write_rows(tmp_path, rnd: int, rows: dict) -> None:
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))


def _row(hash_match, err=None):
    return {
        "rows_match": None if hash_match is None else True,
        "schema_match": None if hash_match is None else True,
        "hash_match": hash_match,
        "spark_rows": 5,
        "oracle_rows": None if hash_match is None else 5,
        "err": err,
    }


def test_red_row_does_not_verify(tmp_path):
    """A hash-red row is a failure, not a sample: the query must read as
    never-verified so tier() re-queues it ahead of tier-2 names."""
    _write_rows(tmp_path, 5, {"q_red": _row(False), "q_green": _row(True)})
    rounds = _driver_rounds(root=str(tmp_path))
    assert "q_red" not in rounds
    assert rounds["q_green"] == 5


def test_newest_row_wins_green_then_red(tmp_path):
    """Green in r3 then red in r5 ⇒ the r5 failure supersedes: unverified."""
    _write_rows(tmp_path, 3, {"q": _row(True)})
    _write_rows(tmp_path, 5, {"q": _row(False)})
    assert "q" not in _driver_rounds(root=str(tmp_path))


def test_red_then_green_reverifies(tmp_path):
    """The inverse: a red row followed by a green re-sample releases the
    query back to tier 2 at the green round."""
    _write_rows(tmp_path, 5, {"q": _row(False)})
    _write_rows(tmp_path, 6, {"q": _row(True)})
    assert _driver_rounds(root=str(tmp_path))["q"] == 6


def test_rows_only_row_still_counts(tmp_path):
    """``err: no_oracle`` rows (hash_match null) remain weak-but-recorded
    evidence — the cap should chase queries with NO row, not these."""
    _write_rows(tmp_path, 2, {"q_ro": _row(None, err="no_oracle")})
    assert _driver_rounds(root=str(tmp_path))["q_ro"] == 2


def test_force_resample_round_awareness(tmp_path):
    """_FORCE_RESAMPLE name→round forces only while the newest row predates
    the fix round; a recorded later green releases the slot."""
    assert _FORCE_RESAMPLE["region_nation_rollup"] == 6
    # Simulate: red r5 row only → unverified → forced (last=0 < 6).
    _write_rows(tmp_path, 5, {"region_nation_rollup": _row(False)})
    assert "region_nation_rollup" not in _driver_rounds(root=str(tmp_path))
    # Simulate the r6 green re-sample → verified at 6, 6 < 6 is False → free.
    _write_rows(tmp_path, 6, {"region_nation_rollup": _row(True)})
    assert _driver_rounds(root=str(tmp_path))["region_nation_rollup"] == 6


def test_simulated_round6_window_head():
    """The round-6 ordering scenario, re-asserted against a SIMULATED driver
    history instead of the repo's live CORRECTNESS files (round-6 verdict
    item 1: the original hard-coded form went stale the moment the driver
    wrote CORRECTNESS_r06.json — a self-expiring assertion on a mutable
    artifact). Simulated state: every registered name verified at r5 EXCEPT
    region_nation_rollup (red, so absent) and the six round-5b additions
    (never sampled). The head must then be the forced red-fix, the six
    unsampled names next, before any tier-2 name — and once all seven are
    verified at r6, the window must be pure tier-2."""
    r5b = {
        "spacesaving_heavy_cohorts",
        "stream_heavyhitters_drain",
        "stream_hll_distinct_drain",
        "stream_interval_join_drain",
        "stream_static_enrich_drain",
        "stream_leftouter_join_drain",
    }
    # every other name "verified" — at r5, or at its own fix round for
    # names LATER rounds added to _FORCE_RESAMPLE (the simulation is about
    # the round-6 scenario; later forced names must not leak into it)
    pre_r6 = {
        n: max(5, _FORCE_RESAMPLE.get(n, 0)) for n in _ordered_names({})
        if n != "region_nation_rollup" and n not in r5b
    }
    names = _ordered_names(pre_r6)
    assert names[0] == "region_nation_rollup"
    assert set(names[1:7]) == r5b
    # After the driver's r6 greens: nothing forced, nothing unsampled.
    post_r6 = dict(pre_r6, region_nation_rollup=6, **{n: 6 for n in r5b})
    assert all(post_r6[n] > 0 for n in _ordered_names(post_r6)[:50])


def test_forced_pending_names_lead_live_window():
    """Durable form of the window-head invariant against the LIVE repo state:
    any _FORCE_RESAMPLE name whose newest verified round predates its fix
    round must sit inside the first-50 window (ahead of tier-2 names). When
    nothing is pending — the steady state once the driver records the
    re-sample — this asserts vacuously, by design."""
    rounds = _driver_rounds()
    names = list(REGISTRY)
    pending = [
        n for n, fix in _FORCE_RESAMPLE.items()
        if n in REGISTRY and rounds.get(n, 0) < fix
    ]
    outside = [n for n in pending if n not in names[:50]]
    assert outside == [], f"forced-pending names outside the window: {outside}"


def test_every_unsampled_query_inside_window():
    """Standing invariant (memory: driver-gate-mechanics): after ANY registry
    change, every query lacking a driver row must sit inside the first-50
    window, or it can never be verified."""
    rounds = _driver_rounds()
    names = list(REGISTRY)
    unsampled = [n for n in names if n not in rounds]
    outside = [n for n in unsampled if n not in names[:50]]
    assert outside == [], f"unsampled queries outside the driver window: {outside}"


def test_no_decimal_outputs_in_oracles():
    """Contract: no registered oracle materializes a decimal128 column.
    DuckDB plans every oracle with LIMIT 0 (schema only, no execution) over
    the sf0.001 views; one Arrow decimal column anywhere is a failure.

    Why a hard ban and not a normalization: the driver's value hash treats
    Arrow decimals differently from the replica's str() path — verified on
    `region_nation_rollup` (r5: value-identical rows, hash-red). BIGINT
    cents / DOUBLE keep both hashes in the regime all 226 green queries
    occupy."""
    sf_dir = os.environ.get("SPARK_GRAFT_DECIMAL_SCAN_SF", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"testdata dir {sf_dir} absent — decimal scan needs views")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    violators = []
    for name in ORACLED:
        oracle = REGISTRY[name].oracle
        try:
            tbl = con.execute(
                f"SELECT * FROM ({oracle}\n) __probe LIMIT 0"
            ).arrow()
        except duckdb.CatalogException:
            # An oracle referencing a table with no view is broken outright
            # (round-6 ADVICE: surface it — the full-execution fallback would
            # raise the same opaque error, or worse, mask a partial-views
            # environment as a decimal result).
            raise
        except duckdb.Error:
            # A shape LIMIT-0 can't wrap (none today) still gets scanned —
            # just with execution.
            tbl = con.execute(oracle).arrow()
        bad = [
            f.name
            for f in tbl.schema
            if str(f.type).startswith("decimal")
        ]
        if bad:
            violators.append((name, bad))
    assert violators == [], f"decimal-emitting oracles: {violators}"
