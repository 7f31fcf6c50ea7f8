"""Counterfactuals for the round-8 join-family oracles — DuckDB-only, no
Spark: each test pins that an oracle's DISTINGUISHING clause actually
changes the answer on the gate fixture, so the driver's hash match is
evidence for the modeled semantics rather than a vacuous agreement two
wrong-but-identical models would also produce. (The Spark side of each
equivalence is pinned by the drains themselves and by
tests/test_streaming_joins.py / test_timers.py; THIS module guards the
oracle models.)
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return c


def test_chain_oracle_watermark_lag_is_load_bearing(con):
    """The chained join→rollup oracle closes windows at
    `end <= min_side_max − delay − JOIN_WINDOW`. Dropping the join-window
    lag term must ADMIT MORE windows on the fixture (measured 20 vs 27 at
    sf0.001) — i.e. the propagation rule is observable, not decorative."""
    from topk_spark.workload.streaming_join_queries import _JOIN_ROLLUP_ORACLE

    lag = con.execute(_JOIN_ROLLUP_ORACLE).fetchall()
    no_lag = con.execute(
        _JOIN_ROLLUP_ORACLE.replace("- 86400000 - 604800000", "- 86400000")
    ).fetchall()
    assert len(no_lag) > len(lag), (
        f"no-lag model admits {len(no_lag)} windows vs {len(lag)} — the "
        "fixture no longer distinguishes the propagation rule"
    )
    # the lagged set is a strict subset: propagation only WITHHOLDS windows
    assert set(map(tuple, lag)) < set(map(tuple, no_lag))


def test_timer_restart_oracle_conversion_clause_is_load_bearing(con):
    """The restart oracle's extra split case (first_due_b = 2 AND
    next_tile = 2 — the gen-1 shutdown flush firing timers that tile-2
    data would have beaten) must produce MORE expiries than the
    uninterrupted model (measured 9 → 17 at sf0.001), and every
    uninterrupted run ending strictly before the conversion point must
    appear unchanged in both."""
    from topk_spark.workload.timer_queries import (
        _TIMER_EXPIRY_ORACLE,
        _TIMER_RESTART_ORACLE,
    )

    plain = con.execute(_TIMER_EXPIRY_ORACLE).fetchall()
    restart = con.execute(_TIMER_RESTART_ORACLE).fetchall()
    assert len(restart) > len(plain), (
        f"restart model emits {len(restart)} vs plain {len(plain)} — the "
        "conversion clause no longer bites on this fixture"
    )
    # runs that fired at batch 1 in the plain model are untouched by a
    # restart after tile 2 (identity on the pre-restart prefix)
    early_plain = {t for t in plain if t[4] == 1}
    early_restart = {t for t in restart if t[4] == 1}
    assert early_plain == early_restart


def test_antijoin_oracle_nonvacuous_and_disjoint_from_semi(con):
    """The anti oracle's output must be non-empty on the fixture and
    exactly complementary to the semi join over expirable views: no view
    appears in both, and anti ∪ semi covers every view whose absence had
    become decidable (semi covers matched views regardless)."""
    from topk_spark.workload.streaming_join_queries import (
        _ANTIJOIN_ORACLE,
        _SEMIJOIN_ORACLE,
    )

    anti = con.execute(_ANTIJOIN_ORACLE).fetchall()
    semi = con.execute(_SEMIJOIN_ORACLE).fetchall()
    assert anti, "anti oracle returns nothing — vacuous gate fixture"
    anti_views = {r[1] for r in anti}
    semi_views = {r[1] for r in semi}
    assert not (anti_views & semi_views), (
        "a view is both matched (semi) and absent-matched (anti)"
    )


def test_fullouter_oracle_is_union_of_parts(con):
    """full_outer = inner pairs ∪ left nulls ∪ right nulls, with the parts
    individually non-empty on the fixture (each null schedule is
    exercised) and no overlap between matched and null rows."""
    from topk_spark.workload.streaming_join_queries import (
        _FULLOUTER_JOIN_ORACLE,
        _INNER_JOIN_ORACLE,
        _RIGHTOUTER_JOIN_ORACLE,
    )

    full = con.execute(_FULLOUTER_JOIN_ORACLE).fetchall()
    inner = con.execute(_INNER_JOIN_ORACLE).fetchall()
    ro = con.execute(_RIGHTOUTER_JOIN_ORACLE).fetchall()
    n_rnull = len(ro) - len(inner)
    n_lnull = len(full) - len(ro)
    assert n_rnull > 0, "no right-null rows on the fixture — vacuous"
    assert n_lnull > 0, "no left-null rows on the fixture — vacuous"
    # matched pairs inside full_outer equal the inner join exactly
    matched_full = [r for r in full if r[1] is not None and r[2] is not None]
    assert sorted(matched_full) == sorted(inner)


def test_dedup_chain_restart_replays_nonvacuous_and_observable(con):
    """stream_dedup_join_rollup_chain_restart_drain's cross-restart replay
    population (rows from the last day of generation 1's range, duplicated
    into tile 2) must (a) exist on the fixture for BOTH sides, and (b)
    produce at least one extra join pair against tile-2 arrivals if
    re-admitted — i.e. losing dedup state across the restart is observable
    in pair_count, not a vacuous claim."""
    rows = con.execute("""
WITH e AS (
  SELECT event_id, ts, user_id, event_type FROM events
  WHERE event_type IN ('view', 'purchase')
),
b AS (SELECT epoch_us(min(ts)) AS tmin, epoch_us(max(ts)) AS tmax FROM e),
t AS (SELECT e.*, CAST(least(2, (epoch_us(ts) - b.tmin) * 3
                   // (b.tmax - b.tmin + 1)) AS INT) AS tile
      FROM e CROSS JOIN b),
thr AS (
  SELECT least(
           (SELECT max(ts) FROM t WHERE event_type='view' AND tile <= 1),
           (SELECT max(ts) FROM t WHERE event_type='purchase' AND tile <= 1)
         ) - INTERVAL 1 DAY AS cut
),
vlate AS (SELECT * FROM t, thr WHERE event_type='view' AND tile=1 AND ts >= cut),
plate AS (SELECT * FROM t, thr WHERE event_type='purchase' AND tile=1 AND ts >= cut),
v2 AS (SELECT * FROM t WHERE event_type='view' AND tile=2),
p2 AS (SELECT * FROM t WHERE event_type='purchase' AND tile=2)
SELECT
  (SELECT count(*) FROM vlate) AS n_vlate,
  (SELECT count(*) FROM plate) AS n_plate,
  (SELECT count(*) FROM vlate v JOIN p2 p ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 7 DAY) AS v_extra_pairs,
  (SELECT count(*) FROM plate p JOIN v2 v ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 7 DAY) AS p_extra_pairs
""").fetchone()
    n_vlate, n_plate, v_extra, p_extra = rows
    assert n_vlate > 0 and n_plate > 0, (n_vlate, n_plate)
    assert v_extra + p_extra > 0, "re-admission would be invisible"
