"""CDC last-value retention horizon (streaming/cdc_lastvalue.py,
`retention_ms`) — the opt-in event-time eviction mirroring the reference's
bounded raw upsert surface (orders_raw_upsert_table.json:10-12, 7-day
retention). The semantics here were MEASURED, and came out stronger than
the naive design note:

- EXPIRY: a key whose materialized row goes `retention_ms` past its event
  time with no newer update is dropped from state via event-time timeout —
  visible in the state-operator metrics (numRowsRemoved), not in output
  (no tombstone emission);
- LATE-EVENTS DOOR: Spark's stateful exec drops input rows below the
  previous micro-batch's watermark BEFORE the operator (probed here: a
  post-eviction stale replay never produces a data call, while a fresh row
  in the same arrival file does) — so any row admitted after an eviction is
  strictly newer than the evicted high-water and wins the comparison with
  or without state;
- therefore RETENTION IS OBSERVATIONALLY FREE: the same timeline with and
  without `retention_ms` emits byte-identical finals; only the state-size
  metrics differ. That is the strongest possible form of the "scale-safe
  lever" claim — bounded state at zero semantic cost (the reference's
  7-day retention, by contrast, drops queryable rows);
- DATA-BEATS-TIMER inheritance: an update arriving in the very batch its
  key's deadline is due takes the data call and resets the horizon (only
  the truly idle key is removed that batch).
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

T0_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch micros
_M_US = 60_000_000
RET_MS = 10 * 60_000  # 10 min retention
DELAY = "1 minute"


def _wf(src: str, name: str, rows: list[dict], mtime: int) -> None:
    os.makedirs(src, exist_ok=True)
    p = os.path.join(src, name)
    with open(p, "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    os.utime(p, (mtime, mtime))


def _ev(uid: int, us: int, eid: int, et: str = "a", val: float = 1.0) -> dict:
    return {
        "user_id": uid,
        "ts_us": T0_US + us,
        "event_id": eid,
        "event_type": et,
        "value": val,
    }


def _drain(spark, tmp_path, name: str, batches: list[list[dict]],
           retention_ms: int | None) -> tuple[dict, list[tuple[int, int]]]:
    """Run the CDC operator over jsonl arrival batches. Returns
    ({user_id: (ts_off_us, event_id)} — each user's FINAL materialized row,
    last emission wins — and [(numRowsTotal, numRowsRemoved)] per batch
    from the state-operator metrics)."""
    from topk_spark.streaming.cdc_lastvalue import streaming_cdc_lastvalue

    src = str(tmp_path / f"src_{name}")
    out = str(tmp_path / f"out_{name}")
    for i, rows in enumerate(batches):
        _wf(src, f"b{i}.jsonl", rows, 1000 + i * 10)
    stream = spark.readStream.schema(
        "user_id long, ts_us long, event_id long, event_type string, "
        "value double"
    ).option("maxFilesPerTrigger", 1).option("latestFirst", "false").json(src)
    q = (
        streaming_cdc_lastvalue(
            stream,
            retention_ms=retention_ms,
            watermark_delay=None if retention_ms is None else DELAY,
        )
        .writeStream.foreachBatch(
            lambda df, bid: df.withColumn("_bid", F.lit(int(bid)))
            .write.mode("append")
            .parquet(out)
        )
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stats = [
        (p["stateOperators"][0]["numRowsTotal"],
         p["stateOperators"][0]["numRowsRemoved"])
        for p in (json.loads(pr.json) for pr in q.recentProgress)
        if p["stateOperators"]
    ]
    final: dict[int, tuple] = {}
    best_bid: dict[int, int] = {}
    for r in spark.read.parquet(out).collect():
        if r["user_id"] not in best_bid or r["_bid"] > best_bid[r["user_id"]]:
            best_bid[r["user_id"]] = r["_bid"]
            final[r["user_id"]] = (
                r["last_ts_ms"] * 1000 - T0_US,
                r["last_event_id"],
            )
    return final, stats


# Shared timeline (offsets from T0; retention R = 10m, delay D = 1m):
#   b0: u1@0m id1, u1@1m id2 (high-water), u2@0m id1
#   b1: advancer u99@20m — in-effect wm = 0m: nothing due yet
#   b2: advancer u98@21m — eviction wm = 19m > u1/u2 deadlines (11m, 10m):
#       with retention both idle keys are REMOVED here (no data call)
#   b3: stale replay u1@0m id1 (below the late-events wm of 19m — dropped
#       at the door) + fresh u3@20.5m (above it — admitted), arriving in
#       ONE file so admission vs drop is pinned within a single batch
_BATCHES = [
    [_ev(1, 0, 1), _ev(1, _M_US, 2, "b", 2.0), _ev(2, 0, 1, "x", 9.0)],
    [_ev(99, 20 * _M_US, 1)],
    [_ev(98, 21 * _M_US, 1)],
    [_ev(1, 0, 1), _ev(3, 20 * _M_US + _M_US // 2, 7, "f", 5.0)],
]

_WANT_FINALS = {
    1: (_M_US, 2),  # the b3 replay never reaches (or never regresses) it
    2: (0, 1),
    3: (20 * _M_US + _M_US // 2, 7),
    98: (21 * _M_US, 1),
    99: (20 * _M_US, 1),
}


def test_retention_is_observationally_free_and_bounds_state(spark, tmp_path):
    with_ret, stats_ret = _drain(spark, tmp_path, "ret", _BATCHES, RET_MS)
    without, stats_none = _drain(spark, tmp_path, "noret", _BATCHES, None)
    # identical emitted finals — eviction changed nothing observable...
    assert with_ret == without == _WANT_FINALS
    # ...but it did bound the state: u1 and u2 were REMOVED at their idle
    # deadline (b2), and no NoTimeout run ever removes anything
    assert sum(r for _, r in stats_ret) == 2, stats_ret
    assert stats_ret[2][1] == 2, stats_ret
    assert sum(r for _, r in stats_none) == 0, stats_none
    # end-of-stream state: retention holds 3 live keys (98, 99, u3 + u1's
    # replay was dropped at the door, never re-creating state); NoTimeout
    # holds all 5 ever seen
    assert stats_ret[-1][0] == 3, stats_ret
    assert stats_none[-1][0] == 5, stats_none


def test_update_in_deadline_batch_resets_horizon(spark, tmp_path):
    """u1's deadline (1m+10m=11m) is due at b2's eviction wm (19m), but u1
    has DATA in b2 — the data call wins and the horizon resets, so ONLY the
    truly idle u2 is removed that batch, and u1's final is its b2 update."""
    batches = [
        _BATCHES[0],
        _BATCHES[1],
        [_ev(98, 21 * _M_US, 1), _ev(1, 2 * _M_US, 3, "c", 3.0)],
    ]
    final, stats = _drain(spark, tmp_path, "reset", batches, RET_MS)
    assert final[1] == (2 * _M_US, 3), final
    assert stats[2][1] == 1, stats  # u2 alone evicted in b2


def test_retention_requires_watermark_delay(spark, tmp_path):
    from topk_spark.streaming.cdc_lastvalue import streaming_cdc_lastvalue

    src = str(tmp_path / "vsrc")
    _wf(src, "b0.jsonl", [_ev(1, 0, 1)], 1000)
    stream = spark.readStream.schema(
        "user_id long, ts_us long, event_id long, event_type string, "
        "value double"
    ).json(src)
    with pytest.raises(ValueError, match="go together"):
        streaming_cdc_lastvalue(stream, retention_ms=1000)
    with pytest.raises(ValueError, match="go together"):
        streaming_cdc_lastvalue(stream, watermark_delay="1 minute")


def test_retention_drain_regime_is_nonvacuous(spark, sf_dir):
    """The registered retention drain's horizon must actually FIRE at
    gate scale, or it gates nothing: for most users, the gap between their
    last event in tile i and the late-events watermark in effect during
    tile i+1 (tile i's max ts minus the 1-minute delay) must exceed the
    horizon — those keys are evicted before their next update. Analytic
    replay of the drain's own tiling arithmetic; guards against testdata
    regeneration compressing the time span under the horizon."""
    import duckdb

    from topk_spark.workload.cdc2_queries import _RETENTION_MS

    con = duckdb.connect()
    rows = con.execute(f"""
        WITH e AS (SELECT user_id, epoch_us(ts) AS us
                   FROM '{sf_dir}/events.parquet'),
        b AS (SELECT min(us) AS tmin, max(us) AS tmax FROM e),
        t AS (SELECT user_id, us,
                     CAST(least(2, (us - b.tmin) * 3 // (b.tmax - b.tmin + 1))
                          AS INT) AS tile
              FROM e CROSS JOIN b),
        last_in AS (SELECT user_id, tile, max(us) AS last_us
                    FROM t GROUP BY 1, 2),
        tile_max AS (SELECT tile, max(us) AS tmax_us FROM t GROUP BY 1)
        SELECT count(*) FILTER (
                 WHERE m.tmax_us - 60_000_000 - l.last_us
                       > CAST({_RETENTION_MS} AS BIGINT) * 1000
               ) AS evicted_pairs,
               count(*) AS pairs
        FROM last_in l JOIN tile_max m ON m.tile = l.tile
    """).fetchone()
    evicted_pairs, pairs = rows
    assert evicted_pairs >= max(10, pairs // 2), (evicted_pairs, pairs)
