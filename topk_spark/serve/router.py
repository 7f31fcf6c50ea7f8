"""Rollup-tier routing (SURVEY.md §4.2) — the engine's replacement for Pinot's
star-tree index and hand-pointed table selection.

The reference pre-computes a ladder (raw → 1m rollup → 1h rollup) and each
serving query is hand-pointed at one tier (QueryService reads pre-ranked
tables; pinot/README.md:5 samples read raw or rollup). We make the choice
explicit and automatic: given a time range, answer from the COARSEST tier
whose windows tile the range exactly; sub-tier remainders fall to finer
tiers. At 100 TB this is the difference between scanning ~10^6 hourly rows
and ~10^10 raw rows for a month-long range.

Every tier is described by a `TierSpec` carrying its LAYOUT, not just its
rows (round-11 VERDICT #4): the partition column + granularity (so routers
derive partition predicates themselves — the round-11 bench lesson was a
"fast path" that scanned all ~720 hour-bucket directories because the
caller forgot the predicate, 5× slower than the slow path) and the tier's
materialized FRONTIER `through_ms` (so freshness/compaction bounds are part
of the plan: a coarse tier compacted through C covers only windows ending
<= C, the remainder falls to finer tiers — and a pre-ranked tier serves
only requests whose newest hop it has materialized). The frontier for a
live tier comes from the drain's on-disk `upto_<W>` subdir names
(topk_spark/io/tier.tier_frontier — one directory listing, no Spark job),
replacing the round-11 collect() probe.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


@dataclass
class TierSpec:
    """One materialized tier: rows + window size + layout metadata.

    - `window_ms`: the tier's window duration (rows carry window_start/
      window_end epoch-ms longs).
    - `partition_col` / `partition_ms`: if the tier is written partitioned
      by a time-bucket column (`hb = window_start div partition_ms`),
      routers add the bucket predicates themselves — directory layouts
      cannot be pruned by window_start/window_end predicates alone.
    - `through_ms`: the tier's committed frontier — every window ending
      <= through_ms is materialized, nothing later is. None = complete
      (batch-built tiers). For a live drain's tier, pass
      `io.tier.tier_frontier(tier_dir)`.
    - `frontier_dir`: the tier's `upto_<W>` directory — when set, the
      frontier is RE-READ from the directory listing at every plan/route
      (one os.listdir, cheaper than any Spark action), so a router built
      once keeps up with a drain that is still appending (round-12 VERDICT
      #3: a process-lifetime snapshot of the frontier made the HTTP facade
      serve rank_on_read forever once built). `through_ms` then acts as a
      floor fallback for an empty/missing directory.
    """

    df: DataFrame
    window_ms: int
    partition_col: str | None = None
    partition_ms: int | None = None
    through_ms: int | None = None
    frontier_dir: str | None = None

    def effective_through(self) -> int | None:
        """The frontier to plan with NOW: the live directory listing when
        `frontier_dir` is set (falling back to `through_ms` while the tier
        has no committed subdir yet), else the static `through_ms`."""
        if self.frontier_dir is not None:
            from topk_spark.io.tier import tier_frontier

            live = tier_frontier(self.frontier_dir)
            return live if live is not None else self.through_ms
        return self.through_ms

    def pruned(self, start_ms: int, end_ms: int) -> DataFrame:
        """The tier's rows for [start_ms, end_ms) under CLOSED containment,
        with the layout-derived partition predicates applied first (windows
        starting in the range live in buckets start//p .. (end-1)//p). The
        partition column is dropped afterwards — it is layout, not data, and
        tiers of different granularity use different bucket columns, so a
        cross-tier union must not carry it."""
        out = self.df
        if self.partition_col is not None:
            p = self.partition_ms or 3_600_000
            out = out.filter(
                (F.col(self.partition_col) >= F.lit(start_ms // p))
                & (F.col(self.partition_col) <= F.lit((end_ms - 1) // p))
            ).drop(self.partition_col)
        return out.filter(
            (F.col("window_start") >= F.lit(start_ms))
            & (F.col("window_end") <= F.lit(end_ms))
        )


def _as_spec(window_ms: int, tier: DataFrame | TierSpec) -> TierSpec:
    if isinstance(tier, TierSpec):
        assert tier.window_ms == window_ms, (
            f"TierSpec.window_ms {tier.window_ms} != registered key {window_ms}"
        )
        return tier
    return TierSpec(df=tier, window_ms=window_ms)


class TierRouter:
    """Choose tiers to cover [start_ms, end_ms) with exact tiling.

    Tiers are registered coarsest-first (e.g. 1h, 1m). `plan` returns
    (tier, sub_start, sub_end) segments: the coarsest tier covers the
    aligned middle, finer tiers cover the misaligned edges — the standard
    materialized-view rewrite, done in plain Python because the query set
    (time-range + group-by over fixed keys) doesn't need a Catalyst rule
    (SURVEY §4 conclusion). A tier with a frontier (`through_ms`) covers
    only its materialized prefix; the remainder falls to finer tiers — the
    compaction-horizon rule (a coarse tier compacted through C answers
    history, the fine tier answers the recent tail) and the freshness rule
    (a lagging materializer can cost latency, never correctness) are the
    same clamp.
    """

    def __init__(
        self,
        tiers: dict[int, DataFrame | TierSpec],
        retain_from_ms: int | None = None,
    ):
        # sort coarsest first
        self._tiers = [
            _as_spec(w, t)
            for w, t in sorted(tiers.items(), key=lambda kv: -kv[0])
        ]
        # The ladder's retention horizon — the reference's retentionTimeValue
        # (orders_1m_rollup_table.json:7-9, 30 DAYS) as the serving-side
        # filter: windows starting before it are EXPIRED and never planned,
        # on any tier. Physical expiry is segment drop (purge_upto on subdirs
        # wholly <= the horizon — a drain's retention step); this clamp is
        # what makes the two compose: a straddling segment may still hold
        # expired rows on disk, but no plan routes to them, and a purged
        # segment was by construction never plannable. One number for the
        # whole ladder, not per tier — retention is a property of the data's
        # age, not of any one rollup granularity.
        self._retain_from_ms = retain_from_ms

    def plan(self, start_ms: int, end_ms: int) -> list[tuple[TierSpec, int, int]]:
        if self._retain_from_ms is not None:
            start_ms = max(start_ms, self._retain_from_ms)
        # frontier snapshot: ONE read per tier per plan (a live frontier_dir
        # re-lists its directory here, not once per recursion step), so a
        # single plan is internally consistent even against a mid-plan append
        throughs = [t.effective_through() for t in self._tiers]
        segments: list[tuple[TierSpec, int, int]] = []
        self._cover(start_ms, end_ms, 0, throughs, segments)
        return segments

    def _cover(
        self,
        start: int,
        end: int,
        tier_idx: int,
        throughs: list[int | None],
        out: list[tuple[TierSpec, int, int]],
    ) -> None:
        if start >= end or tier_idx >= len(self._tiers):
            return
        tier = self._tiers[tier_idx]
        w = tier.window_ms
        aligned_start = start + (-start) % w
        aligned_end = end - end % w
        through = throughs[tier_idx]
        if through is not None:
            # only windows ending <= through exist: clamp the coverable
            # middle to the frontier floored to this tier's alignment
            aligned_end = min(aligned_end, through - through % w)
        if aligned_start >= aligned_end:
            # range smaller than one coarse window (or entirely past the
            # tier's frontier) → finer tier entirely
            self._cover(start, end, tier_idx + 1, throughs, out)
            return
        # edges to finer tiers, aligned middle to this tier
        self._cover(start, aligned_start, tier_idx + 1, throughs, out)
        out.append((tier, aligned_start, aligned_end))
        self._cover(aligned_end, end, tier_idx + 1, throughs, out)

    def scan(self, start_ms: int, end_ms: int) -> DataFrame:
        """Union of tier scans covering the range (closed containment per
        segment, layout-derived partition predicates per TierSpec). All
        tiers must share the rollup column contract (window_start/window_end
        + metric columns)."""
        if self._retain_from_ms is not None:
            # the same clamp plan() applies, repeated here so the
            # empty-plan fallback below cannot scan expired windows either
            # (a range wholly before retention answers empty, not stale)
            start_ms = max(start_ms, self._retain_from_ms)
        parts = [
            tier.pruned(s, e) for tier, s, e in self.plan(start_ms, end_ms)
        ]
        if not parts:
            if self._tiers:
                # a range no tier can tile — shorter than the finest window,
                # or DEGENERATE (start >= end; round-12 ADVICE: the
                # percentiles route 500'd on an inverted range while every
                # other route answered 200-empty): under closed containment
                # the correct answer is the finest tier's — possibly empty —
                # contained rows, not an error (a serving endpoint must
                # answer any range, however malformed)
                return self._tiers[-1].pruned(start_ms, end_ms)
            raise ValueError(f"empty plan for range [{start_ms}, {end_ms})")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out


class TrendingRouter:
    """Pre-ranked-vs-rank-on-read routing for the trending tile — the same
    make-the-tier-choice-explicit discipline as TierRouter, applied to the
    reference's actual serving design: its streaming job stores one RANKED
    row list per window fire and reads serve those rows back verbatim
    (KafkaConsumerTopKJob.kt:243-272 → QueryService.kt:55-60). Here the
    pre-ranked tier is what `stream_sliding_topk_drain` /
    `stream_trending_1h_1m_drain` emit incrementally (exactly-once ranked
    rows per closed hop window, materialized); `serve.api.trending` over
    the sliding rollup tier is the flexible fallback (any k, any metric,
    windows the pipeline has not closed yet). Measured in bench.py
    serving_trending: the pre-ranked read is a pure range-pruned scan with
    no exchange (P99 95.0 vs 121.1 ms rank-on-read at r10).

    Freshness rule (per-request, no clock guess): the newest hop the
    request can contain is the last slide-aligned window END inside
    [start, end]; the pre-ranked tier serves the request iff it has been
    materialized THROUGH that end AND the requested k is within the
    materialized rank depth. Otherwise the rollup path ranks on read —
    correctness never depends on the materializer being caught up.

    Pass `preranked` as a TierSpec to supply the tier's layout (partition
    column → the router derives the bucket predicates; round-11 bench
    measured the unpruned "fast path" 5× slower than rank-on-read at 720
    hour buckets) and its frontier (`through_ms` — for a live drain, the
    committed `upto_<W>` frontier from io.tier.tier_frontier, read from
    directory names with no Spark job). A bare DataFrame still works: the
    frontier then comes from a one-time bounded max(window_end) probe —
    the non-live fallback, one 1-row collect at construction.
    """

    def __init__(
        self,
        preranked: DataFrame | TierSpec,
        rollup: DataFrame,
        key_col: str = "event_type",
        metric_col: str = "revenue_cents",
        window_ms: int = 300_000,
        slide_ms: int = 60_000,
        preranked_k: int = 3,
    ):
        if not isinstance(preranked, TierSpec):
            preranked = TierSpec(df=preranked, window_ms=window_ms)
        self._spec = preranked
        self._rollup = rollup
        self._key_col = key_col
        self._metric_col = metric_col
        # the hop-window size is the pre-ranked tier's window size: one
        # source of truth when a spec is passed
        self._window_ms = preranked.window_ms
        self._slide_ms = slide_ms
        self._preranked_k = preranked_k
        if preranked.through_ms is None and preranked.frontier_dir is None:
            # one-time high-water probe (bounded: 1-row agg) — the non-live
            # fallback; a live deployment passes the drain's committed
            # frontier (through_ms) or its tier directory (frontier_dir —
            # re-listed per route, so the router tracks a still-appending
            # drain; round-12 VERDICT #3) in the TierSpec instead
            row = preranked.df.agg(F.max("window_end")).collect()[0]
            self._spec.through_ms = int(
                row[0] if row[0] is not None else -(1 << 62)
            )

    def route(self, start_ms: int, end_ms: int, k: int) -> str:
        """'preranked' | 'rank_on_read' — split out of read() so tests pin
        the decision itself, not just the rows. Freshness is evaluated NOW:
        with a frontier_dir spec this is one directory listing per call,
        so a request arriving after the drain advances routes preranked
        without rebuilding the router (and a stale frontier degrades to
        rank_on_read, never to a wrong answer)."""
        if k > self._preranked_k:
            return "rank_on_read"
        newest_we = end_ms - (end_ms % self._slide_ms)  # last aligned end <= end
        if newest_we - self._window_ms < start_ms:
            # no hop window fits the range under closed containment — both
            # paths return zero rows; route to the flexible one by convention
            return "rank_on_read"
        through = self._spec.effective_through()
        if through is None:
            return "rank_on_read"
        return "preranked" if newest_we <= through else "rank_on_read"

    def read(self, start_ms: int, end_ms: int, k: int = 3) -> DataFrame:
        """Ranked top-k per hop window in [start, end], closed containment —
        column contract identical on both paths (window_start, window_end,
        key, metric, rank), so callers cannot observe which tier answered
        except through latency."""
        from topk_spark.serve.api import trending

        if self.route(start_ms, end_ms, k) == "preranked":
            return (
                self._spec.pruned(start_ms, end_ms)
                .filter(F.col("rank") <= F.lit(k))
                .select(
                    "window_start", "window_end", self._key_col,
                    self._metric_col, "rank",
                )
            )
        return trending(
            self._rollup,
            key_col=self._key_col,
            metric_col=self._metric_col,
            start_ms=start_ms,
            end_ms=end_ms,
            k=k,
        )
