"""Rollup-tier router (SURVEY.md §4.2) — the engine's replacement for Pinot's
star-tree index and hand-pointed table selection.

The reference pre-computes a ladder (raw → 1m rollup → 1h rollup) and each
serving query is hand-pointed at one tier (QueryService reads pre-ranked
tables; pinot/README.md:5 samples read raw or rollup). We make the choice
explicit and automatic: given a time range, answer from the COARSEST tier
whose windows tile the range exactly; sub-tier remainders fall to finer
tiers. At 100 TB this is the difference between scanning ~10^6 hourly rows
and ~10^10 raw rows for a month-long range.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class RollupTier:
    """One materialized tier: a rollup DataFrame and its window size."""

    df: DataFrame
    window_ms: int


class TierRouter:
    """Choose tiers to cover [start_ms, end_ms) with exact tiling.

    Tiers are registered coarsest-first (e.g. 1h, 1m). `plan` returns
    (tier, sub_start, sub_end) segments: the coarsest tier covers the
    aligned middle, finer tiers cover the misaligned edges — the standard
    materialized-view rewrite, done in plain Python because the query set
    (time-range + group-by over fixed keys) doesn't need a Catalyst rule
    (SURVEY §4 conclusion).
    """

    def __init__(self, tiers: dict[int, DataFrame]):
        # sort coarsest first
        self._tiers = [
            RollupTier(df=df, window_ms=w)
            for w, df in sorted(tiers.items(), key=lambda kv: -kv[0])
        ]

    def plan(self, start_ms: int, end_ms: int) -> list[tuple[RollupTier, int, int]]:
        segments: list[tuple[RollupTier, int, int]] = []
        self._cover(start_ms, end_ms, 0, segments)
        return segments

    def _cover(
        self,
        start: int,
        end: int,
        tier_idx: int,
        out: list[tuple[RollupTier, int, int]],
    ) -> None:
        if start >= end or tier_idx >= len(self._tiers):
            return
        tier = self._tiers[tier_idx]
        w = tier.window_ms
        aligned_start = start + (-start) % w
        aligned_end = end - end % w
        if aligned_start >= aligned_end:
            # range smaller than one coarse window → finer tier entirely
            self._cover(start, end, tier_idx + 1, out)
            return
        # edges to finer tiers, aligned middle to this tier
        self._cover(start, aligned_start, tier_idx + 1, out)
        out.append((tier, aligned_start, aligned_end))
        self._cover(aligned_end, end, tier_idx + 1, out)

    def scan(self, start_ms: int, end_ms: int) -> DataFrame:
        """Union of tier scans covering the range (closed containment per
        segment). All tiers must share the rollup column contract
        (window_start/window_end + metric columns)."""
        import pyspark.sql.functions as F

        parts = []
        for tier, s, e in self.plan(start_ms, end_ms):
            parts.append(
                tier.df.filter(
                    (F.col("window_start") >= F.lit(s))
                    & (F.col("window_end") <= F.lit(e))
                )
            )
        if not parts:
            raise ValueError(f"empty plan for range [{start_ms}, {end_ms})")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
