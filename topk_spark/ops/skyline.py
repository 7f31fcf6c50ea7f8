"""2-D Pareto frontier (skyline) with a lossless band-prune.

Maximize-both semantics: a row survives iff no other row is >= on both
dimensions with > on at least one. The scalable plan (used by
workload/skyline_queries.py and pinned by tests/test_properties.py):

1. Bucket x into `bands` contiguous ranges; per-band max(y) is a tiny
   aggregate whose strictly-higher-band prefix-max broadcasts back onto
   the data — any row with y <= that prefix is provably dominated
   (someone with strictly greater x has >= its y) and drops map-side.
   Lossless: a pruned row's dominator is kept, or is itself pruned by a
   dominator in a strictly higher band — the band index strictly
   increases along that chain, so it terminates at a kept dominator;
   hence running maxima over survivors equal those over all rows.
2. Exact sweep over survivors: running max(y) over strictly-greater x
   (range frame excludes ties) plus the x-tie group's own max(y):
   survive iff y beats the former and equals the latter (equal (x,y)
   duplicates all survive — neither strictly dominates).

The only global-order windows run over band stats (<= `bands` rows) and
survivors — never the full input.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def pareto_front_2d(
    df: DataFrame, x: str, y: str, bands: int = 1024
) -> DataFrame:
    """Rows of `df` on the maximize-(x, y) Pareto frontier. `x` must be a
    non-negative integral column (band arithmetic); `y` any orderable
    numeric."""
    mx = df.agg(F.max(x).alias("_mx"))
    banded = df.crossJoin(F.broadcast(mx)).withColumn(
        "_band", F.expr(f"({x} * {bands}) div (_mx + 1)")
    )
    band_stats = banded.groupBy("_band").agg(F.max(y).alias("_band_max_y"))
    w_band = Window.orderBy(F.desc("_band")).rangeBetween(
        Window.unboundedPreceding, -1
    )
    band_prefix = band_stats.select(
        "_band", F.max("_band_max_y").over(w_band).alias("_higher_band_max_y")
    )
    kept = (
        banded.join(F.broadcast(band_prefix), "_band")
        .filter(
            F.col("_higher_band_max_y").isNull()
            | (F.col(y) > F.col("_higher_band_max_y"))
        )
        .drop("_band", "_mx", "_higher_band_max_y")
    )
    w_higher = Window.orderBy(F.desc(x)).rangeBetween(Window.unboundedPreceding, -1)
    w_ties = Window.partitionBy(x)
    return (
        kept.withColumn("_max_y_higher", F.max(y).over(w_higher))
        .withColumn("_max_y_tie", F.max(y).over(w_ties))
        .filter(
            (F.col("_max_y_higher").isNull() | (F.col(y) > F.col("_max_y_higher")))
            & (F.col(y) == F.col("_max_y_tie"))
        )
        .drop("_max_y_higher", "_max_y_tie")
    )
