"""Batch-drainable registrations of the STATEFUL STREAMING operators — the
reference's signature operators, put under the driver's DuckDB-oracle gate.

Until round 4 the five arbitrary-stateful operators (stateful dedup,
continuous per-key/global top-k, MinHash near-dup suppression, hyperplane
embedding near-dup, streaming CUSUM) were pytest-pinned only: real behavioral
coverage, but invisible to the driver's hard CORRECTNESS signal (round-3
VERDICT item 3). Each query here runs the REAL streaming operator — a file
source drained with `trigger(availableNow=True)` over fixture data written
from the sf_dir parquet tables — and returns the drained output as a batch
DataFrame a DuckDB oracle can hash against:

- `stream_dedup_drain`        — streaming/stateful_dedup.py (D1/D2/T6;
                                 reference TopKStreamingJob.kt:87-119)
- `stream_dedup_multibatch_drain` — the same operator through THREE
                                 ts-ordered micro-batches (T8: cross-batch
                                 state continuity inside the hash)
- `stream_topk_drain`         — streaming/continuous_topk.py (K1;
                                 ProcessFunctions.kt:62-134)
- `stream_global_topk_drain`  — continuous_global_topk (K3/G4;
                                 TopKStreamingJob.kt:543-548)
- `stream_neardup_drain`      — streaming/neardup.py (MinHash-LSH state)
- `stream_embed_neardup_drain`— streaming/embed_neardup.py (hyperplane LSH)
- `stream_rollup_drain`       — streaming/job.py build_rollup_stream
                                 (A1/A2/T1/T3/T5 — the pipeline's stage 2;
                                 the oracle encodes Spark's window-eviction
                                 predicate, pinning the late-data policy)
- `stream_sessions_drain`     — streaming session_window (T-session; the
                                 sessionize_events twin, closed sessions)
- `stream_cusum_drain`        — streaming/cusum.py (Page CUSUM control chart)

Oracle design notes (why these are HASH-comparable, not just rows-only):

* Dedup / top-k / CUSUM have exact relational twins: first-seen-by-(ts) per
  key, group-count rank, and the parallel-prefix CUSUM identity
  S_n = P_n − min(0, min_j P_j) — the DuckDB side derives the answer from
  first principles, independently of the stateful fold.
* The near-dup drains exploit the fixture corpora's similarity GAP. The
  driver's `documents` table plants near-dup pairs at 3-gram Jaccard ≥ 0.9
  while every unrelated pair sits ≤ 0.11 (measured at sf0.01/sf0.001), so a
  0.6 estimator threshold and the oracle's exact-Jaccard 0.6 threshold
  CANNOT disagree: the MinHash agreement estimate of a 0.9-Jaccard pair is
  57.6/64 ± 2.4 (8σ above the 38.4 cut) and band collision for unrelated
  docs needs a 4×64-bit hash coincidence. The embedding drain builds its own
  gap (perturbed twin corpus, cosine ≈ 0.9999 vs cross-pair ≤ 0.56) with
  arithmetic expressible identically in both engines.
* Suppressed docs aggregate `min(dup_of)` so the output is the canonical
  (component-minimum) assignment, stable across which of the at-least-once
  band matches fired; fixture components are cliques, so the SQL
  `min(smaller partner)` is exactly the component minimum.

Each drain is a REAL streaming query: state store, checkpoint, Arrow state
serde — the same execution path the continuous-trigger deployment uses; only
the trigger differs (availableNow). The one-file source makes the drain a
single micro-batch, so update-mode emissions are final-state rows; the
`_bid` guard (max batch id per key) keeps the drains correct under
multi-batch replans too.

Cost note: the SPARK side of every drain is bucketed/windowed and scales
(measured 2–20 s at sf0.1); the near-dup ORACLES are deliberately the
quadratic exact forms (that independence is the point) and are sized for the
driver's sf0.01 gate — at sf0.1 the 25M-pair DuckDB check takes minutes.
Run oracle comparisons at the gate scale.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from topk_spark.io.sources import load_table
from topk_spark.ops.timeparts import floor_to_window_ms
from topk_spark.workload import REGISTRY, register
from topk_spark.workload.events_queries import _ES, order_stream

_TMP_ROOTS: list[str] = []


def _cleanup() -> None:
    for d in _TMP_ROOTS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup)


def _range_tile(df: DataFrame, col: str, n: int) -> DataFrame:
    """Attach `_tile` in [0, n): equal-WIDTH event-time ranges between the
    column's min and max, computed from ONE min/max aggregate broadcast back
    onto the rows — no global-order window. (The r5 fixtures used
    `ntile(n) OVER (ORDER BY col)`, a single-partition sort of the whole
    source inside a registered query's plan; a 100×-scale fixture prep
    cannot afford that — same discipline as global_rank_without_global_sort.)
    Exact integer microsecond arithmetic, reproduced verbatim in the DuckDB
    oracles via `_tile_expr_sql`:

        tile = least(n-1, (us - tmin) * n div (tmax - tmin + 1))

    Monotone in `col`, so tile order == event-time order (what the ordered
    replay needs); the +1 keeps the max row in tile n-1 without a branch.

    `col` may also be an integer column (e.g. doc_id for a corpus stream):
    the ranges are then over the raw values — same arithmetic, no epoch
    conversion."""
    us = (
        f"unix_micros({col})"
        if dict(df.dtypes)[col].startswith("timestamp")
        else f"CAST({col} AS BIGINT)"
    )
    b = df.agg(
        F.expr(f"min({us})").alias("_tmin"), F.expr(f"max({us})").alias("_tmax")
    )
    return (
        df.crossJoin(F.broadcast(b))
        .withColumn(
            "_tile",
            F.least(
                F.lit(n - 1),
                F.expr(f"({us} - _tmin) * {n} div (_tmax - _tmin + 1)"),
            ).cast("int"),
        )
        .drop("_tmin", "_tmax")
    )


def _tile_expr_sql(ts: str = "ts", n: int = 3) -> str:
    """Oracle-side twin of `_range_tile`'s arithmetic, expecting a joined
    relation `b(tmin, tmax)` in scope (see `_bounds_sql`). DuckDB `//` is
    BIGINT floor division; both operands are non-negative, so it agrees
    exactly with Spark's `div`."""
    return (
        f"CAST(least({n - 1}, (epoch_us({ts}) - b.tmin) * {n}"
        f" // (b.tmax - b.tmin + 1)) AS INT)"
    )


def _bounds_sql(rel: str, ts: str = "ts") -> str:
    """`b AS (...)` body: the min/max microsecond bounds of `rel`.`ts` —
    MUST range over exactly the rows the Spark side passed to _range_tile."""
    return (
        f"(SELECT epoch_us(min({ts})) AS tmin, epoch_us(max({ts})) AS tmax"
        f" FROM {rel})"
    )


def _write_ordered_tiles(
    part_df: DataFrame,
    root: str,
    name: str,
    n: int,
    base_mtime: float | None,
) -> tuple[str, float]:
    """Write `part_df` (carrying a `_tile` column in [0, n)) as n single-file
    parquet 'arrivals' under root/name, mtimes staggered 10 s apart so a
    FileStreamSource with latestFirst=false replays them in tile order.
    Shared by the single-source `_drain` and the two-source `drain_join`
    (streaming_join_queries); pass the first call's returned base_mtime into
    the second so both sources share one arrival timeline.

    An empty tile is a fixture bug, not an engine condition: Spark may emit
    zero part files for an empty write, which would silently collapse the
    batch schedule the oracles derive — fail loudly instead."""
    src = os.path.join(root, name)
    os.makedirs(src, exist_ok=True)
    for i in range(n):
        tdir = os.path.join(root, f"{name}_tile{i}")
        part_df.filter(F.col("_tile") == i).drop("_tile").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tdir)
        parts = [f for f in os.listdir(tdir) if f.endswith(".parquet")]
        if len(parts) != 1:
            raise RuntimeError(
                f"tile {i}/{n} of drain source '{name}' produced {len(parts)} "
                f"part files — every event-time tercile must be non-empty for "
                f"the ordered replay (batch i == tile i) the oracle assumes; "
                f"regenerate the fixture or lower n_batches"
            )
        dst = os.path.join(src, f"{i:04d}.parquet")
        shutil.copyfile(os.path.join(tdir, parts[0]), dst)
        if base_mtime is None:
            base_mtime = os.stat(dst).st_mtime
        os.utime(dst, (base_mtime + 10 * i, base_mtime + 10 * i))
    return src, base_mtime


def _restart_generations(
    run_generation: Callable[[], None],
    src_dirs: list[str],
    restart_after: int | None,
    root: str,
) -> None:
    """Shared two-generation orchestration for `_drain` and `drain_join`:
    hold tile files >= `restart_after` out of every source dir, run
    generation 1 (which therefore ends believing the stream is drained),
    restore the held files with their original mtimes (preserving the
    oldest-first arrival order), and run a freshly-built generation 2 on
    the same checkpoint. With `restart_after=None`, runs a single
    generation — the non-restart drains go through the same code path."""
    held: list[tuple[str, str, float]] = []
    if restart_after is not None:
        holdout = os.path.join(root, "holdout")
        os.makedirs(holdout)
        for src in src_dirs:
            for fn in sorted(os.listdir(src)):
                if fn.endswith(".parquet") and int(fn.split(".")[0]) >= restart_after:
                    p = os.path.join(src, fn)
                    h = os.path.join(holdout, os.path.basename(src) + "_" + fn)
                    mt = os.stat(p).st_mtime
                    shutil.move(p, h)
                    held.append((h, p, mt))

    run_generation()

    if restart_after is not None:
        for h, p, mt in held:
            shutil.move(h, p)
            os.utime(p, (mt, mt))
        run_generation()


def _drain(
    spark: SparkSession,
    src_df: DataFrame,
    build: Callable[[DataFrame], DataFrame],
    output_mode: str = "update",
    last_per: list[str] | None = None,
    max_files_per_trigger: int | None = None,
    ordered_split: tuple[str, int] | None = None,
    keep_bid: bool = False,
    restart_after: int | None = None,
    pre_tiled: bool = False,
    batch_transform: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Run `build(stream)` over a one-file parquet stream of `src_df`,
    drained with availableNow into a parquet sink; return the drained rows.

    `last_per`: for update-mode stateful operators that re-emit a key's
    state every micro-batch, keep only each key-group's final (max batch id)
    emission. The one-file source yields a single batch in practice, but the
    guard keeps the result well-defined if the engine ever splits the drain.

    `max_files_per_trigger`: write the source as that many files and cap
    files per micro-batch at 1, forcing a genuinely multi-batch drain so
    the `last_per` guard (and cross-batch state continuity) is exercised
    for real, not argued.

    `ordered_split=(col, n)`: with the multi-batch cap, partition the source
    into n files by EQUAL-WIDTH RANGES of `col` between its min and max
    (`_range_tile` — one aggregate + a broadcast, no global-order window)
    instead of round-robin, and stagger the files' mtimes so the
    FileStreamSource's oldest-first listing (latestFirst=false) replays
    them in `col` order — micro-batch i sees exactly time-range i. That
    makes "arrival order" == "event-time order", which is what lets a
    relational oracle predict cross-batch first-seen semantics exactly
    (the oracles reproduce the same integer boundary arithmetic via
    `_tile_expr_sql`/`_bounds_sql`). This is the topology a production
    backfill uses too: range-split by time partitions.

    `keep_bid`: surface the sink's micro-batch id as `_bid` so the caller
    can PROVE multi-batch execution inside the hashed output.

    `batch_transform`: applied to each micro-batch INSIDE foreachBatch
    before the sink write — the rank-on-close hook. In append mode a
    window's rows are all flushed in the one micro-batch whose watermark
    closes it, so a per-window transform (e.g. rank within window) sees
    every row of each window it touches and composes correctly across
    batches and restarts.

    `restart_after=k` (requires `ordered_split`): split the drain into TWO
    query generations on the SAME checkpoint — generation 1 sees only tiles
    < k (later tile files are held out), terminates, and a freshly-built
    query processes the restored remaining tiles. A mid-stream
    stop/reschedule: state, per-operator watermarks, and the source's
    processed-files log all come from the checkpoint alone.
    """
    root = tempfile.mkdtemp(prefix="topk_spark_drain_")
    _TMP_ROOTS.append(root)
    src = os.path.join(root, "src")
    out = os.path.join(root, "out")
    if restart_after is not None and not (ordered_split and max_files_per_trigger):
        raise ValueError(
            "restart_after requires the ordered_split + max_files_per_trigger "
            "tile layout — it is the only source layout with a defined "
            "per-batch schedule to hold out and restore"
        )
    if pre_tiled and not (ordered_split and max_files_per_trigger):
        raise ValueError(
            "pre_tiled requires the ordered_split + max_files_per_trigger "
            "tile layout — otherwise the caller-supplied _tile schedule "
            "would be silently discarded (and _tile would leak into the "
            "stream schema)"
        )
    if max_files_per_trigger and ordered_split:
        col, n = ordered_split
        assert n == max_files_per_trigger
        # pre_tiled: the caller supplies `_tile` itself — the escape hatch
        # for NON-monotone arrival schedules (e.g. stale replays of early
        # rows arriving in a late tile, which _range_tile's event-time
        # ranges cannot express).
        tiled = src_df if pre_tiled else _range_tile(src_df, col, n)
        if pre_tiled:
            src_df = src_df.drop("_tile")
        _write_ordered_tiles(tiled, root, "src", n, None)
    elif max_files_per_trigger:
        src_df.repartition(max_files_per_trigger).write.mode(
            "overwrite"
        ).parquet(src)
    else:
        src_df.coalesce(1).write.mode("overwrite").parquet(src)

    result_schema = None

    def write_batch(df: DataFrame, bid: int) -> None:
        if batch_transform is not None:
            df = batch_transform(df)
        df.withColumn("_bid", F.lit(int(bid))).write.mode("append").parquet(out)

    def run_generation() -> None:
        nonlocal result_schema
        reader = spark.readStream.schema(src_df.schema)
        if max_files_per_trigger and ordered_split:
            reader = reader.option("maxFilesPerTrigger", 1).option(
                "latestFirst", "false"
            )
        elif max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", 1)
        result = build(reader.parquet(src))
        # the zero-emission fallback must carry the SINK schema: apply the
        # batch transform to an empty batch twin to derive it
        result_schema = (
            result.schema
            if batch_transform is None
            else batch_transform(
                spark.createDataFrame([], result.schema)
            ).schema
        )
        q = (
            result.writeStream.foreachBatch(write_batch)
            .outputMode(output_mode)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _restart_generations(run_generation, [src], restart_after, root)

    if not os.path.isdir(out):  # zero emissions end-to-end
        return spark.createDataFrame([], result_schema)
    drained = spark.read.parquet(out)
    if last_per:
        w = Window.partitionBy(*last_per)
        drained = drained.withColumn("_mb", F.max("_bid").over(w)).where(
            F.col("_bid") == F.col("_mb")
        ).drop("_mb")
    return drained if keep_bid else drained.drop("_bid")


# ---------------------------------------------------------------------------
# D1/D2 — stateful first-seen dedup (TopKStreamingJob.kt:87-119)
# ---------------------------------------------------------------------------

@register(
    "stream_dedup_drain",
    tags=("D1", "D2", "T6", "streaming"),
    oracle=f"""
WITH {_ES},
b AS (
  SELECT es.*, CAST(floor(epoch_ms(ts) / 60000) * 60000 AS BIGINT) AS bucket,
         row_number() OVER (
           PARTITION BY user_id, event_type,
                        CAST(floor(epoch_ms(ts) / 60000) * 60000 AS BIGINT)
           ORDER BY ts ASC) AS rn
  FROM es
)
SELECT event_type, count(*) AS survivors,
       CAST(SUM(revenue_cents) AS BIGINT) AS revenue_cents
FROM b WHERE rn = 1
GROUP BY event_type
""",
)
def stream_dedup_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the REAL `dedup_stateful` operator (applyInPandasWithState,
    per-key GroupState) over the order stream, keyed like the batch
    `dedup_first_seen` twin: at most one event per (user, item, minute),
    earliest ts wins. The oracle derives survivors relationally
    (row_number = 1), independent of the state machine. Fixture ts values
    are tie-free within a key, so the fold is deterministic."""
    from topk_spark.streaming.stateful_dedup import dedup_stateful

    # State is keyed on the COLUMN TUPLE, not a string concatenation — a
    # '|' inside a field value would collide distinct keys (round-4 ADVICE).
    es = order_stream(spark, sf_dir).withColumn(
        "bucket", floor_to_window_ms("ts", 60_000)
    )
    drained = _drain(
        spark,
        es,
        lambda s: dedup_stateful(
            s, key=["user_id", "event_type", "bucket"], ttl_ms=None,
            order_col="ts",
        ),
    )
    return drained.groupBy("event_type").agg(
        F.count("*").alias("survivors"),
        F.sum("revenue_cents").cast("long").alias("revenue_cents"),
    )


# Shared by the 3-batch continuity drain and its checkpoint-RESTART twin:
# `n_batches` counts DISTINCT sink batch ids that emitted a survivor, which
# is invariant under the engine's internal batch-id renumbering across a
# restart (generation 1's trailing flush batch consumes an id without
# emitting), so the same derivation gates both.
_DEDUP_MULTIBATCH_ORACLE = f"""
WITH {_ES},
b AS {_bounds_sql("es")},
t AS (
  SELECT es.*, {_tile_expr_sql()} AS tile,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts)
           AS rn
  FROM es CROSS JOIN b
),
first_seen AS (SELECT * FROM t WHERE rn = 1),
nb AS (SELECT count(DISTINCT tile) AS n_batches FROM first_seen)
SELECT event_type, count(*) AS survivors,
       CAST(SUM(revenue_cents) AS BIGINT) AS revenue_cents,
       CAST(nb.n_batches AS BIGINT) AS n_batches
FROM first_seen CROSS JOIN nb
GROUP BY event_type, nb.n_batches
"""


@register(
    "stream_dedup_multibatch_drain",
    tags=("D1", "T6", "T8", "streaming"),
    oracle=_DEDUP_MULTIBATCH_ORACLE,
)
def stream_dedup_multibatch_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-BATCH state continuity under the gate: the same stateful
    first-seen dedup operator, but drained through THREE micro-batches
    (`maxFilesPerTrigger=1` over three event-time-ordered source files) and
    keyed WITHOUT a time bucket — every (user, event_type) key recurs in
    later batches, so the result is correct ONLY if batch-1 state survives
    into batches 2 and 3 (state resetting per batch would emit each key up
    to 3× and the survivor counts would hash-mismatch). This is the
    reference's semantics — TopKStreamingJob.kt:87-119 keeps dedup state
    across events indefinitely, not per ingest chunk.

    The event-time-ordered split (`_drain` ordered_split) makes arrival
    order == ts order, so the relational oracle's row_number-over-ts
    first-seen IS the operator's cross-batch first-seen (fixture ts values
    are globally unique — measured, both gate scales). `n_batches` carries
    the micro-batch evidence INSIDE the hash: it counts distinct sink batch
    ids that emitted a survivor, and the oracle independently derives it as
    the number of distinct ts-terciles containing a key's first event."""
    from topk_spark.streaming.stateful_dedup import dedup_stateful

    es = order_stream(spark, sf_dir)
    drained = _drain(
        spark,
        es,
        lambda s: dedup_stateful(
            s, key=["user_id", "event_type"], ttl_ms=None, order_col="ts"
        ),
        max_files_per_trigger=3,
        ordered_split=("ts", 3),
        keep_bid=True,
    )
    nb = drained.agg(
        F.countDistinct("_bid").cast("long").alias("n_batches")
    )
    return (
        drained.groupBy("event_type")
        .agg(
            F.count("*").alias("survivors"),
            F.sum("revenue_cents").cast("long").alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(nb))
    )


@register(
    "stream_dedup_restart_drain",
    tags=("D1", "T6", "T8", "streaming", "restart"),
    oracle=_DEDUP_MULTIBATCH_ORACLE,
)
def stream_dedup_restart_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECKPOINT-RESTART continuity for the custom GroupState operator
    under the driver hash gate (the join-buffer twin is
    `stream_interval_join_restart_drain`; the pytest matrix pins both ×2
    state-store providers): the same first-seen dedup as the multibatch
    drain, but the drain STOPS after the first two event-time terciles and
    a freshly-built query — new lineage, same checkpoint — processes the
    third. Every (user, event_type) key recurring in tercile 2 must be
    SUPPRESSED by first-seen state recovered from the checkpoint: a restart
    that reset the GroupState would re-admit those keys in the restored
    generation, inflating the survivor counts, adding a third distinct
    emitting batch (`n_batches`), and failing the hash. The oracle is the
    multibatch drain's SQL verbatim — a mid-stream reschedule must be
    invisible in the results."""
    from topk_spark.streaming.stateful_dedup import dedup_stateful

    es = order_stream(spark, sf_dir)
    drained = _drain(
        spark,
        es,
        lambda s: dedup_stateful(
            s, key=["user_id", "event_type"], ttl_ms=None, order_col="ts"
        ),
        max_files_per_trigger=3,
        ordered_split=("ts", 3),
        keep_bid=True,
        restart_after=2,
    )
    nb = drained.agg(
        F.countDistinct("_bid").cast("long").alias("n_batches")
    )
    return (
        drained.groupBy("event_type")
        .agg(
            F.count("*").alias("survivors"),
            F.sum("revenue_cents").cast("long").alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(nb))
    )


def _under_rocksdb(spark: SparkSession, run: Callable[[], DataFrame]) -> DataFrame:
    """Execute a drain under the RocksDB state-store provider, restoring the
    previous conf afterwards (it is read at streaming-query start, so a
    driver-owned session is left untouched; the drain's streaming queries
    have fully terminated before the restore — the returned DataFrame is a
    batch read of the sink). Falls back to the default store on a build
    without the provider; results are identical either way."""
    from topk_spark.session import _STATE_STORE_CONF, set_state_store

    try:
        prev = spark.conf.get(_STATE_STORE_CONF)
    except Exception:
        prev = None
    applied = set_state_store(spark, "rocksdb")
    try:
        return run()
    finally:
        if applied:
            if prev is None:
                spark.conf.unset(_STATE_STORE_CONF)
            else:
                spark.conf.set(_STATE_STORE_CONF, prev)


@register(
    "stream_dedup_restart_rocksdb_drain",
    tags=("D1", "T6", "T8", "streaming", "restart", "rocksdb"),
    oracle=_DEDUP_MULTIBATCH_ORACLE,
)
def stream_dedup_restart_rocksdb_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup restart drain executed under the ROCKSDB state-store
    provider — the backend the 100 TB deployment story names (state spills
    to local disk with bounded memory; session.set_state_store, benched
    since round 4). Recovery from a RocksDB checkpoint is a different code
    path from the default HDFS-backed store (SST files + changelog replay
    rather than delta files into in-memory maps), so this puts the
    provider's own persist-and-reload cycle under the oracle hash, not
    just pytest (tests/test_restart_continuity.py covers all five stateful
    classes ×2 providers behaviorally; this adds the driver-gated exact-
    result check). Provider flip + restore via `_under_rocksdb`; the
    join-buffer twin is `stream_interval_join_restart_rocksdb_drain`."""
    return _under_rocksdb(
        spark, lambda: stream_dedup_restart_drain(spark, sf_dir)
    )


# ---------------------------------------------------------------------------
# K1 — continuous per-key top-K (ProcessFunctions.kt:62-134)
# ---------------------------------------------------------------------------

_TOPK_ORACLE = f"""
WITH {_ES},
g AS (
  SELECT event_type AS restaurant_id,
         CAST(user_id AS VARCHAR) AS menu_item_id,
         'u' || CAST(user_id AS VARCHAR) AS menu_item_name,
         count(*) AS order_count,
         CAST(SUM(quantity) AS BIGINT) AS total_quantity,
         CAST(SUM(revenue_cents) AS BIGINT) AS total_revenue_cents
  FROM es GROUP BY 1, 2, 3
),
r AS (
  SELECT *, CAST(row_number() OVER
         (PARTITION BY restaurant_id
          ORDER BY order_count DESC, menu_item_id ASC) AS INT) AS rank
  FROM g
)
SELECT restaurant_id, menu_item_id, menu_item_name, order_count,
       total_quantity, total_revenue_cents, rank
FROM r WHERE rank <= 5
"""


def _order_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → the reference's order-event shape (restaurant=event_type,
    menu item=user): the projection continuous_topk consumes."""
    return order_stream(spark, sf_dir).select(
        F.col("event_type").alias("restaurant_id"),
        F.col("user_id").cast("string").alias("menu_item_id"),
        F.concat(F.lit("u"), F.col("user_id")).alias("menu_item_name"),
        "quantity",
        "revenue_cents",
    )


@register("stream_topk_drain", tags=("K1", "K2", "T8", "streaming"), oracle=_TOPK_ORACLE)
def stream_topk_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the REAL `continuous_topk` stateful operator (MapState-analog
    per-restaurant item metrics, rank/truncate to k, re-emit per batch —
    ProcessFunctions.kt:62-134) and keep each key's final emission. With the
    whole fixture as one batch the bounded-state truncation is lossless, so
    the relational rank oracle is exact; the tiebreak (order_count desc,
    item id asc as STRINGS) matches the operator's sort key."""
    from topk_spark.streaming.continuous_topk import continuous_topk

    drained = _drain(
        spark,
        _order_events(spark, sf_dir),
        lambda s: continuous_topk(s, k=5),
        last_per=["restaurant_id"],
    )
    return drained


@register(
    "stream_global_topk_drain",
    tags=("K3", "G4", "streaming"),
    oracle=f"""
WITH {_ES},
g AS (
  SELECT CAST(user_id AS VARCHAR) AS menu_item_id,
         max('u' || CAST(user_id AS VARCHAR)) AS menu_item_name,
         count(*) AS order_count,
         CAST(SUM(quantity) AS BIGINT) AS total_quantity,
         CAST(SUM(revenue_cents) AS BIGINT) AS total_revenue_cents
  FROM es GROUP BY 1
),
r AS (
  SELECT *, CAST(row_number() OVER
         (ORDER BY order_count DESC, menu_item_id ASC) AS INT) AS rank
  FROM g
)
SELECT 'ALL' AS restaurant_id, menu_item_id, menu_item_name, order_count,
       total_quantity, total_revenue_cents, rank
FROM r WHERE rank <= 10
""",
)
def stream_global_topk_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain `continuous_global_topk`: the map-side `prereduce_orders` pass
    plus the 'ALL'-sentinel single-key stateful ranking (the reference's
    `keyBy {{ "global" }}` shape, TopKStreamingJob.kt:543-548, WITH the
    pre-reduce the reference lacks)."""
    from topk_spark.streaming.continuous_topk import continuous_global_topk

    drained = _drain(
        spark,
        _order_events(spark, sf_dir),
        lambda s: continuous_global_topk(s, k=10),
        last_per=["restaurant_id"],
    )
    return drained


# ---------------------------------------------------------------------------
# Streaming MinHash near-dup suppression (streaming/neardup.py)
# ---------------------------------------------------------------------------

@register(
    "stream_neardup_drain",
    tags=("DD-minhash", "streaming"),
    oracle="""
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(l)-1),
            i -> concat_ws(' ', l[i], l[i+1], l[i+2]))) AS s
  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS l
        FROM documents)
)
SELECT b.doc_id AS id, min(a.doc_id) AS dup_of
FROM sh a, sh b
WHERE a.doc_id < b.doc_id
  AND len(list_intersect(a.s, b.s))::DOUBLE
      / len(list_distinct(list_concat(a.s, b.s)))::DOUBLE >= 0.6
GROUP BY b.doc_id
""",
)
def stream_neardup_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the REAL streaming MinHash-LSH near-dup operator over the raw
    `documents` table (which plants near-dup pairs at Jaccard ≥ 0.9 against
    a ≤ 0.11 noise floor) and reduce the at-least-once match stream to the
    canonical assignment: each suppressed doc → min(dup_of). The oracle is
    the EXACT 3-gram-Jaccard answer (each non-minimum member of a ≥ 0.6
    component → component min; fixture components are cliques). The 8σ
    estimator margin and the 256-bit band-collision barrier (module
    docstring) make estimator-vs-exact disagreement impossible here."""
    return _neardup_drain(spark, sf_dir)


@register(
    "stream_neardup_restart_drain",
    tags=("DD-minhash", "T8", "streaming", "restart"),
    oracle=REGISTRY["stream_neardup_drain"].oracle,
)
def stream_neardup_restart_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH suppressor across a CHECKPOINT RESTART — the pytest
    bucket-state pin (test_neardup_bucket_state_survives_restart) promoted
    to the driver hash on the real corpus: docs replay in doc_id order
    over three tiles with a restart after the first, so roughly half the
    planted near-dup pairs (measured 15 of 28 cross-tile at sf0.001) have
    their canonical member's band-bucket entries written BEFORE the stop
    and the duplicate arriving after it. A reset silently re-admits those
    duplicates — the worst failure mode for an ingest-time suppressor —
    shifting min(dup_of) assignments under the shared exact-Jaccard
    oracle. Arrival order only permutes which at-least-once matches fire;
    the canonical (component-minimum) reduction is order-invariant, so
    the forward drain's oracle applies verbatim."""
    return _neardup_drain(spark, sf_dir, restart_after=1)


def _neardup_drain(
    spark: SparkSession, sf_dir: str, restart_after: int | None = None
) -> DataFrame:
    from topk_spark.streaming.neardup import neardup_match_stream

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    kwargs = (
        dict(
            max_files_per_trigger=3,
            ordered_split=("doc_id", 3),
            restart_after=restart_after,
        )
        if restart_after is not None
        else {}
    )
    drained = _drain(
        spark,
        docs,
        lambda s: neardup_match_stream(
            s, id_col="doc_id", text_col="text",
            shingle_n=3, num_perm=64, bands=16, est_threshold=0.6,
        ),
        output_mode="append",
        **kwargs,
    )
    return drained.groupBy("id").agg(F.min("dup_of").alias("dup_of"))


# ---------------------------------------------------------------------------
# Streaming embedding near-dup (streaming/embed_neardup.py)
# ---------------------------------------------------------------------------

_EMB_PERT_OFFSET = 1_000_000


@register(
    "stream_embed_neardup_drain",
    tags=("DD-embed", "streaming"),
    oracle=f"""
WITH v0 AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
corpus AS (
  SELECT vec_id, e FROM v0
  UNION ALL
  SELECT vec_id + {_EMB_PERT_OFFSET} AS vec_id,
         list_transform(range(1, len(e)+1),
                        i -> e[i] * (1 + 0.0001 * (((i-1) % 5) + 1))) AS e
  FROM v0
),
n AS (
  SELECT vec_id, e, sqrt(list_inner_product(e, e)) AS nrm FROM corpus
)
SELECT b.vec_id AS id, min(a.vec_id) AS dup_of
FROM n a, n b
WHERE a.vec_id < b.vec_id
  AND list_inner_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.95
GROUP BY b.vec_id
""",
)
def stream_embed_neardup_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the REAL streaming hyperplane-LSH embedding near-dup operator.
    The fixture embeddings have no planted near-dups (max cross cosine
    ≈ 0.55), so the corpus is the table unioned with a deterministic
    perturbed twin (component i scaled by 1 + 1e-4·((i mod 5)+1) — cosine
    ≈ 0.9999 to its original, identical double arithmetic in both engines).
    Verification inside the operator is EXACT cosine ≥ 0.95; the LSH only
    gates which pairs meet (H=12/L=8 → per-pair miss ~1e-21 at this gap), so
    the quadratic exact oracle is the answer the drain must reproduce."""
    return _embed_neardup_drain(spark, sf_dir)


@register(
    "stream_embed_neardup_restart_drain",
    tags=("DD-embed", "T8", "streaming", "restart"),
    oracle=REGISTRY["stream_embed_neardup_drain"].oracle,
)
def stream_embed_neardup_restart_drain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The hyperplane-LSH embedding suppressor across a CHECKPOINT
    RESTART, with the cleanest possible split: an EXPLICIT tile schedule
    (pre_tiled) puts every ORIGINAL vector in tile 0 — generation 1 — and
    every perturbed twin after the restart (split by vec_id parity into
    tiles 1 and 2, so all three arrival files are non-empty), so EVERY
    match the drain must emit pairs a post-restart arrival against
    pre-restart bucket state — zero same-generation matches to hide
    behind. (Pre-r10 this tiled by raw vec_id, whose 1e6 twin offset left
    the middle tercile empty — the explicit schedule keeps the split AND
    the harness's every-tile-non-empty invariant.) A state reset emits
    nothing at all and fails the shared exact-cosine oracle on every
    row; twin arrival order within tiles 1–2 is irrelevant because
    cross-twin cosine inherits the ≤0.56 cross-pair gap."""
    return _embed_neardup_drain(spark, sf_dir, restart_after=1)


def _embed_neardup_drain(
    spark: SparkSession, sf_dir: str, restart_after: int | None = None
) -> DataFrame:
    from topk_spark.streaming.embed_neardup import embed_neardup_match_stream

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    pert = emb.select(
        (F.col("vec_id") + F.lit(_EMB_PERT_OFFSET)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * (F.lit(1.0) + F.lit(0.0001) * ((i % 5) + 1).cast("double")),
        ).alias("embedding"),
    )
    corpus = emb.unionByName(pert)
    if restart_after is not None:
        # explicit arrival schedule: originals → tile 0 (generation 1),
        # twins → tiles 1/2 by parity (both non-empty for any n ≥ 2) — a
        # raw-vec_id range tile would leave the middle tercile empty
        # because the twin ids sit 1e6 above the originals
        corpus = corpus.withColumn(
            "_tile",
            F.when(F.col("vec_id") < _EMB_PERT_OFFSET, F.lit(0))
            .when(F.col("vec_id") % 2 == 0, F.lit(1))
            .otherwise(F.lit(2))
            .cast("int"),
        )
        kwargs = dict(
            max_files_per_trigger=3,
            ordered_split=("vec_id", 3),
            restart_after=restart_after,
            pre_tiled=True,
        )
    else:
        kwargs = {}
    drained = _drain(
        spark,
        corpus,
        lambda s: embed_neardup_match_stream(
            s, id_col="vec_id", vec_col="embedding",
            num_planes=12, num_tables=8, threshold=0.95, max_bucket=16,
        ),
        output_mode="append",
        **kwargs,
    )
    return drained.groupBy("id").agg(F.min("dup_of").alias("dup_of"))


# ---------------------------------------------------------------------------
# A1/A2/T1/T3 — the PIPELINE's watermarked tumbling rollup (streaming/job.py)
# ---------------------------------------------------------------------------

@register(
    "stream_rollup_drain",
    tags=("A1", "A2", "T1", "T3", "T5", "streaming"),
    oracle=f"""
WITH {_ES},
wm AS (
  -- Spark's event-time watermark after the single drain batch:
  -- max event time (ms precision) minus the 10 s delay.
  SELECT CAST(floor(epoch_ms(max(ts))) AS BIGINT) - 10000 AS w FROM es
),
r AS (
  SELECT event_type AS restaurant_id,
         CAST(user_id AS VARCHAR) AS menu_item_id,
         CAST(floor(epoch_ms(ts) / 60000) * 60000 AS BIGINT) AS window_start_1m,
         CAST(SUM(quantity) AS BIGINT) AS sum_quantity,
         CAST(SUM(revenue_cents) AS BIGINT) AS sum_revenue_cents,
         count(*) AS order_count
  FROM es GROUP BY 1, 2, 3
)
SELECT r.* FROM r, wm
WHERE r.window_start_1m + 60000 <= wm.w
""",
)
def stream_rollup_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the PIPELINE's stage-2 operator itself — streaming/job.py
    `build_rollup_stream`: 10 s watermark, 1-minute tumbling window,
    partial+final aggregation, append-mode window eviction. The drained
    output is exactly the windows the watermark closed; the oracle
    recomputes them relationally and applies the same eviction predicate
    (window_end ≤ max_event_time − delay), so the hash check pins BOTH the
    aggregation arithmetic and Spark's late-data/window-close policy (T1/T5).
    The HLL sketch column is dropped (engine-specific bytes; its estimate
    accuracy is oracled separately by `hll_error_bound`)."""
    from topk_spark.streaming.job import build_rollup_stream

    es = order_stream(spark, sf_dir)
    src = es.select(
        F.col("event_id").cast("string").alias("event_id"),
        F.col("event_type").alias("restaurant_id"),
        F.col("user_id").cast("string").alias("menu_item_id"),
        F.concat(F.lit("u"), F.col("user_id")).alias("menu_item_name"),
        F.lit("CAT0").alias("category_id"),
        F.col("user_id").cast("string").alias("customer_id"),
        "quantity",
        F.col("price_cents").alias("price_in_cents"),
        F.col("ts").alias("event_ts"),
        "revenue_cents",
    )
    drained = _drain(
        spark,
        src,
        lambda s: build_rollup_stream(s),
        output_mode="append",
    )
    return drained.select(
        "restaurant_id",
        "menu_item_id",
        "window_start_1m",
        "sum_quantity",
        "sum_revenue_cents",
        "order_count",
    )


# ---------------------------------------------------------------------------
# T-session — streaming session windows (the sessionize_events twin)
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 6 * 3600 * 1_000_000  # 6 h, matching sessionize_events

# Shared by the forward and the checkpoint-restart session drains: a restart
# must be invisible in the closed-session output.
_SESSIONS_ORACLE = f"""
WITH wm AS (
  SELECT CAST(floor(epoch_ms(max(ts))) AS BIGINT) - 10000 AS w FROM events
),
marks AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER uw) >= {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  -- sid ordering matches the marks window exactly (ts, event_id): with a
  -- ts-only order, duplicate-ts rows at a gap boundary would get a
  -- nondeterministic session id (round-4 ADVICE; fixtures are tie-free,
  -- but the oracle should not depend on that).
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marks
),
agg AS (
  SELECT user_id, min(ts) AS session_start, max(ts) AS session_last,
         count(*) AS n_events,
         CAST(round(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
           AS session_value
  FROM sess GROUP BY user_id, sid
)
SELECT user_id, session_start, session_last, n_events, session_value
FROM agg, wm
WHERE CAST(floor(epoch_ms(session_last)) AS BIGINT) + {6 * 3600 * 1000} <= wm.w
"""


@register(
    "stream_sessions_drain",
    tags=("T-session", "T1", "streaming"),
    oracle=_SESSIONS_ORACLE,
)
def stream_sessions_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain STREAMING `session_window` sessionization (6 h dynamic gap,
    10 s watermark) — the streaming twin of the r1-verified batch
    `sessionize_events`. Append mode emits only sessions the watermark
    CLOSED (session end = last event + gap); the oracle sessionizes
    relationally (lag/cumsum) and applies the same closure predicate, so
    the hash pins gap-merge semantics AND the finalize-on-watermark policy.
    Sessions still open at end-of-stream are withheld on both sides."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    return _drain(spark, e, _build_sessions, output_mode="append")


def _build_sessions(s: DataFrame) -> DataFrame:
    return (
        s.withWatermark("ts", "10 seconds")
        .groupBy(
            F.session_window("ts", "6 hours").alias("w"),
            "user_id",
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last"),
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")), 4
            ).cast("double").alias("session_value"),
        )
        .select(
            "user_id", "session_start", "session_last",
            "n_events", "session_value",
        )
    )


@register(
    "stream_sessions_restart_drain",
    tags=("T-session", "T1", "T8", "streaming", "restart"),
    oracle=_SESSIONS_ORACLE,
)
def stream_sessions_restart_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window sessionization across a CHECKPOINT RESTART — the
    driver-gated twin of the pytest pin
    (test_restart_continuity.py::test_session_window_state_survives_restart)
    and the one stateful class whose recovery must support MERGE-into-
    existing, not just key-value reload: generation 1 drains the first
    event-time tile and stops with thousands of sessions open; the
    restarted query's in-gap arrivals must extend those RECOVERED open
    sessions (same session row, higher n_events/session_value) rather than
    open fresh ones. A state reset splits every restart-straddling session
    in two — both halves hash-mismatch the shared relational oracle, which
    sessionizes the full event list with no restart in sight. Ordered
    tiles keep arrival = event-time order, so closed-by-watermark
    semantics are identical to the forward drain's."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    return _drain(
        spark,
        e,
        _build_sessions,
        output_mode="append",
        max_files_per_trigger=3,
        ordered_split=("ts", 3),
        restart_after=1,
    )


# ---------------------------------------------------------------------------
# Streaming CUSUM (streaming/cusum.py)
# ---------------------------------------------------------------------------

_CUSUM_TARGET_CENTS = 1400  # fixed reference target μ (Page's procedure)
_CUSUM_H_CENTS = 250_000  # alarm threshold h


# Shared by the forward and checkpoint-restart CUSUM drains: the statistic
# is a fold over the event-time-ORDERED sequence, so with ts-ordered tiles
# the restarted fold must continue mid-sequence bit-for-bit.
_CUSUM_DRAIN_ORACLE = f"""
WITH es AS (
  SELECT event_type, ts,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
pre AS (
  SELECT event_type,
         SUM(cents - {_CUSUM_TARGET_CENTS}) OVER (
           PARTITION BY event_type ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM es
),
agg AS (
  SELECT es.event_type,
         CAST(count(*) AS BIGINT) AS n_total,
         SUM(cents) - {_CUSUM_TARGET_CENTS} * count(*) AS pn
  FROM es GROUP BY es.event_type
),
mn AS (
  SELECT event_type, least(0, min(p)) AS mp FROM pre GROUP BY event_type
)
SELECT agg.event_type AS key, n_total,
       CAST(pn - mp AS BIGINT) AS cusum,
       (pn - mp > {_CUSUM_H_CENTS}) AS alarm
FROM agg JOIN mn USING (event_type)
"""


@register(
    "stream_cusum_drain",
    tags=("timeseries", "anomaly", "streaming"),
    oracle=_CUSUM_DRAIN_ORACLE,
)
def stream_cusum_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the REAL streaming CUSUM control chart (per-key BIGINT state,
    event-time-ordered fold per batch) against a fixed reference target μ.
    The oracle re-derives the final statistic from the parallel-prefix
    identity S_n = P_n − min(0, min_j P_j) — a genuinely independent
    derivation of the same sequential recursion (changepoint_queries.py
    documents the identity). Fixture ts values are unique per event_type,
    so the fold order is pinned."""
    return _cusum_drain(spark, sf_dir)


@register(
    "stream_cusum_restart_drain",
    tags=("timeseries", "anomaly", "T8", "streaming", "restart"),
    oracle=_CUSUM_DRAIN_ORACLE,
)
def stream_cusum_restart_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSUM control chart across a CHECKPOINT RESTART — the
    SEQUENTIAL-fold state class: unlike set-valued or additive state, the
    recursion S_n = max(0, S_{n-1} + (x_n − μ)) depends on resume POSITION,
    so the restarted generation must continue each key's fold mid-sequence
    from the recovered (prefix-sum, running-min, count) triple. Generation
    1 drains the first event-time tile and stops; ts-ordered tiles keep
    arrival = fold order, so the shared oracle's parallel-prefix identity
    (S_n = P_n − min(0, min_j P_j), over the FULL sequence) is exactly
    what an invisible restart must reproduce — a reset fold computes the
    statistic of the suffix alone, which shifts cusum for every key whose
    running minimum lives in tile 0."""
    return _cusum_drain(spark, sf_dir, restart_after=1)


def _cusum_drain(
    spark: SparkSession, sf_dir: str, restart_after: int | None = None
) -> DataFrame:
    from topk_spark.streaming.cusum import cusum_stateful

    es = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    kwargs = (
        dict(
            max_files_per_trigger=3,
            ordered_split=("ts", 3),
            restart_after=restart_after,
        )
        if restart_after is not None
        else {}
    )
    drained = _drain(
        spark,
        es,
        lambda s: cusum_stateful(
            s,
            target_cents=_CUSUM_TARGET_CENTS,
            h_cents=_CUSUM_H_CENTS,
            key="event_type",
            value_col="cents",
            order_col="ts",
        ),
        last_per=["key"],
        **kwargs,
    )
    return drained.select("key", "n_total", "cusum", "alarm")


# ---------------------------------------------------------------------------
# Streaming SLIDING (hopping) window rollup — the overlap generalization of
# stream_rollup_drain's tumbling window (batch twin: rollup_sliding_5m_1m)
# ---------------------------------------------------------------------------

_SLIDING_ORACLE = f"""
WITH {_ES},
wm AS (
  -- final event-time watermark after the drain: max ts (ms) - 10 s delay
  SELECT CAST(floor(epoch_ms(max(ts))) AS BIGINT) - 10000 AS w FROM es
),
slid AS (
  -- Spark assigns ts to the 5 slide-aligned windows covering it; the
  -- amplification is materialized explicitly here (same arithmetic the
  -- batch rollup_sliding_5m_1m oracle verified green since r6)
  SELECT e.event_type, e.revenue_cents,
         epoch_ms(date_trunc('minute', e.ts)) - k.k * 60000 AS ws
  FROM es e CROSS JOIN (SELECT unnest(range(5)) AS k) k
),
agg AS (
  SELECT event_type, ws,
         CAST(SUM(revenue_cents) AS BIGINT) AS revenue_cents,
         count(*) AS order_count
  FROM slid GROUP BY event_type, ws
)
SELECT event_type, CAST(ws AS BIGINT) AS window_start,
       CAST(ws + 300000 AS BIGINT) AS window_end,
       revenue_cents, order_count
FROM agg, wm
WHERE ws + 300000 <= wm.w
"""


def _sliding_rollup_drain(
    spark: SparkSession, sf_dir: str, restart_after: int | None = None
) -> DataFrame:
    from topk_spark.ops.rollup import windowed_rollup

    es = order_stream(spark, sf_dir).select(
        "event_id", "ts", "event_type", "revenue_cents"
    )

    def build(s: DataFrame) -> DataFrame:
        return windowed_rollup(
            s.withWatermark("ts", "10 seconds"),
            "ts",
            ["event_type"],
            [
                F.sum("revenue_cents").cast("long").alias("revenue_cents"),
                F.count("*").alias("order_count"),
            ],
            "5 minutes",
            slide="1 minute",
        ).select(
            "event_type", "window_start", "window_end",
            "revenue_cents", "order_count",
        )

    return _drain(
        spark,
        es,
        build,
        output_mode="append",
        max_files_per_trigger=3,
        ordered_split=("ts", 3),
        restart_after=restart_after,
    )


@register(
    "stream_sliding_rollup_drain",
    tags=("A1", "T1", "T3", "T5", "streaming"),
    oracle=_SLIDING_ORACLE,
)
def stream_sliding_rollup_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain a SLIDING-window streaming rollup (5-minute windows hopping
    every 1 minute, 10 s watermark, append mode) over three event-time-
    ordered micro-batches. The reference runs tumbling windows only
    (TopKStreamingJob.kt:313); this is the Flink SlidingEventTimeWindows
    analog the batch `rollup_sliding_5m_1m` registered in r6, now as the
    REAL streaming operator: each event enters 5 overlapping windows
    map-side (before partial aggregation, so the shuffle carries only
    per-window partials — the posture that holds at 100 TB), windows
    accumulate ACROSS micro-batches, and append emits a window exactly once
    when the watermark passes its end. The oracle amplifies the overlap
    explicitly and applies the same closure predicate; windows still open
    at end-of-stream are withheld on both sides."""
    return _sliding_rollup_drain(spark, sf_dir)


@register(
    "stream_sliding_rollup_restart_drain",
    tags=("A1", "T1", "T3", "T8", "streaming", "restart"),
    oracle=_SLIDING_ORACLE,
)
def stream_sliding_rollup_restart_drain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Checkpoint-restart twin of `stream_sliding_rollup_drain` — and the
    first driver restart pin for Spark's BUILT-IN windowed-aggregation
    state (StateStoreSave): the existing restart drains all recover
    applyInPandasWithState or symmetric-join state. Generation 1 drains
    only the first event-time tile and stops; a freshly-built query resumes
    from the checkpoint alone. Sliding windows straddling the stop point
    hold partial sums in recovered state — losing them under-counts those
    windows and fails the shared oracle's value hash; a watermark reset
    would re-emit or mis-close windows (append emits exactly once)."""
    return _sliding_rollup_drain(spark, sf_dir, restart_after=1)


def _sliding_from_slices_drain(
    spark: SparkSession, sf_dir: str, restart_after: int | None = None
) -> DataFrame:
    from topk_spark.ops.rollup import windowed_rollup

    es = order_stream(spark, sf_dir).select(
        "event_id", "ts", "event_type", "revenue_cents"
    )

    def build(s: DataFrame) -> DataFrame:
        # level 1: plain TUMBLING 1-minute slices — each event touches ONE
        # window, streaming state holds 1× open slices (vs the direct
        # sliding form's ratio× overlap factor)
        return windowed_rollup(
            s.withWatermark("ts", "10 seconds"),
            "ts",
            ["event_type"],
            [
                F.sum("revenue_cents").cast("long").alias("revenue_cents"),
                F.count("*").alias("order_count"),
            ],
            "1 minute",
        ).select("event_type", "window_start", "revenue_cents", "order_count")

    slices = _drain(
        spark,
        es,
        build,
        output_mode="append",
        max_files_per_trigger=3,
        ordered_split=("ts", 3),
        restart_after=restart_after,
    )
    # level 2: re-aggregate the 5 slice partials tiling each hop window.
    # A hop window [ws, ws+5m) is decidable exactly when its LAST slice is
    # (ws+5m <= wm), so the closure predicate is the sliding drain's own —
    # which is why this composition shares _SLIDING_ORACLE verbatim.
    wm = es.agg(
        (F.unix_millis(F.max("ts")) - F.lit(10000)).cast("long").alias("w")
    )
    hop = (
        slices.withColumn("_k", F.explode(F.expr("sequence(0, 4)")))
        .withColumn(
            "ws", (F.col("window_start") - F.col("_k") * F.lit(60_000)).cast("long")
        )
        .groupBy("event_type", "ws")
        .agg(
            F.sum("revenue_cents").cast("long").alias("revenue_cents"),
            F.sum("order_count").cast("long").alias("order_count"),
        )
    )
    return (
        hop.crossJoin(F.broadcast(wm))
        .where(F.col("ws") + F.lit(300_000) <= F.col("w"))
        .select(
            "event_type",
            F.col("ws").alias("window_start"),
            (F.col("ws") + F.lit(300_000)).cast("long").alias("window_end"),
            "revenue_cents",
            "order_count",
        )
    )


@register(
    "stream_sliding_from_slices_drain",
    tags=("A1", "A5", "A9", "T1", "T3", "streaming"),
    oracle=_SLIDING_ORACLE,
)
def stream_sliding_from_slices_drain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SLICE-SHARING streaming form of `stream_sliding_rollup_drain`,
    result-identical under _SLIDING_ORACLE verbatim: the REAL streaming
    operator is a tumbling 1-minute slice rollup (each event in exactly ONE
    window — open-state factor 1×, vs the direct sliding form's measured
    ~5× and a dashboard-common 1h/1m's 60×), and closed slices re-aggregate
    into hop windows downstream with the drain's own closure predicate —
    sound because a hop window is decidable exactly when its last slice is
    (ws + window <= wm). This is PLANS.md's round-10 amplification rule run
    live: at 100 TB the slide-grained tumbling tier is the state- and
    shuffle-bounded form, and hop windows are derived re-aggregation
    (merge-rollup discipline, orders_1m_rollup_table.json:72-84), not
    operator state."""
    return _sliding_from_slices_drain(spark, sf_dir)


@register(
    "stream_sliding_from_slices_restart_drain",
    tags=("A1", "A5", "T1", "T3", "T8", "streaming", "restart"),
    oracle=_SLIDING_ORACLE,
)
def stream_sliding_from_slices_restart_drain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Checkpoint-restart twin of `stream_sliding_from_slices_drain`:
    generation 1 drains only the first event-time tile, so slices
    straddling the stop hold partial sums in recovered TUMBLING aggregation
    state and the append log must not re-emit slices already closed —
    either failure shifts the re-aggregated hop sums under the shared
    oracle's value hash."""
    return _sliding_from_slices_drain(spark, sf_dir, restart_after=1)


# ---------------------------------------------------------------------------
# Live trending leaderboard: the sliding rollup COMPOSED with per-window
# ranking at window close — the reference's ranked-rows-per-window serving
# surface (KafkaConsumerTopKJob.kt:243-272) in its sliding generalization
# ---------------------------------------------------------------------------

_SLIDING_TOPK_ORACLE = f"""
WITH {_ES},
wm AS (
  SELECT CAST(floor(epoch_ms(max(ts))) AS BIGINT) - 10000 AS w FROM es
),
slid AS (
  SELECT e.event_type, e.revenue_cents,
         epoch_ms(date_trunc('minute', e.ts)) - k.k * 60000 AS ws
  FROM es e CROSS JOIN (SELECT unnest(range(5)) AS k) k
),
agg AS (
  SELECT event_type, ws,
         CAST(SUM(revenue_cents) AS BIGINT) AS revenue_cents
  FROM slid GROUP BY event_type, ws
),
closed AS (
  SELECT event_type, ws, revenue_cents FROM agg, wm WHERE ws + 300000 <= wm.w
),
r AS (
  SELECT ws, event_type, revenue_cents,
         CAST(row_number() OVER (PARTITION BY ws
              ORDER BY revenue_cents DESC, event_type ASC) AS INT) AS rank
  FROM closed
)
SELECT CAST(ws AS BIGINT) AS window_start,
       CAST(ws + 300000 AS BIGINT) AS window_end,
       event_type, revenue_cents, rank
FROM r WHERE rank <= 3
"""


def _rank_closed_windows(batch: DataFrame) -> DataFrame:
    """Rank-on-close: top-3 event types inside every hop window the
    micro-batch just closed. Runs inside foreachBatch on append output, so
    each window's rows are complete (a window is flushed whole in the one
    batch whose watermark passes its end) and tiny (≤ one row per event
    type) — the rank never sees a global sort."""
    w = Window.partitionBy("window_start").orderBy(
        F.col("revenue_cents").desc(), F.col("event_type").asc()
    )
    return (
        batch.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select(
            "window_start", "window_end", "event_type", "revenue_cents", "rank"
        )
    )


def _sliding_topk_drain(
    spark: SparkSession, sf_dir: str, restart_after: int | None = None
) -> DataFrame:
    from topk_spark.ops.rollup import windowed_rollup

    es = order_stream(spark, sf_dir).select(
        "event_id", "ts", "event_type", "revenue_cents"
    )

    def build(s: DataFrame) -> DataFrame:
        return windowed_rollup(
            s.withWatermark("ts", "10 seconds"),
            "ts",
            ["event_type"],
            [F.sum("revenue_cents").cast("long").alias("revenue_cents")],
            "5 minutes",
            slide="1 minute",
        ).select("window_start", "window_end", "event_type", "revenue_cents")

    return _drain(
        spark,
        es,
        build,
        output_mode="append",
        max_files_per_trigger=3,
        ordered_split=("ts", 3),
        restart_after=restart_after,
        batch_transform=_rank_closed_windows,
    )


@register(
    "stream_sliding_topk_drain",
    tags=("K1", "K2", "T1", "T3", "T5", "streaming"),
    oracle=_SLIDING_TOPK_ORACLE,
)
def stream_sliding_topk_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE trending leaderboard: the sliding (5m/1m) windowed rollup with
    per-window RANKING at window close — top-3 event types by revenue,
    emitted exactly once per closed hop window. This is the reference's
    actual product surface ("trending now" tiles): its streaming job writes
    ranked row lists per window fire (KafkaConsumerTopKJob.kt:243-272,
    tumbling); here the windows overlap and the rank runs in the drain's
    foreachBatch on append output — correct because append flushes a
    window's rows whole in the single micro-batch that closes it, and cheap
    because each window holds ≤ one row per event type. Oracle =
    the sliding rollup's closure predicate (wm = max ts − 10 s) composed
    with `topk_per_sliding_window`'s row_number SQL, both independently
    green since r9; deterministic tie-break (revenue desc, type asc) in
    both engines. At 100 TB the rollup shuffle carries per-window partials
    (amplification is map-side, pre-partial-agg) and the rank touches only
    closed-window rows — never raw events."""
    return _sliding_topk_drain(spark, sf_dir)


@register(
    "stream_sliding_topk_restart_drain",
    tags=("K1", "K2", "T1", "T3", "T8", "streaming", "restart"),
    oracle=_SLIDING_TOPK_ORACLE,
)
def stream_sliding_topk_restart_drain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Checkpoint-restart twin of `stream_sliding_topk_drain`. Generation 1
    drains only the first event-time tile; a freshly-built query resumes
    from the checkpoint. Windows straddling the stop hold partial sums in
    recovered built-in aggregation state — a reset under-counts them and
    reorders the rank (the leaderboard is a FUNCTION of the recovered sums,
    so rank corruption is visible even where sums alone might tie); a
    watermark reset re-emits or mis-closes windows, duplicating or dropping
    leaderboard rows under the exactly-once-per-window hash."""
    return _sliding_topk_drain(spark, sf_dir, restart_after=1)


# ---------------------------------------------------------------------------
# LIVE ratio-60 trending: the dashboard-standard 1h/1m leaderboard served by
# the SLICE-SHARING composition — a tumbling 1-minute slice rollup is the
# only stateful streaming stage (open-state factor 1×, vs 60× direct), and
# foreachBatch derives which hop windows the batch's newly-closed slices
# make decidable, re-aggregates exactly those from the slice tier, and ranks.
# PLANS.md's round-10 amplification rule (hop ratio > ~5 → slice-sharing)
# applied to the engine's own live product surface.
# ---------------------------------------------------------------------------

# Closure derivation (the min-watermark discipline from
# stream_union_minwm_rollup_drain, applied to slices): append emits a slice
# exactly when the watermark passes its END, so the newest closed slice end
# W is a PROVEN lower bound on the watermark — and a hop window [ws, ws+1h)
# is decidable from closed slices exactly when ws + 1h <= W (every one of
# its slices then has end <= W <= wm, i.e. is already in the tier). Deriving
# hop closure from W rather than from wm = max(ts) − 10s matters when the
# stream's trailing minutes are EMPTY: no slice closes there, the tier
# cannot know those hops are complete, and emitting them would be a guess.
# The oracle therefore derives W = max slice end over closed slices (slices
# exist only where events do) and gates hops on ws + 3600000 <= W.
_TRENDING_60_ORACLE = f"""
WITH {_ES},
wm AS (
  SELECT CAST(floor(epoch_ms(max(ts))) AS BIGINT) - 10000 AS w FROM es
),
sl AS (
  SELECT event_type, revenue_cents,
         CAST(epoch_ms(date_trunc('minute', ts)) AS BIGINT) AS ss
  FROM es
),
closed AS (
  SELECT sl.* FROM sl, wm WHERE sl.ss + 60000 <= wm.w
),
wmax AS (SELECT max(ss) + 60000 AS we FROM closed),
hop AS (
  SELECT c.event_type, c.revenue_cents, c.ss - k.k * 60000 AS ws
  FROM closed c CROSS JOIN (SELECT unnest(range(60)) AS k) k
),
agg AS (
  SELECT event_type, ws,
         CAST(SUM(revenue_cents) AS BIGINT) AS revenue_cents
  FROM hop GROUP BY event_type, ws
),
emit AS (
  SELECT a.* FROM agg a, wmax WHERE a.ws + 3600000 <= wmax.we
),
r AS (
  SELECT ws, event_type, revenue_cents,
         CAST(row_number() OVER (PARTITION BY ws
              ORDER BY revenue_cents DESC, event_type ASC) AS INT) AS rank
  FROM emit
)
SELECT CAST(ws AS BIGINT) AS window_start,
       CAST(ws + 3600000 AS BIGINT) AS window_end,
       event_type, revenue_cents, rank
FROM r WHERE rank <= 3
"""

_TRENDING_WINDOW_MS = 3_600_000
_TRENDING_SLIDE_MS = 60_000


def make_rank_new_hops(tier: str, ranked_schema):
    """Build the trending drain's foreachBatch stage (module-level so the
    RETRY contract is unit-testable without streaming machinery): persist
    the batch's closed slices to `tier`, then emit the ranked top-3 for
    every hop window those slices newly made decidable. W advances
    monotonically (a batch only ever closes slices past the previous
    watermark), so `W_prev < hop_end <= W_cur` partitions hops across
    batches — a clean stop/restart can neither re-emit nor skip a hop
    window, because W_prev is re-derived from the persisted tier, not from
    in-memory state. A mid-batch RETRY (crash between the tier write and
    the sink commit) re-derives the SAME W_prev — the frontier listing
    excludes the retrying batch's own `upto_<W_cur>` subdir via
    `below=w_cur` (round-11 ADVICE: the unfiltered listing saw
    W_prev == W_cur and silently skipped the batch's hops forever) — so a
    retry re-emits the same hop rows: the tier stays exactly-once by
    subdir overwrite, the sink gets the append-retry (at-least-once)
    semantics every drain sink has (pinned by
    tests/test_tier_layout.py::test_rank_new_hops_retry_reemits_same_hops).

    Round-13 retention (round-12 VERDICT #1 applied to the slice tier too):
    after the append, slice subdirs no read can ever touch again are
    PURGED, cut at `W_prev − window + slide`. That bound is exactly the
    oldest slice THIS batch's hops can reach (the first undecided hop ends
    at W_prev + slide, its slices end from W_prev − window + 2·slide), and
    every later constraint is looser: future batches' frontiers only grow,
    and the routed-serve read spans at most one window below the final
    frontier. A subdir named W' holds only rows with window_end <= W', so
    deleting W' <= cut destroys no reachable slice — and the PREDECESSOR
    subdir (W' = W_prev > cut since window > slide) always survives, so a
    retry of this batch re-derives the same W_prev (a purge that ate it
    would widen the retry's hop span — duplicate emissions). The slice
    read itself is pruned at DIRECTORY level (tier_subdirs_overlapping
    over the same bound — O(surviving in-window subdirs), not O(history));
    the row-level window_start filter stays, for the straddling subdir's
    out-of-range rows."""

    def rank_new_hops(batch: DataFrame) -> DataFrame:
        from topk_spark.io.tier import (
            append_upto,
            purge_upto,
            read_tier,
            tier_frontier,
            tier_subdirs_overlapping,
        )

        sess = batch.sparkSession
        batch = batch.persist()
        w_cur = batch.agg(F.max("window_end")).collect()[0][0]
        if w_cur is None:  # no slices closed this batch → no new hops
            batch.unpersist()
            return sess.createDataFrame([], ranked_schema)
        # W_prev is the max W over PRIOR batches — each batch's subdir is
        # NAMED by its W (idempotent append below), so the frontier recovers
        # from one directory listing, O(#batches), not a scan of the tier's
        # data; `below` makes the derivation retry-safe (docstring above)
        w_prev = tier_frontier(tier, below=w_cur)
        append_upto(batch, tier, w_cur)
        batch.unpersist()
        if w_prev is not None:
            # hops still open at W_prev have ws > W_prev − window, and all
            # their slices start at >= ws (window_end > W_prev − window +
            # slide) — retire subdirs wholly below that reach, then read
            # only the subdirs the new hops' slice range can live in
            reach = w_prev - _TRENDING_WINDOW_MS + _TRENDING_SLIDE_MS
            purge_upto(tier, reach)
            paths = tier_subdirs_overlapping(tier, reach, w_cur)
            slices = sess.read.schema(batch.schema).parquet(*paths).filter(
                F.col("window_start") > F.lit(w_prev - _TRENDING_WINDOW_MS)
            )
        else:
            slices = read_tier(sess, tier, batch.schema)
        hop = (
            slices.withColumn(
                "_k",
                F.explode(
                    F.expr(
                        f"sequence(0, {_TRENDING_WINDOW_MS // _TRENDING_SLIDE_MS - 1})"
                    )
                ),
            )
            .withColumn(
                "ws",
                (
                    F.col("window_start")
                    - F.col("_k") * F.lit(_TRENDING_SLIDE_MS)
                ).cast("long"),
            )
            .withColumn("we", (F.col("ws") + F.lit(_TRENDING_WINDOW_MS)).cast("long"))
            .where(
                (F.col("we") <= F.lit(w_cur))
                & (F.col("we") > F.lit(w_prev if w_prev is not None else -(1 << 62)))
            )
            .groupBy("ws", "we", "event_type")
            .agg(F.sum("revenue_cents").cast("long").alias("revenue_cents"))
        )
        w = Window.partitionBy("ws").orderBy(
            F.col("revenue_cents").desc(), F.col("event_type").asc()
        )
        return (
            hop.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= 3)
            .select(
                F.col("ws").alias("window_start"),
                F.col("we").alias("window_end"),
                "event_type",
                "revenue_cents",
                "rank",
            )
        )

    return rank_new_hops


def _trending_60_drain(
    spark: SparkSession,
    sf_dir: str,
    restart_after: int | None = None,
    _tier_dirs: list | None = None,
) -> DataFrame:
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from topk_spark.ops.rollup import windowed_rollup

    ranked_schema = StructType(
        [
            StructField("window_start", LongType(), False),
            StructField("window_end", LongType(), False),
            StructField("event_type", StringType(), True),
            StructField("revenue_cents", LongType(), True),
            StructField("rank", IntegerType(), False),
        ]
    )
    tier_root = tempfile.mkdtemp(prefix="topk_spark_trending_tier_")
    _TMP_ROOTS.append(tier_root)
    tier = os.path.join(tier_root, "slices")
    if _tier_dirs is not None:
        _tier_dirs.append(tier)

    es = order_stream(spark, sf_dir).select(
        "event_id", "ts", "event_type", "revenue_cents"
    )

    def build(s: DataFrame) -> DataFrame:
        # the ONLY stateful streaming stage: tumbling 1-minute slices —
        # each event touches exactly ONE window, so open aggregation state
        # is 1× (the direct 1h/1m form would hold 60 open windows per key)
        return windowed_rollup(
            s.withWatermark("ts", "10 seconds"),
            "ts",
            ["event_type"],
            [F.sum("revenue_cents").cast("long").alias("revenue_cents")],
            "1 minute",
        ).select("event_type", "window_start", "window_end", "revenue_cents")

    return _drain(
        spark,
        es,
        build,
        output_mode="append",
        max_files_per_trigger=3,
        ordered_split=("ts", 3),
        restart_after=restart_after,
        batch_transform=make_rank_new_hops(tier, ranked_schema),
    )


@register(
    "stream_trending_1h_1m_drain",
    tags=("K1", "K2", "A5", "A9", "T1", "T3", "streaming"),
    oracle=_TRENDING_60_ORACLE,
)
def stream_trending_1h_1m_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE trending leaderboard at the dashboard-standard 1h/1m (ratio 60)
    — top-3 event types by revenue per hop window, emitted exactly once per
    closed hop, built on the SLICE-SHARING composition: the streaming stage
    is a plain tumbling 1-minute slice rollup (each event touches ONE
    window; open state 1× vs the direct sliding form's 60× at this ratio —
    the measured crossover in bench sliding_ratio put slices ahead past
    ratio ~5, PLANS.md round-10 rule), and foreachBatch re-aggregates 60
    closed slice partials per hop + ranks. Hop closure is DERIVED from
    closed slices, not assumed from the clock: append emits a slice exactly
    when the watermark passes its end, so the newest closed slice end W
    lower-bounds the watermark and a hop is decidable iff hop_end <= W —
    the same proven-bound discipline as the union drain's min-watermark
    derivation. The reference's "trending now" tile at its realistic window
    shape (KafkaConsumerTopKJob.kt:243-272 stores ranked rows per window
    fire); at 100 TB the hop re-aggregation touches only per-slice partials
    (|keys| × minutes rows, independent of event volume) and the tier read
    prunes to the one-window slice range each batch's new hops span."""
    return _trending_60_drain(spark, sf_dir)


@register(
    "stream_trending_1h_1m_restart_drain",
    tags=("K1", "K2", "A5", "T1", "T3", "T8", "streaming", "restart"),
    oracle=_TRENDING_60_ORACLE,
)
def stream_trending_1h_1m_restart_drain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Checkpoint-restart twin of `stream_trending_1h_1m_drain` — and the
    ratio-60 restart pin for the slices form (the ratio-5 twin pins hop
    re-aggregation of the same state shape; here the recovered state is
    tumbling 1-MINUTE slice partials plus the watermark). Generation 1
    drains only the first event-time tile; a freshly-built query resumes
    from the checkpoint alone. Slices straddling the stop hold partial sums
    in recovered tumbling aggregation state (a reset under-counts every hop
    they tile — 60 hops each); the emitted-hop frontier W_prev is re-derived
    from the persisted slice tier, so a restart can neither re-emit nor
    skip a hop window under the exactly-once-per-window hash."""
    return _trending_60_drain(spark, sf_dir, restart_after=1)


# Frontier-fed routed serving (round 12, VERDICT #3): the round-11 pieces —
# the drain's on-disk committed frontier (upto_<W> subdir names) and
# TrendingRouter's freshness rule — wired together. The router's TierSpec
# takes the frontier straight from the tier directory listing (no collect
# probe, no clock guess), and one registered read exercises BOTH routes
# against the live drain's own tiers.
_TRENDING_ROUTED_ORACLE = f"""
WITH {_ES},
wm AS (
  SELECT CAST(floor(epoch_ms(max(ts))) AS BIGINT) - 10000 AS w FROM es
),
sl AS (
  SELECT event_type,
         CAST(epoch_ms(date_trunc('minute', ts)) AS BIGINT) AS ss,
         CAST(SUM(revenue_cents) AS BIGINT) AS revenue_cents
  FROM es, wm
  WHERE CAST(epoch_ms(date_trunc('minute', ts)) AS BIGINT) + 60000 <= wm.w
  GROUP BY event_type, date_trunc('minute', ts)
),
wmax AS (SELECT max(ss) + 60000 AS we FROM sl),
hops AS (
  SELECT s.event_type, s.ss - k.k * 60000 AS ws, s.revenue_cents
  FROM sl s CROSS JOIN (SELECT unnest(range(60)) AS k) k
),
agg AS (
  SELECT event_type, ws, CAST(SUM(revenue_cents) AS BIGINT) AS revenue_cents
  FROM hops GROUP BY event_type, ws
),
pre AS (
  SELECT a.ws, a.event_type, a.revenue_cents,
         CAST(row_number() OVER (PARTITION BY a.ws
              ORDER BY a.revenue_cents DESC, a.event_type ASC) AS INT) AS rank
  FROM agg a, wmax
  WHERE a.ws >= wmax.we - 7200000 AND a.ws + 3600000 <= wmax.we
),
tl AS (
  SELECT a.ws, a.event_type, a.revenue_cents,
         CAST(row_number() OVER (PARTITION BY a.ws
              ORDER BY a.revenue_cents DESC, a.event_type ASC) AS INT) AS rank
  FROM agg a, wmax
  WHERE a.ws >= wmax.we - 3600000
    AND a.ws + 3600000 <= wmax.we + 1800000
)
SELECT CAST(ws AS BIGINT) AS window_start,
       CAST(ws + 3600000 AS BIGINT) AS window_end,
       event_type, revenue_cents, rank, 'preranked' AS route
FROM pre WHERE rank <= 3
UNION ALL
SELECT CAST(ws AS BIGINT) AS window_start,
       CAST(ws + 3600000 AS BIGINT) AS window_end,
       event_type, revenue_cents, rank, 'rank_on_read' AS route
FROM tl WHERE rank <= 3
"""


@register(
    "stream_trending_routed_serve",
    tags=("SERVE", "K1", "K2", "A5", "T3", "streaming"),
    oracle=_TRENDING_ROUTED_ORACLE,
)
def stream_trending_routed_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routed trending reads served from the LIVE drain's own tiers with
    the router fed by the drain's COMMITTED on-disk frontier — closing the
    round-11 gap where TrendingRouter's freshness came from a collect probe
    while the drain maintained the exact frontier as `upto_<W>` subdir
    names one directory away. Runs `stream_trending_1h_1m_drain` (ranked
    hop rows = the pre-ranked tier; persisted 1-minute slices = the
    rank-on-read tier), reads W = io.tier.tier_frontier(slice_dir) — one
    directory listing, NO Spark job, no clock guess — and routes two
    requests through TrendingRouter(TierSpec(through_ms=W)): a fresh 2-hour
    range ending exactly at W (newest hop end == W → served VERBATIM from
    the materialized ranked rows) and a range reaching 30 min PAST the
    frontier (newest hop end > W → rank-on-read over hop re-aggregation of
    the persisted slices, partial hops included). Each row carries its
    route, so the hash pins the routing DECISIONS, both read paths, and
    the frontier arithmetic against a raw-event derivation. At 100 TB this
    is the serving story: freshness is read from the ingest pipeline's own
    commit protocol (frontier-named subdirs), never probed from data or
    assumed from wall clocks, and a lagging materializer degrades latency
    (rank-on-read) but never correctness."""
    from topk_spark.io.tier import read_tier, tier_frontier
    from topk_spark.serve.router import TierSpec, TrendingRouter

    dirs: list[str] = []
    ranked = _trending_60_drain(spark, sf_dir, _tier_dirs=dirs)
    slice_dir = dirs[0]
    w = tier_frontier(slice_dir)  # committed frontier: directory names only
    slices = read_tier(
        spark, slice_dir,
        "event_type string, window_start long, window_end long, "
        "revenue_cents long",
    )
    # rank-on-read tier: hop re-aggregation over the persisted slice
    # partials (slice-sharing read form — |keys|×minutes rows, no raw events)
    ratio = _TRENDING_WINDOW_MS // _TRENDING_SLIDE_MS
    hop_rollup = (
        slices.withColumn("_k", F.explode(F.expr(f"sequence(0, {ratio - 1})")))
        .withColumn(
            "window_start",
            (
                F.col("window_start") - F.col("_k") * F.lit(_TRENDING_SLIDE_MS)
            ).cast("long"),
        )
        .groupBy("window_start", "event_type")
        .agg(F.sum("revenue_cents").cast("long").alias("revenue_cents"))
        .withColumn(
            "window_end",
            (F.col("window_start") + F.lit(_TRENDING_WINDOW_MS)).cast("long"),
        )
    )
    router = TrendingRouter(
        TierSpec(df=ranked, window_ms=_TRENDING_WINDOW_MS, through_ms=w),
        hop_rollup,
        slide_ms=_TRENDING_SLIDE_MS,
        preranked_k=3,
    )
    fresh_rng = (w - 7_200_000, w)
    tail_rng = (w - 3_600_000, w + 1_800_000)
    fresh = router.read(*fresh_rng, k=3).withColumn(
        "route", F.lit(router.route(*fresh_rng, 3))
    )
    tail = router.read(*tail_rng, k=3).withColumn(
        "route", F.lit(router.route(*tail_rng, 3))
    )
    return fresh.unionByName(tail)
