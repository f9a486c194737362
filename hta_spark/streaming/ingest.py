"""Streaming ingest with incremental rollup maintenance (M3 in SURVEY.md §7).

The reference's insert path IS an incremental streaming aggregator: per-
interval open state advanced point by point, closed intervals cascading
upward (W1-W3, /root/reference/src/metric.cpp:510-603), with
``restore_level`` rebuilding open state after a restart
(/root/reference/src/metric.cpp:451-497; equivalence pinned by
tests/restore.cpp:87-215 — reopen-and-continue must equal one continuous
run).

Spark-first mapping:
- the raw append is a Structured Streaming sink (``foreachBatch``);
- rollup maintenance is *idempotent bucket recomputation*: each micro-batch
  recomputes exactly the level buckets its time-range intersects, from raw
  (plus one predecessor point per metric for the segment boundary) — the
  batch analog of ``restore_level``;
- level tables are partitioned by ``(metric, tb)`` where ``tb`` is the
  top-level interval index of ``interval_start``.  Because a monotonic
  batch can only change buckets from the top level's open interval onward
  (``rewrite_from``), and ``rewrite_from`` is top-aligned, the rewrite
  region is an exact set of partitions — the upsert is a *dynamic partition
  overwrite* that touches O(region) files and never reads or rewrites
  table history (the O(table) full-rewrite this replaces was the round-1
  scale-killer);
- exactly-once: bucket rewrites are deterministic versioned publishes, so
  replaying a batch after a crash converges to the same table — checkpoint
  + idempotent sink.  Consistency: each batch's open-region rewrite goes
  through the PARTITION MANIFEST (sources/store.py::publish_partitions):
  fresh immutable ``v=<n>`` partition dirs land first, then one POSIX
  rename flips ``_part_manifest.json`` — a reader racing a micro-batch
  resolves the pre-batch or post-batch partition set, never a mid-swap
  mix (the reference's flush barrier + torn-tail tolerance,
  /root/reference/src/storage/file/file.hpp:210-247, src/metric.cpp:
  605-609).  Whole-table rewrites elsewhere use the same discipline at
  table granularity (sources/store.py::publish_version);
- late/duplicate data: the reference rejects non-monotonic inserts outright
  (src/metric.cpp:519-524).  ``enforce_monotonic`` drops violations per
  micro-batch (documented relaxation: cross-batch enforcement uses the
  stored per-metric max time); non-positive timestamps are rejected
  batch-wide (src/metric.cpp:515-518 throws on t == 0).

All planning state (batch spans, predecessor anchors, rewrite bounds) stays
in small DataFrames joined by broadcast — no per-metric literal predicates
or driver-side dicts, so a batch carrying 10^5 metrics plans exactly like
one carrying 5.

Incremental cost per batch: O(points-in-batch + touched-buckets * levels)
for the recompute + upsert itself, PLUS the per-batch planning lookups —
one combined stats aggregate (per-metric max time + rewrite anchor) and,
for the upsert policy, one duplicate-key anti-join — which scan the
batch's metrics' raw history.  Those lookups are restricted to the batch's
metrics by a broadcast semi-join; under the store's metric-partitioned
layout they prune to those metrics' partitions, and their aggregate shape
(max of the physically sorted time column) is row-group-stats-friendly —
but they are NOT history-size-independent on an unpartitioned append-only
raw table; `compact_raw_every` bounds the file count, and a deployment
with hot metrics should keep the metric-partitioned layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..meta import Meta
from ..operators.rollup import build_levels

__all__ = ["IncrementalRollup", "enforce_monotonic"]


def enforce_monotonic(batch: DataFrame,
                      prev_max: DataFrame | None = None) -> DataFrame:
    """The insert guard of src/metric.cpp:519-524 as a batch rule: drop
    points at/before the stored per-metric max time, and collapse
    duplicate (metric, time) keys to one row (smallest value — a
    deterministic pick).

    The reference additionally rejects FILE-ORDER regressions within one
    ingest; an unordered batch DataFrame has no arrival order, so after
    the duplicate collapse, time order IS the canonical order and there
    is nothing further to reject (a lag-based "strictly increasing"
    filter over the time-ordered window is vacuously true — r4 review
    removed it along with its window pass)."""
    df = batch
    if prev_max is not None:
        df = (df.join(F.broadcast(prev_max), "metric", "left")
              .filter(F.col("_prev_max_t").isNull()
                      | (F.col("time") > F.col("_prev_max_t")))
              .drop("_prev_max_t"))
    return df.withColumn("_rn", F.row_number().over(
        Window.partitionBy("metric", "time").orderBy("value"))) \
        .filter(F.col("_rn") == 1).drop("_rn")


class IncrementalRollup:
    """Maintains raw + all rollup levels under ``base`` incrementally.

    Usage (batch-driven or from ``foreachBatch``)::

        ing = IncrementalRollup(spark, base, meta)
        ing.ingest(batch_df)          # per micro-batch
        # or as a streaming sink:
        stream.writeStream.foreachBatch(lambda df, _eid: ing.ingest(df)).start()
    """

    def __init__(self, spark: SparkSession, base: str, meta: Meta,
                 policy: str = "strict",
                 salt_chunks: int | str | None = None,
                 compact_raw_every: int | None = None):
        """``policy``:

        - ``"strict"`` — the reference's semantics: late (non-monotonic)
          points are rejected per batch (src/metric.cpp:519-524).
        - ``"upsert"`` — documented relaxation for distributed sources that
          deliver out of order: late points with *new* timestamps are
          accepted and the affected historical buckets are recomputed (the
          idempotent rewrite already anchors at the predecessor of the
          earliest batch point, so correctness is the same equivalence-to-
          continuous-build invariant); duplicate (metric, time) keys are
          still dropped (first write wins).

        ``salt_chunks``: parallelize the per-metric window of each batch's
        level recompute via the salted path (rollup.lagged_salted) — use
        when one metric dominates the stream.  ``"auto"`` measures the
        recompute input's skew per batch (costs one extra evaluation of
        the open-region scan, so it is not the streaming default).
        """
        if policy not in ("strict", "upsert"):
            raise ValueError(f"unknown policy {policy!r}")
        self.spark = spark
        self.base = base.rstrip("/")
        self.meta = meta
        self.policy = policy
        self.salt_chunks = salt_chunks
        # auto-compaction policy: every N point-carrying micro-batches,
        # rewrite the raw table via the atomic whole-table republish
        # (store.compact -> publish_version).  Streaming appends a few
        # files per batch; at scale those small files dominate scan
        # planning cost, so a periodic compaction bound is the production
        # default story (levels are already version-GC-bounded per
        # partition by publish_partitions).
        self.compact_raw_every = compact_raw_every
        self._batches_since_compact = 0

    # -- table access ------------------------------------------------------
    # reads/appends resolve through the store's manifest indirection so a
    # compacted (atomically republished) table keeps working mid-stream
    def raw(self) -> DataFrame | None:
        from ..sources.store import resolve_table_path, table_exists
        p = f"{self.base}/raw"
        if not table_exists(p):
            return None
        return self.spark.read.parquet(resolve_table_path(p))

    def level(self, interval: int) -> DataFrame | None:
        """Level table (any layout) normalized to the canonical schema —
        reads resolve through the partition manifest, so a concurrent
        micro-batch's publish is invisible until its atomic flip."""
        from ..sources.store import read_level_table
        return read_level_table(self.spark, f"{self.base}/levels/{interval}")

    def _top(self) -> int:
        return self.meta.level_intervals()[-1]

    # -- ingest ------------------------------------------------------------
    def ingest(self, batch: DataFrame) -> None:
        # reference insert guard: t <= 0 is invalid (src/metric.cpp:515-518);
        # reject up front so bogus rows can neither reach raw nor be chosen
        # as a predecessor anchor for segment integrals
        batch = (batch.select("metric", "time", "value")
                 .filter(F.col("time") > 0))
        # which metrics/time-range this batch *attempts* — needed even when
        # every point turns out to be a duplicate (crash-replay: a previous
        # run may have appended raw but died before level maintenance, so
        # the replayed epoch must still repair the levels idempotently)
        # NOTE (SCALE.md Connect table): ingest's four localCheckpoints
        # are deliberate lineage CUTS, not compat.pin candidates — each
        # frame's plan reads the store snapshot this epoch is about to
        # append to, and the append's refreshByPath would invalidate a
        # persist fallback and re-evaluate against the NEW files (dropping
        # the whole batch as duplicates).  Streaming ingest therefore
        # requires a runtime whose localCheckpoint works (classic Spark, or
        # Connect servers that accept it) — a documented gate.
        attempted = (batch.groupBy("metric")
                     .agg(F.min("time").alias("b_min"))
                     .localCheckpoint(eager=True))
        if attempted.isEmpty():
            return
        existing = self.raw()
        stats = None
        if existing is not None:
            existing_b = existing.join(
                F.broadcast(attempted.select("metric")), "metric", "left_semi")
            # ONE pre-append stats pass over the batch metrics' history:
            # per-metric max time (the monotonic guard) AND the
            # predecessor of the batch's earliest ATTEMPTED point (the
            # rewrite anchor) — the r3 design scanned history separately
            # for each, and anchored at the earliest SURVIVING point,
            # which left levels stale for metrics whose rows had been
            # appended by a crashed run and then fully deduped on replay
            # (review r4).  Anchoring at the attempted minimum is always
            # <= the surviving minimum, so the recomputed region can only
            # grow — idempotent-rewrite correctness is unchanged.
            stats = (existing_b.join(F.broadcast(attempted), "metric")
                     .groupBy("metric")
                     .agg(F.max("time").alias("_prev_max_t"),
                          F.max(F.when(F.col("time") < F.col("b_min"),
                                       F.col("time"))).alias("_pt"))
                     .localCheckpoint(eager=True))
            if self.policy == "strict":
                batch = enforce_monotonic(
                    batch, stats.select("metric", "_prev_max_t"))
            else:
                # upsert: accept out-of-order points; drop only exact
                # (metric, time) duplicates vs the store and within batch
                batch = enforce_monotonic(batch)  # in-batch dedup rules
                batch = batch.join(existing_b.select("metric", "time"),
                                   ["metric", "time"], "left_anti")
        else:
            batch = enforce_monotonic(batch)
        # cut lineage: the enforced batch's plan reads base/raw (monotonic
        # join), which is about to be appended to and refreshed — a plain
        # cache would be invalidated by the refresh and re-evaluate against
        # the new files, dropping the whole batch as duplicates.
        batch = batch.localCheckpoint(eager=True)
        empty = batch.isEmpty()
        if empty and existing is None:
            return
        # repair scope: every attempted metric that has surviving rows OR
        # pre-existing raw data (the latter covers crash replay — a prior
        # run may have appended raw and died before level maintenance, so
        # even fully-deduped metrics must repair idempotently)
        if empty:
            spans = attempted.join(stats.select("metric"),
                                   "metric", "left_semi")
        else:
            keep = batch.select("metric").distinct()
            if stats is not None:
                keep = keep.unionByName(stats.select("metric")).distinct()
            spans = attempted.join(F.broadcast(keep), "metric", "left_semi")
        # rewrite bound per metric: the start of the top level's open
        # interval at the batch's predecessor anchor — everything before it
        # is closed at every level and therefore immutable.  Computed as a
        # small (metric, _rb) frame, broadcast everywhere below;
        # materialized (stats checkpoint) BEFORE the raw append.
        if stats is not None:
            spans = spans.join(F.broadcast(stats.select("metric", "_pt")),
                               "metric", "left")
        else:
            spans = spans.withColumn("_pt", F.lit(None).cast("long"))
        anchor = F.coalesce(F.col("_pt"), F.col("b_min"))
        top = self._top()
        bounds = spans.select(
            "metric",
            F.greatest(anchor - F.pmod(anchor, F.lit(top)),
                       F.lit(0).cast("long")).alias("_rb"),
        ).localCheckpoint(eager=True)
        if bounds.isEmpty():
            return
        if not empty:
            from ..sources.store import resolve_table_path
            raw_path = resolve_table_path(f"{self.base}/raw")
            batch.write.mode("append").parquet(raw_path)
            # invalidate the session's cached file listing for the path —
            # otherwise the post-append read may still see the old file set
            self.spark.catalog.refreshByPath(raw_path)
        self._update_levels(bounds)
        if not empty and self.compact_raw_every:
            self._batches_since_compact += 1
            if self._batches_since_compact >= self.compact_raw_every:
                self.compact_raw()

    def compact_raw(self, target_partitions: int = 1) -> int:
        """Compact the streaming-appended raw table (atomic republish via
        the store's versioned manifest); resets the auto-trigger counter."""
        from ..sources.store import HtaStore
        store = HtaStore(self.spark, self.base, partition_by_metric=False,
                         partition_time_days=False)
        n = store.compact("raw", target_partitions=target_partitions)
        self._batches_since_compact = 0
        return n

    def _update_levels(self, bounds: DataFrame) -> None:
        """Recompute exactly the buckets the batch can change, at every level.

        ``bounds`` is the broadcastable (metric, _rb) rewrite-bound frame.
        The single point before ``_rb`` is included in the recompute input so
        the entering segment (and its count=0 gap buckets) is reproduced
        exactly (the same argument as the reference's ``restore_level``
        reading only the open tail, metric.cpp:451-497).
        """
        # inner join restricts the scan to the batch's metrics and attaches
        # each row's rewrite bound — column comparisons, no literal
        # predicates, so planning cost is independent of the metric count
        raw_b = self.raw().join(F.broadcast(bounds), "metric")
        p0 = (raw_b.filter(F.col("time") < F.col("_rb"))
              .groupBy("metric").agg(F.max("time").alias("_p0")))
        sub = (raw_b.join(F.broadcast(p0), "metric", "left")
               .filter((F.col("time") >= F.col("_rb"))
                       | (F.col("time") == F.col("_p0")))
               .select("metric", "time", "value"))
        levels = build_levels(sub, self.meta, salt_chunks=self.salt_chunks)
        for iv, df in levels.items():
            self._upsert_level(iv, df, bounds)

    def _upsert_level(self, interval: int, fresh: DataFrame,
                      bounds: DataFrame) -> None:
        """Atomic versioned publish of the rewrite region.

        The level table is partitioned by (metric, tb = interval_start div
        top_interval).  ``_rb`` is top-aligned, so {buckets >= _rb} is an
        exact partition set; the freshly recomputed region is published
        through the partition manifest (store.publish_partitions): new
        immutable ``v=<n>`` dirs first, one atomic manifest flip second —
        per-batch write cost is O(region), not O(table), history files are
        never touched, and a racing reader sees the pre- or post-batch
        state, never a partial swap.  Monotonic ingest (and the upsert
        policy's predecessor anchoring) guarantees the fresh region covers
        every previously-published bucket >= _rb, so no stale manifest
        entry can survive the update.  A pre-existing store-built level
        table is adopted into the manifest layout once, at first contact.
        """
        from ..sources.store import (_adopt_into_partition_manifest,
                                     publish_partitions,
                                     read_partition_manifest, table_exists)
        path = f"{self.base}/levels/{interval}"
        top = self._top()
        if read_partition_manifest(path) is None and table_exists(path):
            _adopt_into_partition_manifest(self.spark, path, top)
        region = (fresh.join(F.broadcast(bounds), "metric")
                  .filter(F.col("interval_start") >= F.col("_rb"))
                  .drop("_rb")
                  .withColumn("tb", F.call_function(
                      "div", F.col("interval_start"), F.lit(top))))
        publish_partitions(self.spark, path, region, top)
        self.spark.catalog.refreshByPath(path)

    # -- streaming entry ---------------------------------------------------
    def stream_from(self, stream_df: DataFrame, checkpoint: str,
                    trigger_seconds: int | None = None):
        """Attach as a Structured Streaming sink with exactly-once upserts
        (checkpointed offsets + idempotent bucket rewrite)."""
        writer = (stream_df.writeStream
                  .outputMode("append")
                  .option("checkpointLocation", checkpoint)
                  .foreachBatch(lambda df, _eid: self.ingest(df)))
        if trigger_seconds:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()
