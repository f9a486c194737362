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
- exactly-once: bucket rewrites are deterministic upserts (dynamic partition
  overwrite of affected buckets), so replaying a batch after a crash
  converges to the same table — checkpoint + idempotent sink;
- late/duplicate data: the reference rejects non-monotonic inserts outright
  (src/metric.cpp:519-524).  ``enforce_monotonic`` drops violations per
  micro-batch (documented relaxation: cross-batch enforcement uses the
  stored per-metric max time).

Incremental cost per batch: O(points-in-batch + touched-buckets * levels),
independent of table history size — the same property the reference's
in-memory Level state gives it.
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
    """Keep only strictly-increasing timestamps per metric within the batch,
    and drop points at/before the stored per-metric max time (the insert
    guard of src/metric.cpp:519-524 as a batch rule)."""
    w = Window.partitionBy("metric").orderBy("time")
    df = batch
    if prev_max is not None:
        df = (df.join(F.broadcast(prev_max), "metric", "left")
              .filter(F.col("_prev_max_t").isNull()
                      | (F.col("time") > F.col("_prev_max_t")))
              .drop("_prev_max_t"))
    df = df.withColumn("_rn", F.row_number().over(
        Window.partitionBy("metric", "time").orderBy("value"))) \
        .filter(F.col("_rn") == 1).drop("_rn")
    prev_t = F.lag("time").over(w)
    return (df.withColumn("_pt", prev_t)
            .filter(F.col("_pt").isNull() | (F.col("time") > F.col("_pt")))
            .drop("_pt"))


class IncrementalRollup:
    """Maintains raw + all rollup levels under ``base`` incrementally.

    Usage (batch-driven or from ``foreachBatch``)::

        ing = IncrementalRollup(spark, base, meta)
        ing.ingest(batch_df)          # per micro-batch
        # or as a streaming sink:
        stream.writeStream.foreachBatch(lambda df, _eid: ing.ingest(df)).start()
    """

    def __init__(self, spark: SparkSession, base: str, meta: Meta,
                 policy: str = "strict"):
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
        """
        if policy not in ("strict", "upsert"):
            raise ValueError(f"unknown policy {policy!r}")
        self.spark = spark
        self.base = base.rstrip("/")
        self.meta = meta
        self.policy = policy

    # -- table access ------------------------------------------------------
    def raw(self) -> DataFrame | None:
        p = f"{self.base}/raw"
        return self.spark.read.parquet(p) if os.path.exists(p) else None

    def level(self, interval: int) -> DataFrame | None:
        p = f"{self.base}/levels/{interval}"
        return self.spark.read.parquet(p) if os.path.exists(p) else None

    # -- ingest ------------------------------------------------------------
    def ingest(self, batch: DataFrame) -> None:
        batch = batch.select("metric", "time", "value")
        # which metrics/time-range this batch *attempts* — needed even when
        # every point turns out to be a duplicate (crash-replay: a previous
        # run may have appended raw but died before level maintenance, so
        # the replayed epoch must still repair the levels idempotently)
        attempted = {r["metric"]: r["b_min"] for r in
                     batch.filter(F.col("time") > 0).groupBy("metric")
                     .agg(F.min("time").alias("b_min")).collect()}
        if not attempted:
            return
        batch_metrics = list(attempted)
        existing = self.raw()
        if existing is not None:
            existing_b = existing.filter(F.col("metric").isin(batch_metrics))
            if self.policy == "strict":
                prev_max = existing_b.groupBy("metric").agg(
                    F.max("time").alias("_prev_max_t"))
                batch = enforce_monotonic(batch, prev_max)
            else:
                # upsert: accept out-of-order points; drop only exact
                # (metric, time) duplicates vs the store and within batch
                batch = enforce_monotonic(batch)  # in-batch dedup/sort rules
                batch = batch.join(existing_b.select("metric", "time"),
                                   ["metric", "time"], "left_anti")
        else:
            existing_b = None
            batch = enforce_monotonic(batch)
        # cut lineage: the enforced batch's plan reads base/raw (monotonic
        # join), which is about to be appended to and refreshed — a plain
        # cache would be invalidated by the refresh and re-evaluate against
        # the new files, dropping the whole batch as duplicates.
        batch = batch.localCheckpoint(eager=True)
        empty = batch.isEmpty()
        if empty and existing is None:
            return
        # driver-side planning stats (metric-count-sized), computed pre-append
        if empty:
            # replayed/duplicate batch: repair levels over the attempted
            # range (idempotent rewrite; no raw append)
            spans = {m: b for m, b in attempted.items()}
        else:
            spans = {r["metric"]: r["b_min"] for r in
                     batch.groupBy("metric").agg(F.min("time").alias("b_min"))
                     .collect()}
        prev_t: dict[str, int] = {}
        if existing_b is not None:
            spans_df = self.spark.createDataFrame(
                list(spans.items()), "metric string, b_min long")
            rows = (existing_b.join(F.broadcast(spans_df), "metric")
                    .groupBy("metric")
                    .agg(F.max(F.when(F.col("time") < F.col("b_min"),
                                      F.col("time"))).alias("pt"))
                    .collect())
            prev_t = {r["metric"]: r["pt"] for r in rows
                      if r["pt"] is not None}
        if empty:
            # drop attempted metrics with no raw data at all
            present = {r["metric"] for r in
                       (existing.filter(F.col("metric").isin(batch_metrics))
                        .select("metric").distinct().collect())}
            spans = {m: b for m, b in spans.items() if m in present}
            if not spans:
                return
        else:
            batch.write.mode("append").parquet(f"{self.base}/raw")
            # invalidate the session's cached file listing for the path —
            # otherwise the post-append read may still see the old file set
            self.spark.catalog.refreshByPath(f"{self.base}/raw")
        self._update_levels(spans, prev_t)

    def _update_levels(self, spans: dict[str, int],
                       prev_t: dict[str, int]) -> None:
        """Recompute exactly the buckets the batch can change, at every level.

        Because ingest is strictly monotonic per metric (enforce_monotonic),
        a batch only changes buckets from ``rewrite_from =
        interval_begin(old_t_last, top_interval)`` onward — the start of the
        top level's *open* interval; every closed bucket at every level
        before it is immutable (the same argument as the reference's
        ``restore_level`` reading only the open tail, metric.cpp:451-497).
        The single point before ``rewrite_from`` is included in the
        recompute input so the entering segment (and its count=0 gap
        buckets) is reproduced exactly.
        """
        # every scan below is restricted to the batch's metrics — per-batch
        # cost must not scale with the number of metrics in the store
        raw = self.raw().filter(F.col("metric").isin(list(spans)))
        top = self.meta.level_intervals()[-1]
        rewrite_from: dict[str, int] = {}
        for m, b_min in spans.items():
            anchor = prev_t.get(m, b_min)
            rewrite_from[m] = max(anchor - (anchor % top), 0)
        if not rewrite_from:
            return
        cond = None
        for m, rb in rewrite_from.items():
            c = (F.col("metric") == m) & (F.col("time") >= F.lit(rb))
            cond = c if cond is None else (cond | c)
        # fetch the one point per metric just before its region
        p0_rows = (raw.filter(~cond if cond is not None else F.lit(False))
                   .groupBy("metric").agg(F.max("time").alias("p0_t")))
        p0_map = {r["metric"]: r["p0_t"] for r in p0_rows.collect()
                  if r["p0_t"] is not None}
        for m, t0 in p0_map.items():
            cond = cond | ((F.col("metric") == m) & (F.col("time") == F.lit(t0)))
        sub = raw.filter(cond)
        levels = build_levels(sub, self.meta)
        for iv, df in levels.items():
            self._upsert_level(iv, df, rewrite_from)

    def _upsert_level(self, interval: int, fresh: DataFrame,
                      rewrite_from: dict[str, int]) -> None:
        path = f"{self.base}/levels/{interval}"
        existing = self.level(interval)
        cond = None
        for m, rb in rewrite_from.items():
            c = (F.col("metric") == m) & (F.col("interval_start") >= F.lit(rb))
            cond = c if cond is None else (cond | c)
        fresh_region = fresh.filter(cond)
        if existing is not None:
            out = existing.filter(~cond).unionByName(fresh_region)
        else:
            out = fresh_region
        # write-then-swap for idempotent overwrite (atomic enough for local
        # fs; a Delta MERGE drops in where available)
        tmp = f"{path}.tmp"
        out.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(path)
        self.spark.catalog.refreshByPath(path)
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)

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
