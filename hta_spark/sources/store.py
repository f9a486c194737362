"""Catalog + persistence — the reference's ``Directory`` re-expressed as a
Parquet layout (SURVEY.md §1.5-1.7, D1 in §2.1).

Reference: /root/reference/src/directory.cpp:86-171 (JSON config, prefix
rules, create-on-open, sorted listing), /root/reference/src/storage/file/
directory.cpp:45-86.  The custom .hta container (magic/BOM/versioned header,
src/storage/file/file.hpp:94-326) is replaced wholesale by Parquet: schema,
endianness and stats travel with the files, and positional index arithmetic
becomes predicate pushdown on ``time``/``interval_start``.

Layout:
    <base>/meta.json                 per-metric Meta + prefix rules
    <base>/raw/                      parquet, partitioned by metric
    <base>/levels/<interval_ns>/     parquet rollups, partitioned by metric

Scale notes: ``partitionBy("metric")`` gives per-metric file pruning (the
analog of one directory per metric in the reference).  For millions of
metrics switch ``partition_by_metric=False`` — data is then bucket-sorted by
(metric, time) and row-group stats prune instead (avoids small-file
explosion).  Appends are directory-append atomic; a Delta/Iceberg catalog
drops in here when the jars are available (import-gated, not required).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..errors import InvalidTimestampError, MissingMetricConfigError
from ..meta import Meta
from ..operators.aggregate import aggregate_exact, aggregate_telescope
from ..operators.retrieve import (retrieve_flex, retrieve_min_samples,
                                  retrieve_raw, retrieve_rows)
from ..operators.rollup import build_levels
from ..operators.scopes import (RAW_DEFAULT, ROW_DEFAULT, IntervalScope)
from ..operators.stats import count_scoped

__all__ = ["HtaStore", "Metric", "resolve_table_path", "publish_version"]


def resolve_table_path(path: str) -> str:
    """Current physical directory of a (possibly versioned) table.

    A table that has been atomically republished (see
    :func:`publish_version`) is reached through ``<path>.manifest``, a tiny
    JSON pointer file; otherwise the plain path is the table.  Readers and
    appenders both resolve through here, so they always land on the live
    snapshot."""
    mp = path + ".manifest"
    if os.path.exists(mp):
        with open(mp) as f:
            doc = json.load(f)
        return os.path.join(os.path.dirname(path), doc["current"])
    return path


def table_exists(path: str) -> bool:
    return os.path.exists(path) or os.path.exists(path + ".manifest")


def publish_version(path: str, write_fn, keep: int = 2) -> str:
    """Atomic table republish: write a brand-new immutable snapshot under
    ``<path>.versions/v_<n>``, then flip the ``<path>.manifest`` pointer
    with one POSIX rename.

    This is the swap-write discipline the plain overwrite lacked: a reader
    racing the old write-tmp-then-overwrite saw a partially deleted
    directory (the reference instead tolerates torn tails at the file
    layer, /root/reference/src/storage/file/file.hpp:210-247).  Here a
    concurrent reader either resolves the old manifest (old snapshot, kept
    for ``keep``-1 more publishes) or the new one — never a half table; a
    crash before the rename leaves the old pointer intact.

    ``write_fn(target_dir)`` must fully write the snapshot.  Returns the
    new snapshot directory.
    """
    import shutil
    vroot = path + ".versions"
    os.makedirs(vroot, exist_ok=True)
    versions = sorted(int(d[2:]) for d in os.listdir(vroot)
                      if d.startswith("v_") and d[2:].isdigit())
    target = f"{vroot}/v_{(versions[-1] + 1) if versions else 1}"
    write_fn(target)
    mp = path + ".manifest"
    tmp = f"{mp}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"current": os.path.relpath(target, os.path.dirname(path))},
                  f)
    os.replace(tmp, mp)                       # the atomic pointer flip
    # GC: drop all but the latest keep-1 previous snapshots (in-flight
    # readers of the immediately-previous version stay valid)
    for v in versions[:len(versions) - (keep - 1)] if keep > 1 else versions:
        shutil.rmtree(f"{vroot}/v_{v}", ignore_errors=True)
    # the pre-versioning in-place directory is one generation behind once a
    # second snapshot lands — same retirement rule as GC'd versions
    if versions and os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
    return target


class HtaStore:
    """A directory of metrics with hierarchical rollups."""

    def __init__(self, spark: SparkSession, base_path: str,
                 configs: dict[str, Meta] | None = None,
                 prefix_configs: dict[str, Meta] | None = None,
                 partition_by_metric: bool = True,
                 partition_time_days: bool = False):
        """``partition_time_days``: additionally partition the raw table by
        UTC day (derived from the ns timestamp).  At 100 TB this is the
        difference between directory-level pruning of a time-range query and
        relying on row-group stats alone; day bounds are injected by the
        Metric facade where scope semantics allow (see ``_day_bounds``)."""
        self.spark = spark
        self.base = base_path.rstrip("/")
        self.partition_by_metric = partition_by_metric
        self.partition_time_days = partition_time_days
        # merge semantics: persisted configs load first, caller-supplied
        # entries overlay them (never clobber the persisted catalog), and
        # the merged result is re-persisted when anything new was supplied
        self._configs: dict[str, Meta] = {}
        self._prefix: dict[str, Meta] = {}
        if os.path.exists(self._meta_path()):
            self._load_meta()
        self._configs.update(configs or {})
        self._prefix.update(prefix_configs or {})
        if configs or prefix_configs:
            self._save_meta()

    # -- config / catalog --------------------------------------------------
    def _meta_path(self) -> str:
        return f"{self.base}/meta.json"

    def _save_meta(self) -> None:
        os.makedirs(self.base, exist_ok=True)
        doc = {
            "metrics": {m: asdict(c) for m, c in self._configs.items()},
            "prefixes": {m: asdict(c) for m, c in self._prefix.items()},
        }
        with open(self._meta_path(), "w") as f:
            json.dump(doc, f, indent=1)

    def _load_meta(self) -> None:
        with open(self._meta_path()) as f:
            doc = json.load(f)
        self._configs = {m: Meta(**c) for m, c in doc.get("metrics", {}).items()}
        self._prefix = {m: Meta(**c) for m, c in doc.get("prefixes", {}).items()}

    def meta_for(self, name: str) -> Meta:
        """Exact config, else longest matching prefix rule
        (src/directory.cpp:106-111,157-170); unknown names raise."""
        if name in self._configs:
            return self._configs[name]
        best = None
        for p, m in self._prefix.items():
            if name.startswith(p + ".") and (best is None or len(p) > len(best[0])):
                best = (p, m)
        if best:
            return best[1]
        raise MissingMetricConfigError(f"no metric config for {name!r}")

    def metric_names(self) -> list[str]:
        """Sorted listing (src/storage/file/directory.cpp:74-86).

        With a metric-partitioned raw table the partition directories ARE
        the catalog (the analog of the reference's one-dir-per-metric
        layout): an O(#metrics) filesystem listing, no data scan.  Falls
        back to a distinct scan for unpartitioned layouts."""
        path = resolve_table_path(f"{self.base}/raw")
        if not os.path.isdir(path):
            return []
        if self.partition_by_metric:
            from urllib.parse import unquote
            names = {unquote(d.split("=", 1)[1]) for d in os.listdir(path)
                     if d.startswith("metric=")}
            if names:
                return sorted(names)
        raw = self.raw()
        if raw is None:
            return []
        return sorted(r["metric"] for r in raw.select("metric").distinct().collect())

    def __getitem__(self, name: str) -> "Metric":
        return Metric(self, name, self.meta_for(name))

    # -- physical tables ---------------------------------------------------
    def raw(self) -> DataFrame | None:
        path = f"{self.base}/raw"
        if not table_exists(path):
            return None
        df = self.spark.read.parquet(resolve_table_path(path))
        if "day" in df.columns:
            df = df.select("metric", "time", "value", "day")
        return df

    @staticmethod
    def day_pruned(raw: DataFrame, begin: int | None, end: int | None) -> DataFrame:
        """Inject day-partition bounds for a time range where scope
        semantics allow (closed/open endpoints only — extended endpoints may
        need arbitrarily distant neighbour points).  Day = time div 86400e9."""
        if "day" not in raw.columns:
            return raw
        d = 86_400_000_000_000
        cond = None
        if begin is not None:
            c = F.col("day") >= F.lit(begin // d)
            cond = c
        if end is not None:
            c = F.col("day") <= F.lit(end // d)
            cond = c if cond is None else (cond & c)
        return raw.filter(cond) if cond is not None else raw

    def level(self, interval: int) -> DataFrame | None:
        path = f"{self.base}/levels/{interval}"
        if not table_exists(path):
            return None
        try:
            df = self.spark.read.parquet(resolve_table_path(path))
        except Exception:
            # a level with no closed buckets yet writes no schema files
            # (empty dataframe); the reference likewise has an empty file
            from ..schemas import AGG_SCHEMA
            return self.spark.createDataFrame([], AGG_SCHEMA)
        # normalize streaming-maintained layouts (partitioned by metric +
        # time bucket): drop the bookkeeping column, undo partition-column
        # type inference
        if "tb" in df.columns:
            df = df.drop("tb")
        return df.withColumn("metric", F.col("metric").cast("string"))

    def levels_for(self, meta: Meta) -> dict[int, DataFrame]:
        out = {}
        for iv in meta.level_intervals():
            df = self.level(iv)
            if df is not None:
                out[iv] = df
        return out

    def write_raw(self, df: DataFrame, mode: str = "append",
                  validate: bool = True) -> None:
        """Append raw points.  ``validate`` enforces the reference's insert
        guards (t != 0, src/metric.cpp:513-518) batch-wide; strict
        monotonicity across appends is the ingest job's contract (see
        streaming.ingest for the stateful enforcement)."""
        if validate:
            if df.filter(F.col("time") <= 0).limit(1).count() > 0:
                raise InvalidTimestampError("cannot insert invalid (<= 0) time")
        w = df.select("metric", "time", "value")
        parts = []
        if self.partition_by_metric:
            parts.append("metric")
        if self.partition_time_days:
            w = w.withColumn("day", F.call_function(
                "div", F.col("time"), F.lit(86_400_000_000_000)))
            parts.append("day")
        w = w.sortWithinPartitions("metric", "time")
        writer = w.write.mode(mode)
        if parts:
            writer = writer.partitionBy(*parts)
        # appends resolve to the live snapshot (file-level rename-atomic);
        # only table REWRITES need the versioned publish path
        writer.parquet(resolve_table_path(f"{self.base}/raw"))

    def compact(self, table: str = "raw", target_partitions: int = 1) -> int:
        """Small-file compaction for streaming-appended tables: rewrite the
        table coalesced and re-sorted by (metric, time).  Streaming ingest
        appends a few files per micro-batch; at scale those small files
        dominate scan planning cost — periodic compaction restores
        row-group-stat pruning efficiency.  Returns the file count after.

        (A Delta OPTIMIZE/Z-ORDER drops in here when the jars are present.)
        """
        path = (f"{self.base}/raw" if table == "raw"
                else f"{self.base}/levels/{table}")
        if not table_exists(path):
            return 0
        live = resolve_table_path(path)
        df = self.spark.read.parquet(live)
        sort_cols = ["metric", "time"] if "time" in df.columns \
            else ["metric", "interval_start"]
        # preserve the existing partition layout exactly — a rewrite that
        # drops (or adds) partition columns leaves a mixed directory the
        # next writer makes unreadable.  A "tb" column marks the streaming
        # level layout (always partitioned by metric AND time bucket —
        # the ingest job's dynamic partition overwrites depend on it).
        if "tb" in df.columns:
            parts = ["metric", "tb"]
        else:
            parts = [c for c in ("metric", "day") if c in df.columns
                     and ((c == "metric" and self.partition_by_metric)
                          or (c == "day" and self.partition_time_days))]

        def _write(target: str) -> None:
            writer = (df.repartition(max(target_partitions, 1), "metric")
                      .sortWithinPartitions(*sort_cols)
                      .write.mode("overwrite"))
            if parts:
                writer = writer.partitionBy(*parts)
            writer.parquet(target)

        # atomic republish: full new snapshot, then one manifest rename —
        # a concurrent reader sees the old or the new table, never a
        # half-deleted directory (the round-1 in-place overwrite's race)
        new_dir = publish_version(path, _write)
        self.spark.catalog.refreshByPath(new_dir)
        n = sum(1 for root, _d, files in os.walk(new_dir)
                for f in files if f.endswith(".parquet"))
        return n

    def build(self, metas: dict[str, Meta] | None = None) -> None:
        """(Re)build all rollup levels for all metrics.

        Metrics sharing identical hierarchy parameters are built together in
        one job (one scan per distinct Meta), each level written as its own
        parquet table.
        """
        raw = self.raw()
        if raw is None:
            return
        metas = metas or {m: self.meta_for(m) for m in self.metric_names()}
        by_params: dict[tuple, list[str]] = {}
        for m, meta in metas.items():
            key = (meta.interval_min, meta.interval_max, meta.interval_factor)
            by_params.setdefault(key, []).append(m)
        per_level: dict[int, list[DataFrame]] = {}
        for (imin, imax, ifac), metrics in by_params.items():
            meta = Meta(interval_min=imin, interval_max=imax, interval_factor=ifac)
            sub = raw.filter(F.col("metric").isin(metrics))
            for iv, df in build_levels(sub, meta).items():
                per_level.setdefault(iv, []).append(df)
        # one atomic republish per level table (param groups sharing an
        # interval are unioned first) — a rebuild racing readers flips the
        # manifest instead of overwriting in place.  Levels are written
        # bottom-up with each level cached so every cascade step reads its
        # materialized parent (forcing independently would re-derive all
        # intermediate levels from level 1: O(levels^2) aggregations).
        cached = []
        for iv in sorted(per_level):
            dfs = per_level[iv]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d)
            for d in dfs:
                d.cache()
                cached.append(d)
            out = out.sortWithinPartitions("metric", "interval_start")

            def _write(target: str, _out=out) -> None:
                writer = _out.write.mode("overwrite")
                if self.partition_by_metric:
                    writer = writer.partitionBy("metric")
                writer.parquet(target)

            publish_version(f"{self.base}/levels/{iv}", _write)
        for d in cached:
            d.unpersist()


class Metric:
    """Single-metric facade with the reference Metric's read API
    (mode-checked), over the store's tables."""

    def __init__(self, store: HtaStore, name: str, meta: Meta):
        self.store = store
        self.name = name
        self.meta = meta

    def _raw(self) -> DataFrame:
        self.meta.check_read()
        raw = self.store.raw()
        if raw is None:
            raise MissingMetricConfigError(f"no data for {self.name!r}")
        return raw.filter(F.col("metric") == self.name)

    def _levels(self) -> dict[int, DataFrame]:
        out = {}
        for iv, df in self.store.levels_for(self.meta).items():
            out[iv] = df.filter(F.col("metric") == self.name)
        return out

    def retrieve(self, begin: int, end: int,
                 scope: IntervalScope = RAW_DEFAULT) -> DataFrame:
        from ..operators.scopes import Scope
        raw = self._raw()
        lo = begin if scope.begin in (Scope.closed, Scope.open) else None
        hi = end if scope.end in (Scope.closed, Scope.open) else None
        return retrieve_raw(HtaStore.day_pruned(raw, lo, hi), begin, end, scope)

    def retrieve_rows(self, begin: int, end: int, interval_upper: int,
                      scope: IntervalScope = ROW_DEFAULT) -> DataFrame:
        return retrieve_rows(self._raw(), self._levels(), self.meta,
                             begin, end, interval_upper, scope)

    def retrieve_min_samples(self, begin: int, end: int, min_samples: int,
                             scope: IntervalScope = ROW_DEFAULT) -> DataFrame:
        return retrieve_min_samples(self._raw(), self._levels(), self.meta,
                                    begin, end, min_samples, scope)

    def retrieve_flex(self, begin: int, end: int, interval_upper: int,
                      scope: IntervalScope = ROW_DEFAULT,
                      smooth: bool = True):
        return retrieve_flex(self._raw(), self._levels(), self.meta,
                             begin, end, interval_upper, scope, smooth)

    def aggregate(self, begin: int, end: int, use_levels: bool = True) -> DataFrame:
        if use_levels:
            levels = self._levels()
            if levels:
                return aggregate_telescope(self._raw(), levels, self.meta,
                                           begin, end)
        # lower day-bound is safe for the scan (only points >= clamped begin
        # contribute) — but per-metric ranges must come from the *unpruned*
        # table, or clamping would see a false t_first; the upper boundary
        # point may be days later, so no upper bound.
        from ..operators.rollup import raw_range
        raw = self._raw()
        return aggregate_exact(HtaStore.day_pruned(raw, begin, None),
                               begin, end, ranges=raw_range(raw))

    def count(self, begin: int | None = None, end: int | None = None,
              scope: IntervalScope = RAW_DEFAULT) -> int:
        if begin is None:
            return self._raw().count()
        rows = count_scoped(self._raw(), begin, end, scope).collect()
        return rows[0]["n"] if rows else 0

    def range(self) -> tuple[int, int]:
        r = self._raw().agg(F.min("time"), F.max("time")).collect()[0]
        return r[0], r[1]

    def insert(self, df: DataFrame) -> None:
        self.meta.check_write()
        self.store.write_raw(df.withColumn("metric", F.lit(self.name)))
