"""R5 — exact aggregate over an arbitrary ns range (SURVEY.md §2.1).

Two implementations with identical results (equivalence-tested):

- :func:`aggregate_exact` — raw-exact single pruned scan; the Spark-idiomatic
  default.  Mirrors ``Metric::aggregate_raw`` semantics
  (/root/reference/src/metric.cpp:112-137) with per-metric clamping
  (/root/reference/src/metric.cpp:160-231: clamp to data range, identity
  when the range misses the data entirely).
- :func:`aggregate_telescope` — the reference's multi-resolution telescoping
  decomposition (metric.cpp:184-227): raw ragged edges + per-level chunks,
  O(levels * factor) rows touched instead of O(raw).  The scale path when
  rollups are materialized — at 100 TB a year-long exact aggregate reads a
  few hundred rollup rows instead of re-scanning raw.

Postcondition (both): ``active_time == clamped_end - clamped_begin``
(metric.cpp:229; regression-tested per tests/aggregate.cpp:397-521).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..chrono import interval_begin, interval_end
from ..errors import InvalidRangeError
from ..meta import Meta
from .rollup import raw_range
from .scopes import IntervalScope, Scope, filter_level

__all__ = ["aggregate_exact", "aggregate_telescope"]

_INF = float("inf")

_AGG_OUT = ["metric", "minimum", "maximum", "sum", "count", "integral",
            "active_time"]


def _identity_fill(joined: DataFrame, exact: bool = False) -> DataFrame:
    """Fill metrics with no in-range contributions with the identity
    aggregate (min=+inf, max=-inf, rest 0) — ``return {}`` at
    /root/reference/src/metric.cpp:174-178."""
    sum_zero = F.lit(0).cast("long") if exact else F.lit(0.0)
    int_zero = F.lit(0).cast("decimal(38,0)") if exact else F.lit(0.0)
    return joined.select(
        "metric",
        F.coalesce(F.col("minimum"), F.lit(_INF)).alias("minimum"),
        F.coalesce(F.col("maximum"), F.lit(-_INF)).alias("maximum"),
        F.coalesce(F.col("sum"), sum_zero).alias("sum"),
        F.coalesce(F.col("count"), F.lit(0)).cast("long").alias("count"),
        F.coalesce(F.col("integral"), int_zero).alias("integral"),
        F.coalesce(F.col("active_time"), F.lit(0)).cast("long").alias("active_time"),
    )


def aggregate_exact(raw: DataFrame, begin: int, end: int,
                    ranges: DataFrame | None = None,
                    exact: bool = False) -> DataFrame:
    """One row per metric: exact Aggregate over [begin, end) with LAST
    semantics, per-metric clamping and identity fill.

    Fully declarative: filter (pushed to parquet) -> one window lag ->
    one grouped aggregation.  The pre-window filter is safe because every
    predecessor timestamp below the clamped begin is clamped to it anyway.
    ``exact``: order-free integer sum/integral in micro-value units — see
    rollup._merge_pieces.
    """
    if begin >= end:
        raise InvalidRangeError(
            f"invalid request: begin timestamp {begin} >= end timestamp {end}")
    ranges = ranges if ranges is not None else raw_range(raw)

    # static pushdown bound: for every *valid* metric (begin <= t_last,
    # end > t_first) the clamped begin bm = max(begin, t_first) >= begin, and
    # invalid metrics contribute nothing — so `time >= begin` prunes the
    # parquet scan (join-dependent predicates like `time >= bm` cannot).
    j = (raw.filter(F.col("time") >= F.lit(begin))
         .join(F.broadcast(ranges), "metric"))
    bm = F.greatest(F.least(F.lit(begin), F.col("t_last")), F.col("t_first"))
    em = F.greatest(F.least(F.lit(end), F.col("t_last")), F.col("t_first"))
    valid = (F.lit(end) > F.col("t_first")) & (F.lit(begin) <= F.col("t_last"))

    # prune: keep points in [bm, em) plus the first boundary point >= em.
    # (points below bm only matter as clamped-away predecessors)
    j = j.filter(valid & (F.col("time") >= bm)).withColumn("_em", em).withColumn("_bm", bm)
    bounds = j.groupBy("metric").agg(
        F.min(F.when(F.col("time") >= F.col("_em"), F.col("time"))).alias("_e_pt"))
    j = (j.join(F.broadcast(bounds), "metric", "left")
         .filter(F.col("_e_pt").isNull() | (F.col("time") <= F.col("_e_pt"))))

    w = Window.partitionBy("metric").orderBy("time")
    prev = F.greatest(F.coalesce(F.lag("time").over(w), F.col("_bm")), F.col("_bm"))
    t, v = F.col("time"), F.col("value")
    inside = t < F.col("_em")

    contrib = j.select(
        "metric",
        v.alias("mv"),
        F.when(inside, v).alias("sv"),
        F.when(inside, F.lit(1)).otherwise(F.lit(0)).alias("cnt"),
        F.when(inside, (t - prev)).otherwise(F.col("_em") - prev).alias("dur"),
    )
    if exact:
        from .rollup import micro_value
        sum_expr = F.coalesce(F.sum(micro_value(F.col("sv"))),
                              F.lit(0)).cast("long").alias("sum")
        integral_expr = F.sum(
            micro_value(F.col("mv")).cast("decimal(38,0)")
            * F.col("dur")).alias("integral")
    else:
        sum_expr = F.coalesce(F.sum("sv"), F.lit(0.0)).alias("sum")
        integral_expr = F.sum(
            F.col("mv") * F.col("dur").cast("double")).alias("integral")
    agg = contrib.groupBy("metric").agg(
        F.min("mv").alias("minimum"),
        F.max("mv").alias("maximum"),
        sum_expr,
        F.sum("cnt").cast("long").alias("count"),
        integral_expr,
        F.sum("dur").cast("long").alias("active_time"),
    )
    return _identity_fill(ranges.select("metric").join(agg, "metric", "left"),
                          exact=exact)


def _telescope_plan(begin: int, end: int, meta: Meta) -> tuple[
        list[tuple[int, int]], list[tuple[int, int, int]]]:
    """The reference's decomposition loop (metric.cpp:184-227) on clamped
    bounds: returns (raw_edges, level_chunks) with level chunks as
    (interval, chunk_begin, chunk_end), all [b, e) with aligned b/e."""
    interval = meta.interval_min
    next_begin = interval_end(begin - 1, interval)
    next_end = interval_begin(end, interval)
    if next_begin >= next_end:
        return [(begin, end)], []
    raw_edges = [(begin, next_begin), (next_end, end)]
    begin, end = next_begin, next_end
    chunks: list[tuple[int, int, int]] = []
    while True:
        next_interval = interval * meta.interval_factor
        nb = interval_end(begin - 1, next_interval)
        ne = interval_begin(end, next_interval)
        if next_interval > meta.interval_max or nb >= ne:
            chunks.append((interval, begin, end))
            break
        chunks.append((interval, begin, nb))
        chunks.append((interval, ne, end))
        begin, end = nb, ne
        interval = next_interval
    return raw_edges, [(iv, b, e) for (iv, b, e) in chunks if b < e]


def aggregate_telescope(raw: DataFrame, levels: dict[int, DataFrame], meta: Meta,
                        begin: int, end: int,
                        ranges: DataFrame | None = None) -> DataFrame:
    """Telescoping exact aggregate via materialized rollups.

    Per-metric clamping makes the decomposition metric-dependent; metrics
    are grouped by identical clamped bounds.  The driver sees only the
    DISTINCT clamped-bound pairs (group-count-sized — it must, since each
    pair yields a different telescope decomposition, i.e. a different
    plan); per-metric membership stays in a broadcastable frame applied via
    semi-joins, so 10^5 metrics cost the same planning as 5.  Typically
    every metric's data span covers the query range, so there is a single
    group.
    """
    if begin >= end:
        raise InvalidRangeError(
            f"invalid request: begin timestamp {begin} >= end timestamp {end}")
    ranges = ranges if ranges is not None else raw_range(raw)
    b_lit, e_lit = F.lit(begin), F.lit(end)
    clamped = (ranges
               .filter((e_lit > F.col("t_first")) & (b_lit <= F.col("t_last")))
               .select(
                   "metric",
                   F.least(F.greatest(b_lit, F.col("t_first")),
                           F.col("t_last")).alias("_bm"),
                   F.least(F.greatest(e_lit, F.col("t_first")),
                           F.col("t_last")).alias("_em"))
               .localCheckpoint(eager=True))
    bound_pairs = [(r["_bm"], r["_em"]) for r in
                   clamped.select("_bm", "_em").distinct().collect()]

    spark = raw.sparkSession
    parts: list[DataFrame] = []
    for (bm, em) in bound_pairs:
        members = clamped.filter((F.col("_bm") == F.lit(bm))
                                 & (F.col("_em") == F.lit(em))).select("metric")
        sub_raw = raw.join(F.broadcast(members), "metric", "left_semi")
        if bm >= em:
            # degenerate clamp (begin at/after last point): raw path handles
            parts.append(_edge_aggregate(sub_raw, bm, em))
            continue
        raw_edges, chunks = _telescope_plan(bm, em, meta)
        for (b, e) in raw_edges:
            parts.append(_edge_aggregate(sub_raw, b, e))
        for (iv, b, e) in chunks:
            lvl = levels.get(iv)
            if lvl is None:
                # missing rollup level (not built / unreadable): fall back
                # to an exact raw scan of the chunk rather than silently
                # undercounting — the aligned [b, e) raw aggregate equals
                # the level-row sum by the path-equivalence invariant
                parts.append(_edge_aggregate(sub_raw, b, e))
                continue
            sub = filter_level(
                lvl.join(F.broadcast(members), "metric", "left_semi"),
                b, e, iv, IntervalScope(Scope.closed, Scope.open))
            # each chunk reads O(metrics * factor) rollup rows — tiny next
            # to its 32-partition parent.  Without the coalesce the final
            # union+agg schedules parts*shuffle_partitions map tasks (~800
            # at sf0.1) and task overhead dominates; cap per-chunk
            # parallelism proportionally to the cluster instead.
            par = max(2, spark.sparkContext.defaultParallelism // 8)
            parts.append(sub.select(
                "metric", "minimum", "maximum", "sum", "count", "integral",
                "active_time").coalesce(par))

    if parts:
        allc = parts[0]
        for p in parts[1:]:
            allc = allc.unionByName(p)
        agg = allc.groupBy("metric").agg(
            F.min("minimum").alias("minimum"),
            F.max("maximum").alias("maximum"),
            F.sum("sum").alias("sum"),
            F.sum("count").cast("long").alias("count"),
            F.sum("integral").alias("integral"),
            F.sum("active_time").cast("long").alias("active_time"),
        )
    else:
        agg = spark.createDataFrame([], schema="metric string, minimum double,"
                                    " maximum double, sum double, count long,"
                                    " integral double, active_time long")
    return _identity_fill(ranges.select("metric").join(agg, "metric", "left"))


def _edge_aggregate(raw: DataFrame, b: int, e: int) -> DataFrame:
    """``aggregate_raw`` over one ragged edge [b, e) — scoped scan
    {closed, extended} with boundary-partial carry (metric.cpp:112-137).
    Contributions only; identity fill happens at the caller."""
    t, v = F.col("time"), F.col("value")
    # points >= b plus the first point >= e
    sub = raw.filter(t >= F.lit(b))
    bounds = sub.groupBy("metric").agg(
        F.min(F.when(t >= F.lit(e), t)).alias("_e_pt"))
    sub = (sub.join(F.broadcast(bounds), "metric", "left")
           .filter(F.col("_e_pt").isNull() | (t <= F.col("_e_pt"))))
    w = Window.partitionBy("metric").orderBy("time")
    prev = F.greatest(F.coalesce(F.lag("time").over(w), F.lit(b)), F.lit(b))
    inside = t < F.lit(e)
    contrib = sub.select(
        "metric",
        v.alias("mv"),
        F.when(inside, v).alias("sv"),
        F.when(inside, F.lit(1)).otherwise(F.lit(0)).alias("cnt"),
        F.when(inside, t - prev).otherwise(F.lit(e) - prev).alias("dur"),
    )
    return contrib.groupBy("metric").agg(
        F.min("mv").alias("minimum"),
        F.max("mv").alias("maximum"),
        F.coalesce(F.sum("sv"), F.lit(0.0)).alias("sum"),
        F.sum("cnt").cast("long").alias("count"),
        F.sum(F.col("mv") * F.col("dur").cast("double")).alias("integral"),
        F.sum("dur").cast("long").alias("active_time"),
    )