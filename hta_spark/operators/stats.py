"""R6/R8 — count, range, last (SURVEY.md §2.1).

Reference: /root/reference/src/metric.cpp:233-243,441-445;
/root/reference/src/storage/file/metric.cpp:341-345,497-515.

The reference computes scoped counts from rollup ``count`` sums plus a local
refine (its prefix-sum index walk).  In Spark a scoped count is a pruned
``count(*)`` — parquet row-group stats give the same skip-scan effect; for
very large ranges :func:`count_via_levels` sums rollup counts instead,
touching O(levels·factor) rows (used by bench to show the scale path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..compat import pin
from .scopes import RAW_DEFAULT, IntervalScope, filter_raw

__all__ = ["count_scoped", "count_total", "count_via_levels", "metric_range",
           "last_point"]


def count_scoped(raw: DataFrame, begin: int, end: int,
                 scope: IntervalScope = RAW_DEFAULT) -> DataFrame:
    """Per-metric point count in the scoped range (metric, n)."""
    return (filter_raw(raw, begin, end, scope)
            .groupBy("metric").agg(F.count("*").alias("n")))


def count_total(raw: DataFrame) -> DataFrame:
    return raw.groupBy("metric").agg(F.count("*").alias("n"))


def metric_range(raw: DataFrame) -> DataFrame:
    """(first, last) timestamp pair per metric."""
    return raw.groupBy("metric").agg(
        F.min("time").alias("t_first"), F.max("time").alias("t_last"))


def count_via_levels(raw: DataFrame, levels: dict, meta, begin: int,
                     end: int) -> DataFrame:
    """Point count over [begin, end) via rollup ``count`` sums — the
    reference's count-prefix-sum walk
    (/root/reference/src/storage/file/metric.cpp:102-156) as a telescoped
    plan: O(levels·factor) rollup rows + two raw edge scans instead of a
    full range scan.

    A point count over [begin, end) IS the ``count`` field of the exact
    range aggregate, except at the data tail: the aggregate clamps ``end``
    to the last point and counts points in [begin, t_last) — the last point
    itself needs a +1 correction when ``begin <= t_last < end``.
    """
    from pyspark.sql import functions as F

    from .aggregate import aggregate_telescope
    from .rollup import raw_range
    # one eager metric-count-sized materialization: the lazy ranges plan
    # would re-execute its full-raw aggregate in the telescope's identity
    # fill AND the correction join below — 2 extra raw scans in the
    # operator whose whole point is avoiding raw scans (review r4)
    ranges = pin(raw_range(raw))
    agg = aggregate_telescope(raw, levels, meta, begin, end, ranges=ranges)
    corr = F.when((F.lit(begin) <= F.col("t_last"))
                  & (F.col("t_last") < F.lit(end)), 1).otherwise(0)
    return (agg.join(F.broadcast(ranges), "metric")
            .select("metric", (F.col("count") + corr).cast("long").alias("n")))


def last_point(raw: DataFrame) -> DataFrame:
    """Tail element per metric — max_by keeps it a single aggregation
    (no sort/limit per metric)."""
    return raw.groupBy("metric").agg(
        F.max("time").alias("time"),
        F.max_by("value", "time").alias("value"))
