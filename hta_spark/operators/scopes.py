"""IntervalScope predicate algebra (SURVEY.md §2.3).

Reference: ``Scope``/``IntervalScope`` (/root/reference/include/hta/types.hpp),
raw index resolution /root/reference/src/storage/file/metric.cpp:255-327
(via ``find_index_before_or_on`` / ``find_index_on_or_after``,
metric.cpp:102-238), level index resolution metric.cpp:358-472.

Spark mapping: ``closed``/``open`` are plain pushdown-friendly comparisons;
``extended`` additionally needs the neighbour row — implemented as a tiny
per-metric conditional aggregate (max t <= begin / min t >= end) broadcast
back.  ``infinity`` drops the bound.  The reference's count-prefix-sum
hierarchy walk is an indexing concern that parquet row-group stats replace.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import InvalidRangeError


class Scope(str, Enum):
    closed = "closed"
    open = "open"
    extended = "extended"
    infinity = "infinity"


@dataclass(frozen=True)
class IntervalScope:
    begin: Scope = Scope.closed
    end: Scope = Scope.extended


# Default scopes per API (include/hta/metric.hpp:120-137)
RAW_DEFAULT = IntervalScope(Scope.closed, Scope.extended)
ROW_DEFAULT = IntervalScope(Scope.extended, Scope.open)


def check_range(begin: int, end: int, scope: IntervalScope) -> None:
    """begin > end is invalid unless an infinity scope (src/metric.cpp:104-108)."""
    if begin > end and scope.begin != Scope.infinity and scope.end != Scope.infinity:
        raise InvalidRangeError(
            f"invalid request: begin timestamp {begin} larger than end {end}")


def filter_raw(raw: DataFrame, begin: int, end: int,
               scope: IntervalScope = RAW_DEFAULT,
               two_phase: bool = False) -> DataFrame:
    """Scope-filtered raw point scan — ``storage::Metric::get(begin, end, scope)``
    (/root/reference/src/storage/file/metric.cpp:329-345 + find_index:255-327).

    ``two_phase``: for extended scopes, first collect the per-metric
    boundary times (a metric-count-sized action — the Spark analog of the
    reference's index binary search), then add *static* global time bounds
    so the main scan gets parquet pushdown even though the exact per-metric
    predicate is join-dependent.  Results are identical; worth it when the
    scan is large and the extended neighbours are near the range.
    """
    check_range(begin, end, scope)
    t = F.col("time")

    needs_bounds = Scope.extended in (scope.begin, scope.end)
    df = raw
    if needs_bounds:
        bounds = raw.groupBy("metric").agg(
            F.max(F.when(t <= F.lit(begin), t)).alias("_b_ext"),
            F.min(F.when(t >= F.lit(end), t)).alias("_e_ext"),
        )
        if two_phase:
            rows = bounds.collect()
            lo: int | None = None
            hi: int | None = None
            if scope.begin == Scope.extended:
                b_vals = [r["_b_ext"] for r in rows]
                # a metric with no point <= begin starts from its first
                # point -> no safe global lower bound
                lo = min(b_vals) if b_vals and all(
                    v is not None for v in b_vals) else None
            elif scope.begin in (Scope.closed, Scope.open):
                lo = begin
            if scope.end == Scope.extended:
                e_vals = [r["_e_ext"] for r in rows]
                hi = max(e_vals) if e_vals and all(
                    v is not None for v in e_vals) else None
            elif scope.end in (Scope.closed, Scope.open):
                hi = end
            pre = raw
            if lo is not None:
                pre = pre.filter(t >= F.lit(lo))
            if hi is not None:
                pre = pre.filter(t <= F.lit(hi))
            bounds_df = raw.sparkSession.createDataFrame(
                [(r["metric"], r["_b_ext"], r["_e_ext"]) for r in rows],
                "metric string, _b_ext long, _e_ext long")
            df = pre.join(F.broadcast(bounds_df), "metric", "left")
        else:
            df = raw.join(F.broadcast(bounds), "metric", "left")

    cond = F.lit(True)
    if scope.begin == Scope.closed:
        cond = cond & (t >= F.lit(begin))
    elif scope.begin == Scope.open:
        cond = cond & (t > F.lit(begin))
    elif scope.begin == Scope.extended:
        # from the last point at-or-before begin; if none, from the first point
        cond = cond & (F.col("_b_ext").isNull() | (t >= F.col("_b_ext")))
    # infinity: no bound

    if scope.end == Scope.closed:
        cond = cond & (t <= F.lit(end))
    elif scope.end == Scope.open:
        cond = cond & (t < F.lit(end))
    elif scope.end == Scope.extended:
        # up to and including the first point at-or-after end; if none, to last
        cond = cond & (F.col("_e_ext").isNull() | (t <= F.col("_e_ext")))
    # infinity: no bound

    out = df.filter(cond)
    if needs_bounds:
        out = out.drop("_b_ext", "_e_ext")
    return out


def level_start_bounds(begin: int, end: int, interval: int,
                       scope: IntervalScope) -> tuple[int | None, int | None, bool]:
    """Translate a scoped level read into ``interval_start`` bounds.

    Returns ``(min_start, max_start, definitely_empty)`` where either bound is
    None for unbounded.  Level rows are dense on the absolute epoch-aligned
    grid, so the reference's index arithmetic
    (/root/reference/src/storage/file/metric.cpp:392-459) reduces to grid
    predicates (SURVEY.md §2.3); per-metric clamping to the first stored row
    happens naturally because earlier rows don't exist.

    The reference computes indices relative to the metric's aligned epoch;
    since that epoch is itself a multiple of ``interval``, grid arithmetic on
    absolute ns is identical.  Pre-epoch special cases (offset <= 0) fold into
    the same predicates: a too-early bound selects nothing below the first
    stored row.  The one behavioural quirk — extended-end with ``end`` at or
    before the epoch still includes row 0 (index_end=0, metric.cpp:438-445) —
    is preserved by ``ceil`` semantics plus the caller clamping to the first
    row (ceil of a pre-epoch end lands at or below the epoch start... the
    extended-end index formula ``(offset-1)/interval + 1`` with truncating
    division yields 0 for offset <= 0, i.e. row 0 inclusive; our ``max_start``
    for that case is the epoch-aligned floor of ``end`` + interval, which is
    >= the first row's start iff a row could be included — matching).
    """
    def floor_grid(x: int) -> int:
        return x - (x % interval)

    def ceil_grid(x: int) -> int:
        return floor_grid(x + interval - 1)

    min_start: int | None = None
    max_start: int | None = None

    if scope.begin == Scope.closed:
        min_start = ceil_grid(begin)
    elif scope.begin == Scope.open:
        min_start = floor_grid(begin) + interval
    elif scope.begin == Scope.extended:
        min_start = floor_grid(begin)
    # infinity: None

    if scope.end == Scope.closed:
        max_start = floor_grid(end)
    elif scope.end == Scope.open:
        max_start = ceil_grid(end) - interval
    elif scope.end == Scope.extended:
        max_start = ceil_grid(end)
    # infinity: None

    empty = (min_start is not None and max_start is not None
             and min_start > max_start)
    return min_start, max_start, empty


def filter_level(level: DataFrame, begin: int, end: int, interval: int,
                 scope: IntervalScope = ROW_DEFAULT) -> DataFrame:
    """Scoped read of one rollup level (R7 in SURVEY.md §2.1)."""
    check_range(begin, end, scope)
    min_start, max_start, empty = level_start_bounds(begin, end, interval, scope)
    if empty:
        return level.filter(F.lit(False))
    s = F.col("interval_start")
    cond = F.lit(True)
    if min_start is not None:
        cond = cond & (s >= F.lit(min_start))
    if max_start is not None:
        if scope.end == Scope.extended:
            # reference quirk: extended-end with end at/before the metric's
            # epoch still includes row 0 (index formula yields 0 for
            # offset <= 0, /root/reference/src/storage/file/metric.cpp:438-445)
            # -> clamp the bound up to the first stored row per metric.
            firsts = level.groupBy("metric").agg(
                F.min("interval_start").alias("_first_start"))
            return (level.join(F.broadcast(firsts), "metric", "left")
                    .filter(cond & (s <= F.greatest(F.lit(max_start),
                                                    F.col("_first_start"))))
                    .drop("_first_start"))
        cond = cond & (s <= F.lit(max_start))
    return level.filter(cond)
