"""True-streaming level maintenance with ``applyInPandasWithState``.

This is the reference's ``Level`` open-interval accumulator
(/root/reference/src/level.hpp:38-67) held in Spark's streaming state store,
with ``Metric::insert``'s boundary-splitting close-and-cascade loop
(/root/reference/src/metric.cpp:510-603) replayed per metric inside the
state function — including the n>1 cascade: a closed level-n row advances
the open level-n+1 accumulator (``Metric::insert(Row)``,
src/metric.cpp:562-603) and closes it when the child's end time hits the
parent boundary (exact, because closed child rows are dense: gap buckets
are emitted with count=0 and min/max absorbing the spanning value).
Closed intervals of EVERY level are emitted append-mode; all open tails
live in one checkpointed state row per metric, which is exactly the
reference's ``restore_level`` contract (crash/restart resumes from the
state store).

Complements ``streaming/ingest.py`` (the foreachBatch + idempotent-rewrite
variant): use this one when you want closed rollup rows pushed downstream
as a stream; use IncrementalRollup when you want queryable tables.

Scale shape: state is O(levels) scalars per metric (a few hundred bytes),
the stage is a single shuffle on ``metric`` — one stateful operator, no
chained-stateful restrictions, any number of levels.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["stream_level1", "stream_levels"]

_OUT_FIELDS = [
    T.StructField("interval", T.LongType()),
    T.StructField("metric", T.StringType()),
    T.StructField("interval_start", T.LongType()),
    T.StructField("minimum", T.DoubleType()),
    T.StructField("maximum", T.DoubleType()),
    T.StructField("sum", T.DoubleType()),
    T.StructField("count", T.LongType()),
    T.StructField("integral", T.DoubleType()),
    T.StructField("active_time", T.LongType()),
]
_OUT_SCHEMA = T.StructType(_OUT_FIELDS)

# per-metric state: level-1 cursor + last raw time, then per-level open
# accumulators as parallel arrays (index 0 = level 1, ...); open_start -1
# means "no open interval at this level yet"
_STATE_SCHEMA = T.StructType([
    T.StructField("time_current", T.LongType()),
    T.StructField("last_time", T.LongType()),
    T.StructField("open_start", T.ArrayType(T.LongType())),
    T.StructField("minimum", T.ArrayType(T.DoubleType())),
    T.StructField("maximum", T.ArrayType(T.DoubleType())),
    T.StructField("sum", T.ArrayType(T.DoubleType())),
    T.StructField("count", T.ArrayType(T.LongType())),
    T.StructField("integral", T.ArrayType(T.DoubleType())),
    T.StructField("active_time", T.ArrayType(T.LongType())),
])

_INF = float("inf")
_COLS = [f.name for f in _OUT_FIELDS]


def _make_fn(intervals: list[int]):
    ivs = [int(i) for i in intervals]
    nl = len(ivs)

    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        metric = key[0]
        if state.exists:
            (tc, last_t, os_, mn, mx, sm, cnt, ig, at) = state.get
            os_, mn, mx = list(os_), list(mn), list(mx)
            sm, cnt, ig, at = list(sm), list(cnt), list(ig), list(at)
        else:
            tc, last_t = None, None
            os_ = [-1] * nl
            mn, mx = [_INF] * nl, [-_INF] * nl
            sm, ig = [0.0] * nl, [0.0] * nl
            cnt, at = [0] * nl, [0] * nl

        closed: list[tuple] = []

        def close(j: int, start: int) -> None:
            """Emit level j's open interval and cascade it into level j+1
            (Metric::insert(Row), src/metric.cpp:562-603)."""
            row = (ivs[j], metric, start, mn[j], mx[j], sm[j], cnt[j],
                   ig[j], at[j])
            closed.append(row)
            mn[j], mx[j] = _INF, -_INF
            sm[j], ig[j] = 0.0, 0.0
            cnt[j], at[j] = 0, 0
            os_[j] = -1
            if j + 1 >= nl:
                return            # top level: persisted, not propagated
            p = j + 1
            p_start = start - start % ivs[p]
            if os_[p] < 0:
                os_[p] = p_start
            # monoid merge of the closed child row (Aggregate::operator+=)
            mn[p] = min(mn[p], row[3])
            mx[p] = max(mx[p], row[4])
            sm[p] += row[5]
            cnt[p] += row[6]
            ig[p] += row[7]
            at[p] += row[8]
            if start + ivs[j] == p_start + ivs[p]:
                close(p, p_start)

        # materialize the group's WHOLE micro-batch before sorting:
        # applyInPandasWithState delivers it as an iterator of Arrow
        # chunks with no cross-chunk ordering, so a per-chunk sort with
        # one global last_t cursor would silently drop chunk-2 points
        # whose timestamps fall below chunk 1's max as "non-monotonic"
        # (review r4).  Memory is one group's batch — the same unit the
        # reference ingests per metric.
        chunks = [pdf[["time", "value"]] for pdf in pdfs]
        if not chunks:                     # timeout-style empty invocation
            chunks = [pd.DataFrame({"time": [], "value": []})]
        batch = (chunks[0] if len(chunks) == 1
                 else pd.concat(chunks)).sort_values("time")
        for t, v in zip(batch["time"].to_list(), batch["value"].to_list()):
            t = int(t)
            if t <= 0 or (last_t is not None and t <= last_t):
                continue  # reject invalid / non-monotonic (metric.cpp:513-525)
            last_t = t
            if tc is None:
                tc = t  # level starts at the first point (metric.cpp:533-535)
            iv0 = ivs[0]
            level_end = ((tc + iv0) // iv0) * iv0
            while t >= level_end:
                # boundary partial: count=0/sum=0 but min/max absorb
                pd_ns = level_end - tc
                mn[0] = min(mn[0], v)
                mx[0] = max(mx[0], v)
                ig[0] += v * pd_ns
                at[0] += pd_ns
                tc = level_end
                close(0, level_end - iv0)
                level_end = tc + iv0
            # in-interval advance: Aggregate(v, t - tc)
            dur = t - tc
            mn[0] = min(mn[0], v)
            mx[0] = max(mx[0], v)
            sm[0] += v
            cnt[0] += 1
            ig[0] += v * dur
            at[0] += dur
            if os_[0] < 0:
                os_[0] = level_end - iv0
            tc = t

        state.update((tc, last_t, os_, mn, mx, sm, cnt, ig, at))
        yield pd.DataFrame(closed, columns=_COLS)

    return fn


def stream_levels(stream_df: DataFrame, intervals: list[int]) -> DataFrame:
    """Streaming closed rows for the FULL level hierarchy from a
    (metric, time, value) stream: one stateful stage, one ``interval``
    column tagging each closed row's level.  ``intervals`` is
    ``Meta.level_intervals()`` (ascending, each dividing the next)."""
    if not intervals:
        raise ValueError("need at least one level interval")
    ivs = [int(i) for i in intervals]
    for a, b in zip(ivs, ivs[1:]):
        if b % a != 0:
            raise ValueError(f"level interval {b} is not a multiple of {a}")
    return (stream_df.groupBy("metric")
            .applyInPandasWithState(_make_fn(ivs), _OUT_SCHEMA,
                                    _STATE_SCHEMA, "append",
                                    GroupStateTimeout.NoTimeout))


def stream_level1(stream_df: DataFrame, interval: int) -> DataFrame:
    """Streaming closed level-1 rows from a (metric, time, value) stream
    (the single-level form of :func:`stream_levels`)."""
    return stream_levels(stream_df, [interval]).drop("interval")
