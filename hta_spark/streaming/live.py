"""True-streaming level-1 maintenance with ``applyInPandasWithState``.

This is the reference's ``Level`` open-interval accumulator
(/root/reference/src/level.hpp:38-67) held in Spark's streaming state store,
with ``Metric::insert``'s boundary-splitting close-and-cascade loop
(/root/reference/src/metric.cpp:510-560) replayed per metric inside the
state function.  Closed intervals are emitted append-mode; the open tail
lives in checkpointed state, which is exactly the reference's
``restore_level`` contract (crash/restart resumes from the state store).

Complements ``streaming/ingest.py`` (the foreachBatch + idempotent-rewrite
variant): use this one when you want closed rollup rows pushed downstream
as a stream; use IncrementalRollup when you want queryable tables.

Higher levels are monoid re-groups of the emitted closed rows (batch
``build_next_level`` over the sink, or a second stateful stage).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["stream_level1"]

_OUT_SCHEMA = T.StructType([
    T.StructField("metric", T.StringType()),
    T.StructField("interval_start", T.LongType()),
    T.StructField("minimum", T.DoubleType()),
    T.StructField("maximum", T.DoubleType()),
    T.StructField("sum", T.DoubleType()),
    T.StructField("count", T.LongType()),
    T.StructField("integral", T.DoubleType()),
    T.StructField("active_time", T.LongType()),
])

# (time_current, last_time, minimum, maximum, sum, count, integral, active_time)
_STATE_SCHEMA = T.StructType([
    T.StructField("time_current", T.LongType()),
    T.StructField("last_time", T.LongType()),
    T.StructField("minimum", T.DoubleType()),
    T.StructField("maximum", T.DoubleType()),
    T.StructField("sum", T.DoubleType()),
    T.StructField("count", T.LongType()),
    T.StructField("integral", T.DoubleType()),
    T.StructField("active_time", T.LongType()),
])

_INF = float("inf")


def _make_fn(interval: int):
    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        metric = key[0]
        if state.exists:
            (tc, last_t, mn, mx, sm, cnt, ig, at) = state.get
        else:
            tc, last_t = None, None
            mn, mx, sm, cnt, ig, at = _INF, -_INF, 0.0, 0, 0.0, 0

        closed: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("time")
            for t, v in zip(pdf["time"].to_list(), pdf["value"].to_list()):
                t = int(t)
                if t <= 0 or (last_t is not None and t <= last_t):
                    continue  # reject invalid / non-monotonic (metric.cpp:513-525)
                last_t = t
                if tc is None:
                    tc = t  # level starts at the first point (metric.cpp:533-535)
                level_end = ((tc + interval) // interval) * interval
                while t >= level_end:
                    # boundary partial: count=0/sum=0 but min/max absorb
                    pd_ns = level_end - tc
                    mn, mx = min(mn, v), max(mx, v)
                    ig += v * pd_ns
                    at += pd_ns
                    closed.append((metric, level_end - interval,
                                   mn, mx, sm, cnt, ig, at))
                    tc = level_end
                    mn, mx, sm, cnt, ig, at = _INF, -_INF, 0.0, 0, 0.0, 0
                    level_end = tc + interval
                # in-interval advance: Aggregate(v, t - tc)
                dur = t - tc
                mn, mx = min(mn, v), max(mx, v)
                sm += v
                cnt += 1
                ig += v * dur
                at += dur
                tc = t

        state.update((tc, last_t, mn, mx, sm, cnt, ig, at))
        yield pd.DataFrame(closed, columns=[f.name for f in _OUT_SCHEMA])

    return fn


def stream_level1(stream_df: DataFrame, interval: int) -> DataFrame:
    """Streaming closed level-1 rows from a (metric, time, value) stream."""
    return (stream_df.groupBy("metric")
            .applyInPandasWithState(_make_fn(interval), _OUT_SCHEMA,
                                    _STATE_SCHEMA, "append",
                                    GroupStateTimeout.NoTimeout))
