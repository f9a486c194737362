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
        """Vectorized replay of the reference's per-point insert loop
        (``Metric::insert``, src/metric.cpp:510-603): a kept point whose
        duration crosses interval boundaries contributes a "boundary
        partial" (min/max absorb, integral/active accrue, no sum/count)
        to every interval it spans and its sum/count to the interval
        containing it, closed intervals cascade into the parent level,
        and a parent closes exactly when its last child does.  The
        per-point while-loop becomes numpy per batch: boundary-split
        segments (repeat/arange expansion — the same O(crossed
        boundaries) work the loop does), dense per-interval stats via
        ``reduceat``/``bincount`` (grouped in array order = time order;
        NOTE ``np.add.reduceat`` sums pairwise and the carried open
        accumulator merges after the batch reduction, so float
        sum/integral agree with the sequential per-point loop only
        within association tolerance (~1e-13 relative) — parity tests
        must compare those two fields with a relative epsilon, never
        bit-exact; min/max/count/active_time stay exact), then a
        per-LEVEL cascade over the dense closed children (levels
        iterations, not rows).
        ~40x the per-row-Python loop's throughput at 1 MHz spacing."""
        import numpy as np

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

        # materialize the group's WHOLE micro-batch before sorting:
        # applyInPandasWithState delivers it as an iterator of Arrow
        # chunks with no cross-chunk ordering, so a per-chunk sort with
        # one global last_t cursor would silently drop chunk-2 points
        # whose timestamps fall below chunk 1's max as "non-monotonic"
        # (review r4).  Memory is one group's batch — the same unit the
        # reference ingests per metric.
        ts, vs = [], []
        for pdf in pdfs:
            ts.append(np.asarray(pdf["time"].to_numpy(), dtype=np.int64))
            vs.append(np.asarray(pdf["value"].to_numpy(),
                                 dtype=np.float64))
        t = np.concatenate(ts) if ts else np.empty(0, dtype=np.int64)
        v = np.concatenate(vs) if vs else np.empty(0, dtype=np.float64)
        if len(t) > 1 and np.any(t[1:] < t[:-1]):
            # stable sort keeps the batch-first duplicate; skipped on the
            # (typical) already-ordered batch — the argsort of an 8M-row
            # batch costs more than the whole dense aggregation
            order = np.argsort(t, kind="stable")
            t, v = t[order], v[order]
        # reject invalid / non-monotonic (metric.cpp:513-525): sorted, so
        # "≤ the running kept max" reduces to "≤ last_t, ≤ 0, or equal to
        # the previous element" (stable sort keeps the batch-first dup)
        thresh = last_t if last_t is not None else 0
        keep = (t > max(thresh, 0))
        if len(t) > 1:
            keep[1:] &= t[1:] != t[:-1]
        t, v = t[keep], v[keep]
        n = len(t)
        if n == 0:
            state.update((tc, last_t, os_, mn, mx, sm, cnt, ig, at))
            yield pd.DataFrame(
                {c: pd.Series(dtype=d) for c, d in zip(
                    _COLS, ["int64", "object", "int64", "float64",
                            "float64", "float64", "int64", "float64",
                            "int64"])})
            return

        # level starts at the first point (metric.cpp:533-535): the first
        # kept point's "previous cursor" is itself (zero-length segment)
        first = tc is None
        prev = np.concatenate(([t[0] if first else int(tc)], t[:-1]))
        iv0 = ivs[0]
        K = t // iv0            # interval holding each point's sum/count
        Kp = prev // iv0        # open interval when the point arrives
        K0, Kn = int(Kp[0]), int(K[-1])
        L = Kn - K0 + 1

        # boundary-split segments: point i touches intervals Kp[i]..K[i]
        m = K - Kp + 1
        reps = m.astype(np.int64)
        M = int(reps.sum())
        J = np.repeat(Kp, reps) + (np.arange(M)
                                   - np.repeat(np.cumsum(reps) - reps, reps))
        vr = np.repeat(v, reps)
        seg = (np.minimum((J + 1) * iv0, np.repeat(t, reps))
               - np.maximum(J * iv0, np.repeat(prev, reps)))
        idx = J - K0                       # non-decreasing, covers 0..L-1
        gs = np.searchsorted(idx, np.arange(L), side="left")
        act_d = np.add.reduceat(seg, gs)
        igr_d = np.add.reduceat(vr * seg, gs)
        # fmin/fmax skip NaN values exactly like the sequential
        # min(current, v) chain; an all-NaN interval post-fixes to the
        # chain's untouched ±inf initializers
        mn_d = np.fmin.reduceat(vr, gs)
        mx_d = np.fmax.reduceat(vr, gs)
        mn_d = np.where(np.isnan(mn_d), _INF, mn_d)
        mx_d = np.where(np.isnan(mx_d), -_INF, mx_d)
        cnt_d = np.bincount(K - K0, minlength=L)
        sum_d = np.bincount(K - K0, weights=v, minlength=L)
        # merge the carried open accumulator into the entry interval
        mn_d[0] = min(mn[0], mn_d[0])
        mx_d[0] = max(mx[0], mx_d[0])
        sum_d[0] += sm[0]
        cnt_d[0] += cnt[0]
        igr_d[0] += ig[0]
        act_d[0] += at[0]

        out: dict[str, list] = {c: [] for c in _COLS}

        def emit(level_iv: int, starts, mn_a, mx_a, sm_a, cnt_a, ig_a,
                 at_a) -> None:
            k = len(starts)
            out["interval"].append(np.full(k, level_iv, dtype=np.int64))
            out["metric"].append(np.full(k, metric, dtype=object))
            out["interval_start"].append(starts)
            out["minimum"].append(mn_a)
            out["maximum"].append(mx_a)
            out["sum"].append(sm_a)
            out["count"].append(cnt_a.astype(np.int64))
            out["integral"].append(ig_a)
            out["active_time"].append(at_a.astype(np.int64))

        # closed level-1 rows: every dense interval but the open last one
        c_start0, c_n = K0 * iv0, L - 1
        emit(iv0, (K0 + np.arange(c_n)) * iv0, mn_d[:c_n], mx_d[:c_n],
             sum_d[:c_n], cnt_d[:c_n], igr_d[:c_n], act_d[:c_n])
        # interval Kn stays open in state
        os_[0] = Kn * iv0
        mn[0], mx[0] = float(mn_d[L - 1]), float(mx_d[L - 1])
        sm[0], cnt[0] = float(sum_d[L - 1]), int(cnt_d[L - 1])
        ig[0], at[0] = float(igr_d[L - 1]), int(act_d[L - 1])

        # cascade: closed child rows (DENSE — boundary partials emit every
        # crossed interval, including count=0 gap buckets) merge into the
        # parent accumulator; a parent closes exactly when its last child
        # does (Metric::insert(Row), src/metric.cpp:562-603), so with
        # dense children all spanned parents close except (at most) the
        # one holding the last child
        c_mn, c_mx = mn_d[:c_n], mx_d[:c_n]
        c_sm, c_ct = sum_d[:c_n], cnt_d[:c_n]
        c_ig, c_at = igr_d[:c_n], act_d[:c_n]
        civ = iv0
        for p in range(1, nl):
            if c_n == 0:
                break
            ivp = ivs[p]
            c_starts = c_start0 + np.arange(c_n) * civ
            P = c_starts // ivp
            P0 = int(P[0])
            Lp = int(P[-1]) - P0 + 1
            pgs = np.searchsorted(P - P0, np.arange(Lp), side="left")
            pmn = np.fmin.reduceat(c_mn, pgs)
            pmx = np.fmax.reduceat(c_mx, pgs)
            psm = np.add.reduceat(c_sm, pgs)
            pct = np.add.reduceat(c_ct, pgs)
            pig = np.add.reduceat(c_ig, pgs)
            pat = np.add.reduceat(c_at, pgs)
            pmn[0] = min(mn[p], pmn[0])
            pmx[0] = max(mx[p], pmx[0])
            psm[0] += sm[p]
            pct[0] += cnt[p]
            pig[0] += ig[p]
            pat[0] += at[p]
            last_child_end = int(c_starts[-1]) + civ
            n_closed = (last_child_end - P0 * ivp) // ivp
            emit(ivp, (P0 + np.arange(n_closed)) * ivp, pmn[:n_closed],
                 pmx[:n_closed], psm[:n_closed], pct[:n_closed],
                 pig[:n_closed], pat[:n_closed])
            if n_closed < Lp:              # partial last parent stays open
                os_[p] = (P0 + n_closed) * ivp
                mn[p], mx[p] = float(pmn[Lp - 1]), float(pmx[Lp - 1])
                sm[p], cnt[p] = float(psm[Lp - 1]), int(pct[Lp - 1])
                ig[p], at[p] = float(pig[Lp - 1]), int(pat[Lp - 1])
            else:                          # boundary-aligned: all closed
                os_[p] = -1
                mn[p], mx[p] = _INF, -_INF
                sm[p], ig[p] = 0.0, 0.0
                cnt[p], at[p] = 0, 0
            c_start0, c_n, civ = P0 * ivp, n_closed, ivp
            c_mn, c_mx = pmn[:n_closed], pmx[:n_closed]
            c_sm, c_ct = psm[:n_closed], pct[:n_closed]
            c_ig, c_at = pig[:n_closed], pat[:n_closed]

        state.update((int(t[-1]), int(t[-1]), os_, mn, mx, sm, cnt, ig, at))
        yield pd.DataFrame({c: np.concatenate(a) if a else a
                            for c, a in out.items()})

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
