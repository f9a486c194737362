"""Property tests for the vectorized streaming state function
(streaming/live.py `_make_fn`) — VERDICT r5 item 3: r4's worst bugs lived
exactly here (cross-chunk ordering, mixed replay), so the numpy rewrite
gets a differential oracle: a SEQUENTIAL per-point re-implementation of
the reference's insert loop (/root/reference/src/metric.cpp:510-603 —
boundary-partial splitting, close-and-cascade, restore_level state),
written independently of the numpy code, fed the same random point sets
through random batchings / Arrow-chunk splits / duplicate and replay
noise.

The state fn is driven DIRECTLY (fake GroupState), no Spark session: a
hundred hypothesis examples run in seconds, versus one streaming query
each.  The real applyInPandasWithState plumbing (checkpoints, restarts,
chunk delivery) is pinned by tests/test_streaming_ingest.py and
test_streaming_review_fixes.py; this file pins the MATH.

Float policy (live.py docstring / ADVICE r5): `np.add.reduceat` sums
pairwise and merges the carried open accumulator after the batch
reduction, so sum/integral compare with relative epsilon; minimum /
maximum / count / active_time / interval starts compare exactly.
"""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from hta_spark.streaming.live import _make_fn

INF = float("inf")


class FakeState:
    """The subset of pyspark GroupState the fn touches."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class SequentialModel:
    """The reference's per-point insert loop, scalar Python: a kept point
    spans intervals prev..t, contributing boundary partials (min/max
    absorb, integral/active accrue) to every crossed interval and its
    sum/count to the interval containing it; a closed child merges into
    the parent's open accumulator and closes the parent when it ends on
    the parent boundary (Metric::insert(Row))."""

    def __init__(self, ivs: list[int]):
        self.ivs = ivs
        nl = len(ivs)
        self.tc = None
        self.last_t = None
        self.mn = [INF] * nl
        self.mx = [-INF] * nl
        self.sm = [0.0] * nl
        self.ct = [0] * nl
        self.ig = [0.0] * nl
        self.at = [0] * nl
        self.os = [-1] * nl
        self.closed: list[tuple] = []

    def _reset(self, lvl):
        self.os[lvl] = -1
        self.mn[lvl], self.mx[lvl] = INF, -INF
        self.sm[lvl], self.ig[lvl] = 0.0, 0.0
        self.ct[lvl], self.at[lvl] = 0, 0

    def _close(self, lvl):
        row = (self.ivs[lvl], self.os[lvl], self.mn[lvl], self.mx[lvl],
               self.sm[lvl], self.ct[lvl], self.ig[lvl], self.at[lvl])
        self.closed.append(row)
        if lvl + 1 < len(self.ivs):
            self._merge_child(lvl + 1, self.os[lvl], self.ivs[lvl],
                              self.mn[lvl], self.mx[lvl], self.sm[lvl],
                              self.ct[lvl], self.ig[lvl], self.at[lvl])
        self._reset(lvl)

    def _merge_child(self, p, cs, civ, mn, mx, sm, ct, ig, at):
        ivp = self.ivs[p]
        ps = (cs // ivp) * ivp
        if self.os[p] == -1:
            self.os[p] = ps
        self.mn[p] = min(self.mn[p], mn)
        self.mx[p] = max(self.mx[p], mx)
        self.sm[p] += sm
        self.ct[p] += ct
        self.ig[p] += ig
        self.at[p] += at
        if cs + civ == ps + ivp:
            self._close(p)

    def _insert(self, t, v):
        iv0 = self.ivs[0]
        prev = t if self.tc is None else self.tc
        for j in range(prev // iv0, t // iv0 + 1):
            if self.os[0] == -1:
                self.os[0] = j * iv0
            seg = min((j + 1) * iv0, t) - max(j * iv0, prev)
            self.mn[0] = min(self.mn[0], v)
            self.mx[0] = max(self.mx[0], v)
            self.ig[0] += v * seg
            self.at[0] += seg
            if j < t // iv0:
                self._close(0)
            else:
                self.sm[0] += v
                self.ct[0] += 1
        self.tc = self.last_t = t

    def feed_batch(self, pts: list[tuple[int, float]]):
        """Same keep rule as the fn: stable sort by time over the WHOLE
        batch, drop t <= max(last_t, 0), drop intra-batch duplicate
        timestamps keeping the arrival-first one."""
        thresh = max(self.last_t if self.last_t is not None else 0, 0)
        kept, prev_t = [], None
        for t, v in sorted(pts, key=lambda p: p[0]):
            if t <= thresh or t == prev_t:
                prev_t = t
                continue
            prev_t = t
            kept.append((t, v))
        for t, v in kept:
            self._insert(t, v)


def run_fn(ivs, batches):
    """Drive _make_fn directly: each batch is a list of Arrow 'chunks'
    (lists of (t, v)); returns (closed rows, final state tuple)."""
    fn = _make_fn(ivs)
    state = FakeState()
    rows = []
    for chunks in batches:
        pdfs = [pd.DataFrame({"time": pd.Series([t for t, _ in ch],
                                                 dtype="int64"),
                              "value": pd.Series([v for _, v in ch],
                                                 dtype="float64")})
                for ch in chunks]
        for out in fn(("m",), iter(pdfs), state):
            for r in out.itertuples(index=False):
                rows.append((int(r.interval), int(r.interval_start),
                             float(r.minimum), float(r.maximum),
                             float(r.sum), int(r.count), float(r.integral),
                             int(r.active_time)))
    return rows, state._v


def _close_enough(a, b):
    return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)


def assert_equiv(ivs, batches):
    model = SequentialModel(ivs)
    for chunks in batches:
        model.feed_batch([p for ch in chunks for p in ch])
    got, st_ = run_fn(ivs, batches)
    want = [(iv, s, mn, mx, sm, ct, ig, at)
            for (iv, s, mn, mx, sm, ct, ig, at) in model.closed]
    # closed rows: keyed by (interval, start) — each closes exactly once
    gk = {(r[0], r[1]): r for r in got}
    wk = {(r[0], r[1]): r for r in want}
    assert len(gk) == len(got) and len(wk) == len(want)
    assert gk.keys() == wk.keys(), (sorted(gk), sorted(wk))
    for key, g in gk.items():
        w = wk[key]
        assert g[2] == w[2] and g[3] == w[3], (key, g, w)      # min/max
        assert g[5] == w[5] and g[7] == w[7], (key, g, w)      # count/active
        assert _close_enough(g[4], w[4]), (key, g, w)          # sum
        assert _close_enough(g[6], w[6]), (key, g, w)          # integral
    # final open state: the restore_level contract
    if st_ is not None:
        tc, last_t, os_, mn, mx, sm, cnt, ig, at = st_
        assert tc == model.tc and last_t == model.last_t
        assert list(os_) == model.os
        for lvl in range(len(ivs)):
            assert mn[lvl] == model.mn[lvl] and mx[lvl] == model.mx[lvl]
            assert cnt[lvl] == model.ct[lvl] and at[lvl] == model.at[lvl]
            assert _close_enough(sm[lvl], model.sm[lvl])
            assert _close_enough(ig[lvl], model.ig[lvl])
    else:
        assert model.tc is None


@st.composite
def stream_case(draw):
    iv0 = draw(st.sampled_from([2, 3, 5, 10]))
    factors = draw(st.lists(st.integers(2, 5), min_size=0, max_size=3))
    ivs = [iv0]
    for f in factors:
        ivs.append(ivs[-1] * f)
    # arrival list: mostly increasing, salted with duplicates/regressions
    # (including t <= 0 and replays of already-seen timestamps)
    n = draw(st.integers(1, 90))
    steps = draw(st.lists(st.integers(-4, 4 * iv0), min_size=n, max_size=n))
    t0 = draw(st.integers(-2, 3 * iv0))
    # values are exact binary fractions (and segment lengths are small
    # ints), so every sum/integral is exactly representable: association
    # order cannot change them, letting the split-invariance test compare
    # states bit-exactly.  Association *tolerance* (arbitrary doubles) is
    # covered by the model test's isclose fields.
    pts, t = [], t0
    for i, s in enumerate(steps):
        t = t + s
        pts.append((t, float(draw(st.sampled_from(
            [-7.25, 0.0, 1.5, 3.0, 1e6])))))
    # random batching, each batch randomly split into Arrow chunks
    batches, i = [], 0
    while i < len(pts):
        bn = draw(st.integers(1, max(1, len(pts) - i)))
        batch, j = [], i
        while j < i + bn:
            cn = draw(st.integers(1, i + bn - j))
            batch.append(pts[j:j + cn])
            j += cn
        batches.append(batch)
        i += bn
    # occasionally an empty batch (trigger with no rows for this group)
    if draw(st.booleans()):
        batches.insert(draw(st.integers(0, len(batches))), [[]])
    return ivs, batches


@settings(max_examples=120, deadline=None)
@given(stream_case())
def test_state_fn_matches_sequential_model(case):
    ivs, batches = case
    assert_equiv(ivs, batches)


@settings(max_examples=60, deadline=None)
@given(stream_case())
def test_state_fn_batch_split_invariant(case):
    """For the points the fn actually keeps, the union of closed rows and
    the final state must not depend on HOW the stream was batched: replay
    the kept points as ONE batch and as the drawn batching — identical
    output (the stream ≡ batch cascade law, reference
    tests/restore.cpp:87-215)."""
    ivs, batches = case
    # compute the kept sequence via the model's keep rule
    model = SequentialModel(ivs)
    kept: list[tuple[int, float]] = []
    for chunks in batches:
        pts = [p for ch in chunks for p in ch]
        before = model.last_t
        thresh = max(before if before is not None else 0, 0)
        prev_t = None
        for t, v in sorted(pts, key=lambda p: p[0]):
            if t <= thresh or t == prev_t:
                prev_t = t
                continue
            prev_t = t
            kept.append((t, v))
        model.feed_batch(pts)
    split_rows, split_state = run_fn(ivs, batches)
    # one batch of one chunk — fed even when everything was rejected, so
    # both runs end with a state row (an all-rejected batch still updates
    # the identity state)
    one_rows, one_state = run_fn(ivs, [[kept]])
    assert sorted(split_rows) == sorted(one_rows)
    a = tuple(tuple(x) if isinstance(x, list) else x for x in split_state)
    b = tuple(tuple(x) if isinstance(x, list) else x for x in one_state)
    assert a == b
