"""Golden aggregate() tests on F1 — transcribed from
/root/reference/tests/aggregate.cpp:114-395, plus the F5 active_time
regression (tests/aggregate.cpp:397-521) and raw/telescope equivalence.
"""

from __future__ import annotations

import math

import pytest

from hta_spark import Meta, SECOND
from hta_spark.errors import InvalidRangeError
from hta_spark.operators import aggregate_exact, aggregate_telescope, build_levels

from .conftest import F1_META, tp

NS1 = float(SECOND)


def agg1(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


@pytest.fixture(scope="module")
def f1_levels(f1_raw):
    return build_levels(f1_raw, F1_META)


def both_paths(f1_raw, f1_levels, b, e):
    r1 = agg1(aggregate_exact(f1_raw, b, e))
    r2 = agg1(aggregate_telescope(f1_raw, f1_levels, F1_META, b, e))
    for f in ["minimum", "maximum", "sum", "count", "integral", "active_time"]:
        assert r1[f] == r2[f], f"{f}: raw-exact {r1[f]} != telescope {r2[f]}"
    return r1


def test_invalid_inputs(f1_raw):
    with pytest.raises(InvalidRangeError):
        aggregate_exact(f1_raw, tp(10), tp(1))
    for t in [1, 11, 85, 225, 250]:
        with pytest.raises(InvalidRangeError):
            aggregate_exact(f1_raw, tp(t), tp(t))


def test_large_interval_between_first_last(f1_raw, f1_levels):
    r = both_paths(f1_raw, f1_levels, tp(20), tp(220))
    assert r["count"] == 108
    assert r["minimum"] == -36.0
    assert r["maximum"] == 45.0
    assert r["sum"] == 1985.0
    integral = ((-36 * 1) + (-30 * 21) + (-20 * 6) + (-10 * 5) + (0 * 14)
                + (-10 * 13) + (20 * 119) + (31 * 4) + (35 * 14) + (45 * 2)
                + (35 * 1))
    assert r["active_time"] == 200 * SECOND
    assert r["integral"] == integral * NS1


def test_exact_first_to_last(f1_raw, f1_levels):
    r = both_paths(f1_raw, f1_levels, tp(11), tp(225))
    assert r["count"] == 109
    assert r["minimum"] == -37.0 and r["maximum"] == 45.0
    assert r["sum"] == 1948.0
    integral = ((-36 * 10) + (-30 * 21) + (-20 * 6) + (-10 * 5) + (0 * 14)
                + (-10 * 13) + (20 * 119) + (31 * 4) + (35 * 14) + (45 * 2)
                + (35 * 6))
    assert r["active_time"] == 214 * SECOND
    assert r["integral"] == integral * NS1


def test_starts_before_ends_after(f1_raw, f1_levels):
    r = both_paths(f1_raw, f1_levels, tp(1), tp(230))
    assert r["count"] == 109
    assert r["minimum"] == -37.0 and r["maximum"] == 45.0
    assert r["sum"] == 1948.0
    assert r["active_time"] == 214 * SECOND


def test_medium_intervals(f1_raw, f1_levels):
    r = both_paths(f1_raw, f1_levels, tp(110), tp(130))
    assert r["count"] == 20
    assert r["minimum"] == 20.0 and r["maximum"] == 20.0
    assert r["sum"] / r["count"] == 20.0
    assert r["integral"] / r["active_time"] == 20.0
    assert r["active_time"] == 20 * SECOND

    r = both_paths(f1_raw, f1_levels, tp(110), tp(125))
    assert r["count"] == 15 and r["active_time"] == 15 * SECOND

    r = both_paths(f1_raw, f1_levels, tp(115), tp(130))
    assert r["count"] == 15 and r["active_time"] == 15 * SECOND


def test_tiny_one_raw_value(f1_raw, f1_levels):
    r = both_paths(f1_raw, f1_levels, tp(20), tp(30))
    assert r["count"] == 1
    assert r["minimum"] == -36.0 and r["maximum"] == -30.0
    assert r["sum"] / r["count"] == -36.0
    assert r["integral"] / r["active_time"] == (-36 - 9 * 30) / 10.0
    assert r["active_time"] == 10 * SECOND


def test_tiny_point_to_point(f1_raw, f1_levels):
    r = both_paths(f1_raw, f1_levels, tp(11), tp(21))
    assert r["count"] == 1
    assert r["minimum"] == -37.0 and r["maximum"] == -36.0
    assert r["integral"] / r["active_time"] == -36.0
    assert r["active_time"] == 10 * SECOND

    r = both_paths(f1_raw, f1_levels, tp(21), tp(42))
    assert r["count"] == 1
    assert r["sum"] == -36.0
    assert r["minimum"] == -36.0 and r["maximum"] == -30.0
    assert r["integral"] / r["active_time"] == -30.0
    assert r["active_time"] == 21 * SECOND


def test_tiny_between_two_raw(f1_raw, f1_levels):
    r = both_paths(f1_raw, f1_levels, tp(12), tp(20))
    assert r["count"] == 0
    assert r["minimum"] == -36.0 and r["maximum"] == -36.0
    assert r["sum"] == 0.0
    assert r["integral"] / r["active_time"] == -36.0
    assert r["active_time"] == 8 * SECOND


def test_first_row_interval(f1_raw, f1_levels):
    r = both_paths(f1_raw, f1_levels, tp(10), tp(20))
    assert r["active_time"] == 9 * SECOND
    assert r["count"] == 1
    assert r["sum"] == -37.0
    assert r["minimum"] == -37.0 and r["maximum"] == -36.0
    assert r["integral"] == -36.0 * 9 * NS1


def test_row_before_first_row(f1_raw, f1_levels):
    r = both_paths(f1_raw, f1_levels, tp(0), tp(10))
    assert r["active_time"] == 0
    assert r["count"] == 0
    assert r["sum"] == 0.0
    assert r["minimum"] == math.inf and r["maximum"] == -math.inf
    assert r["integral"] == 0.0


def test_begins_after_last(f1_raw, f1_levels):
    r = both_paths(f1_raw, f1_levels, tp(501), tp(504))
    assert r["active_time"] == 0 and r["count"] == 0
    assert r["minimum"] == math.inf and r["maximum"] == -math.inf
    assert r["sum"] == 0.0 and r["integral"] == 0.0


# F5 — sparse active_time regression (tests/aggregate.cpp:397-521)
F5_META = Meta(interval_min=40 * SECOND, interval_max=400_000 * SECOND,
               interval_factor=10)


@pytest.fixture(scope="module")
def f5_raw(spark):
    pts = [("bar", 1_696_102_100 * SECOND, 42.0),
           ("bar", 1_696_112_100 * SECOND, 42.0),
           ("bar", 1_697_112_100 * SECOND, 42.0)]
    return spark.createDataFrame(pts, "metric string, time long, value double").cache()


@pytest.mark.parametrize("b_s,e_s", [
    (1_696_102_100, 1_697_112_100),
    (1_696_102_200, 1_697_112_000),
    (1_696_103_000, 1_697_112_050),
    (1_696_104_000, 1_696_304_000),
    (1_696_110_000, 1_696_140_000),
    (1_696_112_000, 1_696_112_200),
    (1_696_102_100, 1_696_102_101),
])
def test_f5_active_time_invariant(spark, f5_raw, b_s, e_s):
    levels = build_levels(f5_raw, F5_META)
    b, e = b_s * SECOND, e_s * SECOND
    r1 = agg1(aggregate_exact(f5_raw, b, e))
    r2 = agg1(aggregate_telescope(f5_raw, levels, F5_META, b, e))
    # postcondition: active_time == clamped(end) - clamped(begin)
    t_first, t_last = 1_696_102_100 * SECOND, 1_697_112_100 * SECOND
    bm = min(max(b, t_first), t_last)
    em = min(max(e, t_first), t_last)
    expected = em - bm if e > t_first and b <= t_last else 0
    assert r1["active_time"] == expected
    assert r2["active_time"] == expected
    for f in ["minimum", "maximum", "sum", "count", "integral", "active_time"]:
        assert r1[f] == r2[f]


@pytest.mark.parametrize("b,e,exp", [
    # (begin, end, (active, count, sum, min, max, integral))
    (tp(225), tp(504), (0, 0, 0.0, 35.0, 35.0, 0.0)),
    (tp(225) - 1, tp(504), (1, 0, 0.0, 35.0, 35.0, 35.0)),
    (tp(1), tp(10), (0, 0, 0.0, math.inf, -math.inf, 0.0)),
    (tp(1), tp(11), (0, 0, 0.0, math.inf, -math.inf, 0.0)),
    (tp(1), tp(11) + 1, (1, 1, -37.0, -37.0, -36.0, -36.0)),
])
def test_edge_boundaries(f1_raw, f1_levels, b, e, exp):
    """Edge placements around the first/last timestamps
    (tests/aggregate.cpp:330-393), both paths."""
    r = both_paths(f1_raw, f1_levels, b, e)
    active, count, s, mn, mx, integral = exp
    assert r["active_time"] == active
    assert r["count"] == count
    assert r["sum"] == s
    assert r["minimum"] == mn and r["maximum"] == mx
    assert r["integral"] == integral
