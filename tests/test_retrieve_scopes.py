"""Raw-retrieve scope sections from /root/reference/tests/retrieve.cpp:214-488:
all 9 scope combinations over two boundary situations on F1 —
(a) begin/end exactly on raw values [42 s, 67 s],
(b) begin/end between raw values [40 s, 50 s].
"""

from __future__ import annotations

import pytest

from hta_spark.operators import IntervalScope, Scope, retrieve_raw

from .conftest import tp

S = Scope

# (begin_s, end_s, scope_begin, scope_end) -> expected times (s)
ON_VALUES = [
    (S.open, S.open, [48, 53]),
    (S.open, S.closed, [48, 53, 67]),
    (S.open, S.extended, [48, 53, 67]),
    (S.closed, S.open, [42, 48, 53]),
    (S.closed, S.closed, [42, 48, 53, 67]),
    (S.closed, S.extended, [42, 48, 53, 67]),
    (S.extended, S.open, [42, 48, 53]),
    (S.extended, S.closed, [42, 48, 53, 67]),
    (S.extended, S.extended, [42, 48, 53, 67]),
]

BETWEEN_VALUES = [
    (S.open, S.open, [42, 48]),
    (S.open, S.closed, [42, 48]),
    (S.open, S.extended, [42, 48, 53]),
    (S.closed, S.open, [42, 48]),
    (S.closed, S.closed, [42, 48]),
    (S.closed, S.extended, [42, 48, 53]),
    (S.extended, S.open, [21, 42, 48]),
    (S.extended, S.closed, [21, 42, 48]),
    (S.extended, S.extended, [21, 42, 48, 53]),
]


@pytest.mark.parametrize("sb,se,expected", ON_VALUES)
def test_scopes_on_raw_values(f1_raw, sb, se, expected):
    got = sorted(r["time"] for r in
                 retrieve_raw(f1_raw, tp(42), tp(67),
                              IntervalScope(sb, se)).collect())
    assert got == [tp(t) for t in expected], (sb, se)


@pytest.mark.parametrize("sb,se,expected", BETWEEN_VALUES)
def test_scopes_between_raw_values(f1_raw, sb, se, expected):
    got = sorted(r["time"] for r in
                 retrieve_raw(f1_raw, tp(40), tp(50),
                              IntervalScope(sb, se)).collect())
    assert got == [tp(t) for t in expected], (sb, se)


@pytest.mark.parametrize("sb,se,expected", ON_VALUES)
def test_two_phase_equivalence_on_values(f1_raw, sb, se, expected):
    from hta_spark.operators.scopes import filter_raw
    got = sorted(r["time"] for r in filter_raw(
        f1_raw, tp(42), tp(67), IntervalScope(sb, se),
        two_phase=True).collect())
    assert got == [tp(t) for t in expected], (sb, se)


@pytest.mark.parametrize("sb,se,expected", BETWEEN_VALUES)
def test_two_phase_equivalence_between(f1_raw, sb, se, expected):
    from hta_spark.operators.scopes import filter_raw
    got = sorted(r["time"] for r in filter_raw(
        f1_raw, tp(40), tp(50), IntervalScope(sb, se),
        two_phase=True).collect())
    assert got == [tp(t) for t in expected], (sb, se)


def test_two_phase_pushdown_visible(spark, f1_raw):
    """With two_phase, the static bounds must reach the scan as a plain
    time filter (visible pre-join), not only via the broadcast join."""
    import re
    from hta_spark.operators.scopes import filter_raw
    df = filter_raw(f1_raw, tp(42), tp(67),
                    IntervalScope(Scope.extended, Scope.extended),
                    two_phase=True)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert re.search(r"time#\d+L >= 15191300", plan), plan
