"""Exhaustive count() scope matrices from
/root/reference/tests/count.cpp:200-416: tiny intervals (point-to-point
cases A/B, strictly-between), first-row / pre-first-row intervals, and
every edge placement around the first/last timestamps — all 9 scope
combinations each."""

from __future__ import annotations

import pytest

from hta_spark import SECOND
from hta_spark.operators import IntervalScope, Scope, count_scoped

from .conftest import tp

S = Scope

MATRICES = [
    # (begin_ns, end_ns, {scope-pair: expected})
    ("pt_to_pt_A", tp(11), tp(21), [0, 1, 1, 1, 2, 2, 1, 2, 2]),
    ("pt_to_pt_B", tp(21), tp(42), [0, 1, 1, 1, 2, 2, 1, 2, 2]),
    ("strictly_between", tp(12), tp(20), [0, 0, 1, 0, 0, 1, 1, 1, 2]),
    ("first_row", tp(10), tp(20), [1, 1, 2, 1, 1, 2, 1, 1, 2]),
    ("row_before_first", tp(0), tp(10), [0, 0, 1, 0, 0, 1, 0, 0, 1]),
    ("begins_after_last", tp(501), tp(504), [0, 0, 0, 0, 0, 0, 1, 1, 1]),
    ("begins_at_last", tp(225), tp(504), [0, 0, 0, 1, 1, 1, 1, 1, 1]),
    ("begins_before_last", tp(225) - 1, tp(504), [1, 1, 1, 1, 1, 1, 2, 2, 2]),
    ("ends_at_first", tp(1), tp(11), [0, 1, 1, 0, 1, 1, 0, 1, 1]),
    ("ends_after_first", tp(1), tp(11) + 1, [1, 1, 2, 1, 1, 2, 1, 1, 2]),
]

SCOPE_ORDER = [(S.open, S.open), (S.open, S.closed), (S.open, S.extended),
               (S.closed, S.open), (S.closed, S.closed), (S.closed, S.extended),
               (S.extended, S.open), (S.extended, S.closed),
               (S.extended, S.extended)]


@pytest.mark.parametrize("name,b,e,expected", MATRICES)
def test_count_scope_matrix(f1_raw, name, b, e, expected):
    for (sb, se), want in zip(SCOPE_ORDER, expected):
        rows = count_scoped(f1_raw, b, e, IntervalScope(sb, se)).collect()
        got = rows[0]["n"] if rows else 0
        assert got == want, f"{name} {sb.value}-{se.value}: {got} != {want}"
