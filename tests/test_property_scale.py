"""Property-based invariants for the scale-surface operators (hypothesis):

- KMV: exact below k; invariant under duplication, permutation and
  repartitioning (the determinism the md5 construction promises);
- histogram quantiles: estimates bounded by the data range, target rank
  exact, partition-invariant;
- grid range join == brute force for arbitrary intervals and cell sizes
  (incl. degenerate one-unit intervals and cells larger than the domain).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from hta_spark.operators.rangejoin import range_join_points
from hta_spark.pipeline.sketch import hist_quantiles, kmv_distinct


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.integers(min_value=-50, max_value=50),
                     min_size=1, max_size=80),
       dup=st.integers(min_value=1, max_value=3),
       parts=st.integers(min_value=1, max_value=7))
def test_kmv_properties(spark, vals, dup, parts):
    df = spark.createDataFrame([("g", v) for v in vals * dup],
                               "g string, v int")
    row = kmv_distinct(df.repartition(parts), "v", ["g"], k=64).collect()[0]
    n_distinct = len(set(vals))
    if n_distinct < 64:
        assert row["kmv_distinct"] == float(n_distinct)
    base = kmv_distinct(
        spark.createDataFrame([("g", v) for v in sorted(set(vals))],
                              "g string, v int"),
        "v", ["g"], k=64).collect()[0]
    # duplication / permutation / partitioning never move the sketch
    assert (row["n_kept"], row["kth_hash"], row["kmv_distinct"]) \
        == (base["n_kept"], base["kth_hash"], base["kmv_distinct"])


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cents=st.lists(st.integers(min_value=-10_000, max_value=10_000),
                      min_size=1, max_size=120),
       q=st.sampled_from([0.1, 0.5, 0.9, 1.0]),
       parts=st.integers(min_value=1, max_value=5))
def test_hist_quantile_properties(spark, cents, q, parts):
    vals = [c / 100.0 for c in cents]
    df = spark.createDataFrame([(v,) for v in vals], "x double") \
        .repartition(parts)
    rows = hist_quantiles(df, "x", qs=(q,), n_bins=16).collect()
    assert len(rows) == 1
    r = rows[0]
    import math
    n = len(vals)
    assert r["target_rank"] == math.ceil(n * q)
    lo, hi = min(vals), max(vals)
    width_slack = max((hi - lo) / 16, 0.01) + 0.01
    assert lo - width_slack <= r["est"] <= hi + width_slack


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pts=st.lists(st.integers(min_value=0, max_value=300),
                    min_size=0, max_size=40),
       ivs=st.lists(st.tuples(st.integers(min_value=0, max_value=300),
                              st.integers(min_value=1, max_value=80)),
                    min_size=0, max_size=15),
       cell=st.sampled_from([1, 3, 17, 64, 1000]))
def test_range_join_equals_brute_force(spark, pts, ivs, cell):
    points = [(i, p) for i, p in enumerate(pts)]
    intervals = [(j, b, b + ln) for j, (b, ln) in enumerate(ivs)]
    p = spark.createDataFrame(points or [(0, -1)], "pid int, t long")
    if not points:
        p = p.filter("pid < 0")
    iv = spark.createDataFrame(intervals or [(0, -2, -1)],
                               "iid int, b long, e long")
    if not intervals:
        iv = iv.filter("iid < 0")
    got = {(r["pid"], r["iid"])
           for r in range_join_points(p, iv, "t", "b", "e",
                                      cell=cell).collect()}
    want = {(i, j) for i, t in points for j, b, e in intervals
            if b <= t < e}
    assert got == want
