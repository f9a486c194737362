"""Multi-metric aligned retrieve (operators/retrieve.py::retrieve_aligned):
N metrics pivoted onto one common interval grid — the dashboard composition
the reference serves as N separate per-metric retrieves
(/root/reference/src/metric.cpp:414-439).  Registry gate:
``hta_retrieve_aligned`` (bit-exact vs the DuckDB pivot oracle)."""

from __future__ import annotations

from hta_spark import Meta, SECOND
from hta_spark.operators import build_levels
from hta_spark.operators.retrieve import retrieve_aligned

from .conftest import tp

META = Meta(interval_min=10 * SECOND, interval_max=1000 * SECOND,
            interval_factor=10)


def _two_metric_frame(spark):
    # a: value i at tp(i), every 5 s over [0, 300]; b: constant 1.0 over
    # [100, 305] — so b has NO closed 100 s bucket before tp(100)
    pts = [("a", tp(i), float(i)) for i in range(0, 301, 5)]
    pts += [("b", tp(i), 1.0) for i in range(100, 306, 5)]
    return spark.createDataFrame(pts, "metric string, time long, value double")


def test_aligned_grid_means_and_null_gaps(spark):
    df = _two_metric_frame(spark)
    levels = build_levels(df, META)
    out = retrieve_aligned(levels, META, tp(0), tp(300), 100 * SECOND)
    assert out.columns == ["time", "interval", "a", "b"]
    rows = {r["time"]: r for r in out.collect()}
    # ROW_DEFAULT scope (extended begin, open end) on the 100 s grid:
    # starts tp(0), tp(100), tp(200)
    assert sorted(rows) == [tp(0), tp(100), tp(200)]
    assert all(r["interval"] == 100 * SECOND for r in rows.values())
    # LAST-semantics mean_integral of metric a: each 5 s segment carries
    # the LATER point's value -> bucket mean = avg(first+5 .. last)
    assert rows[tp(0)]["a"] == 52.5
    assert rows[tp(100)]["a"] == 152.5
    assert rows[tp(200)]["a"] == 252.5
    # b has no closed bucket at tp(0) -> NULL gap, present afterwards
    assert rows[tp(0)]["b"] is None
    assert rows[tp(100)]["b"] == 1.0
    assert rows[tp(200)]["b"] == 1.0


def test_aligned_pins_schema_and_steps_down(spark):
    df = _two_metric_frame(spark)
    levels = build_levels(df, META)
    # pinned metric list fixes the schema without inference; an absent
    # metric is an all-NULL column (the dashboard's "no data yet" lane)
    out = retrieve_aligned(levels, META, tp(0), tp(300), 100 * SECOND,
                           metrics=["a", "b", "zz"])
    assert out.columns == ["time", "interval", "a", "b", "zz"]
    assert [r["zz"] for r in out.collect()] == [None, None, None]
    # limit allows the 1000 s level but only 10 s is materialized ->
    # steps down to the largest materialized level
    only10 = {10 * SECOND: levels[10 * SECOND]}
    out10 = retrieve_aligned(only10, META, tp(0), tp(300), 1000 * SECOND)
    assert out10.select("interval").distinct().collect()[0][0] == 10 * SECOND


def test_aligned_custom_value_expression(spark):
    from pyspark.sql import functions as F
    df = _two_metric_frame(spark)
    levels = build_levels(df, META)
    out = retrieve_aligned(levels, META, tp(0), tp(300), 100 * SECOND,
                           value=F.col("count").cast("double"))
    rows = {r["time"]: r for r in out.collect()}
    # counts: a has 20 points per closed bucket (5 s spacing, the bucket-
    # opening point belongs to the PREVIOUS bucket's a-piece only when it
    # starts the bucket -- points at tp(0/5/../95) = 20 in [0,100))
    assert rows[tp(0)]["a"] == 20.0
    assert rows[tp(100)]["b"] == 20.0


def test_aligned_duplicate_cells_resolve_deterministically(spark):
    """ADVICE r8: pivot cells aggregate with min, so a caller-supplied
    frame with duplicate (metric, interval_start) rows yields a
    deterministic value rather than F.first's partition-order roulette."""
    from pyspark.sql import functions as F
    iv = 10 * SECOND
    dup = spark.createDataFrame(
        [("a", tp(0), 1.0, 2.0, 9.0, 3, 90.0, 10),
         ("a", tp(0), 0.5, 2.0, 6.0, 3, 60.0, 10)],
        "metric string, interval_start long, minimum double, maximum double,"
        " sum double, count long, integral double, active_time long")
    out = retrieve_aligned({iv: dup}, META, tp(0), tp(300), iv,
                           value=F.col("sum"))
    assert [r["a"] for r in out.collect()] == [6.0]


def test_aligned_rejects_sub_level_limit(spark):
    """ADVICE r8: a limit below interval_min cannot be honored by any
    materialized grid -> ValueError, not a silently coarser grid."""
    import pytest
    df = _two_metric_frame(spark)
    levels = build_levels(df, META)
    with pytest.raises(ValueError, match="interval_upper_limit"):
        retrieve_aligned(levels, META, tp(0), tp(300), 5 * SECOND)
