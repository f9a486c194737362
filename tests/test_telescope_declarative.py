"""Declarative telescoping (VERDICT r3 item 8): the decomposition is
carried as per-metric bound columns — no DataFrame.collect anywhere in
the aggregate_telescope path, and many distinct per-metric clamps cost
one plan, not one plan per clamp group.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame, functions as F

from hta_spark import Meta, SECOND
from hta_spark.operators import (aggregate_exact, aggregate_telescope,
                                 build_levels)


def test_telescope_no_driver_collect(spark, monkeypatch):
    """Constructing the telescope plan must never call collect() — the r3
    implementation collected the distinct clamped-bound pairs."""
    pts = spark.createDataFrame(
        [("m%d" % (i % 5), (1_000 + i) * SECOND, float(i))
         for i in range(200)],
        "metric string, time long, value double")
    meta = Meta(interval_min=10 * SECOND, interval_max=1000 * SECOND,
                interval_factor=10)
    levels = build_levels(pts, meta, salt_chunks=None)

    def _boom(self, *a, **k):
        raise AssertionError("collect() called during telescope planning")
    monkeypatch.setattr(DataFrame, "collect", _boom)
    df = aggregate_telescope(pts, levels, meta,
                             1_005 * SECOND, 1_180 * SECOND)
    monkeypatch.undo()
    assert df.count() == 5


def test_telescope_many_distinct_clamps(spark):
    """2*10^4 metrics, EVERY one with different clamped bounds (staggered
    t_first/t_last): one static plan must handle all groups and agree
    with the raw-exact path."""
    n = 20_000
    base = spark.range(n).select(
        F.concat(F.lit("m"), F.col("id")).alias("metric"),
        F.col("id").alias("i"))
    # 4 points per metric, staggered so every metric clamps differently
    pts = (base.crossJoin(spark.range(4).select(F.col("id").alias("k")))
           .select("metric",
                   ((F.lit(1_000_000) + F.col("i") * 7
                     + F.col("k") * F.lit(1_000)) * F.lit(SECOND))
                   .alias("time"),
                   (F.col("k") * 1.0 + 1.0).alias("value")))
    meta = Meta(interval_min=100 * SECOND, interval_max=10_000 * SECOND,
                interval_factor=10)
    levels = build_levels(pts, meta, salt_chunks=None)
    b = 1_000_500 * SECOND
    e = 1_003_500 * SECOND
    tel = aggregate_telescope(pts, levels, meta, b, e)
    raw = aggregate_exact(pts, b, e)
    joined = (tel.alias("t").join(raw.alias("r"), "metric")
              .select(
                  (F.col("t.count") == F.col("r.count")).alias("c_ok"),
                  (F.abs(F.col("t.active_time") - F.col("r.active_time"))
                   <= 0).alias("a_ok"),
                  (F.abs(F.col("t.integral") - F.col("r.integral"))
                   <= F.abs(F.col("r.integral")) * 1e-9 + 1e-6)
                  .alias("i_ok")))
    bad = joined.filter(~F.col("c_ok") | ~F.col("a_ok")
                        | ~F.col("i_ok")).count()
    assert bad == 0
    assert tel.count() == n
