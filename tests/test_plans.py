"""Physical-plan regression tests: the properties that make the engine
scale must stay visible in `.explain` output.

- time-range predicates reach the parquet scan (PushedFilters);
- small dimension sides broadcast (no shuffle of the fact table);
- the rollup cascade adds no exchange beyond the window shuffle
  (hash-partitioning by metric satisfies (metric, bucket) grouping);
- the hot paths stay inside WholeStageCodegen.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from hta_spark import SECOND
from hta_spark.operators import aggregate_exact, build_level1


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_aggregate_exact_pushdown(spark):
    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select(F.col("event_type").alias("metric"), F.col("ts").alias("time"),
                "value")
    plan = _plan(aggregate_exact(raw, 1_704_412_800 * SECOND,
                                 1_705_708_800 * SECOND))
    # the static begin bound must be pushed into the scan
    assert re.search(r"PushedFilters:.*GreaterThanOrEqual\(ts,1704412800",
                     plan), plan[:2000]


def test_rollup_exchange_budget(spark):
    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select(F.col("event_type").alias("metric"), F.col("ts").alias("time"),
                "value")
    plan = _plan(build_level1(raw, 3600 * SECOND))
    # exactly two hash exchanges: the per-metric window, and the tiny
    # raw_range aggregate feeding the broadcast.  The exploded piece merge
    # must NOT introduce a third (hash-partitioning by metric already
    # satisfies (metric, bucket) grouping).
    n_shuffles = len(re.findall(r"Arguments: hashpartitioning", plan))
    assert n_shuffles == 2, f"expected 2 hash exchanges, got {n_shuffles}\n{plan}"
    assert "BroadcastExchange" in plan


def test_q5_broadcasts_dimensions(spark):
    from hta_spark.queries_rel import q5_local_supplier
    plan = _plan(q5_local_supplier(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan


def test_scoped_retrieve_pushdown(spark):
    from hta_spark.operators import IntervalScope, Scope, filter_raw
    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select(F.col("event_type").alias("metric"), F.col("ts").alias("time"),
                "value")
    plan = _plan(filter_raw(raw, 1_704_844_800 * SECOND, 1_704_931_200 * SECOND,
                            IntervalScope(Scope.closed, Scope.open)))
    assert re.search(r"PushedFilters:.*GreaterThanOrEqual\(ts,1704844800", plan)
    assert re.search(r"PushedFilters:.*LessThan\(ts,1704931200", plan)