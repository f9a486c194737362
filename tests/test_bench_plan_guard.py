"""bench.py's partition-less-Window tripwire (VERDICT r5 item 4): the
bench quiets WindowExec's single-partition WARN process-wide (the
dummy-store builds make it fire by design), so the compensating plan
assertion must (a) trip on a genuinely unpartitioned window and (b) stay
silent on every real benched query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from bench import (HEADLINE, _assert_windows_partitioned,
                   _partitionless_windows)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_tripwire_fires_on_partitionless_window(spark):
    df = spark.range(10).withColumn(
        "r", F.row_number().over(Window.orderBy("id")))
    assert _partitionless_windows(_plan(df))
    with pytest.raises(AssertionError, match="partition-less Window"):
        _assert_windows_partitioned(df, "deliberately_broken")


def test_tripwire_quiet_on_partitioned_window(spark):
    df = spark.range(10).withColumn("g", F.col("id") % 2).withColumn(
        "r", F.row_number().over(Window.partitionBy("g").orderBy("id")))
    assert not _partitionless_windows(_plan(df))
    _assert_windows_partitioned(df, "fine")


def test_headline_queries_pass_guard(spark):
    """The assertion wired into the bench loops must hold for every
    headline query at test scale (plan shape is scale-independent)."""
    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()
    for name in HEADLINE:
        fn = qs.get(name)
        assert fn is not None, name
        _assert_windows_partitioned(fn(spark, "/root/testdata/sf0.001"),
                                    name)


def test_host_canary_normalization(spark):
    """The r7 host-speed canary: a throttled canary sample must discount
    the raw figure by exactly the measured host-speed ratio, and the live
    kernels must return plausible sub-5s positives (demo numbers under
    real throttles: SURVEY §13)."""
    from bench import CANARY_REF, _canary_single, _normalized

    # math: a host measuring 2x the reference canary time halves the raw
    assert _normalized(10.0, 2 * CANARY_REF["cores_sec"]) == 5.0
    assert _normalized(10.0, CANARY_REF["cores_sec"]) == 10.0
    s = _canary_single()
    assert 0.0 < s < 5.0
    assert set(CANARY_REF) == {"single_sec", "cores_sec"}


def test_tripwire_quiet_on_unordered_partitioned_window(spark):
    """r11 false positive: count(*) over (partition by g) prints only two
    bracket groups ([funcs], [partitionSpec]) — the guard must recognize
    the second group as a partition spec (no ASC/DESC markers)."""
    df = spark.range(10).withColumn("g", F.col("id") % 2).withColumn(
        "n", F.count("*").over(Window.partitionBy("g")))
    assert not _partitionless_windows(_plan(df))
    _assert_windows_partitioned(df, "fine_unordered")


def test_tripwire_fires_on_unpartitioned_unordered_window(spark):
    df = spark.range(10).withColumn(
        "n", F.count("*").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing)))
    assert _partitionless_windows(_plan(df))
