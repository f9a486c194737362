"""VERDICT r8 "Next round" #2: retrieve_flex's raw-smoothing branch must
scan raw ONCE.  Before the fix, the density-counts job, the dense-side
semi-join and the sparse-side semi-join each re-ran the pruned raw filter
(3x raw reads).  The branch now pins ``pts`` (compat.pin) before fanning
out.

The scan counter is a passthrough ``mapInPandas`` stage that appends each
batch's row count to a local spool file (local mode: python workers share
the test's filesystem) — re-executions of the raw subtree are visible as
extra spooled rows, checkpoint/persist reads are not.
"""

from __future__ import annotations

import os

import pytest

from hta_spark import SECOND
from hta_spark.operators.retrieve import retrieve_flex
from hta_spark.operators.rollup import build_levels

from .conftest import F1_META, f1_points, tp


def _counted_raw(spark, spool: str):
    import pandas as pd  # noqa: F401

    df = spark.createDataFrame(
        f1_points(), "metric string, time long, value double").repartition(2)

    def passthrough(batches):
        for pdf in batches:
            with open(spool, "a") as fh:
                fh.write(f"{len(pdf)}\n")
            yield pdf

    return df.mapInPandas(
        passthrough, "metric string, time long, value double")


def _spooled(spool: str) -> int:
    if not os.path.exists(spool):
        return 0
    with open(spool) as fh:
        return sum(int(line) for line in fh if line.strip())


def test_raw_smoothing_scans_raw_once(spark, tmp_path):
    from hta_spark.operators.retrieve import retrieve_raw

    # Baseline: ONE execution of the scoped raw subtree.  (The ROW_DEFAULT
    # scope plan itself reads raw twice — a per-metric boundary groupBy
    # plus the main scan — so "one scan" means "one execution of that
    # plan", measured here rather than hard-coded.)
    base_spool = str(tmp_path / "base_spool.txt")
    retrieve_raw(_counted_raw(spark, base_spool), tp(0), tp(300)).collect()
    baseline = _spooled(base_spool)
    assert baseline > 0

    spool = str(tmp_path / "scan_spool.txt")
    raw = _counted_raw(spark, spool)
    levels = build_levels(
        spark.createDataFrame(f1_points(),
                              "metric string, time long, value double"),
        F1_META)
    kind, out = retrieve_flex(raw, levels, F1_META, tp(0), tp(300),
                              5 * SECOND)
    assert kind == "rows"
    out.collect()
    total = _spooled(spool)
    # the smoothing branch must cost exactly the baseline: the pinned pts
    # materialization.  Pre-fix, the density-counts job and the two
    # semi-joins each re-executed the raw subtree (~3x the baseline).
    assert total == baseline, (total, baseline)
    assert out.count() > 0  # re-reading the RESULT must not re-scan raw
    assert _spooled(spool) == total
