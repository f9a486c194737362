"""prototype_prune (D4 stage-2 diversification, Tirumala et al. 2023)
contract tests: the dropped set per cluster is exactly the ceil-count
top-prototypicality members under the (proto_sim DESC, vec_id) order,
labels partition the input, and the labeling is partition-invariant.

The clustering itself (kmeans_lite) is oracle-gated separately
(ann_kmeans_lite) — here it is treated as the trusted score source and
the NEW logic (selection + labeling) is checked against a Python
re-ranking of the very scores Spark assigned."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hta_spark.pipeline.kmeans import kmeans_lite
from hta_spark.pipeline.semdedup import prototype_prune

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .select("vec_id", "embedding").cache()
    df.count()
    return df


def _expected_dropped(spark, emb, drop_bp):
    """Python re-ranking of Spark's own assignment scores."""
    rows = kmeans_lite(emb, k=8, iterations=3, quantize=6).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(
            (r["sim"], r["vec_id"]))
    dropped = set()
    for members in by_cluster.values():
        members.sort(key=lambda sv: (-sv[0], sv[1]))
        n_drop = math.ceil(len(members) * drop_bp / 10_000)
        dropped.update(v for _s, v in members[:n_drop])
    return dropped


def test_dropped_set_matches_python_ranking(spark, emb):
    out = prototype_prune(emb, drop_bp=2500).collect()
    got = {r["vec_id"] for r in out if not r["kept"]}
    assert got == _expected_dropped(spark, emb, 2500)
    # labels partition the input: every vector labeled exactly once
    assert len(out) == emb.count()
    assert len({r["vec_id"] for r in out}) == len(out)


def test_per_cluster_exact_ceil_count(spark, emb):
    out = prototype_prune(emb, drop_bp=1000).collect()
    sizes: dict[int, list[int]] = {}
    for r in out:
        n_all, n_drop = sizes.setdefault(r["cluster"], [0, 0])
        sizes[r["cluster"]] = [n_all + 1, n_drop + (0 if r["kept"] else 1)]
    assert sizes  # non-empty
    for n_all, n_drop in sizes.values():
        assert n_drop == math.ceil(n_all * 1000 / 10_000)


def test_extreme_fractions(spark, emb):
    all_kept = prototype_prune(emb, drop_bp=0)
    assert all_kept.filter(~F.col("kept")).count() == 0
    none_kept = prototype_prune(emb, drop_bp=10_000)
    assert none_kept.filter(F.col("kept")).count() == 0


def test_partition_invariance(spark, emb):
    a = sorted(map(tuple, prototype_prune(emb, drop_bp=2500).collect()))
    b = sorted(map(tuple, prototype_prune(
        emb.repartition(7), drop_bp=2500).collect()))
    assert a == b


def test_banded_arm_parity(spark, emb):
    """rows_cap below every cluster size forces the selection through
    top_fraction_by's banded histogram arm (the 100 TB hot-cluster
    path); labels must be identical to the window arm's."""
    a = sorted(map(tuple, prototype_prune(emb, drop_bp=2500).collect()))
    b = sorted(map(tuple, prototype_prune(
        emb, drop_bp=2500, rows_cap=10).collect()))
    assert a == b
