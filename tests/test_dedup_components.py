"""Connected components (hash-min label propagation) over duplicate-pair
edge lists: cluster shapes, chain diameter, empty input, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from hta_spark.pipeline.dedup import connected_components


def _pairs(spark, edges):
    if not edges:
        return (spark.range(0)
                .select(F.col("id").alias("a"), F.col("id").alias("b")))
    return spark.createDataFrame(edges, "a long, b long")


def _collect(spark, edges, **kw):
    out = connected_components(_pairs(spark, edges), **kw).collect()
    return {r["id"]: r["comp"] for r in out}


def test_two_disjoint_clusters(spark):
    got = _collect(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # a 12-node path needs multiple propagation rounds (diameter > 1)
    chain = [(i, i + 1) for i in range(12)]
    got = _collect(spark, chain)
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_edge_direction_irrelevant(spark):
    # same component regardless of which endpoint is 'a'
    assert _collect(spark, [(5, 2), (2, 9)]) == {2: 2, 5: 2, 9: 2}


def test_empty_pairs(spark):
    assert _collect(spark, []) == {}


def test_cycle(spark):
    got = _collect(spark, [(1, 2), (2, 3), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_star_merges_with_bridge(spark):
    # two stars joined by one bridge edge collapse to one component
    star1 = [(0, i) for i in range(1, 5)]
    star2 = [(100, i) for i in range(101, 105)]
    got = _collect(spark, star1 + star2 + [(4, 104)])
    assert set(got.values()) == {0}
