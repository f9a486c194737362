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


def test_deep_chain_pointer_jumping(spark):
    # 400-node path: plain hash-min would need 400 rounds; pointer jumping
    # converges within the default 20 (O(log d))
    chain = [(i, i + 1) for i in range(400)]
    got = _collect(spark, chain)
    assert set(got.values()) == {0}
    assert len(got) == 401


def test_nonconvergence_raises(spark):
    import pytest
    # small_graph_edges=0 forces the iterative path (the r15 union-find
    # dispatch would solve a 40-edge graph driver-side without rounds)
    with pytest.raises(RuntimeError, match="did not converge"):
        _collect(spark, [(i, i + 1) for i in range(40)], max_iters=2,
                 small_graph_edges=0)


def test_small_graph_dispatch_matches_iterative(spark):
    # the r15 size dispatch: driver union-find (<= cap edges) must produce
    # the exact labels of the distributed hash-min loop on every shape
    graphs = [
        [(1, 2), (2, 3), (10, 11)],                 # disjoint clusters
        [(i, i + 1) for i in range(12)],            # chain (multi-round)
        [(1, 2), (2, 3), (3, 1)],                   # cycle
        [(0, i) for i in range(1, 5)]
        + [(100, i) for i in range(101, 105)] + [(4, 104)],  # bridged stars
        [],                                         # empty
    ]
    for edges in graphs:
        fast = _collect(spark, edges)                          # union-find
        slow = _collect(spark, edges, small_graph_edges=0)     # loop
        assert fast == slow, f"dispatch divergence on {edges!r}"


def test_small_graph_dispatch_string_ids(spark):
    # id-type-agnostic like the loop (review r4): string node ids keep
    # min-LEXICOGRAPHIC labels on both paths
    pairs = spark.createDataFrame(
        [("docB", "docA"), ("docB", "docC"), ("zz", "zy")],
        "a string, b string")
    fast = {r["id"]: r["comp"]
            for r in connected_components(pairs).collect()}
    slow = {r["id"]: r["comp"]
            for r in connected_components(
                pairs, small_graph_edges=0).collect()}
    assert fast == slow == {"docA": "docA", "docB": "docA",
                            "docC": "docA", "zy": "zy", "zz": "zy"}


def test_small_graph_cap_boundary(spark):
    # symmetric-distinct edge count == 2 * pairs here; the dispatch must
    # route exactly at the cap (<= takes the driver path)
    edges = [(i, i + 1) for i in range(8)]          # 16 symmetric edges
    at_cap = _collect(spark, edges, small_graph_edges=16)
    above = _collect(spark, edges, small_graph_edges=15)   # forced loop
    assert at_cap == above
    assert set(at_cap.values()) == {0}


def test_scale_many_clusters(spark):
    # 50k edges in 10k star clusters + one 64-deep chain: one CC call,
    # seconds not minutes, exact labels
    import time
    from pyspark.sql import functions as F
    stars = (spark.range(10_000)
             .select((F.col("id") * 10).alias("a"),
                     F.explode(F.sequence(F.lit(1), F.lit(5))).alias("k"))
             .select("a", (F.col("a") + F.col("k")).alias("b")))
    base = 1_000_000
    chain = spark.range(64).select(
        (F.col("id") + base).alias("a"), (F.col("id") + base + 1).alias("b"))
    t0 = time.time()
    out = connected_components(stars.union(chain)).collect()
    elapsed = time.time() - t0
    labels = {r["id"]: r["comp"] for r in out}
    assert len(labels) == 60_000 + 65
    # every star member labeled by its hub, the chain by its head
    assert labels[3] == 0                        # member 3 of hub 0
    assert labels[9_990 * 10 + 3] == 99_900      # member 3 of the last hub
    assert all(labels[base + i] == base for i in range(65))
    assert elapsed < 120, f"CC too slow: {elapsed:.1f}s"
