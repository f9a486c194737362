"""VERDICT r10 items 1/3/4: the stats-blind-broadcast defense and the
SemDeDup hot-cluster bound.

Catalyst estimates a ``spark.range``-derived frame at ~8 B/row — an
``array<double>`` payload is invisible — so the SRP verify join
(ann.py r10 ``cand.join(ea).join(eb)``) picked a BroadcastHashJoin whose
real relation was multi-GiB and OOMed the round-10 bench.  These tests
pin the fix: every join that re-attaches vectors to candidates routes
through :func:`attach_vectors` (forced SHUFFLE_HASH), and no physical
BroadcastExchange in the affected operators carries a vector column.
The one-row codebook broadcasts (``_planes``, ``_cents``) stay allowed —
they ARE the design.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hta_spark.pipeline import semdedup as semdedup_mod
from hta_spark.pipeline.ann import attach_vectors, hyperplane_lsh_pairs
from hta_spark.pipeline.semdedup import semantic_dedup, semantic_pairs

#: column-name fragments that mark a vector payload in these operators'
#: plans; none may appear inside a BroadcastExchange subtree
VECTOR_COLS = ("embedding#", "_va#", "_vb#", "_v#")


def _broadcast_subtrees(df) -> list[str]:
    """Text of every BroadcastExchange subtree in the physical plan
    (pre-AQE initial plan — the estimate-driven decisions; AQE runtime
    conversions use ACTUAL shuffle sizes, which is the safe regime)."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    lines = plan.splitlines()

    def depth(ln: str) -> int:
        return len(ln) - len(ln.lstrip(" :+-*("))

    subs = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        d = depth(ln)
        block = [ln]
        for nxt in lines[i + 1:]:
            if nxt.strip() and depth(nxt) <= d:
                break
            block.append(nxt)
        subs.append("\n".join(block))
    return subs


def _assert_no_vector_broadcast(df) -> str:
    plan_subs = _broadcast_subtrees(df)
    for sub in plan_subs:
        for frag in VECTOR_COLS:
            assert frag not in sub, (
                f"vector column {frag} inside a BroadcastExchange — the "
                f"r10 OOM class:\n{sub}")
    return "\n---\n".join(plan_subs)


@pytest.fixture(scope="module")
def range_emb(spark):
    """The dangerous shape: range-derived (stats-blind ~8 B/row estimate)
    embedding frame whose real rows carry a 16-double array."""
    return spark.range(240).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            (F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(1000))
             .cast("double") / 1000.0 - 0.5) for j in range(16)])
        .alias("embedding"))


def test_hyperplane_verify_join_never_broadcasts_vectors(range_emb):
    df = hyperplane_lsh_pairs(range_emb, threshold=0.8)
    _assert_no_vector_broadcast(df)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    # the verify joins must be the pinned shuffle strategy
    assert plan.count("ShuffledHashJoin") >= 2, plan
    df.count()                                   # and the plan executes


def test_semantic_pairs_never_broadcasts_vectors(range_emb):
    df = semantic_pairs(range_emb, k=4, iterations=2, threshold=0.8)
    _assert_no_vector_broadcast(df)
    df.count()


def test_attach_vectors_pins_shuffle(range_emb, spark):
    cand = spark.range(10).select(F.col("id").alias("vec_id"))
    df = attach_vectors(cand, range_emb, "vec_id")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


# -- hot-cluster bound (VERDICT r10 item 3) -----------------------------------

def _planted(spark, n: int = 50, planted: int = 5, dim: int = 8):
    """n vectors; ids i and i+n are identical for i < planted (exact
    duplicates — SRP signatures collide deterministically)."""
    base = F.when(F.col("id") >= n, F.col("id") - n).otherwise(F.col("id"))
    return spark.range(n + planted).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            (F.pmod(F.xxhash64(base, F.lit(j)), F.lit(1000))
             .cast("double") / 1000.0 - 0.5) for j in range(dim)])
        .alias("embedding"))


def test_hot_cluster_bound_engages_and_keeps_exact_dups(spark, monkeypatch):
    n, planted = 50, 5
    emb = _planted(spark, n, planted)
    called = {}
    orig = semdedup_mod.hyperplane_lsh_pairs

    def spy(*a, **k):
        called["hot"] = True
        return orig(*a, **k)

    monkeypatch.setattr(semdedup_mod, "hyperplane_lsh_pairs", spy)
    # k=1 -> ONE dominant cluster of 55 rows > cap 20: the bound must
    # route it through within-cluster SRP banding
    pairs = semantic_pairs(emb, k=1, iterations=1, threshold=0.99,
                           max_cluster_rows=20).collect()
    assert called.get("hot"), "hot-cluster path did not engage"
    got = {(r["a"], r["b"]) for r in pairs}
    # identical vectors have identical SRP signatures -> guaranteed
    # candidates -> every planted pair survives with cos 1.0
    for i in range(planted):
        assert (i, n + i) in got, (i, n + i, sorted(got))
    assert all(r["cos_sim"] >= 0.99 for r in pairs)
    assert all(r["cluster"] == pairs[0]["cluster"] for r in pairs)


def test_no_hot_cluster_means_exact_unchanged(spark):
    emb = _planted(spark, 30, 3)
    unbounded = semantic_pairs(emb, k=2, iterations=2, threshold=0.5,
                               max_cluster_rows=None)
    bounded = semantic_pairs(emb, k=2, iterations=2, threshold=0.5,
                             max_cluster_rows=10_000)
    a = sorted(map(tuple, unbounded.collect()))
    b = sorted(map(tuple, bounded.collect()))
    assert a == b and a, "cap below threshold must not change results"


def test_semantic_dedup_with_hot_path_keeps_planted_components(spark):
    n, planted = 40, 4
    emb = _planted(spark, n, planted)
    comp = semantic_dedup(emb, k=1, iterations=1, threshold=0.999,
                          max_cluster_rows=15).collect()
    got = {r["component"]: r["n_members"] for r in comp}
    for i in range(planted):
        assert got.get(i) == 2, (i, got)


def test_max_cluster_rows_validation(spark):
    emb = _planted(spark, 10, 1)
    with pytest.raises(ValueError, match="max_cluster_rows"):
        semantic_pairs(emb, k=1, max_cluster_rows=0)
