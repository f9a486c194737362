"""leakage_safe_split contract tests: near-dup components never straddle
splits, singletons key on their own id, rates validate loudly, and the
assignment is a pure function of the keys (partition-invariant,
salt-redrawable)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hta_spark.pipeline.sample import BP, hash_bucket, leakage_safe_split


@pytest.fixture(scope="module")
def graph(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id long").cache()
    #  components: {1,2,3} (chain), {5,6}; 4 and 7 are singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "a long, b long").cache()
    docs.count(), pairs.count()
    return docs, pairs


def test_components_share_split_and_key(spark, graph):
    docs, pairs = graph
    out = {r["doc_id"]: (r["split_key"], r["split"])
           for r in leakage_safe_split(docs, pairs).collect()}
    assert out[1] == out[2] == out[3]          # whole chain moves together
    assert out[5] == out[6]
    assert out[1][0] == 1 and out[5][0] == 5   # min-id component key
    assert out[4][0] == 4 and out[7][0] == 7   # singletons key on own id
    assert set(v[1] for v in out.values()) <= {"train", "val", "test"}


def test_split_matches_hash_bucket_of_key(spark, graph):
    docs, pairs = graph
    out = leakage_safe_split(docs, pairs)
    # the bucket decision must be exactly hash_bucket(split_key, salt)
    chk = out.withColumn(
        "_b", hash_bucket(F.col("split_key").cast("string"), "split"))
    for r in chk.collect():
        expect = ("train" if r["_b"] < 8000
                  else "val" if r["_b"] < 9000 else "test")
        assert r["split"] == expect, (r["doc_id"], r["_b"], r["split"])


def test_rates_validation(spark, graph):
    docs, pairs = graph
    with pytest.raises(ValueError, match="sum"):
        leakage_safe_split(docs, pairs, rates=(5000, 1000, 1000))
    with pytest.raises(ValueError, match="mismatch"):
        leakage_safe_split(docs, pairs, rates=(5000, 5000),
                           names=("a", "b", "c"))
    # negative rates can still sum to 10000 — must refuse loudly, not
    # label everything with the over-allocated split (review r15)
    with pytest.raises(ValueError, match="non-negative"):
        leakage_safe_split(docs, pairs, rates=(11000, -1000),
                           names=("a", "b"))


def test_string_ids(spark):
    """String document ids work end-to-end (review r15: a forced long
    cast crashed them under ANSI and silently routed every singleton
    to the last split with ANSI off)."""
    docs = spark.createDataFrame(
        [("docA",), ("docB",), ("docC",), ("docD",)], "doc_id string")
    pairs = spark.createDataFrame([("docA", "docB")], "a string, b string")
    out = {r["doc_id"]: (r["split_key"], r["split"])
           for r in leakage_safe_split(docs, pairs).collect()}
    assert out["docA"] == out["docB"]           # pair shares key + split
    assert out["docA"][0] == "docA"             # min-id component key
    assert out["docC"][0] == "docC" and out["docD"][0] == "docD"
    assert all(v[1] in ("train", "val", "test") for v in out.values())


def test_two_way_split_and_salt_redraw(spark):
    docs = spark.range(1, 400).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame([], "a long, b long")
    two = leakage_safe_split(docs, pairs, rates=(9000, 1000),
                             names=("train", "holdout"))
    counts = {r["split"]: r["n"] for r in
              two.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "holdout"}
    assert counts["train"] > counts["holdout"]
    a = {(r["doc_id"], r["split"]) for r in two.collect()}
    b = {(r["doc_id"], r["split"]) for r in
         leakage_safe_split(docs, pairs, rates=(9000, 1000),
                            names=("train", "holdout"),
                            salt="other").collect()}
    assert {d for d, _ in a} == {d for d, _ in b}
    assert a != b                               # salt redraws the split


def test_partition_invariance(spark, graph):
    docs, pairs = graph
    a = sorted(map(tuple, leakage_safe_split(docs, pairs).collect()))
    b = sorted(map(tuple, leakage_safe_split(
        docs.repartition(5), pairs.repartition(3)).collect()))
    assert a == b
