"""r11 incremental NEAR-dup (stored band index) + source-overlap matrix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hta_spark.pipeline.dedup import (dedup_against_neardup,
                                      lsh_band_buckets, minhash_signatures,
                                      source_overlap)

BOILER = ("the quick brown fox jumps over the lazy dog near the river "
          "bank every single morning before sunrise")


@pytest.fixture(scope="module")
def corpora(spark):
    seen = spark.createDataFrame(
        [(1, BOILER),
         (2, "completely different seen content about spark shuffles "
             "and partition pruning at scale")],
        "doc_id long, text string")
    incoming = spark.createDataFrame(
        # 10 = near-dup of seen doc 1 (one word changed -> most 3-shingles
        # shared -> minhash bands collide); 11 = novel
        [(10, BOILER.replace("lazy", "sleepy")),
         (11, "a totally novel incoming document with fresh vocabulary "
              "unrelated to anything previously ingested wxyz")],
        "doc_id long, text string")
    return seen, incoming


def test_neardup_drops_banded_duplicate_keeps_novel(spark, corpora):
    seen, incoming = corpora
    out = dedup_against_neardup(incoming, seen)
    assert [r["doc_id"] for r in out.collect()] == [11]


def test_neardup_prebanded_index_path_identical(spark, corpora):
    seen, incoming = corpora
    idx = lsh_band_buckets(minhash_signatures(seen))
    direct = {r["doc_id"]
              for r in dedup_against_neardup(incoming, seen).collect()}
    via_idx = {r["doc_id"]
               for r in dedup_against_neardup(incoming, idx).collect()}
    assert direct == via_idx == {11}


def test_neardup_shingleless_doc_survives(spark, corpora):
    seen, _ = corpora
    tiny = spark.createDataFrame([(20, "two words")],
                                 "doc_id long, text string")
    # < shingle_n tokens -> no signature -> no bands -> never flagged
    assert [r["doc_id"]
            for r in dedup_against_neardup(tiny, seen).collect()] == [20]


def test_source_overlap_counts_distinct_shared_keys(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta", "a"), (2, "gamma delta", "a"),
         (3, "alpha beta", "b"), (4, "alpha beta", "b"),   # within-src dup
         (5, "gamma delta", "c"), (6, "alpha beta", "c")],
        "doc_id long, text string, source string")
    got = {(r["src_a"], r["src_b"]): r["n_shared"]
           for r in source_overlap(docs).collect()}
    assert got == {("a", "b"): 1, ("a", "c"): 2, ("b", "c"): 1}


def test_neardup_seen_shape_validation(spark, corpora):
    """ADVICE r11: an unrelated `bh` column on a raw document frame must
    not silently route `seen` through the pre-banded-index path."""
    import pytest as _pt
    from hta_spark.pipeline.dedup import dedup_against_neardup
    incoming, seen = corpora
    trap = seen.withColumn("bh", F.lit("junk")).withColumn("band", F.lit(0))
    with _pt.raises(ValueError, match="cannot infer"):
        dedup_against_neardup(incoming, trap)
    # explicit override resolves the ambiguity to the document path
    got = {r.doc_id for r in dedup_against_neardup(
        incoming, trap, seen_is_index=False).collect()}
    want = {r.doc_id for r in dedup_against_neardup(
        incoming, seen).collect()}
    assert got == want
    with _pt.raises(ValueError, match="lacks 'band'/'bh'"):
        dedup_against_neardup(incoming, seen, seen_is_index=True)
    with _pt.raises(ValueError, match="lacks the text column"):
        dedup_against_neardup(
            incoming, trap.select("band", "bh"), seen_is_index=False)
