"""Cross-corpus incremental dedup (pipeline/dedup.py::dedup_against):
planted overlap must be dropped, new content kept, the stored-hash-table
fast path must agree with the recompute path, and a broadcast-small seen
side must not shuffle the incoming corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hta_spark.pipeline.dedup import dedup_against, normalize_text


def test_planted_overlap_dropped(spark):
    seen = spark.createDataFrame(
        [(1, "shared boilerplate header text"),
         (2, "some other already ingested document")],
        "doc_id long, text string")
    incoming = spark.createDataFrame(
        # normalize_text lower-cases and trims (it does NOT collapse
        # internal whitespace — token-level dedup is the minhash family's
        # job), so case/padding variants collapse, respaced text does not
        [(10, "  Shared boilerplate header text "),  # same after normalize
         (11, "a genuinely new document body"),
         (12, "some other already ingested document")],
        "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in
                  dedup_against(incoming, seen).collect())
    assert kept == [11]


def test_hash_table_seen_side_agrees(spark):
    """Passing the stored two-column hash table (the 100 TB shape) must
    produce the same survivors as recomputing hashes from seen text."""
    seen = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string")
    incoming = spark.createDataFrame(
        [(10, "alpha beta gamma"), (11, "fresh content here")],
        "doc_id long, text string")
    via_text = sorted(r["doc_id"] for r in
                      dedup_against(incoming, seen).collect())
    hash_table = seen.select(
        F.md5(normalize_text(F.col("text"))).alias("content_hash"))
    via_table = sorted(r["doc_id"] for r in
                       dedup_against(incoming, hash_table).collect())
    assert via_text == via_table == [11]


def test_small_seen_side_broadcasts(spark):
    seen = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    incoming = spark.createDataFrame([(2, "a b c")],
                                     "doc_id long, text string")
    df = dedup_against(incoming, seen)
    df.collect()                 # local frames carry no stats: the static
    # plan is SMJ and AQE flips it to broadcast at runtime — assert the
    # FINAL adaptive plan (parquet-backed corpora broadcast statically)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
