"""Streaming document dedup: exact dedup as a watermarked stream, and the
near-dup lambda (streamed MinHash signatures + periodic batch LSH join)
agreeing with the pure-batch pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from hta_spark.pipeline.dedup import exact_dedup, lsh_pairs, minhash_signatures
from hta_spark.streaming.dedup_stream import stream_exact_dedup


def _docs(spark, sf="/root/testdata/sf0.001"):
    return spark.read.parquet(f"{sf}/documents.parquet")


def test_stream_exact_dedup_matches_batch(spark, tmp_path):
    """File-source stream through stream_exact_dedup keeps exactly one doc
    per content hash — the same hash set the batch exact_dedup finds."""
    src = tmp_path / "docs_src"
    src.mkdir()
    docs = _docs(spark).withColumn(
        "ts", F.timestamp_millis(F.lit(1_700_000_000_000)
                                 + F.col("doc_id") * 1000))
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    half.coalesce(1).write.parquet(str(src / "b0"))
    rest.coalesce(1).write.parquet(str(src / "b1"))

    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src / "b*")))
    q = (stream_exact_dedup(stream, ts_col="ts", watermark="1 hour")
         .writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
         .format("memory").queryName("dd_out").start())
    q.processAllAvailable()
    q.stop()

    got = spark.sql("SELECT content_hash, count(*) AS n FROM dd_out "
                    "GROUP BY 1").collect()
    batch_hashes = {r["content_hash"] for r in exact_dedup(docs).collect()}
    assert {r["content_hash"] for r in got} == batch_hashes
    assert all(r["n"] == 1 for r in got)


def test_streamed_signatures_feed_batch_lsh(spark, tmp_path):
    """The lambda pattern: signatures computed per micro-batch in
    foreachBatch accumulate in a table; batch lsh_pairs over it equals the
    all-batch pipeline."""
    src = tmp_path / "sig_src"
    src.mkdir()
    docs = _docs(spark)
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1) \
            .write.parquet(str(src / f"b{i}"))
    sig_table = str(tmp_path / "signatures")

    def sink(batch_df, _eid):
        minhash_signatures(batch_df).write.mode("append").parquet(sig_table)

    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src / "b*")))
    q = (stream.writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "sig_ckpt"))
         .foreachBatch(sink).start())
    q.processAllAvailable()
    q.stop()

    streamed = {(r["a"], r["b"]) for r in
                lsh_pairs(spark.read.parquet(sig_table)).collect()}
    batch = {(r["a"], r["b"]) for r in
             lsh_pairs(minhash_signatures(docs)).collect()}
    assert streamed == batch and batch


def test_unbounded_dedup_requires_opt_in(spark):
    """Omitting ts_col (unbounded state) must be an explicit opt-in."""
    import pytest
    from hta_spark.streaming.dedup_stream import stream_exact_dedup
    stream = (spark.readStream.format("rate").load()
              .withColumn("text", F.col("value").cast("string")))
    with pytest.raises(ValueError, match="unbounded"):
        stream_exact_dedup(stream)
    out = stream_exact_dedup(stream, allow_unbounded_state=True)
    assert "content_hash" in out.columns
