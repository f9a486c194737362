"""Stream-static join: enriching a stream against a broadcast dimension
table — the lookup pattern every streaming ingest needs (Spark re-reads /
re-broadcasts the static side per micro-batch, so dimension updates
between batches are picked up; no state store involved)."""
from __future__ import annotations

from pyspark.sql import functions as F


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    src = tmp_path / "enrich_src"
    src.mkdir()
    rows = [(i, f"m{i % 3}", float(i)) for i in range(60)]
    n = len(rows)
    for i in range(2):
        (spark.createDataFrame(rows[i * n // 2:(i + 1) * n // 2],
                               "event_id long, metric string, v double")
         .coalesce(1).write.parquet(str(src / f"b{i}")))

    dim = spark.createDataFrame(
        [("m0", "team-a"), ("m1", "team-b")], "metric string, owner string")

    stream = (spark.readStream
              .schema("event_id long, metric string, v double")
              .option("maxFilesPerTrigger", "1").parquet(str(src / "b*")))
    enriched = stream.join(F.broadcast(dim), "metric", "left")
    q = (enriched.writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "enrich_ckpt"))
         .format("memory").queryName("enriched_events").start())
    q.processAllAvailable()
    q.stop()

    got = {r["event_id"]: r["owner"]
           for r in spark.sql("SELECT * FROM enriched_events").collect()}
    assert len(got) == 60
    for i in range(60):
        want = {0: "team-a", 1: "team-b", 2: None}[i % 3]
        assert got[i] == want
