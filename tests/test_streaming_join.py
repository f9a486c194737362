"""Stream-stream join with watermarks: correlating two live event
streams (view -> purchase attribution within a time window) — state for
both sides is watermark-bounded, the third leg of the streaming surface
next to stateful aggregation (live.py) and stream-static enrichment."""
from __future__ import annotations

from pyspark.sql import functions as F


def test_stream_stream_interval_join(spark, tmp_path):
    # views and purchases for the same users; purchase joins views of the
    # SAME user within [view_ts, view_ts + 10 min]
    base = 1_700_000_000
    views = [(u, base + u * 60) for u in range(20)]
    purchases = [(u, base + u * 60 + (u % 3) * 240) for u in range(20)]
    # expected matches: delta = (u%3)*240s <= 600s -> all (0,240,480 ok)

    vdir, pdir = tmp_path / "views", tmp_path / "purch"
    vdir.mkdir(), pdir.mkdir()
    for i in range(2):
        (spark.createDataFrame(views[i * 10:(i + 1) * 10],
                               "user_id long, vts long")
         .coalesce(1).write.parquet(str(vdir / f"b{i}")))
        (spark.createDataFrame(purchases[i * 10:(i + 1) * 10],
                               "user_id long, pts long")
         .coalesce(1).write.parquet(str(pdir / f"b{i}")))

    vs = (spark.readStream.schema("user_id long, vts long")
          .option("maxFilesPerTrigger", "1").parquet(str(vdir / "b*"))
          .withColumn("view_time", F.timestamp_seconds("vts"))
          .withWatermark("view_time", "30 minutes"))
    ps = (spark.readStream.schema("user_id long, pts long")
          .option("maxFilesPerTrigger", "1").parquet(str(pdir / "b*"))
          .withColumn("purch_time", F.timestamp_seconds("pts"))
          .withWatermark("purch_time", "30 minutes"))

    joined = vs.join(
        ps,
        (vs.user_id == ps.user_id)
        & (ps.purch_time >= vs.view_time)
        & (ps.purch_time <= vs.view_time + F.expr("INTERVAL 10 MINUTES")))

    q = (joined.select(vs.user_id.alias("u"), "vts", "pts")
         .writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ss_ckpt"))
         .format("memory").queryName("attributed").start())
    q.processAllAvailable()
    q.stop()

    got = {(r["u"], r["vts"], r["pts"])
           for r in spark.sql("SELECT * FROM attributed").collect()}
    want = {(u, vt, pt)
            for u, vt in views for u2, pt in purchases
            if u == u2 and vt <= pt <= vt + 600}
    assert got == want
    assert len(want) == 20     # every purchase attributes to its view
