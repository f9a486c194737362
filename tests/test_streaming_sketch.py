"""Streaming KMV sketch: incremental merge must equal the batch sketch."""
from __future__ import annotations

from hta_spark.pipeline.dedup import md5_long
from hta_spark.pipeline.sketch import kmv_distinct
from hta_spark.streaming.sketch_stream import md5_long_py, stream_kmv_distinct


def test_md5_long_py_matches_spark(spark):
    from pyspark.sql import functions as F
    vals = ["7", "hello", "-3", "0"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r["h"] for r in
           df.select(md5_long(F.col("v"), "kmv").alias("h")).collect()]
    assert got == [md5_long_py(v, "kmv") for v in vals]


def _rows():
    # 3 groups, overlapping values, duplicates across batches
    rows = []
    for i in range(300):
        rows.append(("a", i % 120))
        rows.append(("b", i % 17))
    rows += [("c", i) for i in range(5)]
    return rows


def test_stream_kmv_equals_batch(spark, tmp_path):
    rows = _rows()
    src = tmp_path / "kmv_src"
    src.mkdir()
    n = len(rows)
    for i in range(3):
        chunk = rows[i * n // 3:(i + 1) * n // 3]
        (spark.createDataFrame(chunk, "g string, v int")
         .coalesce(1).write.parquet(str(src / f"b{i}")))

    stream = (spark.readStream.schema("g string, v int")
              .option("maxFilesPerTrigger", "1").parquet(str(src / "b*")))
    out = stream_kmv_distinct(stream, "v", "g", k=16)
    q = (out.writeStream.outputMode("update")
         .option("checkpointLocation", str(tmp_path / "kmv_ckpt"))
         .format("memory").queryName("kmv_stream").start())
    q.processAllAvailable()
    q.stop()

    # final sketch per group: the memory table holds one row per
    # (group, micro-batch) in no guaranteed order, but the sketch evolves
    # monotonically (n_kept grows to k, then kth only shrinks) — the final
    # state is the row maximal under (n_kept, -kth_hash)
    per_group: dict[str, list] = {}
    for r in spark.sql("SELECT * FROM kmv_stream").collect():
        per_group.setdefault(r["g"], []).append(r)
    last = {}
    for g, rs in per_group.items():
        f = max(rs, key=lambda r: (r["n_kept"], -r["kth_hash"]))
        last[g] = (f["n_kept"], f["kth_hash"], f["kmv_distinct"])

    batch = {r["g"]: (r["n_kept"], r["kth_hash"], r["kmv_distinct"])
             for r in kmv_distinct(
                 spark.createDataFrame(rows, "g string, v int"),
                 "v", ["g"], k=16).collect()}
    assert last == batch
    # group c has 5 < k distinct -> exact
    assert last["c"][0] == 5 and last["c"][2] == 5.0


def test_stream_kmv_skips_nulls_and_long_group_col(spark, tmp_path):
    """Null values must not enter the sketch (matching batch kmv), and a
    non-string group column must keep its type in the output schema."""
    rows = [(1, "a"), (1, "b"), (1, None), (2, "a")]
    src = tmp_path / "kmvn_src"
    src.mkdir()
    (spark.createDataFrame(rows, "g long, v string")
     .coalesce(1).write.parquet(str(src / "b0")))
    stream = (spark.readStream.schema("g long, v string")
              .option("maxFilesPerTrigger", "1").parquet(str(src / "b*")))
    out = stream_kmv_distinct(stream, "v", "g", k=8)
    q = (out.writeStream.outputMode("update")
         .option("checkpointLocation", str(tmp_path / "kmvn_ckpt"))
         .format("memory").queryName("kmv_nulls").start())
    q.processAllAvailable()
    q.stop()
    got = {r["g"]: r["n_kept"]
           for r in spark.sql("SELECT * FROM kmv_nulls").collect()}
    assert got == {1: 2, 2: 1}      # the null contributed nothing
    # kth_hash must be BIT-exact vs batch even in a chunk containing a
    # NULL (r4 review: a nullable _h column crosses Arrow as float64 and
    # int() loses the low ~7 bits of a 2^60 hash — the JVM-side
    # isNotNull filter keeps the column non-nullable end-to-end)
    hashes = {r["g"]: r["kth_hash"]
              for r in spark.sql("SELECT * FROM kmv_nulls").collect()}
    batch = {r["g"]: r["kth_hash"]
             for r in kmv_distinct(
                 spark.createDataFrame(rows, "g long, v string"),
                 "v", ["g"], k=8).collect()}
    assert hashes == batch


def test_stream_hist_equals_batch_fixed_bounds(spark, tmp_path):
    """Streaming per-group histogram quantiles after all batches must
    equal the batch fixed-bounds sketch over the same rows, bit-for-bit
    (shared bin expression + shared interpolation twin)."""
    from pyspark.sql import functions as F
    from hta_spark.pipeline.sketch import hist_quantiles
    from hta_spark.streaming.sketch_stream import stream_hist_quantiles

    rows = [("a", i / 7.0) for i in range(400)] \
        + [("b", i * 1.5) for i in range(90)] \
        + [("a", 999.0), ("b", -50.0)]       # out-of-range -> edge bins
    bounds = (0, 5000)                        # scaled ints (scale=100)
    src = tmp_path / "hist_src"
    src.mkdir()
    n = len(rows)
    for i in range(3):
        chunk = rows[i * n // 3:(i + 1) * n // 3]
        (spark.createDataFrame(chunk, "g string, v double")
         .coalesce(1).write.parquet(str(src / f"b{i}")))

    stream = (spark.readStream.schema("g string, v double")
              .option("maxFilesPerTrigger", "1").parquet(str(src / "b*")))
    out = stream_hist_quantiles(stream, "v", "g", bounds=bounds)
    q = (out.writeStream.outputMode("update")
         .option("checkpointLocation", str(tmp_path / "hist_ckpt"))
         .format("memory").queryName("hist_stream").start())
    q.processAllAvailable()
    q.stop()

    # last emission per (group, q): target_rank is monotone in rows seen,
    # so the final state row is the max-target_rank one
    per: dict[tuple, list] = {}
    for r in spark.sql("SELECT * FROM hist_stream").collect():
        per.setdefault((r["g"], r["q"]), []).append(r)
    last = {k: max(rs, key=lambda r: r["target_rank"]) for k, rs in per.items()}

    df = spark.createDataFrame(rows, "g string, v double")
    for g in ("a", "b"):
        batch = {r["q"]: (r["target_rank"], r["est"]) for r in
                 hist_quantiles(df.filter(F.col("g") == g), "v",
                                bounds=bounds).collect()}
        for qv, (tr, est) in batch.items():
            got = last[(g, qv)]
            assert (got["target_rank"], got["est"]) == (tr, est), (g, qv)


def test_hist_fixed_bounds_matches_data_bounds_when_equal(spark):
    """With bounds set to the data's own scaled min/max, the one-scan
    fixed path must reproduce the two-scan default path exactly."""
    from hta_spark.pipeline.sketch import hist_quantiles
    df = spark.createDataFrame([(float(i * i % 977),) for i in range(500)],
                               "v double")
    lo_hi = df.selectExpr(
        "min(cast(round(v * 100) as bigint)) lo",
        "max(cast(round(v * 100) as bigint)) hi").collect()[0]
    a = [tuple(r) for r in hist_quantiles(df, "v").collect()]
    b = [tuple(r) for r in
         hist_quantiles(df, "v", bounds=(lo_hi["lo"], lo_hi["hi"]))
         .collect()]
    assert a == b
