"""Regression tests for the second r4 review pass (pipeline/ + sources/):
string-id connected components, subset rebuild preservation, validation
guards, and multimodal edge routing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hta_spark import Meta
from hta_spark.chrono import SECOND


def test_connected_components_string_ids(spark):
    """String node ids must converge to true components (the old
    sum(comp) fixpoint was NULL over strings and returned after one
    round with a chain only partially collapsed)."""
    from hta_spark.pipeline.dedup import connected_components
    chain = [(f"d{i}", f"d{i+1}") for i in range(9)]        # one chain
    extra = [("x1", "x2"), ("x2", "x3")]
    pairs = spark.createDataFrame(chain + extra, "a string, b string")
    got = {r["id"]: r["comp"]
           for r in connected_components(pairs).collect()}
    assert all(got[f"d{i}"] == "d0" for i in range(10))
    assert all(got[x] == "x1" for x in ("x1", "x2", "x3"))


def test_store_subset_build_preserves_other_metrics(spark, tmp_path):
    """build(metas=<subset>) must republish each level carrying forward
    the rows of metrics NOT in the subset (the old code silently
    destroyed them)."""
    from hta_spark.sources.store import HtaStore
    meta = Meta(interval_min=10 * SECOND, interval_max=100 * SECOND,
                interval_factor=10)
    base = str(tmp_path / "db")
    store = HtaStore(spark, base, configs={"a": meta, "b": meta})
    t0 = 1_650_000_000 * SECOND
    rows = [(m, t0 + i * SECOND, float(i)) for m in ("a", "b")
            for i in range(50)]
    store.write_raw(spark.createDataFrame(
        rows, "metric string, time long, value double"))
    store.build()
    before_b = sorted(map(tuple, store.level(10 * SECOND)
                          .filter(F.col("metric") == "b").collect()))
    assert before_b
    # rebuild ONLY metric a
    store.build(metas={"a": meta})
    lvl = store.level(10 * SECOND)
    after_b = sorted(map(tuple, lvl.filter(F.col("metric") == "b")
                         .collect()))
    after_a = lvl.filter(F.col("metric") == "a").count()
    assert after_b == before_b          # b's rollups survived
    assert after_a > 0


def test_metric_count_open_ended(spark, tmp_path):
    from hta_spark.sources.store import HtaStore
    meta = Meta(interval_min=10 * SECOND, interval_max=100 * SECOND,
                interval_factor=10)
    store = HtaStore(spark, str(tmp_path / "db2"), configs={"m": meta})
    t0 = 1_650_000_000 * SECOND
    store.write_raw(spark.createDataFrame(
        [("m", t0 + i * SECOND, 1.0) for i in range(20)],
        "metric string, time long, value double"))
    m = store["m"]
    assert m.count() == 20
    # begin given, end omitted: open-ended tail count (was a TypeError)
    assert m.count(begin=t0 + 10 * SECOND) > 0


def test_write_raw_rejects_null_time(spark, tmp_path):
    from hta_spark.errors import InvalidTimestampError
    from hta_spark.sources.store import HtaStore
    meta = Meta(interval_min=10 * SECOND, interval_max=100 * SECOND,
                interval_factor=10)
    store = HtaStore(spark, str(tmp_path / "db3"), configs={"m": meta})
    bad = spark.createDataFrame([("m", None, 1.0), ("m", 5 * SECOND, 2.0)],
                                "metric string, time long, value double")
    with pytest.raises(InvalidTimestampError):
        store.write_raw(bad)


def test_sample_frames_zero_guard(spark):
    from hta_spark.pipeline.multimodal import sample_frames
    df = spark.createDataFrame([(1, "video", b"x", {})],
                               "asset_id long, media_type string, "
                               "payload binary, meta map<string,string>")
    with pytest.raises(ValueError):
        sample_frames(df, n_frames=0)


def test_pack_budget_guard(spark):
    from hta_spark.pipeline.pack import pack_contiguous
    df = spark.createDataFrame([(1, 10, "s")],
                               "doc_id long, n_tokens long, source string")
    with pytest.raises(ValueError):
        pack_contiguous(df, budget=0, key_col="doc_id",
                        size_col="n_tokens", shard_col="source")


def test_video_meta_fake_stubs_malformed_y4m(spark):
    """fake=True must stub truncated / unsupported Y4M instead of dying
    on one bad asset (parity with the image/audio fake paths)."""
    from hta_spark.pipeline.multimodal import decode_video_meta
    bad = b"YUV4MPEG2 W4 H4 F25:1 C420\x0aFRAME\x0a\x01\x02"  # truncated
    df = spark.createDataFrame(
        [(1, "video", bad, {})],
        "asset_id long, media_type string, payload binary, "
        "meta map<string,string>")
    rows = decode_video_meta(df, fake=True).collect()
    assert rows[0]["vid_format"] == "fake"
    with pytest.raises(Exception):
        decode_video_meta(df, fake=False).collect()


def test_extract_features_riff_webp_not_audio(spark):
    """A RIFF/WEBP payload must NOT be routed to the audio decoder (RIFF
    is also the WEBP/AVI container); it falls through to the image
    diagnostics."""
    from hta_spark.pipeline.multimodal import extract_features
    webp = b"RIFF" + (36).to_bytes(4, "little") + b"WEBPVP8 " + bytes(24)
    df = spark.createDataFrame(
        [(1, "image", webp, {})],
        "asset_id long, media_type string, payload binary, "
        "meta map<string,string>")
    with pytest.raises(Exception) as ei:
        extract_features(df).collect()
    assert "image container" in str(ei.value)   # image-path diagnostics


def test_check_dups_oracle_covers_all_issue_kinds(spark, tmp_path):
    """The hta_check_dups oracle must model EVERY issue kind check_raw can
    emit on this query's inputs (nan/inf/-inf/magnitude/too-old/dup), not
    just duplicates — verified on constructed data containing all of
    them."""
    import datetime

    import duckdb

    from hta_spark.queries_hta import SQL_HTA_CHECK_DUPS, q_hta_check_dups

    def us(sec):
        return datetime.datetime.fromtimestamp(
            sec, tz=datetime.timezone.utc).replace(tzinfo=None)

    rows = [
        (1, us(1_704_000_000), 7, "m", 1.0, "{}"),
        (2, us(1_704_000_000), 7, "m", 2.0, "{}"),      # duplicate ts
        (3, us(1_704_000_100), 7, "m", float("nan"), "{}"),
        (4, us(1_704_000_200), 7, "m", float("inf"), "{}"),
        (5, us(1_704_000_300), 7, "m", float("-inf"), "{}"),
        (6, us(1_704_000_400), 7, "m", 1e21, "{}"),     # magnitude
        (7, us(100_000), 7, "m", 1.0, "{}"),            # pre-2000
        (8, us(1_704_000_500), 7, "n", 1.0, "{}"),      # clean metric
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    p = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(p)

    got = sorted(tuple(r) for r in
                 q_hta_check_dups(spark, str(tmp_path)).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{p}/*.parquet'")
    want = sorted(tuple(r) for r in
                  con.sql(SQL_HTA_CHECK_DUPS).fetchall())
    assert got == want
    kinds = {k for (_m, k, _n) in got}
    assert kinds == {"duplicate_timestamp", "nan", "inf", "-inf",
                     "implausible_magnitude", "timestamp_too_old"}
