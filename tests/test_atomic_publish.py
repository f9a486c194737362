"""Atomic-publish discipline for table rewrites (round-1 VERDICT item 8):
compaction republises into an immutable versioned snapshot and flips a
manifest pointer with one POSIX rename, so a concurrent reader NEVER
observes a partially written/deleted table — the Spark-layout analog of the
reference's torn-tail tolerance
(/root/reference/src/storage/file/file.hpp:210-247).
"""

from __future__ import annotations

import json
import os
import threading

from hta_spark import SECOND
from hta_spark.sources import HtaStore
from hta_spark.sources.store import publish_version, resolve_table_path

from .conftest import F1_META, f1_points


def _as_df(spark, pts):
    return spark.createDataFrame(pts, "metric string, time long, value double")


def test_manifest_flip_resolves(tmp_path):
    path = str(tmp_path / "t")

    def w1(target):
        os.makedirs(target)
        open(f"{target}/a", "w").write("1")

    v1 = publish_version(path, w1)
    assert resolve_table_path(path) == v1
    doc = json.load(open(path + ".manifest"))
    assert doc["current"].startswith("t.versions/v_")

    def w2(target):
        os.makedirs(target)
        open(f"{target}/b", "w").write("2")

    v2 = publish_version(path, w2)
    assert resolve_table_path(path) == v2
    # previous snapshot retained for in-flight readers (keep=2)
    assert os.path.exists(v1)
    v3 = publish_version(path, w2)
    assert resolve_table_path(path) == v3
    assert not os.path.exists(v1)        # GC'd after falling 2 behind


def test_concurrent_reader_never_sees_partial_table(spark, tmp_path):
    """Reader loop racing repeated compactions: every read must return the
    full row count (the round-1 in-place overwrite intermittently lost the
    race and saw a half-deleted directory)."""
    base = str(tmp_path / "race_store")
    store = HtaStore(spark, base, configs={"foo": F1_META},
                     partition_by_metric=False)
    pts = f1_points()
    store.write_raw(_as_df(spark, pts))
    expected = len(pts)

    errors: list[str] = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                n = store.raw().count()
                if n != expected:
                    errors.append(f"saw {n} rows, expected {expected}")
                    return
            except Exception as ex:          # torn read
                errors.append(repr(ex)[:200])
                return

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        for _ in range(6):
            store.compact("raw", target_partitions=2)
    finally:
        stop.set()
        t.join(timeout=60)
    assert not errors, errors[0]
    # result is intact post-race
    rows = sorted((r["metric"], r["time"], r["value"])
                  for r in store.raw().collect())
    assert rows == sorted(pts)


def test_compact_then_append_then_compact(spark, tmp_path):
    """Appends land in the live snapshot; a second compaction folds them in
    and the old snapshot is retired without breaking reads."""
    base = str(tmp_path / "cycle_store")
    store = HtaStore(spark, base, configs={"foo": F1_META},
                     partition_by_metric=False)
    pts = f1_points()
    half = len(pts) // 2
    store.write_raw(_as_df(spark, pts[:half]))
    store.compact("raw")
    store.write_raw(_as_df(spark, pts[half:]))
    assert store.raw().count() == len(pts)
    store.compact("raw")
    store.compact("raw")
    rows = sorted((r["metric"], r["time"], r["value"])
                  for r in store.raw().collect())
    assert rows == sorted(pts)


def test_time_travel_read_previous_snapshot(spark, tmp_path):
    """Snapshot versions are immutable -> an earlier version inside the
    keep horizon reads back exactly, even after later republishes."""
    import pytest
    from hta_spark.sources.store import list_versions, resolve_table_version

    store = HtaStore(spark, str(tmp_path / "db"), configs={"foo": F1_META})
    store.write_raw(_as_df(spark, f1_points()))
    before = sorted((r["time"], r["value"]) for r in store.raw().collect())

    # two compactions -> snapshots v1, v2; v1 stays readable (keep=2)
    store.compact("raw")
    store.compact("raw", target_partitions=2)
    path = str(tmp_path / "db" / "raw")
    vs = list_versions(path)
    assert len(vs) == 2
    old = sorted((r["time"], r["value"])
                 for r in store.raw(version=vs[0]).collect())
    new = sorted((r["time"], r["value"]) for r in store.raw().collect())
    assert old == before == new          # same rows, different physical layout
    assert resolve_table_version(path, vs[-1]) == resolve_table_path(path)

    # outside the keep horizon -> explicit error naming live versions
    store.compact("raw")
    with pytest.raises(FileNotFoundError, match="on-disk versions"):
        store.raw(version=vs[0])


def test_two_writers_race_second_blocks_or_fails(tmp_path):
    """VERDICT r8 #4: two racing publishers must serialize (the loser
    blocks until the lease frees) or fail loudly — never interleave
    manifest flips so that one publisher's rows silently vanish."""
    import pytest
    from hta_spark.sources.store import (PublishLockError, _writer_lease,
                                         list_versions)

    path = str(tmp_path / "t")
    entered = threading.Event()
    release = threading.Event()
    results: list[str] = []

    def slow_write(target):
        os.makedirs(target)
        entered.set()
        assert release.wait(20)
        with open(os.path.join(target, "data.txt"), "w") as f:
            f.write("A")

    t = threading.Thread(
        target=lambda: results.append(publish_version(path, slow_write)))
    t.start()
    assert entered.wait(10)
    # writer B with a zero-wait lease: fails LOUDLY while A holds it
    with pytest.raises(PublishLockError, match="single-writer"):
        with _writer_lease(path, timeout_s=0):
            pass
    # writer B with a patient lease: BLOCKS until A's flip, then wins —
    # both snapshots exist, version numbers never collide
    def write_b(target):
        os.makedirs(target)
        with open(os.path.join(target, "data.txt"), "w") as f:
            f.write("B")

    release.set()
    t.join(30)
    assert not t.is_alive()
    publish_version(path, write_b)
    assert list_versions(path) == [1, 2]
    live = resolve_table_path(path)
    assert open(os.path.join(live, "data.txt")).read() == "B"
    assert open(os.path.join(path + ".versions/v_1",
                             "data.txt")).read() == "A"
    assert not os.path.exists(path + ".lock")


def test_stale_lock_takeover(tmp_path):
    """A crashed holder's lockfile is taken over once it ages past
    stale_s; a fresh lock is not."""
    import pytest
    from hta_spark.sources.store import PublishLockError, _writer_lease

    path = str(tmp_path / "t")
    lock = path + ".lock"
    with open(lock, "w") as f:
        f.write("dead-holder")
    old = os.path.getmtime(lock) - 9_999
    os.utime(lock, (old, old))                  # age it past stale_s
    with _writer_lease(path, timeout_s=0.2, stale_s=300):
        assert open(lock).read() != "dead-holder"
    assert not os.path.exists(lock)
    # fresh foreign lock -> loud failure, file untouched
    with open(lock, "w") as f:
        f.write("live-holder")
    with pytest.raises(PublishLockError):
        with _writer_lease(path, timeout_s=0.2, stale_s=300):
            pass
    assert open(lock).read() == "live-holder"
    os.unlink(lock)


def test_partition_publish_holds_lease(spark, tmp_path):
    """publish_partitions runs under the same lease."""
    import pytest
    from hta_spark.sources.store import (PublishLockError, _writer_lease,
                                         publish_partitions,
                                         read_partition_manifest)

    path = str(tmp_path / "lvl")
    region = spark.createDataFrame(
        [("m", 0, 0, 1.0, 2.0, 3.0, 2, 30.0, 10)],
        "metric string, tb long, interval_start long, minimum double,"
        " maximum double, sum double, count long, integral double,"
        " active_time long")
    with _writer_lease(path):
        with pytest.raises(PublishLockError):
            publish_partitions(spark, path, region, top=10,
                               lock_timeout_s=0.2)
    keys = publish_partitions(spark, path, region, top=10)
    assert keys == ["metric=m/tb=0"]
    assert read_partition_manifest(path)["v"] == 1


def test_lease_heartbeat_prevents_stale_steal(tmp_path):
    """ADVICE r9 (medium): a LIVE holder whose leased section outlasts
    ``stale_s`` must keep the lease — the heartbeat thread refreshes the
    lockfile mtime, so a contender never judges it stale.  Before the
    heartbeat existed this exact shape (write_fn slower than stale_s) had
    the lease silently stolen, re-admitting the two-writer flip race."""
    import time as _time

    import pytest
    from hta_spark.sources.store import PublishLockError, _writer_lease

    path = str(tmp_path / "t")
    with _writer_lease(path, stale_s=1.2) as lease:
        _time.sleep(2.5)        # leased section runs > 2x stale_s
        # a contender must still see a LIVE lock (mtime refreshed) and
        # fail loudly rather than taking over
        with pytest.raises(PublishLockError, match="single-writer"):
            with _writer_lease(path, timeout_s=0.3, stale_s=1.2):
                pass
        lease.verify()          # and the holder still owns it
    assert not os.path.exists(path + ".lock")


def test_lease_verify_raises_after_theft(tmp_path):
    """The pre-flip ownership re-check: if the lockfile stops carrying our
    token (takeover/removal in any residual window), ``verify()`` must
    raise before the manifest flip, and ``close()`` must not unlink the
    new holder's lock."""
    import pytest
    from hta_spark.sources.store import PublishLockError, _writer_lease

    path = str(tmp_path / "t")
    with _writer_lease(path, stale_s=300) as lease:
        with open(path + ".lock", "w") as f:
            f.write("thief-token")
        with pytest.raises(PublishLockError, match="no longer owned"):
            lease.verify()
    assert open(path + ".lock").read() == "thief-token"
    os.unlink(path + ".lock")
