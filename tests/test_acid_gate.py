"""Import-gated ACID table layer (sources/acid.py): the manifest fallback
must deliver the full contract HERE (atomic replace, append, version time
travel — it is the engine's shipped consistency layer, not a stopgap);
the Delta-specific agreement test activates when a Delta runtime exists
(same skip-gating as the Pillow codec tests).
"""

from __future__ import annotations

import threading

import pytest

from hta_spark.sources.acid import (acid_backend, acid_versions, read_acid,
                                    write_acid)


def _df(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "x long")


def test_overwrite_replaces_atomically(spark, tmp_path):
    path = str(tmp_path / "t")
    assert write_acid(_df(spark, [1, 2]), path) in ("manifest", "delta")
    assert sorted(r["x"] for r in read_acid(spark, path).collect()) == [1, 2]
    write_acid(_df(spark, [7, 8, 9]), path)
    assert sorted(r["x"] for r in read_acid(spark, path).collect()) \
        == [7, 8, 9]


def test_append_accumulates(spark, tmp_path):
    path = str(tmp_path / "t")
    write_acid(_df(spark, [1]), path)
    write_acid(_df(spark, [2]), path, mode="append")
    assert sorted(r["x"] for r in read_acid(spark, path).collect()) == [1, 2]
    with pytest.raises(ValueError):
        write_acid(_df(spark, [3]), path, mode="upsert")


def test_append_is_versioned_and_snapshot_atomic(spark, tmp_path):
    """Append publishes a NEW snapshot on both backends (ADVICE r6: the r6
    manifest append wrote into the current snapshot in place — unversioned
    and, for a multi-file append, not atomic): the post-append read sees
    old+new rows, and time travel to the immediately previous version
    shows the pre-append state — the exact semantics Delta's append commit
    gives, so this test is backend-agnostic."""
    path = str(tmp_path / "t")
    write_acid(_df(spark, [1]), path)
    write_acid(_df(spark, [2]), path)            # republish -> v2 current
    write_acid(_df(spark, [3]), path, mode="append")
    assert sorted(r["x"] for r in read_acid(spark, path).collect()) == [2, 3]
    vs = acid_versions(spark, path)
    old = read_acid(spark, path, version=vs[-2])
    assert [r["x"] for r in old.collect()] == [2]     # pre-append snapshot


def test_time_travel_previous_version(spark, tmp_path):
    path = str(tmp_path / "t")
    write_acid(_df(spark, [1]), path)
    write_acid(_df(spark, [2]), path)
    vs = acid_versions(spark, path)
    assert len(vs) >= 2
    old = read_acid(spark, path, version=vs[-2])
    assert [r["x"] for r in old.collect()] == [1]
    new = read_acid(spark, path, version=vs[-1])
    assert [r["x"] for r in new.collect()] == [2]


def test_reader_racing_overwrite_sees_whole_snapshots(spark, tmp_path):
    """Concurrent readers during repeated overwrites must only ever see a
    complete snapshot (one of the published value-sets, never a mix or a
    partial directory)."""
    path = str(tmp_path / "t")
    write_acid(_df(spark, [0, 0]), path)
    seen, errs = [], []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                vals = sorted(r["x"] for r in
                              read_acid(spark, path).collect())
                seen.append(tuple(vals))
            except Exception as e:                    # noqa: BLE001
                errs.append(e)

    t = threading.Thread(target=reader)
    t.start()
    try:
        for g in range(1, 6):
            write_acid(_df(spark, [g, g]), path)
    finally:
        stop.set()
        t.join()
    assert not errs, errs[:2]
    legal = {(g, g) for g in range(6)}
    assert seen and set(seen) <= legal, set(seen) - legal


def test_reader_racing_append_sees_whole_snapshots(spark, tmp_path):
    """Concurrent readers during repeated MULTI-FILE appends must only see
    complete snapshots — every observed value-set is an exact append
    prefix, never a partially-visible append (the atomicity the r6
    in-place append could not give)."""
    path = str(tmp_path / "t")
    write_acid(_df(spark, [0]).repartition(4), path)
    seen, errs = [], []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                vals = sorted(r["x"] for r in
                              read_acid(spark, path).collect())
                seen.append(tuple(vals))
            except Exception as e:                    # noqa: BLE001
                errs.append(e)

    t = threading.Thread(target=reader)
    t.start()
    try:
        for g in range(1, 5):
            write_acid(_df(spark, [g] * 4).repartition(4), path,
                       mode="append")
    finally:
        stop.set()
        t.join()
    assert not errs, errs[:2]
    legal = {tuple([0] + sorted(sum(([v] * 4 for v in range(1, g + 1)), [])))
             for g in range(5)}
    assert seen and set(seen) <= legal, set(seen) - legal


def test_delta_backend_agreement(spark, tmp_path):
    """Activates only when a Delta runtime is installed (absent from this
    image): the delta backend must satisfy the exact same contract the
    fallback tests pin above."""
    if acid_backend(spark) != "delta":
        pytest.skip("Delta runtime not installed; manifest fallback "
                    "covered by the tests above")
    path = str(tmp_path / "t")
    write_acid(_df(spark, [1]), path)
    write_acid(_df(spark, [2]), path)
    vs = acid_versions(spark, path)
    assert [r["x"] for r in read_acid(spark, path,
                                      version=vs[-2]).collect()] == [1]
