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


def test_append_lands_in_current_snapshot(spark, tmp_path):
    """Append AFTER an atomic republish must resolve through the manifest
    into the CURRENT snapshot — and leave the retained previous version
    untouched (time travel still shows pre-append state)."""
    path = str(tmp_path / "t")
    write_acid(_df(spark, [1]), path)
    write_acid(_df(spark, [2]), path)            # republish -> v2 current
    write_acid(_df(spark, [3]), path, mode="append")
    assert sorted(r["x"] for r in read_acid(spark, path).collect()) == [2, 3]
    vs = acid_versions(spark, path)
    old = read_acid(spark, path, version=vs[-2])
    assert [r["x"] for r in old.collect()] == [1]     # untouched


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
