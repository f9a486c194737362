"""ACID table writes — import-gated Delta Lake with a first-class
manifest fallback.

The reference guarantees readers never see torn state through
flush-barrier + torn-tail tolerance at the file layer
(/root/reference/src/metric.cpp:605-609,
src/storage/file/file.hpp:210-247).  This engine's native equivalent is
the POSIX-rename manifest discipline (:func:`.store.publish_version` /
:func:`.store.publish_partitions`): immutable snapshot directories behind
an atomically-flipped pointer, raced-reader tested.  That discipline is
NOT a stopgap — it is the shipped, tested consistency layer.

When a Delta Lake runtime is present (``delta-spark`` package + its jars
— absent from this image, same gating style as the Pillow/soundfile
codecs in :mod:`..pipeline.multimodal`), :func:`write_acid` /
:func:`read_acid` route through ``format("delta")`` instead, gaining
row-level transactional overwrite and native version time travel; the
API and the test contract (atomic replace, readable history) are
identical either way, so flipping a deployment to Delta is a
configuration change, not a code change.  The Delta-specific agreement
tests in tests/test_acid_gate.py skip-activate exactly like the codec
ones.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .store import (list_versions, publish_version, resolve_table_path,
                    resolve_table_version)

__all__ = ["acid_backend", "write_acid", "read_acid", "acid_versions"]


def acid_backend(spark: SparkSession) -> str:
    """``"delta"`` when the Delta Lake runtime is usable in this session,
    else ``"manifest"`` (the engine's native snapshot discipline).
    Requires BOTH the python package and the JVM-side jar — a
    half-installed runtime falls back rather than failing mid-write."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return "manifest"
    try:
        # Classic-only probe (SCALE.md Connect table): under Spark Connect
        # the `_jvm` attribute access itself raises, lands here, and the
        # backend falls back to the manifest layer — same API, documented
        # gate (Connect users opt into Delta by configuring the server).
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.delta.DeltaLog")
    except Exception:
        return "manifest"
    return "delta"


def _link_forward(src: str, tgt: str) -> None:
    """Hard-link every data file of snapshot ``src`` into ``tgt``
    (recursively, preserving partition subdirs; Spark control files like
    _SUCCESS are skipped).  Hard links make the copy-forward O(files)
    metadata work with zero data movement; cross-device setups fall back
    to a real copy."""
    import shutil
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        dst_dir = tgt if rel == "." else os.path.join(tgt, rel)
        os.makedirs(dst_dir, exist_ok=True)
        for fn in files:
            if fn.startswith(("_", ".")):
                continue
            s, d = os.path.join(root, fn), os.path.join(dst_dir, fn)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


def write_acid(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """Atomically (re)publish ``df`` as the table at ``path``; returns the
    backend used.  ``mode``: ``overwrite`` (atomic replace) or ``append``.

    BOTH modes are snapshot-atomic and versioned on BOTH backends (ADVICE
    r6: the r6 manifest append wrote into the current snapshot in place —
    unversioned, and a multi-file append was not atomic under a racing
    reader).  A manifest append now publishes a brand-new snapshot:
    hard-links of the current snapshot's immutable data files plus the
    appended files, flipped in with the same POSIX-rename manifest
    discipline as overwrite — a concurrent reader resolves the pre-append
    or the post-append snapshot, never a partially-visible append, and
    time travel to the pre-append version works exactly like Delta's."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unsupported mode {mode!r}")
    backend = acid_backend(df.sparkSession)
    if backend == "delta":
        df.write.format("delta").mode(mode).save(path)
        return backend
    if mode == "append":
        cur = resolve_table_path(path)
        if not os.path.isdir(cur):
            publish_version(path, lambda tgt: df.write.parquet(tgt))
            return backend

        def _append_snapshot(tgt: str) -> None:
            _link_forward(cur, tgt)
            df.write.mode("append").parquet(tgt)

        publish_version(path, _append_snapshot)
        return backend
    publish_version(path, lambda tgt: df.write.parquet(tgt))
    return backend


def read_acid(spark: SparkSession, path: str,
              version: int | None = None) -> DataFrame:
    """Read the live table, or time-travel to ``version`` (Delta's
    ``versionAsOf`` / the manifest layout's retained snapshots)."""
    if acid_backend(spark) == "delta":
        r = spark.read.format("delta")
        if version is not None:
            r = r.option("versionAsOf", str(version))
        return r.load(path)
    return spark.read.parquet(resolve_table_version(path, version))


def acid_versions(spark: SparkSession, path: str) -> list[int]:
    """Snapshot versions available for time travel, ascending."""
    if acid_backend(spark) == "delta":
        from delta.tables import DeltaTable
        hist = DeltaTable.forPath(spark, path).history().select("version")
        return sorted(r["version"] for r in hist.collect())
    return list_versions(path)
