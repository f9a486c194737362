"""Spark Connect compatibility shims (VERDICT r8 "Next round" #3).

Classic PySpark exposes driver-side JVM handles — ``spark.sparkContext``,
``spark._jvm``, ``sc.broadcast`` — and ``DataFrame.localCheckpoint``.
Spark Connect's thin client has none of these (recent servers do accept
``localCheckpoint``, but restricted or older ones raise).  Library code
must not hard-depend on any of them, or a cluster user on Connect hits an
AttributeError the first time an operator plans.

Every helper here tries the classic fast path and falls back to a
Connect-expressible equivalent with the same *contract* (stop
recomputation / pick a partition count / ship a read-only value to
tasks).  The fallbacks trade some efficiency, never correctness:

========================  =========================  =====================
helper                    classic path               Connect fallback
========================  =========================  =====================
``pin``                   ``localCheckpoint``        ``persist``+``count``
                          (lineage truncated)        (lineage kept; plans
                                                     grow in iterative
                                                     loops but results and
                                                     re-use semantics are
                                                     identical)
``default_parallelism``   ``sc.defaultParallelism``  ``spark.sql.shuffle.
                                                     partitions`` conf
``bc_value``              ``sc.broadcast`` (one      closure capture (the
                          copy per executor)         value pickles into
                                                     each task binary —
                                                     fine for the codebook
                                                     /matrix sizes our
                                                     guards already cap)
``set_log_level``         ``sc.setLogLevel``         no-op
========================  =========================  =====================

``FORCE_FALLBACK`` routes every helper straight to its fallback — the
test hook behind ``tests/test_connect_compat.py``, which runs the
operator battery with the classic paths disabled AND
``DataFrame.localCheckpoint`` monkeypatched to raise, proving the
fallbacks are load-bearing rather than dead code.

Remaining classic-only sites are documented GATES, not breakage:
``sources/acid.py::acid_backend`` probes the Delta jar via ``spark._jvm``
inside try/except — on Connect the probe fails and the backend falls back
to the manifest layer (same API); ``operators/ids.py::dense_ids`` reads
parquet footers off the local filesystem and already fails loudly on any
non-local setup.  See SCALE.md "Spark Connect portability" for the table.
"""

from __future__ import annotations

import weakref
from typing import Any

from pyspark.sql import DataFrame, SparkSession

__all__ = ["pin", "release", "lc_available", "default_parallelism",
           "bc_value", "set_log_level", "FORCE_FALLBACK"]

# Test hook: when True every helper skips its classic path (simulating a
# Connect client).  Set/restored by tests only.
FORCE_FALLBACK = False

# per-session localCheckpoint capability, probed once (ADVICE r9: a
# blanket `except Exception` around the real localCheckpoint call
# swallowed GENUINE job failures — data errors, OOM — and re-ran the
# whole failing plan through the persist fallback just to fail again,
# doubling the cost and burying the original traceback).  The probe runs
# a 1-row localCheckpoint per session: unsupported (Connect) fails the
# probe and routes to the fallback; after a successful probe the real
# call runs UNGUARDED so its failures propagate first time.
#
# Keyed WEAKLY on the session object (ADVICE r10): an id()-keyed dict
# both grew unbounded across sessions and could hand a NEW session a
# stale verdict when the allocator reused a dead session's id.  Weak
# entries die with their session; a session that can't be weakly
# referenced is simply re-probed (1-row job) per call.
_LC_OK: "weakref.WeakKeyDictionary[SparkSession, bool]" = \
    weakref.WeakKeyDictionary()


def _lc_supported(spark: SparkSession) -> bool:
    try:
        got = _LC_OK.get(spark)
    except TypeError:           # unhashable/non-weakrefable session
        got = None
    if got is None:
        try:
            spark.range(1).localCheckpoint(eager=True)
            got = True
        except Exception:
            got = False
        try:
            _LC_OK[spark] = got
        except TypeError:
            pass
    return got


def lc_available(spark: SparkSession) -> bool:
    """True when :func:`pin` would take the classic ``localCheckpoint``
    path (lineage-truncating, blocks GC-reclaimed with the DataFrame —
    leak-free without a release).  Callers that cannot pair a pin with a
    :func:`release` (the returned lineage reads the pinned frame, e.g.
    ``semantic_pairs``) gate their pin on this instead of re-deriving
    the capability check — ONE source of truth with pin's own dispatch
    (review r12)."""
    return not FORCE_FALLBACK and _lc_supported(spark)


def pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` so downstream branches reuse one computation.

    Classic: ``localCheckpoint`` (truncates lineage — iterative loops keep
    constant plan depth).  Connect fallback: ``persist`` + ``count()``.
    Persist does not truncate lineage, so an iterative caller's plan text
    grows per round on the fallback path — re-analysis cost only; the
    persisted blocks still stop recomputation, results are identical.
    ``eager=False`` maps to a lazy persist (materialized on first use).

    Iterative callers MUST :func:`release` each superseded pinned frame
    once its replacement is materialized (and any probe against it has
    run): on the fallback path every pin registers a persisted Dataset
    with the CacheManager for the session lifetime, so a loop that pins
    per round without releasing grows the cache without bound (ADVICE
    r9); on the classic path release is a free no-op.
    """
    if lc_available(df.sparkSession):
        # unguarded: a failure here is a real job failure, not a
        # capability gap (capability was probed above)
        return df.localCheckpoint(eager=eager)
    from pyspark import StorageLevel
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    if eager:
        out.count()
    return out


def release(df: DataFrame | None) -> None:
    """Drop a SUPERSEDED :func:`pin` result's cached blocks.

    Fallback (persist) path: unpersists, freeing the CacheManager entry —
    without this, iterative loops (connected_components, kmeans_lite,
    throttle_parallel's doubling) leak one persisted Dataset per round
    for the session lifetime.  Classic (localCheckpoint) path: unpersist
    is a no-op on the checkpointed RDD blocks, which are GC-reclaimed
    with the DataFrame — calling it is still safe, so callers don't
    branch on the path.  Only call once every consumer of ``df`` has
    materialized (on the fallback path a released frame re-executes its
    FULL lineage if read again)."""
    if df is None:
        return
    try:
        df.unpersist()
    except Exception:
        pass


def default_parallelism(spark: SparkSession) -> int:
    """Task fan-out hint: classic ``sc.defaultParallelism``; on Connect the
    session's ``spark.sql.shuffle.partitions`` (the same knob the engine
    sizes in :func:`hta_spark.session.get_spark`), floor 2."""
    if not FORCE_FALLBACK:
        try:
            return int(spark.sparkContext.defaultParallelism)
        except Exception:
            pass
    try:
        return max(2, int(spark.conf.get("spark.sql.shuffle.partitions")))
    except Exception:
        return 200


class _PlainValue:
    """Duck-typed stand-in for ``Broadcast``: exposes ``.value`` and
    pickles by value into each task closure."""

    __slots__ = ("value",)

    def __init__(self, value: Any):
        self.value = value


def bc_value(spark: SparkSession, value: Any):
    """Ship a read-only value to tasks; returns an object with ``.value``.

    Classic: ``sc.broadcast`` — one torrent copy per executor.  Connect
    fallback: plain closure capture — the pickled value rides inside each
    task binary instead (per-task dispatch cost, not per-executor; all
    call sites are behind explicit size guards — ``max_broadcast_mb`` for
    the GEMM matrices, codebook-sized for IVF — so the regression is
    bounded bandwidth, never memory)."""
    if not FORCE_FALLBACK:
        try:
            return spark.sparkContext.broadcast(value)
        except Exception:
            pass
    return _PlainValue(value)


def set_log_level(spark: SparkSession, level: str) -> None:
    """Driver log level; silently unavailable on Connect."""
    if FORCE_FALLBACK:
        return
    try:
        spark.sparkContext.setLogLevel(level)
    except Exception:
        pass
