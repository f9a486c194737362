"""Nanosecond time arithmetic.

Re-expresses the reference's chrono layer (/root/reference/include/hta/chrono.hpp:38-73,
/root/reference/include/hta/types.hpp:144-154) on plain int64 nanoseconds.

All engine-internal timestamps are int64 ns since the POSIX epoch, kept in
Spark ``LongType`` columns.  Spark's ``TimestampType`` is microsecond-precision
and session-timezone-dependent; the reference's semantics (and its golden
tests) are ns-exact, so timestamps only become ``TimestampType`` at the
display/export boundary.

A ``TimePoint`` of 0 means "invalid" in the reference
(/root/reference/include/hta/chrono.hpp:49-63); we preserve that convention.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Handy duration constants (ns)
NS = 1
US = 1_000
MS = 1_000_000
SECOND = 1_000_000_000
MINUTE = 60 * SECOND
HOUR = 60 * MINUTE
DAY = 24 * HOUR
YEAR = 365 * DAY


def interval_begin(time_ns: int, interval_ns: int) -> int:
    """Epoch-aligned floor of ``time_ns`` to ``interval_ns`` buckets.

    Mirrors ``hta::interval_begin`` (/root/reference/include/hta/types.hpp:144-148).
    Python's ``%`` floors (C++ truncates), but all valid engine timestamps are
    positive so the two agree; floor is also the sane extension for t < 0.
    """
    return time_ns - (time_ns % interval_ns)


def interval_end(time_ns: int, interval_ns: int) -> int:
    """First bucket boundary strictly after ``time_ns``... precisely:
    ``interval_begin(time_ns + interval, interval)``
    (/root/reference/include/hta/types.hpp:150-154).  Note: for an aligned
    ``time_ns`` this returns ``time_ns + interval``, not ``time_ns``.
    """
    return interval_begin(time_ns + interval_ns, interval_ns)


def floordiv(time_ns: int, interval_ns: int) -> int:
    """Bucket index of ``time_ns`` (floor division)."""
    return time_ns // interval_ns


# ---------------------------------------------------------------------------
# Column-expression variants (stay JVM-side / codegen'd — no UDFs).
# ---------------------------------------------------------------------------

def col_bucket(time: Column, interval_ns: int, origin_ns: int = 0) -> Column:
    """Bucket index ``floor((time - origin) / interval)`` as a LongType column.

    Uses the SQL integral ``div`` (exact int64 division) — a double division
    would round the ~1e18 ns numerator into the 53-bit mantissa and can
    truncate the quotient off by one at half-ulp ties.  ``pmod`` first makes
    the numerator an exact multiple, giving floor (not truncating) semantics
    for negative offsets too.
    """
    off = time - F.lit(origin_ns)
    return F.call_function(
        "div", off - F.pmod(off, F.lit(interval_ns)), F.lit(interval_ns))


def col_interval_begin(time: Column, interval_ns: int) -> Column:
    """Column version of :func:`interval_begin` (floor semantics)."""
    return (time - F.pmod(time, F.lit(interval_ns))).cast("long")


def col_interval_end(time: Column, interval_ns: int) -> Column:
    """Column version of :func:`interval_end`."""
    return col_interval_begin(time + F.lit(interval_ns), interval_ns)
