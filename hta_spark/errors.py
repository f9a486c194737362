"""Engine exceptions, mirroring the reference's error surface
(/root/reference/include/hta/exception.hpp and the throw sites in
/root/reference/src/metric.cpp, /root/reference/src/directory.cpp)."""

from __future__ import annotations


class HtaError(Exception):
    """Base for all engine errors (analog of ``hta::Exception``)."""


class InvalidRangeError(HtaError):
    """begin/end out of order (``src/metric.cpp:104-108,162-167``)."""


class InvalidTimestampError(HtaError):
    """t == 0 or non-monotonic insert (``src/metric.cpp:513-525``)."""


class MissingMetricConfigError(HtaError, KeyError):
    """Unconfigured metric name (``src/directory.cpp:170``)."""


class MetaValidationError(HtaError, ValueError):
    """Bad hierarchy parameters (``src/meta.cpp:53-66``)."""


class ModeError(HtaError):
    """Read on write-only / write on read-only metric (``src/metric.cpp:73-95``)."""
