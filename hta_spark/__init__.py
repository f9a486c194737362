"""hta_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of metricq/hta (hierarchical timeline
aggregation), re-expressed Spark-first.

See SURVEY.md for the blueprint and the reference-parity citations.
"""

from .chrono import (DAY, HOUR, MINUTE, MS, NS, SECOND, US, YEAR,
                     interval_begin, interval_end)
from .meta import Meta
from .session import get_spark

__all__ = [
    "Meta", "get_spark",
    "interval_begin", "interval_end",
    "NS", "US", "MS", "SECOND", "MINUTE", "HOUR", "DAY", "YEAR",
]

__version__ = "0.1.0"
