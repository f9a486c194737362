"""Engine table schemas (see SURVEY.md §1.7 and FIXTURES.md).

raw:   one row per sample            — replaces raw.hta (16-byte records,
                                       /root/reference/src/storage/file/metric.hpp:100)
agg:   one row per closed interval   — replaces <interval_ns>.hta (64-byte records,
                                       /root/reference/src/storage/file/metric.hpp:101);
                                       the ``interval_start`` column replaces the
                                       dense index-is-time addressing
                                       (/root/reference/src/storage/file/metric.cpp:485-493)
meta:  one row per metric            — replaces the JSON directory config
                                       (/root/reference/src/directory.cpp:86-123)
"""

from __future__ import annotations

from pyspark.sql import types as T

RAW_SCHEMA = T.StructType([
    T.StructField("metric", T.StringType(), False),
    T.StructField("time", T.LongType(), False),    # ns since epoch, > 0
    T.StructField("value", T.DoubleType(), False),
])

AGG_FIELDS = ["minimum", "maximum", "sum", "count", "integral", "active_time"]

AGG_SCHEMA = T.StructType([
    T.StructField("metric", T.StringType(), False),
    T.StructField("interval_start", T.LongType(), False),  # epoch-aligned
    T.StructField("minimum", T.DoubleType(), False),       # identity +inf
    T.StructField("maximum", T.DoubleType(), False),       # identity -inf
    T.StructField("sum", T.DoubleType(), False),
    T.StructField("count", T.LongType(), False),
    T.StructField("integral", T.DoubleType(), False),      # value*ns, LAST semantics
    T.StructField("active_time", T.LongType(), False),     # ns
])

META_SCHEMA = T.StructType([
    T.StructField("metric", T.StringType(), False),
    T.StructField("interval_min", T.LongType(), False),
    T.StructField("interval_max", T.LongType(), False),
    T.StructField("interval_factor", T.LongType(), False),
    T.StructField("mode", T.StringType(), True),
    T.StructField("prefix", T.BooleanType(), True),
])

# Row shape returned by retrieve()-family queries
# (hta::Row, /root/reference/include/hta/types.hpp:109-127)
ROW_SCHEMA = T.StructType([
    T.StructField("metric", T.StringType(), False),
    T.StructField("interval", T.LongType(), False),   # 0 for raw-derived rows
    T.StructField("time", T.LongType(), False),
    T.StructField("minimum", T.DoubleType(), False),
    T.StructField("maximum", T.DoubleType(), False),
    T.StructField("sum", T.DoubleType(), False),
    T.StructField("count", T.LongType(), False),
    T.StructField("integral", T.DoubleType(), False),
    T.StructField("active_time", T.LongType(), False),
])
