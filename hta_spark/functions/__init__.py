"""Scalar surface (SURVEY.md §2.4 "Scalar functions").

Reference: ``mean_sum``/``mean_integral``/``mean``
(/root/reference/include/hta/types.hpp:72-89), ``interval_begin/end``
(types.hpp:144-154), finiteness predicates (src/tools/check.cpp:76-93).

All are plain column expressions — JVM-side, codegen'd, no UDFs.
``mean_sum`` of an empty interval is NaN (0/0), matching the reference
(tests/aggregate.cpp:270).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..chrono import col_bucket, col_interval_begin, col_interval_end

__all__ = [
    "mean_sum", "mean_integral", "mean", "is_finite",
    "col_bucket", "col_interval_begin", "col_interval_end",
]


def mean_sum(sum_col: Column | None = None,
             count_col: Column | None = None) -> Column:
    """sum/count; NaN when count == 0 (double 0/0).

    Defaults resolve lazily (F.col needs an active session; eager defaults
    would break import before SparkSession creation)."""
    sum_col = sum_col if sum_col is not None else F.col("sum")
    count_col = count_col if count_col is not None else F.col("count")
    return sum_col / count_col.cast("double")


def mean_integral(integral_col: Column | None = None,
                  active_col: Column | None = None) -> Column:
    integral_col = integral_col if integral_col is not None else F.col("integral")
    active_col = active_col if active_col is not None else F.col("active_time")
    return integral_col / active_col.cast("double")


def mean(sum_col: Column | None = None, count_col: Column | None = None,
         integral_col: Column | None = None,
         active_col: Column | None = None) -> Column:
    """Prefer integral mean when active_time > 0 (types.hpp:81-88)."""
    active_col = active_col if active_col is not None else F.col("active_time")
    return F.when(active_col > 0, mean_integral(integral_col, active_col)) \
            .otherwise(mean_sum(sum_col, count_col))


def is_finite(c: Column) -> Column:
    return ~F.isnan(c) & (F.abs(c) != float("inf"))
