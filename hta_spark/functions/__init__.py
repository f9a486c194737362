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


def mean_sum(sum_col: Column = F.col("sum"),
             count_col: Column = F.col("count")) -> Column:
    """sum/count; NaN when count == 0 (double 0/0)."""
    return sum_col / count_col.cast("double")


def mean_integral(integral_col: Column = F.col("integral"),
                  active_col: Column = F.col("active_time")) -> Column:
    return integral_col / active_col.cast("double")


def mean(sum_col: Column = F.col("sum"), count_col: Column = F.col("count"),
         integral_col: Column = F.col("integral"),
         active_col: Column = F.col("active_time")) -> Column:
    """Prefer integral mean when active_time > 0 (types.hpp:81-88)."""
    return F.when(active_col > 0, mean_integral(integral_col, active_col)) \
            .otherwise(mean_sum(sum_col, count_col))


def is_finite(c: Column) -> Column:
    return ~F.isnan(c) & (F.abs(c) != float("inf"))
