from .aggregate import aggregate_auto, aggregate_exact, aggregate_telescope
from .retrieve import (retrieve_flex, retrieve_min_samples, retrieve_raw,
                       retrieve_rows, rows_from_timevalues, smooth_raw)
from .rollup import (build_level1, build_levels, build_next_level,
                     materialize_levels, lagged,
                     raw_range, segment_pieces)
from .scopes import (RAW_DEFAULT, ROW_DEFAULT, IntervalScope, Scope,
                     filter_level, filter_raw)
from .stats import (count_scoped, count_total, count_via_levels,
                    last_point, metric_range)

__all__ = [
    "aggregate_auto", "aggregate_exact", "aggregate_telescope",
    "retrieve_flex", "retrieve_min_samples", "retrieve_raw", "retrieve_rows",
    "rows_from_timevalues", "smooth_raw",
    "build_level1", "build_levels", "build_next_level",
    "materialize_levels", "lagged",
    "raw_range", "segment_pieces",
    "RAW_DEFAULT", "ROW_DEFAULT", "IntervalScope", "Scope",
    "filter_level", "filter_raw",
    "count_scoped", "count_total", "count_via_levels", "last_point",
    "metric_range",
]
