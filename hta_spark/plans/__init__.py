"""Query planning layer (SURVEY.md §4).

The reference has no rule-based optimizer; its two planner behaviors are
re-expressed here as driver-side decisions over metric-count-sized
statistics, then handed to Catalyst as ordinary DataFrame plans:

- **rollup selection with empty-level step-down** — pick the largest
  materialized level with ``interval <= resolution bound``, stepping down
  per metric while the scoped range is empty
  (/root/reference/src/metric.cpp:388-409); implemented in
  :func:`hta_spark.operators.retrieve.retrieve_flex` /
  ``_per_metric_level_choice``.
- **telescoping decomposition** — raw ragged edges + per-level aligned
  chunks for exact aggregates (/root/reference/src/metric.cpp:184-227);
  the literal-bounds spec lives in
  :func:`hta_spark.operators.aggregate._telescope_plan` (exported here as
  :func:`telescope_plan`); since round 4 the execution path
  (:func:`hta_spark.operators.aggregate.aggregate_telescope`) carries the
  SAME recurrence as per-metric bound columns
  (``_telescope_bounds``) — fully declarative, no driver collect.

Everything below the decision (pruned scans, partial aggregation, join
strategy) is Catalyst's job — see SCALE.md for the shuffle budgets and
tests/test_plans.py for the plan-shape regressions.
"""

from ..operators.aggregate import _telescope_plan as telescope_plan
from ..operators.aggregate import aggregate_telescope
from ..operators.retrieve import retrieve_flex

__all__ = ["telescope_plan", "aggregate_telescope", "retrieve_flex"]
