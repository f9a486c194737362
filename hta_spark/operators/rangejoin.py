"""Interval containment join as a grid-bucketed equi-join.

``point IN [begin, end)`` has no equality key, so Spark's planner can only
offer a (broadcast) nested-loop join — O(|L|·|R|) comparisons, a
scale-killer the moment neither side fits in memory.  The classic fix
(DB2's grid files, Databricks' range-join binning) recovers a shuffle
hash join: quantize time into fixed cells, explode each interval into the
cells it covers, compute each point's single cell, equi-join on the cell,
then apply the exact predicate.  Work becomes
O(|L| + |R| · cells_per_interval + matches): linear, shuffled on a real
key, AQE-skew-splittable.

Each (point, interval) match is found in EXACTLY one cell — the point's
own — so no post-join dedup is needed (the correctness subtlety that makes
naive grid joins emit duplicates).

The reference has no join surface at all; this is part of the generic
relational layer (SURVEY.md §2.4) the Spark engine adds, implemented the
way a 100 TB engine must.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["range_join_points"]


def range_join_points(points: DataFrame, intervals: DataFrame,
                      point_col: str, begin_col: str, end_col: str,
                      cell: int,
                      extra_keys: list[str] | None = None) -> DataFrame:
    """INNER-join ``points`` to every interval with
    ``begin <= point < end`` (half-open, matching the engine's scope
    algebra) via grid cells of ``cell`` time units.  (Outer variants are
    deliberately unsupported: the post-join exact predicate would
    silently drop null-extended rows, turning any outer join back into
    an inner one — compose an anti-join against this result instead.)

    ``cell`` should be on the order of the typical interval length: much
    smaller multiplies the interval explosion, much larger multiplies the
    false-candidate filter work.  ``extra_keys`` co-partitions the join on
    additional equality columns (e.g. a tenant id) for free.

    Empty/inverted intervals (``end <= begin``) match nothing under the
    half-open semantics and are dropped BEFORE the cell explosion —
    F.sequence would otherwise step backwards and emit a descending cell
    list (unbounded work for corrupt intervals, phantom cells for empty
    ones).

    All columns of both inputs survive (same-name collisions are the
    caller's problem, as with any join).
    """
    keys = list(extra_keys or [])
    cell = int(cell)

    def _cell_of(col):
        # exact int64 floor division (chrono.col_bucket's construction):
        # a double `/` would round ~1e18 ns numerators into the 53-bit
        # mantissa and could shift a cell index off the semantic grid
        off = col.cast("long")
        return F.call_function(
            "div", off - F.pmod(off, F.lit(cell)), F.lit(cell))

    p_cell = _cell_of(F.col(point_col)).alias("_cell")
    # cells covered by [begin, end): floor(b/c) .. floor((e-1)/c)
    covered = F.sequence(
        _cell_of(F.col(begin_col)),
        _cell_of(F.col(end_col) - F.lit(1)))
    iv = (intervals
          .filter(F.col(end_col).cast("long")
                  > F.col(begin_col).cast("long"))
          .withColumn("_cell", F.explode(covered)))
    pt = points.withColumn("_cell", p_cell)
    cond = (F.col(point_col).cast("long")
            >= F.col(begin_col).cast("long")) & \
           (F.col(point_col).cast("long") < F.col(end_col).cast("long"))
    return (pt.join(iv, ["_cell", *keys], "inner")
            .filter(cond)
            .drop("_cell"))
