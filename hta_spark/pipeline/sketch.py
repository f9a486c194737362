"""Deterministic, mergeable sketches: KMV distinct-count and fixed-width
histogram quantiles.

Spark's ``approx_count_distinct`` (HLL++) and ``approx_percentile`` are
engine-private: their estimates are not reproducible in another engine, so
they cannot be oracle-gated and two pipelines (e.g. Spark batch + a DuckDB
spot-check) disagree on the same data.  These sketches are built from
md5 hashes and integer bin arithmetic only, so ANY engine computes the
same estimate bit-for-bit — the property that makes a 100 TB metrics
pipeline auditable.

Both are classic mergeable summaries:

- **KMV (k-minimum values)** [Bar-Yossef et al. 2002]: the sketch of a set
  is its k smallest hash values; union-merge = k smallest of the
  concatenation; estimate = (k-1) * H / h_k for hash range H.  Spark's
  WindowGroupLimit optimization executes exactly that merge: the
  ``row_number() <= k`` filter is pushed to a per-partition top-k before
  the shuffle, so each task ships at most k hashes per group — the sketch
  IS the shuffle payload.
- **Fixed-width histogram**: per-bin counts add across partitions (plain
  partial/final hash agg); quantiles come from the cumulative counts with
  linear interpolation inside the hit bin.  Values are scaled to integers
  first so bin assignment has no float-boundary ambiguity.

The reference has no approximate surface (its aggregates are exact); this
extends the pipeline surface for cardinality / distribution monitoring at
scales where exact distincts are themselves a cost center.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import md5_long

__all__ = ["kmv_distinct", "hist_quantiles", "hist_quantiles_grouped",
           "hist_width", "hist_bin_col", "hist_counts_to_quantiles"]

_H = 2.0 ** 60  # md5_long hash range (15 hex chars)


def kmv_distinct(df: DataFrame, value_col: str, group_cols: list[str],
                 k: int = 64, seed: str = "kmv") -> DataFrame:
    """Per-group KMV distinct estimate next to the kth-minimum hash.

    Output: ``group_cols..., n_kept, kth_hash, kmv_distinct`` where
    ``kmv_distinct`` is exact (= n_kept) when the group has < k distinct
    values and ``(k-1) * 2^60 / h_k`` otherwise.  Deterministic in the
    data only — partitioning, task order and engine cannot change it.

    NULL values are excluded, matching ``count_distinct`` (a null would
    otherwise hash to NULL, sort first in Spark's window but last in
    DuckDB's, and skew n_kept vs the exact count).
    """
    h = md5_long(F.col(value_col).cast("string"), seed)
    hashed = (df.select(*group_cols, F.col(value_col))
              .filter(F.col(value_col).isNotNull())
              .distinct()
              .select(*group_cols, h.alias("_h")))
    w = Window.partitionBy(*group_cols).orderBy("_h")
    kept = (hashed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= F.lit(int(k))))
    agg = kept.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.max("_h").alias("kth_hash"))
    est = F.when(
        F.col("n_kept") < F.lit(int(k)),
        F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_H) / F.col("kth_hash").cast("double"))
    return agg.withColumn("kmv_distinct", est)


def hist_width(lo: int, hi: int, n_bins: int) -> int:
    """The shared bin-width rule: ``max(1, floor((hi-lo)/n_bins) + 1)``
    on SCALED integer bounds — one definition for the batch aggregate,
    the explicit-bounds path, the streaming state fn and any oracle."""
    return max(1, (int(hi) - int(lo)) // int(n_bins) + 1)


def hist_bin_col(value_col: str, lo: int, hi: int, n_bins: int,
                 scale: int) -> Column:
    """Bin index of a value under EXPLICIT scaled bounds, clamped to the
    edge bins (out-of-range values land in bin 0 / n_bins-1) — computed
    JVM-side so batch and streaming assign identically."""
    w = hist_width(lo, hi, n_bins)
    v = F.round(F.col(value_col).cast("double") * F.lit(int(scale)))\
        .cast("long")
    # exact int64 `div`, never a double division (ADVICE r4): scaled
    # values beyond 2^53 would misbin through a double.  `div` truncates
    # toward zero where floor-div rounds down, but the two differ only
    # for NEGATIVE numerators, which the edge clamp below sends to bin 0
    # under either convention.
    raw_bin = F.call_function("div", v - F.lit(int(lo)), F.lit(w))
    # guard BEFORE clamping: greatest/least IGNORE nulls, so an
    # unguarded clamp would silently map NULL values to bin 0 instead of
    # propagating NULL for the callers' isNotNull exclusion filters
    return F.when(
        v.isNotNull(),
        F.least(F.greatest(raw_bin, F.lit(0).cast("long")),
                F.lit(int(n_bins) - 1).cast("long")))


def hist_quantiles(df: DataFrame, value_col: str,
                   qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                   n_bins: int = 64, scale: int = 100,
                   bounds: tuple[int, int] | None = None) -> DataFrame:
    """Quantile estimates from a fixed-width integer histogram.

    ``scale`` lifts values to integers (100 = cent precision) so the bin
    of a value is pure integer arithmetic; the only float op is the final
    interpolation ``edge + width * (target - below) / in_bin`` — one
    multiply and one divide, identical in any IEEE engine.

    Output: one row per q — ``q, target_rank, est`` (est back on the
    original value scale).  Two scans of the column (bounds, then counts)
    by default; pass ``bounds=(lo, hi)`` in SCALED integer units to skip
    the bounds pass entirely (ONE scan — the 100 TB shape when bounds are
    known a priori; out-of-range values clamp to the edge bins).
    """
    bad = [q for q in qs if not 0.0 < float(q) <= 1.0]
    if bad:
        # q=0 has no rank-1-satisfying bin (target_rank 0 < every _cum)
        # and q>1 exceeds the data — both would silently drop rows
        raise ValueError(f"quantiles must be in (0, 1], got {bad}")
    if bounds is not None:
        return _hist_quantiles_fixed(df, value_col, qs, n_bins, scale,
                                     int(bounds[0]), int(bounds[1]))
    v = F.round(F.col(value_col).cast("double") * F.lit(int(scale)))\
        .cast("long")
    # NULL values are excluded (count/percentile semantics; a NULL bin
    # would inflate _total, sort FIRST in Spark's window but LAST in
    # DuckDB's, and diverge from the NaN-dropping streaming twin)
    ints = df.select(v.alias("_v")).filter(F.col("_v").isNotNull())
    bounds = ints.agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"),
                      F.count("*").cast("long").alias("_total"))
    # exact int64 `div`, never a double division (ADVICE r4): totals and
    # spans beyond 2^53 would misbin through a double.  Numerators are
    # non-negative here (_lo is the min), so trunc-div == floor-div.
    width = F.greatest(
        F.lit(1).cast("long"),
        F.call_function("div", F.col("_hi") - F.col("_lo"),
                        F.lit(int(n_bins))) + F.lit(1))
    binned = (ints.crossJoin(F.broadcast(bounds))
              .select(F.call_function("div", F.col("_v") - F.col("_lo"),
                                      width).alias("_bin"),
                      "_lo", (width).alias("_w"), "_total")
              .groupBy("_bin", "_lo", "_w", "_total")
              .agg(F.count("*").cast("long").alias("_n")))
    # partitionBy(_total): the cumulative window runs over the AGGREGATED
    # frame (<= n_bins rows), so one partition is fine — but an empty
    # partition spec makes WindowExec emit a scale WARN per run, and the
    # bench tail is now the parse surface.  ``_total`` is constant across
    # the frame (one group, same plan) yet a genuine attribute, so the
    # optimizer can't fold it away like a literal key; the broadcast
    # self-join alternative would execute the full-data aggregate twice.
    return _quantiles_from_binned(binned, ["_total"], qs, scale, [])


def _quantiles_from_binned(binned: DataFrame, part_cols: list[str],
                           qs: tuple[float, ...], scale: int,
                           out_cols: list[str]) -> DataFrame:
    """The ONE rank/interpolation definition shared by every batch path
    (global, fixed-bounds, grouped; the streaming twin replays it in
    Python via :func:`hist_counts_to_quantiles`).

    ``binned``: ``part_cols..., _bin, _lo, _w, _total, _n`` — cumulates
    per partition key, targets ``ceil(q * _total)`` as exact integer
    ranks, interpolates inside the hit bin with one float multiply and
    one divide.  ``out_cols``: caller columns to carry into the result
    (the group keys; empty for the global paths)."""
    wcum = Window.partitionBy(*part_cols).orderBy("_bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = (binned.withColumn("_cum", F.sum("_n").over(wcum))
           .withColumn("_below", F.col("_cum") - F.col("_n")))
    targets = F.broadcast(binned.sparkSession.createDataFrame(
        [(float(q), int(round(float(q) * 1_000_000))) for q in qs],
        "q double, _qm long"))
    # target rank = ceil(q * total) in EXACT integer arithmetic: q scaled
    # to micro-units, ceil-div by 10^6.  A double ceil(total * q) shifts
    # the rank by one whenever the product rounds up across an integer
    # (e.g. 10^6 * 0.1 = 100000.00000000001 -> rank 100001; review r4).
    # Exact for total < ~9.2e12 (int64 headroom over the 10^6 scale).
    tr = F.call_function(
        "div", F.col("_total") * F.col("_qm") + F.lit(999_999),
        F.lit(1_000_000))
    hit = (cum.crossJoin(targets)
           .withColumn("target_rank", tr)
           .filter((F.col("_below") < F.col("target_rank"))
                   & (F.col("target_rank") <= F.col("_cum"))))
    edge = (F.col("_lo") + F.col("_bin") * F.col("_w")).cast("double")
    interp = edge + F.col("_w").cast("double") * (
        (F.col("target_rank") - F.col("_below")).cast("double")
        / F.col("_n").cast("double"))
    return (hit.select(*out_cols, F.col("q"), F.col("target_rank"),
                       (interp / F.lit(float(scale))).alias("est"))
            .orderBy(*out_cols, "q"))


def _hist_quantiles_fixed(df: DataFrame, value_col: str,
                          qs: tuple[float, ...], n_bins: int, scale: int,
                          lo: int, hi: int) -> DataFrame:
    """Explicit-bounds histogram quantiles: ONE data scan (one grouped
    bin count), then windows over the <= n_bins aggregated rows.  The
    windows partition by a constant ATTRIBUTE obtained from a broadcast
    1-row range frame — a literal key would be constant-folded away and
    WindowExec would warn about the (intentional, 64-row) single
    partition."""
    w = hist_width(lo, hi, n_bins)
    binned = (df.select(hist_bin_col(value_col, lo, hi, n_bins, scale)
                        .alias("_bin"))
              .filter(F.col("_bin").isNotNull())     # NULL values excluded
              .groupBy("_bin").agg(F.count(F.lit(1)).cast("long")
                                   .alias("_n")))
    one = df.sparkSession.range(1).select(F.col("id").alias("_one"))
    b1 = (binned.crossJoin(F.broadcast(one))
          .withColumn("_total", F.sum("_n").over(Window.partitionBy("_one")))
          .withColumn("_lo", F.lit(int(lo)))
          .withColumn("_w", F.lit(int(w))))
    return _quantiles_from_binned(b1, ["_one"], qs, scale, [])


def hist_counts_to_quantiles(counts: list[int], lo: int, w: int,
                             qs: tuple[float, ...],
                             scale: int) -> list[tuple[float, int, float]]:
    """Python twin of the interpolation (for the streaming state fn):
    identical EXACT integer target ranks (micro-scaled q, ceil-div) and
    the identical single float-multiply/divide, so stream == batch
    bit-for-bit."""
    total = sum(counts)
    out = []
    for q in qs:
        qm = int(round(float(q) * 1_000_000))
        tr = (total * qm + 999_999) // 1_000_000
        below = 0
        for b, n in enumerate(counts):
            if n == 0:
                continue
            cum = below + n
            if below < tr <= cum:
                edge = float(lo + b * w)
                est = (edge + float(w) * float(tr - below) / float(n)) \
                    / float(scale)
                out.append((float(q), tr, est))
                break
            below = cum
    return out


def hist_quantiles_grouped(df: DataFrame, value_col: str,
                           group_cols: list[str],
                           qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                           n_bins: int = 64, scale: int = 100) -> DataFrame:
    """Per-GROUP :func:`hist_quantiles` — the shape a monitoring pipeline
    actually runs (p50/p99 per metric/tenant/event type).

    Same integer-bin arithmetic per group; group-local bounds come from
    one grouped aggregate broadcast back, the per-bin counts from one
    grouped count, and the cumulative window partitions by the group
    (a genuinely partitioned window — parallel across groups, bounded by
    ``n_bins`` rows within one).  Output:
    ``group_cols..., q, target_rank, est``."""
    bad = [q for q in qs if not 0.0 < float(q) <= 1.0]
    if bad:
        raise ValueError(f"quantiles must be in (0, 1], got {bad}")
    v = F.round(F.col(value_col).cast("double") * F.lit(int(scale)))\
        .cast("long")
    ints = df.select(*group_cols, v.alias("_v")) \
        .filter(F.col("_v").isNotNull())             # NULL values excluded
    bounds = ints.groupBy(*group_cols).agg(
        F.min("_v").alias("_lo"), F.max("_v").alias("_hi"),
        F.count(F.lit(1)).cast("long").alias("_total"))
    # exact int64 `div` (same convention/rationale as hist_quantiles)
    width = F.greatest(
        F.lit(1).cast("long"),
        F.call_function("div", F.col("_hi") - F.col("_lo"),
                        F.lit(int(n_bins))) + F.lit(1))
    binned = (ints.join(F.broadcast(bounds), group_cols)
              .select(*group_cols,
                      F.call_function("div", F.col("_v") - F.col("_lo"),
                                      width).alias("_bin"),
                      "_lo", width.alias("_w"), "_total")
              .groupBy(*group_cols, "_bin", "_lo", "_w", "_total")
              .agg(F.count(F.lit(1)).cast("long").alias("_n")))
    return _quantiles_from_binned(binned, group_cols, qs, scale,
                                  list(group_cols))
