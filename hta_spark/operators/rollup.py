"""Hierarchical rollup build — the engine's core transform.

Re-expresses the reference's insert cascade (W1-W4 in SURVEY.md §2.1;
/root/reference/src/metric.cpp:510-603, /root/reference/src/level.hpp:38-67,
/root/reference/src/aggregate.cpp:37-59) as one declarative Spark pipeline.

Semantics (LAST / sample-and-hold, ns-exact):
- every point ``(t_i, v_i)`` contributes ``count=1, sum=v, min=max=v`` to the
  bucket containing ``t_i``;
- its *segment* ``[t_{i-1}, t_i)`` carries value ``v_i`` and contributes
  ``integral = v * overlap_ns``, ``active_time = overlap_ns`` and
  ``min=max=v`` (count=0, sum=0) to every bucket it overlaps — this is the
  reference's boundary-splitting partial aggregate
  (/root/reference/src/metric.cpp:537-558: ``Aggregate{v, v, 0, 0,
  v*partial_ns, partial_duration}``);
- the first point of a metric has an empty segment (``Level.time_current`` is
  initialized to the first point's own time, /root/reference/src/metric.cpp:533-535).

Only *closed* intervals are materialized, matching the reference's level
files: bucket ``k`` of width ``d`` is closed iff ``(k+1)*d <= t_last`` (the
open tail interval lives in the Level state, not storage).  At every level
``m`` the stored buckets are exactly ``floor(t_first/d_m) <= k <
floor(t_last/d_m)`` — higher levels are pure monoid re-groups of the level
below (/root/reference/src/metric.cpp:562-603).

Scale notes:
- the lag window shuffles once on ``metric``; the grouped aggregation is
  partial-aggregated map-side, so the second shuffle moves ~|level-1| rows
  (≈ raw/30 with recommended params), not raw rows;
- each following level is a single groupBy over a 10x smaller input — total
  build cost ≈ 1.1x one raw scan (the reference's ~11% overhead figure,
  /root/reference/README.md "Planning the aggregation parameters");
- a single giant metric makes ``Window.partitionBy(metric)`` skew; for that
  shape use bucketed time-ranges per metric (salt on
  ``floor(time/coarse)`` and fix up the per-salt first row, which only needs
  the neighbouring salt's last point).  The segment explode is bounded by the
  same dense-row count the reference itself would write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..meta import Meta
from ..compat import default_parallelism

__all__ = [
    "raw_range",
    "lagged",
    "segment_pieces",
    "build_level1",
    "build_next_level",
    "build_levels",
    "materialize_levels",
]


#: auto-salting aims for at most this many rows per window task; a metric
#: whose series exceeds it gets its window salted into time chunks
AUTO_SALT_TARGET_ROWS = 1_000_000


def auto_salt_chunks(raw: DataFrame) -> int | None:
    """Skew decision from per-metric row-count stats: returns the chunk
    count for :func:`lagged_salted` when the largest metric's series would
    overfill one window task (> ``AUTO_SALT_TARGET_ROWS`` rows), else None.

    Cost: one map-side-combined count aggregation over the input.  When
    the build also needs the ranges frame, use :func:`plan_build` instead
    — it derives BOTH the decision and a literal ranges frame from one
    collected stats pass, so the raw lineage executes once, not twice.
    """
    mx_row = (raw.groupBy("metric").agg(F.count(F.lit(1)).alias("n"))
              .agg(F.max("n").alias("mx")).collect())
    mx = mx_row[0]["mx"] if mx_row else None
    return _chunks_for(mx, raw)


def _chunks_for(mx: int | None, raw: DataFrame) -> int | None:
    if not mx or mx <= AUTO_SALT_TARGET_ROWS:
        return None
    par = default_parallelism(raw.sparkSession)
    need = -(-mx // AUTO_SALT_TARGET_ROWS)          # ceil
    # 4x the parallelism, not 1x (r15, guide §2.5): hashing exactly
    # `par` chunk keys into `par` shuffle partitions is balls-in-bins —
    # ~1/e of the partitions draw no chunk and the busiest carry 2-3,
    # so the window stage runs at ~60% effective parallelism with 2x
    # stragglers.  At >=4 keys/partition the expected imbalance drops
    # to ~±25% (measured on the 16.7M single-metric build: the salted
    # window pass 3.06 s -> 1.80 s at 32 cores).  Scale-adaptive: the
    # floor tracks default_parallelism on any cluster size; the 256 cap
    # bounds the boundary-repair broadcast.
    return int(min(256, max(need, min(4 * par, 256))))


def raw_stats(raw: DataFrame) -> DataFrame:
    """Per-metric (t_first, t_last, n): :func:`raw_range` plus row count —
    the one aggregate the build planner needs."""
    return raw.groupBy("metric").agg(
        F.min("time").alias("t_first"), F.max("time").alias("t_last"),
        F.count(F.lit(1)).alias("n"))


def plan_build(raw: DataFrame) -> tuple[int | None, DataFrame]:
    """One collected stats pass -> (salt decision, LITERAL ranges frame).

    The skew decision needs a driver-side value, so auto-salting must run
    an action; folding min/max into the same aggregate and re-emitting the
    collected rows as a literal frame means the (possibly expensive) raw
    lineage executes exactly once for all planner needs — the lazy
    ``raw_range`` broadcast subtree would re-execute it inside the build
    job.  Driver state is metric-count-sized (the repo's planner-state
    convention; 10^4-metric smoke-tested)."""
    rows = raw_stats(raw).collect()
    spark = raw.sparkSession
    schema = "metric string, t_first long, t_last long"
    ranges = spark.createDataFrame(
        [(r["metric"], r["t_first"], r["t_last"]) for r in rows], schema)
    mx = max((r["n"] for r in rows), default=0)
    return _chunks_for(mx, raw), ranges


def _resolve_salt(raw: DataFrame,
                  salt_chunks: int | str | None) -> int | None:
    if salt_chunks == "auto":
        return auto_salt_chunks(raw)
    return salt_chunks


def raw_range(raw: DataFrame) -> DataFrame:
    """Per-metric (t_first, t_last) — the reference's ``Metric::range()``
    (/root/reference/src/metric.cpp:441-445)."""
    return raw.groupBy("metric").agg(
        F.min("time").alias("t_first"), F.max("time").alias("t_last")
    )


def lagged(raw: DataFrame) -> DataFrame:
    """Attach ``prev_time`` (strictly-earlier neighbour) per metric.

    One shuffle on ``metric`` + in-partition sort; feeds both the level-1
    build and the raw-exact aggregate.  For a single giant metric this puts
    the whole series through one task — use :func:`lagged_salted` there.
    """
    w = Window.partitionBy("metric").orderBy("time")
    return raw.withColumn("prev_time", F.lag("time").over(w))


def chunk_index(time_col: Column, chunks: int) -> Column:
    """Contiguous time-slice index in ``[0, chunks)`` over a joined
    (t_first, t_last) range — the salting key shared by the skew-proof
    window paths.  All rows with the same timestamp land in the same
    chunk (the index is a pure function of time), which is what makes
    chunk-local window logic repairable/exact."""
    span = F.col("t_last") - F.col("t_first")
    width = F.greatest(F.call_function("div", span, F.lit(chunks)), F.lit(1))
    return F.least(F.call_function("div", time_col - F.col("t_first"), width),
                   F.lit(chunks - 1).cast("long"))


def lagged_salted(raw: DataFrame, chunks: int = 256,
                  ranges: DataFrame | None = None) -> DataFrame:
    """Skew-proof ``prev_time``: salt each metric's time range into
    ``chunks`` contiguous slices, window within (metric, slice), and repair
    each slice's first row from the previous *non-empty* slice's last
    timestamp (a slice-count-sized aggregate + broadcast join).

    Identical output to :func:`lagged` (equivalence-tested); turns the
    one-task-per-metric sort into ``chunks`` parallel tasks, which is the
    difference between a single-threaded and a cluster-wide build when one
    metric dominates.  Cost: one extra tiny aggregate + broadcast join.
    """
    ranges = ranges if ranges is not None else raw_range(raw)
    j = raw.join(F.broadcast(ranges), "metric")
    df = (j.withColumn("_c", chunk_index(F.col("time"), chunks))
          .drop("t_first", "t_last"))

    # boundary frame from the PRE-window frame: chunk_last only needs
    # max(time) per slice, so deriving it before the window keeps the
    # sorted/windowed subtree single-consumer (computing it from the
    # windowed frame makes Spark sort the entire input twice — measured
    # 2x on the 16.7M-point single-metric build)
    chunk_last = df.groupBy("metric", "_c").agg(F.max("time").alias("_cl"))
    w_c = Window.partitionBy("metric").orderBy("_c")
    boundary = chunk_last.select(
        "metric", "_c", F.lag("_cl").over(w_c).alias("_prev_last"))

    w_in = Window.partitionBy("metric", "_c").orderBy("time")
    return (df.withColumn("_lag_in", F.lag("time").over(w_in))
            .join(F.broadcast(boundary), ["metric", "_c"], "left")
            .withColumn("prev_time", F.coalesce("_lag_in", "_prev_last"))
            .drop("_c", "_lag_in", "_prev_last"))


def segment_pieces(
    lagged_df: DataFrame,
    interval: int,
    origin: int = 0,
    clip_begin: int | None = None,
    clip_end: int | None = None,
) -> DataFrame:
    """Explode each point + its segment into per-bucket contribution pieces.

    Returns columns: ``metric, k (bucket index), value, cnt (0/1), dur (ns)``.

    ``origin``/``clip_*`` generalize the transform: the level build uses
    ``origin=0`` and no clipping; ``retrieve_flex``'s raw smoothing
    (/root/reference/src/metric.cpp:259-311) uses ``origin=clip_begin=begin``
    and ``clip_end=end``.  Faithful smoothing quirks reproduced here:

    - a missing predecessor is initialized to ``begin`` (the reference's
      ``previous_tp = min(begin, first_point)``), so the first point
      back-fills to the query begin;
    - a segment entering from before ``begin`` is *not* clipped: its
      pre-begin overhang folds into bucket 0 (the reference's skip loop
      leaves ``previous_tp`` at the last pre-begin point and the first
      consumed point is weighted from there, metric.cpp:265-272,289);
    - segments are clipped at ``end`` (the inner loop never consumes a point
      ``>= current_end``; partials stop at ``min(current_begin + interval,
      end)``, metric.cpp:286,299-306).
    """
    t = F.col("time")
    v = F.col("value")
    prev = F.col("prev_time")
    if clip_begin is not None:
        # reference: previous_tp starts at min(begin, first point time)
        prev = F.coalesce(prev, F.least(F.lit(clip_begin), t))

    seg_begin = prev
    seg_end = t if clip_end is None else F.least(t, F.lit(clip_end))

    o = F.lit(origin)
    d = F.lit(interval)

    def bucket(x: Column) -> Column:
        # exact int64 floor-division (see chrono.col_bucket: double division
        # can truncate the quotient off-by-one at 1e18 ns magnitudes)
        off = x - o
        return F.call_function("div", off - F.pmod(off, d), d)

    if clip_begin is None and clip_end is None:
        # Hot path (the level build): the point's bucket ``kp`` is always
        # the last bucket of its segment's sequence (the segment ends AT
        # the point), so one ``sequence(k_start, kp)`` covers both the
        # count piece (k == kp) and every overlap piece — no
        # array-of-struct assembly and ~half the exploded rows of the
        # general two-array form.  Piece-for-piece the grouped sums are
        # identical: the bucket that used to get a (cnt=1, dur=0) point
        # piece plus a (cnt=0, dur=x) segment piece now gets one
        # (cnt=1, dur=x) piece.  A contract-violating non-monotonic pair
        # (prev >= t) degenerates to the point piece alone, exactly like
        # the general path's seg_valid guard.
        kp = bucket(t)
        valid_seg = prev.isNotNull() & (prev < t)
        rows = lagged_df.select(
            "metric",
            t.alias("time"),
            v.alias("value"),
            F.when(valid_seg, prev).alias("sb"),
            kp.alias("kp"),
            F.explode(F.sequence(F.when(valid_seg, bucket(prev))
                                 .otherwise(kp), kp)).alias("k"),
        )
        k = F.col("k")
        dur = F.when(F.col("sb").isNull(), F.lit(0).cast("long")).otherwise(
            F.least(o + (k + 1) * d, F.col("time"))
            - F.greatest(o + k * d, F.col("sb")))
        return rows.select(
            "metric",
            k.alias("k"),
            "value",
            F.when(k == F.col("kp"), 1).otherwise(0).alias("cnt"),
            dur.alias("dur"),
        )

    # count/sum piece: only for points inside [clip_begin, clip_end)
    in_range = F.lit(True)
    if clip_begin is not None:
        in_range = in_range & (t >= F.lit(clip_begin))
    if clip_end is not None:
        in_range = in_range & (t < F.lit(clip_end))
    point_piece = F.when(
        in_range,
        F.array(F.struct(bucket(t).alias("k"), F.lit(1).alias("cnt"))),
    ).otherwise(F.array().cast("array<struct<k:long,cnt:int>>"))

    # integral pieces: one per overlapped bucket of the segment, bucket
    # indices clamped to >= 0 when folding (pre-begin overhang -> bucket 0).
    k_lo = bucket(seg_begin)
    k_hi = bucket(seg_end - F.lit(1))
    if clip_begin is not None:
        k_lo = F.greatest(k_lo, F.lit(0).cast("long"))
        k_hi = F.greatest(k_hi, F.lit(0).cast("long"))
        seg_valid = seg_begin.isNotNull() & (seg_begin <= seg_end) & (
            seg_end >= F.lit(origin)) & (t >= F.lit(clip_begin))
    else:
        seg_valid = seg_begin.isNotNull() & (seg_begin < seg_end)
    # guard: never let F.sequence descend (a contract-violating duplicate
    # timestamp on a bucket boundary would otherwise emit a [k, k-1] array
    # whose spurious piece pollutes the previous bucket's min/max)
    k_hi = F.greatest(k_hi, k_lo)
    seg_pieces = F.when(
        seg_valid,
        F.transform(
            F.sequence(k_lo, k_hi),
            lambda k: F.struct(k.alias("k"), F.lit(0).alias("cnt")),
        ),
    ).otherwise(F.array().cast("array<struct<k:long,cnt:int>>"))

    pieces = lagged_df.select(
        "metric",
        t.alias("time"),
        v.alias("value"),
        seg_begin.alias("sb"),
        seg_end.alias("se"),
        F.explode(F.concat(point_piece, seg_pieces)).alias("p"),
    )
    k = F.col("p.k")
    if clip_begin is not None:
        # pre-begin overhang folds into bucket 0 (the smoothing quirk,
        # metric.cpp:265-272,289) — matched by the k>=0 clamp above
        lower = F.when(k == 0, F.least(o, F.col("sb"))).otherwise(o + k * d)
    else:
        # clip_end-only: negative k pieces are emitted unclamped, so
        # bucket 0 must NOT also absorb the pre-origin overhang (it would
        # double-count what the k<0 pieces already carry)
        lower = o + k * d
    dur = F.when(
        F.col("p.cnt") == 1, F.lit(0).cast("long")
    ).otherwise(
        F.least(o + (k + 1) * d, F.col("se")) - F.greatest(lower, F.col("sb"))
    )
    return pieces.select(
        "metric",
        k.alias("k"),
        "value",
        F.col("p.cnt").alias("cnt"),
        dur.alias("dur"),
    )


def micro_value(value: Column) -> Column:
    """``round(value * 1e6)`` as BIGINT — the micro-unit quantization used by
    the order-free ``exact=True`` accumulation.  For |value| << 2^53/1e6 the
    double product is correctly rounded, so every engine (Spark, DuckDB, ...)
    computes the identical integer; after that all arithmetic is exact."""
    return F.round(value * F.lit(1e6), 0).cast("long")


def _merge_pieces(pieces: DataFrame, interval: int, origin: int = 0,
                  exact: bool = False) -> DataFrame:
    """groupBy (metric, bucket) with the Aggregate monoid
    (/root/reference/src/aggregate.cpp:50-59) — Spark's partial+final hash
    aggregation IS ``Aggregate::operator+=``.

    ``exact=True``: order-free integer accumulation for the oracle-gated
    queries.  ``sum`` becomes BIGINT in micro-value units and ``integral``
    DECIMAL(38,0) in micro-value*ns: values are quantized once via
    :func:`micro_value` (deterministic across engines), then summed with
    exact associative integer arithmetic — bit-reproducible regardless of
    partition/summation order.  Assumes |value| <= ~1e9 (documented
    convention; the double default path has no such bound and matches the
    reference's engine-internal doubles).
    """
    if exact:
        mv = micro_value(F.col("value"))
        sum_expr = F.sum(F.when(F.col("cnt") == 1, mv)
                         .otherwise(F.lit(0))).cast("long").alias("sum")
        integral_expr = F.sum(
            mv.cast("decimal(38,0)") * F.col("dur")).alias("integral")
    else:
        sum_expr = F.sum(F.when(F.col("cnt") == 1, F.col("value"))
                         .otherwise(0.0)).alias("sum")
        integral_expr = F.sum(F.col("value") * F.col("dur")).alias("integral")
    return (
        pieces.groupBy("metric", "k")
        .agg(
            F.min("value").alias("minimum"),
            F.max("value").alias("maximum"),
            sum_expr,
            F.sum("cnt").cast("long").alias("count"),
            integral_expr,
            F.sum("dur").cast("long").alias("active_time"),
        )
        .select(
            "metric",
            (F.lit(origin) + F.col("k") * F.lit(interval)).alias("interval_start"),
            "minimum", "maximum", "sum", "count", "integral", "active_time",
        )
    )


def build_level1(raw: DataFrame, interval: int,
                 ranges: DataFrame | None = None,
                 salt_chunks: int | str | None = "auto",
                 exact: bool = False) -> DataFrame:
    """Level-1 rollup (closed buckets only) from the raw table.

    Equivalent to replaying ``Metric::insert`` (/root/reference/src/metric.cpp:510-560)
    over the whole series, keeping only closed intervals.
    ``salt_chunks``: parallelize the per-metric window via
    :func:`lagged_salted` (needed when few metrics carry most rows).  The
    default ``"auto"`` measures per-metric skew and salts only when a
    metric's series would overfill one window task
    (:func:`auto_salt_chunks`); pass an int to force, None to disable.
    ``exact``: decimal sum/integral accumulation (see :func:`_merge_pieces`);
    higher levels inherit the decimal type through their plain ``sum()``s.
    """
    if salt_chunks == "auto" and ranges is None:
        salt_chunks, ranges = plan_build(raw)
    else:
        ranges = ranges if ranges is not None else raw_range(raw)
        salt_chunks = _resolve_salt(raw, salt_chunks)
    lg = (lagged_salted(raw, salt_chunks, ranges) if salt_chunks
          else lagged(raw))
    pieces = segment_pieces(lg, interval)
    agg = _merge_pieces(pieces, interval, exact=exact)
    return (
        agg.join(F.broadcast(ranges), "metric")
        .filter(F.col("interval_start") + F.lit(interval) <= F.col("t_last"))
        .drop("t_first", "t_last")
    )


def build_levels_counts(raw: DataFrame, meta: Meta,
                        ranges: DataFrame | None = None,
                        pin_level1: bool = True) -> dict[int, DataFrame]:
    """Counts-only cascade: dict interval_ns -> (metric, interval_start,
    count) with the same closed-bucket row set as :func:`build_levels`.

    For consumers that read ONLY the rollup ``count`` field (the
    telescoped count walk, ``stats.count_via_levels``), the full monoid
    build computes five fields that are thrown away — and the expensive
    parts of the build exist ONLY for those fields: the per-metric lag
    window feeds the segment durations (integral/active_time) and the
    per-segment bucket explode exists to spread min/max/integral across
    overlapped buckets.  A bucket's ``count`` is just the number of
    points inside it, so the counts-only cascade is one map-side-combined
    groupBy per level — zero windows, zero explodes, one shuffle of
    ~|level-1| rows (guide §1.2: don't compute what you throw away).
    Bucket indexing and the closed-bucket filter use the identical
    expressions as the full build, so the row set matches exactly.

    ``pin_level1`` (default on — the counts twin of ``build_levels``'
    ``cache_level1``): eagerly materializes the level-1 count frame
    (~raw/30 rows) so a consumer whose one action unions several level
    branches (the telescoped count walk) reads it once instead of every
    branch re-deriving the level-1 aggregate from raw — racing branches
    inside a single job do not reliably share a lazy cache."""
    ranges = ranges if ranges is not None else raw_range(raw)
    out: dict[int, DataFrame] = {}
    intervals = meta.level_intervals()
    if not intervals:
        return out
    d = intervals[0]
    t = F.col("time")
    off = t - F.lit(0)
    k = F.call_function("div", off - F.pmod(off, F.lit(d)), F.lit(d))
    child = (raw.groupBy("metric", k.alias("k"))
             .agg(F.count(F.lit(1)).cast("long").alias("count"))
             .select("metric", (F.col("k") * F.lit(d)).alias("interval_start"),
                     "count")
             .join(F.broadcast(ranges), "metric")
             .filter(F.col("interval_start") + F.lit(d) <= F.col("t_last"))
             .drop("t_first", "t_last"))
    if pin_level1 and len(intervals) > 1:
        from ..compat import pin
        child = pin(child)
    out[d] = child
    for iv in intervals[:-1]:
        parent = iv * meta.interval_factor
        pk = (F.col("interval_start")
              - F.pmod(F.col("interval_start"), F.lit(parent)))
        child = (child.groupBy("metric", pk.alias("interval_start"))
                 .agg(F.sum("count").cast("long").alias("count"))
                 .join(F.broadcast(ranges), "metric")
                 .filter(F.col("interval_start") + F.lit(parent)
                         <= F.col("t_last"))
                 .drop("t_first", "t_last"))
        out[parent] = child
    return out


def build_next_level(child: DataFrame, child_interval: int, factor: int,
                     ranges: DataFrame) -> DataFrame:
    """Level n+1 from level n — the ``Metric::insert(Row)`` cascade
    (/root/reference/src/metric.cpp:562-603) as a monoid re-group."""
    parent_interval = child_interval * factor
    pk = (F.col("interval_start") - F.pmod(F.col("interval_start"), F.lit(parent_interval)))
    agg = (
        child.groupBy("metric", pk.alias("interval_start"))
        .agg(
            F.min("minimum").alias("minimum"),
            F.max("maximum").alias("maximum"),
            F.sum("sum").alias("sum"),
            F.sum("count").cast("long").alias("count"),
            F.sum("integral").alias("integral"),
            F.sum("active_time").cast("long").alias("active_time"),
        )
    )
    return (
        agg.join(F.broadcast(ranges), "metric")
        .filter(F.col("interval_start") + F.lit(parent_interval) <= F.col("t_last"))
        .drop("t_first", "t_last")
    )


def materialize_levels(levels: dict[int, DataFrame]) -> None:
    """Force the whole cascade dict into cache with TWO jobs instead of
    one per level.

    Per-level ``cache().write(noop)`` loops pay one full job (scheduling,
    broadcast re-execution, shuffle setup) per level even though every
    level above 1 is a trivial re-group of a tiny cached parent — measured
    ~0.5 s/level of pure overhead on the 16.7M-point single-metric build
    (levels 2-4 hold 559k/56k/5.6k rows).  Instead: job 1 materializes
    level 1 (the only expensive lineage) into cache; job 2 forces the
    UNION of all higher levels in one action.  Branches start
    concurrently, so branch k typically recomputes levels 2..k-1 from
    the cached level 1 rather than reading a sibling's not-yet-populated
    cache — worst-case duplicate work is O(n_levels * |level 1|) row
    re-grouping (every branch re-aggregating the cached level 1), which
    for factor-10 ladders is still well under one job's scheduling
    overhead; each level's own ``cache()`` populates as its branch
    computes, so callers keep per-level cached frames."""
    if not levels:
        return
    ivs = sorted(levels)

    def cached(df: DataFrame) -> DataFrame:
        # re-materializing an already-cached dict (bench re-runs, repeated
        # reads) must not re-issue cache(): CacheManager warns "already
        # cached" per call and the warning tail is a parse surface
        return df if df.is_cached else df.cache()

    cached(levels[ivs[0]]).write.mode("overwrite").format("noop").save()
    if len(ivs) == 1:
        return
    rest = None
    for iv in ivs[1:]:
        df = cached(levels[iv]).select(
            F.lit(iv).alias("_iv"), "metric", "interval_start")
        rest = df if rest is None else rest.unionByName(df)
    rest.write.mode("overwrite").format("noop").save()


def build_levels(raw: DataFrame, meta: Meta,
                 cache_level1: bool = True,
                 salt_chunks: int | str | None = "auto") -> dict[int, DataFrame]:
    """Build the whole hierarchy: dict interval_ns -> agg DataFrame.

    Levels cascade (each built from the previous), so materializing level 1
    (cache or a parquet write by the caller) avoids re-scanning raw for every
    level.  ``salt_chunks="auto"`` (default) measures per-metric skew once
    and salts the level-1 window only when a dominant metric needs it.
    """
    if salt_chunks == "auto":
        salt_chunks, ranges = plan_build(raw)
    else:
        ranges = raw_range(raw)
    out: dict[int, DataFrame] = {}
    intervals = meta.level_intervals()
    if not intervals:
        return out
    lvl = build_level1(raw, intervals[0], ranges, salt_chunks=salt_chunks)
    if cache_level1 and len(intervals) > 1:
        lvl = lvl.cache()
    out[intervals[0]] = lvl
    child = lvl
    for iv in intervals[:-1]:
        nxt = build_next_level(child, iv, meta.interval_factor, ranges)
        out[iv * meta.interval_factor] = nxt
        child = nxt
    return out
