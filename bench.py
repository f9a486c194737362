#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full computation, no
driver-side result transfer skewing the numbers).  The level-1 rollup build
is the analog of the reference's insert-throughput bench
(/root/reference/tests/bench.cpp:43-88); rows/s derivable from events size.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_label(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


# -- host-speed canary (VERDICT r6 "What's wrong #3") -------------------------
#
# BENCH_r06's official record showed a phantom 2.8x regression because the
# driver's run landed on a throttled host; nothing in the artifact said so
# by measurement.  Two fixed synthetic kernels now run before and after the
# headline loop and the stdout record carries raw AND host-normalized
# figures, so every future BENCH_r{N}.json is self-certifying:
#
#   normalized = raw * (CANARY_REF / canary_now)
#
# A 2x-throttled host doubles canary_now and halves the correction — the
# normalized figure stays flat while the raw figure moves (demonstrated
# under `taskset`; numbers in SURVEY §13).  CANARY_REF values were measured
# on a quiet box (load < 0.1) at local[32], median of the same protocol.

CANARY_REF = {"single_sec": 0.225, "cores_sec": 1.05}   # quiet-box r7 ref


def _canary_single() -> float:
    """Pinned single-core kernel: 8x (sort + dot) over a fixed 2^21 numpy
    array — pure CPU, no Spark, no I/O.  Median of 5 after one warmup."""
    import numpy as np
    a = np.random.default_rng(7).standard_normal(1 << 21)
    def one() -> float:
        t0 = time.perf_counter()
        s = 0.0
        for _ in range(8):
            b = np.sort(a)
            s += float(b @ b)
        assert s == s
        return time.perf_counter() - t0
    one()                                             # warmup
    return _stats([one() for _ in range(5)])["median"]


def _canary_cores(spark) -> float:
    """Fixed all-cores kernel: one Spark job of exactly 32 tasks, each
    xxhash64+sum over 2^26 rows (whole-stage codegen, zero shuffle, zero
    I/O) — measures effective JVM throughput across the cores the headline
    queries actually use.  Median of 3 after one warmup."""
    from pyspark.sql import functions as F
    # pmod keeps the running sum < 2^46 so the ANSI-mode long sum can't
    # overflow (a raw sum of 2G xxhash64 values does).  Forced through
    # the noop SINK, not collect(): re-collecting one DataFrame reuses the
    # AQE-materialized result stage and measures nothing.
    df = spark.range(0, 32 * (1 << 26), 1, 32).select(
        F.sum(F.pmod(F.xxhash64("id"), F.lit(1 << 20))).alias("h"))

    def one() -> float:
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    one()                                             # warmup (codegen)
    return _stats([one() for _ in range(3)])["median"]


def _host_canary(spark) -> dict:
    return {"single_sec": _canary_single(),
            "cores_sec": _canary_cores(spark)}


def _normalized(value: float, cores_now: float) -> float:
    """Host-speed-normalized seconds: what this measurement would read on
    the reference (quiet) box.  cores_now is the effective canary during
    the run (mean of the before/after samples)."""
    return round(value * (CANARY_REF["cores_sec"] / cores_now), 3)


HEADLINE = [
    "hta_level1_rollup",
    "hta_level2_rollup",
    "hta_aggregate_range",
    "hta_retrieve_extended",
    "hta_smooth3",
    "hta_throttle",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q_sessionize",
    "q_asof_signup",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "dedup_simhash",
    "text_quality",
    "ann_cosine_topk",
]


def _partitionless_windows(plan: str) -> list[str]:
    """Arguments of physical ``Window`` nodes carrying NO partition spec —
    the single-partition scale-killer whose WARN this bench deliberately
    quiets (see main()).  The formatted node prints
    ``Arguments: [functions], [partitionSpec], [orderSpec]`` — but EMPTY
    specs are omitted entirely, so two bracket groups is ambiguous: an
    unpartitioned-but-ordered window prints ``[funcs], [orderSpec]``
    while a partitioned-but-unordered one (e.g. ``count(*) over
    (partition by g)``) prints ``[funcs], [partitionSpec]``.  The two are
    told apart by the sort-direction markers only order specs carry
    (r11: the old <3-groups rule false-positived on every unordered
    partitioned window)."""
    bad = []
    for m in re.finditer(r"\(\d+\) Window\n(?:Input.*\n)?Arguments: (.*)",
                         plan):
        args = m.group(1)
        groups, depth, start = [], 0, 0
        for i, ch in enumerate(args):
            if ch == "[":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(args[start:i + 1])
        if len(groups) >= 3:
            partitioned = groups[1] != "[]"
        elif len(groups) == 2:
            # order specs read "col ASC NULLS FIRST" / "col DESC NULLS
            # LAST" — match the full direction+null-order shape (ADVICE
            # r11: a PARTITION column literally named ASC/DESC, or an
            # expression embedding those words, must not be misread as
            # an order spec)
            partitioned = not re.search(
                r"\b(ASC|DESC) NULLS (FIRST|LAST)\b", groups[1])
        else:
            partitioned = False
        if not partitioned:
            bad.append(args)
    return bad


def _assert_windows_partitioned(df, name: str) -> None:
    """VERDICT r5 item 4: quieting the WindowExec logger (main()) removed
    the stderr tail as a regression tripwire, so every benched REAL-store
    query's plan is asserted clean instead — a future partition-less
    window (how r3's text_vocab scale bug surfaced) now fails the bench
    loudly rather than hiding.  The allowlisted dummy-store builds
    (_insert_throughput/_insert_matrix/_aggregate_crossover) never call
    this: their tiny chunk-boundary windows are partition-less by
    measured design (tools.dummy's folded literal metric)."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    bad = _partitionless_windows(plan)
    if bad:
        raise AssertionError(
            f"partition-less Window in benched query {name!r} "
            f"(would run single-partition at scale): {bad}")


def _insert_throughput(spark, n: int = 2 ** 24) -> dict:
    """The reference's insert-throughput matrix analog
    (/root/reference/tests/bench.cpp:43-88): build the full rollup
    hierarchy over n ramp points at 50 ms spacing with recommended params
    (interval_min = 30x spacing, factor 10).  A single metric is the
    worst-case skew shape — the auto planner salts its window.

    r4 methodology change (VERDICT r3 item 2): the plan is compiled ONCE
    and each timed run recomputes all data from raw with caches cleared.
    Profiling the r3 figure (4.48 s) decomposed it into ~1 s of per-run
    Catalyst re-analysis (build_levels constructs + analyzes the 4-level
    plan tree every call) + ~1.5 s of per-level job overhead (4 actions,
    each re-broadcasting ranges) + ~2 s of actual data path — only the
    last scales with data.  The reference's C++ insert loop is compiled
    ahead of time, so excluding plan compilation measures like for like;
    it is still reported as plan_sec.  materialize_levels() forces the
    cascade in 2 jobs (level 1, then the unioned higher levels)."""
    from hta_spark import Meta
    from hta_spark.operators import build_levels, materialize_levels
    from hta_spark.operators.tools import dummy

    # dummy() is spark.range-backed: already defaultParallelism partitions
    df = dummy(spark, count=n, time_delta_ns=50_000_000, value=None)
    meta = Meta(interval_min=1_500_000_000, interval_max=1_500_000_000_000,
                interval_factor=10)

    t0 = time.perf_counter()
    levels = build_levels(df, meta)   # auto skew planner (stats + analysis)
    plan_sec = time.perf_counter() - t0

    def one_run(clear_after: bool) -> float:
        t0 = time.perf_counter()
        materialize_levels(levels)    # 2 jobs: level 1 + unioned cascade
        dt = time.perf_counter() - t0
        if clear_after:
            for lvl in levels.values():
                lvl.unpersist()
        return dt

    cold = one_run(False)    # includes codegen compilation; caches stay
    # r1's "steady" accidentally reused the cached level 1 across runs, so
    # it measured the cascade, not a full build — keep that figure under an
    # honest name and report the true full-rebuild throughput as "sec"
    warm = one_run(True)     # level 1 cached from the cold run
    fulls = [one_run(True) for _ in range(N_RUNS)]   # nothing cached
    full_stats = _stats(fulls)
    full = full_stats["median"]
    return {"rows": n, "sec": full, "cold_sec": round(cold, 3),
            "warm_cascade_sec": round(warm, 3),
            "plan_sec": round(plan_sec, 3),
            "rows_per_sec": round(n / full),
            "full_runs": full_stats,
            "note": ("sec = MEDIAN of full data recomputes from raw, plan "
                     "compiled once (plan_sec); r3's 4.48 s included "
                     "per-run re-analysis + 4 per-level actions — see "
                     "_insert_throughput docstring for the decomposition")}


N_RUNS = 3  # per-query measurement repeats (VERDICT r4 item 3: medians)


def _stats(vals: list[float]) -> dict:
    """{median, min, max, n} over a run list — SURVEY quotes medians, not
    best-observed (single runs on this box vary +-10%)."""
    s = sorted(vals)
    n = len(s)
    med = s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2
    return {"median": round(med, 3), "min": round(s[0], 3),
            "max": round(s[-1], 3), "n": n}


_DAY_NS = 86_400_000_000_000


def _insert_matrix(spark) -> list[dict]:
    """The reference's full insert-throughput matrix
    (/root/reference/tests/bench.cpp:80-86): counts 2^10..2^26 in x4 steps,
    spacings {826 ns (1.21 MHz), 50 ms (20 Hz), 1 s (1 Hz)}, each cell a
    full hierarchy build with the reference's recommended params
    (interval_min = 30 x spacing, factor 10, interval_max the largest
    power-of-10 multiple below one day).  One timed run per cell (codegen
    already warm from the identical-shape headline runs)."""
    from hta_spark import Meta
    from hta_spark.operators import build_levels, materialize_levels
    from hta_spark.operators.tools import dummy

    cells = []
    for spacing in (1_000_000_000 // 1_210_000, 50_000_000, 1_000_000_000):
        imin = 30 * spacing
        imax = imin
        while imax * 10 < _DAY_NS:
            imax *= 10
        meta = Meta(interval_min=imin, interval_max=imax, interval_factor=10)
        for exp in range(10, 27, 2):
            n = 1 << exp
            df = dummy(spark, count=n, time_delta_ns=spacing, value=None)
            t0 = time.perf_counter()
            levels = build_levels(df, meta, salt_chunks=256)
            # 2 jobs: level 1 into cache, then the unioned higher cascade
            # (each branch re-groups the cached level 1 / tiny cached
            # intermediates — O(levels) aggregations, 1 job of overhead)
            materialize_levels(levels)
            dt = time.perf_counter() - t0
            for lvl in levels.values():       # don't leak cache across cells
                lvl.unpersist()
            cells.append({"rows": n, "spacing_ns": spacing,
                          "sec": round(dt, 3),
                          "rows_per_sec": round(n / dt)})
    return cells


def _query_latency(spark) -> dict:
    """BASELINE.md M5 items 2-3: retrieve_flex latency per level and exact
    aggregate over 1/10/100 % of the data range, raw-exact vs telescoping,
    on the sf events table with materialized (cached) rollups standing in
    for the stored level tables."""
    from pyspark.sql import functions as F
    from hta_spark.operators import build_levels, materialize_levels
    from hta_spark.operators.aggregate import aggregate_exact, aggregate_telescope
    from hta_spark.operators.retrieve import retrieve_flex
    from hta_spark.operators.rollup import raw_range
    from hta_spark.queries_hta import EVENTS_META, events_raw
    from hta_spark.chrono import HOUR, MINUTE

    raw = events_raw(spark, SF_DIR)
    levels = build_levels(raw, EVENTS_META, salt_chunks=256)
    materialize_levels(levels)             # materialize = stored rollups
    ranges = raw_range(raw).cache()
    lo, hi = ranges.select(F.min("t_first"), F.max("t_last")).collect()[0]

    def timed(df) -> float:
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 3)

    flex = {}
    for label, upper in (("raw_smooth", 30 * MINUTE), ("level_1h", HOUR),
                         ("level_10h", 10 * HOUR), ("level_100h", 100 * HOUR)):
        _kind, df = retrieve_flex(raw, levels, EVENTS_META, lo, hi, upper)
        flex[label] = timed(df)

    agg = {}
    for pct in (1, 10, 100):
        end = lo + (hi - lo) * pct // 100
        agg[f"exact_{pct}pct"] = timed(
            aggregate_exact(raw, lo, end, ranges=ranges))
        agg[f"telescope_{pct}pct"] = timed(
            aggregate_telescope(raw, levels, EVENTS_META, lo, end,
                                ranges=ranges))
    for lvl in levels.values():
        lvl.unpersist()
    ranges.unpersist()
    return {"flex_latency_sec": flex, "aggregate_latency_sec": agg}


def _aggregate_crossover(spark, n: int = 2 ** 24) -> dict:
    """VERDICT r4 item 4: the telescoping crossover, demonstrated on data
    large enough to show it.  At sf0.1 (167k rows/metric) raw-exact beats
    telescoping 1.5-1.7x — the levels it reads are not much smaller than
    raw.  On the 16.7M-point single-metric store (the reference's bench
    shape, /root/reference/src/metric.cpp:160-231: O(levels*factor) level
    reads vs O(raw) points) the telescope touches ~interval_factor rows
    per level plus two interval_min-bounded raw boundary slices, so it
    must win once raw >> levels.  Medians of N_RUNS re-executions per
    cell; levels are cached (the stored-rollup stand-in, same as
    _query_latency)."""
    from pyspark.sql import functions as F
    from hta_spark import Meta
    from hta_spark.operators import build_levels, materialize_levels
    from hta_spark.operators.aggregate import (AUTO_ROW_FLOOR, AUTO_ROW_RATIO,
                                               _auto_choice, aggregate_auto,
                                               aggregate_exact,
                                               aggregate_telescope)
    from hta_spark.operators.rollup import raw_range
    from hta_spark.operators.tools import dummy

    raw = dummy(spark, count=n, time_delta_ns=50_000_000, value=None)
    meta = Meta(interval_min=1_500_000_000, interval_max=1_500_000_000_000,
                interval_factor=10)
    levels = build_levels(raw, meta)
    materialize_levels(levels)
    ranges = raw_range(raw).cache()
    lo, hi = ranges.select(F.min("t_first"), F.max("t_last")).collect()[0]

    out: dict[str, dict] = {}
    choices: dict[str, str] = {}
    for pct in (1, 10, 100):
        end = lo + (hi - lo) * pct // 100
        # VERDICT r5 item 6: the auto planner must TRACK the measured
        # winner at each range size.  Per-cell choice is recorded, and the
        # auto cell's one-time rollup-probe planning cost is reported
        # separately (auto_plan_sec) — the timed runs re-execute the
        # chosen plan, same convention as every other cell here.
        choices[f"{pct}pct"] = _auto_choice(
            levels, meta, lo, end, ranges, AUTO_ROW_FLOOR, AUTO_ROW_RATIO)[0]
        for label, mk in (
                ("exact", lambda e=end: aggregate_exact(
                    raw, lo, e, ranges=ranges)),
                ("telescope", lambda e=end: aggregate_telescope(
                    raw, levels, meta, lo, e, ranges=ranges)),
                ("auto", lambda e=end: aggregate_auto(
                    raw, levels, meta, lo, e, ranges=ranges))):
            t0 = time.perf_counter()
            df = mk()
            if label == "auto":
                choices[f"{pct}pct_plan_sec"] = round(
                    time.perf_counter() - t0, 3)
            runs = []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                runs.append(time.perf_counter() - t0)
            out[f"{label}_{pct}pct"] = _stats(runs)
    for lvl in levels.values():
        lvl.unpersist()
    ranges.unpersist()
    return {"rows": n, "cells": out, "auto_choice": choices}


def _ivf_skew_cell(spark, n: int = 8192, dim: int = 32) -> dict:
    """VERDICT r5 item 2, measured: a maximally hot centroid (ONE cluster
    holding all n vectors) through knn_join_ivf, unbounded (one cogroup
    task owns the whole n x n GEMM) vs sub-blocked (max_cluster_rows=512
    -> 32 bounded tasks).  Output is bit-identical (equivalence-tested in
    test_scale_ops); this cell records the parallelism the blocking buys
    on the skew shape it exists for."""
    import numpy as np
    from pyspark.sql import functions as F
    from hta_spark.pipeline.ann import knn_join_ivf

    rng = np.random.default_rng(17)
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<float>").cache()
    emb.count()
    cents = [(0, [1.0] + [0.0] * (dim - 1))]
    out = {"rows": n, "dim": dim}
    for label, bound in (("unbounded", n), ("blocked_512", 512)):
        df = knn_join_ivf(emb, cents, k=5, nprobe=1,
                          max_cluster_rows=bound)
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        out[label] = _stats(runs)
    u, b = out["unbounded"]["median"], out["blocked_512"]["median"]
    out["speedup"] = round(u / b, 2) if b > 0 else None
    emb.unpersist()
    return out


def _throttle_dispatch_cell(spark, n: int = 2 ** 21) -> dict:
    """r8 (VERDICT r6 'What's wrong #4'), measured: one dominant metric
    through BOTH throttle arms, plus the auto planner's actual choice.

    Timings are construct+execute per pass (the parallel arm does its
    doubling work eagerly at construction, so steady re-execution would
    measure checkpoint reads, not the operator).  Locally the sequential
    Arrow pass wins at ANY size that fits one task — the parallel arm
    buys bounded per-task memory and cluster-width scaling, not local
    speed (see throttle_auto's docstring) — so this cell records the
    local price of that insurance instead of assuming it."""
    from hta_spark.operators.tools import dummy, throttle_auto

    raw = dummy(spark, count=n, time_delta_ns=50_000_000, value=42.0).cache()
    raw.count()
    cooldown = 999_000_000          # keep every 20th 50 ms point

    def arm_of(df) -> str:
        plan = df._jdf.queryExecution().analyzed().toString()
        return "seq" if "FlatMapGroupsInPandas" in plan else "par"

    out: dict = {"n": n, "cooldown_ns": cooldown,
                 # ADVICE r9: count() replaced the r7 noop sink as this
                 # cell's timed action in r8 — Catalyst can prune/partial-
                 # agg under count(), so figures from r8 onward are not
                 # directly comparable to the r7 noop-sink cells; the
                 # throttle plans here keep every column live (the kept
                 # filter reads them), so the observed delta was noise,
                 # but the methodology change is now on the record.
                 "timed_action": "count() since r8 (r7: noop sink)"}
    kept: dict[str, int] = {}
    for label, cap in (("seq", 1 << 62), ("par", 0), ("auto", None)):
        runs = []
        df = cnt = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = (throttle_auto(raw, cooldown) if cap is None
                  else throttle_auto(raw, cooldown, seq_rows_cap=cap))
            # count() as the timed action: executes the full plan like the
            # noop sink did, AND yields the kept-set size in the same pass
            # — the old extra df.count() after the timed loop re-ran the
            # whole throttle per arm just for bookkeeping (ADVICE r8)
            cnt = df.count()
            runs.append(round(time.perf_counter() - t0, 3))
        out[label] = {"runs": runs, "min": min(runs)}
        kept[label] = cnt
        if cap is None:
            out["auto_choice"] = arm_of(df)
    # all arms must agree on the kept-set size (full equivalence is
    # pytest-pinned; this is the in-record tripwire)
    out["kept_rows"] = kept["seq"]
    out["arms_agree"] = len(set(kept.values())) == 1
    raw.unpersist()
    return out


def _hash_set(df, cols: list[str]) -> tuple[int, int]:
    """Order-independent (count, folded-hash) fingerprint of a result set
    — one job, no driver-side rows.  pmod keeps the ANSI long sum safe."""
    from pyspark.sql import functions as F
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.xxhash64(*cols), F.lit(1 << 40))).alias("h")) \
        .collect()[0]
    return int(row["n"] or 0), int(row["h"] or 0)


def _se_lsh_hot_bucket(spark, n_docs: int = 1_000_000,
                       hot: int = 5_000) -> dict:
    """scale_evidence (a): the LSH hot-bucket star guard at its DEFAULT
    threshold (``lsh_pairs`` ``max_bucket=4096``) on generated data.

    10^6 documents end-to-end (text -> minhash -> banding): ``hot`` of
    them share one boilerplate text, so every band puts the same
    ``hot``-id bucket through the pair expansion — past the 4096 default,
    so the star expansion must engage (hot-bucket pairs collapse from
    B(B-1)/2 to B-1, every pair anchored at the bucket's smallest id).
    Equivalence: connected components over the star pairs equal
    components over the FULL i<j expansion — computed on a 1500-doc
    SLICE of the planted bucket (r13, VERDICT r12 item 5: the full
    12.5M-pair expansion was 48 s of insurance for a graph property
    that is size-independent — the star is anchored at the bucket's
    smallest id, so its induced subgraph on any id prefix is itself
    the star of that prefix, and one component either way)."""
    from pyspark.sql import functions as F
    from hta_spark.pipeline.dedup import (connected_components, lsh_pairs,
                                          minhash_signatures)

    boiler = "breaking news subscribe to our newsletter all rights reserved"
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < hot, F.lit(boiler))
         .otherwise(F.concat_ws(" ", *[
             F.hex(F.xxhash64(F.col("id"), F.lit(j))) for j in range(10)]))
         .alias("text"))
    sigs = minhash_signatures(docs).cache()
    n_sigs = sigs.count()

    t0 = time.perf_counter()
    star = lsh_pairs(sigs)            # ALL defaults, incl. max_bucket=4096
    star_hot = star.filter((F.col("a") < hot) & (F.col("b") < hot)).cache()
    star_hot_n = star_hot.count()
    star_sec = round(time.perf_counter() - t0, 3)

    sub = 1500                        # equivalence slice (see docstring)
    t0 = time.perf_counter()
    full = lsh_pairs(sigs.filter(F.col("doc_id") < sub),
                     max_bucket=None).cache()
    full_n = full.count()
    full_sec = round(time.perf_counter() - t0, 3)

    cc_star = connected_components(
        star_hot.filter((F.col("a") < sub) & (F.col("b") < sub)))
    cc_full = connected_components(full)
    components_equal = (
        cc_star.exceptAll(cc_full).count() == 0
        and cc_full.exceptAll(cc_star).count() == 0)
    for c in (sigs, star_hot, full):
        c.unpersist()
    return {"docs": n_docs, "planted_bucket": hot,
            "default_max_bucket": 4096, "signatures": n_sigs,
            # star: B-1 pairs; unguarded full expansion would be B(B-1)/2
            "guard_engaged": star_hot_n == hot - 1,
            "star_pairs_hot": star_hot_n,
            "full_pairs_unguarded_would_be": hot * (hot - 1) // 2,
            "equivalence_slice_docs": sub,
            "full_pairs_slice": full_n,
            "full_pairs_slice_expected": sub * (sub - 1) // 2,
            "components_equal": components_equal,
            "star_banding_sec_1m_docs": star_sec,
            "full_expansion_sec_slice": full_sec}


def _planted_embeddings(spark, n_base: int, planted: int, dim: int,
                        perturb: bool = True):
    """Generated corpus with ``planted`` near-duplicate pairs: vector i
    copied to id n_base+i (optionally with a small perturbation so the
    pair cosine is ~0.999 rather than exactly 1); random pairs are
    centered so their cosine ~0 and a high threshold excludes them.

    Materialized through the cache (VERDICT r10 item 7): a bare
    ``spark.range`` projection carries an ~8 B/row Catalyst estimate
    that is blind to the array payload — the "tiny-estimate, huge-
    payload" shape behind the r10 broadcast OOM.  The cached
    InMemoryRelation reports its REAL byte size, so every plan downstream
    of these scale cells plans against honest stats (the production-path
    defense is attach_vectors' pinned join strategy; this removes the
    whole estimate-lie class from the bench's own inputs).  Caller
    unpersists."""
    from pyspark.sql import functions as F

    n = n_base + planted
    base_id = F.when(F.col("id") < n_base, F.col("id")) \
               .otherwise(F.col("id") - n_base)

    def coord(j: int):
        c = (F.pmod(F.xxhash64(base_id, F.lit(j)), F.lit(100_000))
             .cast("double") / 100_000.0 - 0.5)
        if perturb and j < 4:   # perturb 4 coords of the copies: cos ~0.999
            c = c + F.when(F.col("id") >= n_base, F.lit(0.05)) \
                     .otherwise(F.lit(0.0))
        return c

    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[coord(j) for j in range(dim)]).alias("embedding")).cache()
    emb.count()
    est = int(str(emb._jdf.queryExecution().optimizedPlan()
                  .stats().sizeInBytes()))
    return emb, est


def _se_gemm_guard(spark, n_base: int = 559_500, planted: int = 500,
                   dim: int = 64) -> dict:
    """scale_evidence (b): the exact-GEMM broadcast guard at its DEFAULT
    threshold (``max_broadcast_mb=256``) on generated data.

    560k x 64 float64 embeddings = 273 MiB > 256: ``cosine_pairs_gemm``
    must REFUSE (clean ValueError naming the scale substitute, before any
    collect) and ``hyperplane_lsh_pairs`` must SERVE the same corpus —
    with measured recall over ``planted`` near-duplicate pairs.  This is
    the cell that OOMed the round-10 bench: the SRP verify join
    broadcast the embedding side off a stats-blind estimate
    (VERDICT r10 #1); it now runs against the pinned shuffle join of
    ``attach_vectors`` AND honest (cached) input stats."""
    from pyspark.sql import functions as F
    from hta_spark.pipeline.ann import cosine_pairs_gemm, hyperplane_lsh_pairs

    n = n_base + planted
    emb, est_bytes = _planted_embeddings(spark, n_base, planted, dim)

    guard_raised, guard_msg = False, None
    t0 = time.perf_counter()
    try:
        cosine_pairs_gemm(emb, threshold=0.99)     # DEFAULT 256 MiB guard
    except ValueError as e:
        guard_raised, guard_msg = True, str(e)
    guard_sec = round(time.perf_counter() - t0, 3)

    # the named substitute serves the corpus class: banded SRP-LSH with
    # scale-appropriate banding (24-bit bands -> bucket size ~1).  r13
    # (VERDICT r12 item 5): the recall measurement runs at HALF the
    # guard shape — SRP recall is a per-pair property independent of
    # corpus size (bucket collisions only ADD candidates), so the
    # insurance arm pays half the wall while the guard still refuses
    # the full 273 MiB corpus above
    emb.unpersist()
    lsh_base = n_base // 2
    emb2, _ = _planted_embeddings(spark, lsh_base, planted, dim)
    t0 = time.perf_counter()
    pairs = hyperplane_lsh_pairs(emb2, threshold=0.99,
                                 n_planes=72, rows_per_band=24).cache()
    pairs_n = pairs.count()
    lsh_sec = round(time.perf_counter() - t0, 3)
    recovered = pairs.filter((F.col("b") - F.col("a") == lsh_base)
                             & (F.col("a") < planted)).count()
    pairs.unpersist()
    emb2.unpersist()
    return {"vectors": n, "dim": dim,
            "matrix_mib": round(n * dim * 8 / 2 ** 20),
            "plan_stats_mib": round(est_bytes / 2 ** 20),
            "default_max_broadcast_mb": 256,
            "guard_raised": guard_raised,
            "guard_msg": (guard_msg or "")[:120],
            "guard_check_sec": guard_sec,
            "lsh_params": {"n_planes": 72, "rows_per_band": 24,
                           "threshold": 0.99},
            "lsh_corpus_vectors": lsh_base + planted,
            "lsh_pairs": pairs_n, "lsh_sec": lsh_sec,
            "planted_pairs": planted,
            "planted_recovered": recovered,
            "recall": round(recovered / planted, 4)}


def _se_semdedup_hot(spark, n_base: int = 69_700, planted: int = 300,
                     dim: int = 32) -> dict:
    """scale_evidence (e, r11 — VERDICT r10 item 3): ``semantic_pairs``'
    hot-cluster bound at its DEFAULT (``max_cluster_rows=65536``) with
    ONE dominant k-means cluster (``k=1`` makes every vector land in it —
    the skew shape real embedding distributions produce at k=8).

    70k rows > 65 536: the bound must route the cluster through
    within-cluster SRP banding instead of the O(B^2) exact pair join.
    ``planted`` pairs are NEAR-identical copies (4 coords perturbed,
    cos ~0.998 — VERDICT r11 item 3: identical copies collide in every
    SRP band by construction, so they measure nothing), so the reported
    recall is the MEASURED SRP recall at the hot-path defaults
    (``hot_n_planes=72``, ``hot_rows_per_band=24``; the analytic
    expectation at cos 0.998 is ~((1-(1-acos(c)/pi)^24)^3 miss) ~0.94),
    while random pairs (~cos 0) stay excluded by the 0.99 threshold."""
    from pyspark.sql import functions as F
    from hta_spark.pipeline.semdedup import semantic_pairs

    n = n_base + planted
    emb, est_bytes = _planted_embeddings(spark, n_base, planted, dim,
                                         perturb=True)
    t0 = time.perf_counter()
    pairs = semantic_pairs(emb, k=1, iterations=1,
                           threshold=0.99).cache()    # ALL scale defaults
    pairs_n = pairs.count()
    sec = round(time.perf_counter() - t0, 3)
    recovered = pairs.filter((F.col("b") - F.col("a") == n_base)
                             & (F.col("a") < planted)).count()
    pairs.unpersist()
    emb.unpersist()
    return {"vectors": n, "dim": dim,
            "plan_stats_mib": round(est_bytes / 2 ** 20),
            "default_max_cluster_rows": 65536,
            "guard_engaged": n > 65536,
            "pairs": pairs_n,
            "planted_pairs": planted,
            "planted_recovered": recovered,
            "recall": round(recovered / planted, 4),
            "semantic_pairs_sec": sec}


def _se_throttle_cap(spark, n: int = 8_100_000) -> dict:
    """scale_evidence (c): ``throttle_auto``'s straggler cap at its
    DEFAULT (``seq_rows_cap=8_000_000``) on generated data.

    r13 split (VERDICT r12 item 5 — this cell's insurance arms were 58 s
    of the bench wall): the GUARD is a dispatch property, so it is
    observed binding at 8.1M rows (the smallest round size past the
    default cap) from the PLAN — auto with no knobs must choose the
    pointer-doubling arm — without executing the 8.1M throttle; the
    arm-equivalence insurance (parallel kept set fingerprint-equals the
    sequential arm's) executes BOTH arms at half the shape, where the
    equality is the same statement (the recurrence has no
    size-dependent branch; the dispatch is the only thing the cap
    changes, and it is pinned by the plan probe above plus
    tests/test_scale_ops.py's forced-arm equivalences).  The parallel
    arm is slower locally — the recorded price of bounded per-task
    memory at cluster width; the doubling converges in ~log2(kept)
    rounds, and the cooldown keeps ~n/2^20 points (~3 rounds)."""
    from pyspark.sql import functions as F  # noqa: F401  (plan probe)
    from hta_spark.operators.tools import dummy, throttle, throttle_auto

    cooldown = 50_000_000 * (1 << 20) - 1

    # guard binding at DEFAULT knobs, 8.1M rows: the dispatch decision
    # itself (throttle_auto_arm — the same planner call throttle_auto
    # branches on; throttle_parallel runs eagerly at construction, so
    # observing the arm through a built frame would execute the 8.1M
    # throttle this split exists to avoid)
    from hta_spark.operators.tools import throttle_auto_arm
    raw = dummy(spark, count=n, time_delta_ns=50_000_000,
                value=None).cache()
    raw.count()
    t0 = time.perf_counter()
    arm = throttle_auto_arm(raw)                   # DEFAULT cap
    dispatch_sec = round(time.perf_counter() - t0, 3)
    raw.unpersist()

    # arm equivalence at half shape
    half = n // 2
    raw2 = dummy(spark, count=half, time_delta_ns=50_000_000,
                 value=None).cache()
    raw2.count()
    t0 = time.perf_counter()
    # through the auto dispatch (cap lowered to keep the par arm + its
    # default salting) so the tested path IS the product path
    par_n, par_h = _hash_set(
        throttle_auto(raw2, cooldown, seq_rows_cap=half - 1),
        ["metric", "time", "value"])
    par_sec = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    seq_n, seq_h = _hash_set(throttle(raw2, cooldown),
                             ["metric", "time", "value"])
    seq_sec = round(time.perf_counter() - t0, 3)
    raw2.unpersist()
    return {"rows": n, "default_seq_rows_cap": 8_000_000,
            "auto_arm": arm, "guard_engaged": arm == "par",
            "dispatch_check_sec": dispatch_sec,
            "equivalence_rows": half, "kept_rows": par_n,
            "kept_sets_equal": (par_n, par_h) == (seq_n, seq_h),
            "auto_parallel_sec": par_sec, "seq_arm_sec": seq_sec}


def _se_ivf_subblock(spark, n: int = 66_000, dim: int = 16,
                     k: int = 5, sample: int = 1024) -> dict:
    """scale_evidence (d): the IVF sub-block bound at its DEFAULT
    (``max_cluster_rows=65536``) on generated data.

    66k vectors all assigned to ONE centroid (a hot cluster just past
    the default bound -> ceil(66000/65536) = 2 salted sub-blocks per the
    guard's arithmetic; VERDICT r11 item 6 shrank the shape — and the
    GEMM-irrelevant dim — to the smallest size that still trips the
    guard): ``knn_join_ivf`` with no knobs must still
    produce the exact result (one centroid + nprobe 1 probes every
    member, so any difference is the sub-blocking itself).  Ground truth
    is an INDEPENDENT driver-side numpy oracle — full-row stable argsort
    under the same (-round(cos,4), b) contract, i.e. the pre-r10
    selection code — over a ``sample`` of probes, plus a total row-count
    check; a second full cluster-side GEMM job would double the cell for
    no extra evidence."""
    import math

    import numpy as np
    from pyspark.sql import functions as F
    from hta_spark.pipeline.ann import knn_join_ivf

    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            (F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(100_000))
             .cast("double") / 100_000.0 - 0.5) for j in range(dim)])
        .alias("embedding")).cache()
    emb.count()
    cents = [(0, [1.0] + [0.0] * (dim - 1))]

    t0 = time.perf_counter()
    ivf = knn_join_ivf(emb, cents, k=k, nprobe=1).cache()  # DEFAULT cap
    ivf_n = ivf.count()
    ivf_sec = round(time.perf_counter() - t0, 3)

    # independent exact oracle on a probe sample
    rows = emb.collect()
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    step = max(1, n // sample)
    probe_idx = np.arange(0, n, step)[:sample]
    sims = np.round((mat[probe_idx] @ mat.T)
                    / (norms[probe_idx, None] * norms[None, :]), 4)
    order = np.argsort(-sims, axis=1, kind="stable")[:, :k + 1]
    expected = set()
    for r, i in enumerate(probe_idx):
        rank = 0
        for j in order[r]:
            if ids[j] == ids[i]:
                continue
            rank += 1
            if rank > k:
                break
            expected.add((int(ids[i]), int(ids[j]),
                          float(sims[r, j]), rank))
    probe_ids = [int(ids[i]) for i in probe_idx]
    got = {(int(r["a"]), int(r["b"]), float(r["cos_sim"]), int(r["rank"]))
           for r in ivf.filter(F.col("a").isin(probe_ids)).collect()}
    ivf.unpersist()
    emb.unpersist()
    return {"vectors": n, "dim": dim,
            "default_max_cluster_rows": 65536,
            "sub_blocks": math.ceil(n / 65536),
            "probe_chunks": math.ceil(n / 8192),   # r12 2-D blocking axis
            "guard_engaged": n > 65536,
            "knn_rows": ivf_n, "knn_rows_expected": n * k,
            "sampled_probes": len(probe_ids),
            "sampled_rows_equal": got == expected,
            "ivf_subblocked_sec": ivf_sec}


def _se_incremental_neardup(spark, corpus_n: int = 1_000_000,
                            crawl_n: int = 50_000,
                            dup_n: int = 5_000) -> dict:
    """scale_evidence (g, r12 — VERDICT r11 item 4): the incremental
    near-dup's 100 TB shape on a 10^6-doc STORED band index + a 50k-doc
    crawl with 5k planted near-duplicates.

    Proves the pre-banded path: the corpus is banded ONCE into a parquet
    ``lsh_band_buckets`` table; the crawl pass reads it back and must
    (a) never re-band or re-aggregate the index — the plan carries
    EXACTLY the two HashAggregate nodes of the crawl-side id-distinct,
    so the index side's only exchange is the semi-join's own — and
    (b) drop every planted duplicate while keeping the novel docs
    (banding has no false negatives on identical text).

    Also measures the streaming Bloom twin's false-positive DROP rate vs
    the exact join at the r13 AUTO-SIZED default (4M band keys ->
    2^26 bits; novel docs survive at ~1 - bands*fp_key), and records
    that an explicitly undersized 2^20 build — the old default, which
    saturated and dropped 100% of novel docs — now REFUSES at the fill
    guard.  False negatives are impossible in any case: every planted
    duplicate must still drop."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from hta_spark.pipeline.dedup import (dedup_against_neardup,
                                          lsh_band_buckets,
                                          minhash_signatures_maponly)
    from hta_spark.streaming.dedup_stream import (neardup_bloom_filter,
                                                  neardup_index_bitset)

    def text_of(base_id, salt: int):
        return F.concat_ws(" ", *[
            F.hex(F.xxhash64(base_id, F.lit(salt + j))) for j in range(10)])

    corpus = spark.range(corpus_n).select(
        F.col("id").alias("doc_id"), text_of(F.col("id"), 0).alias("text"))
    # crawl ids continue past the corpus; the first dup_n reuse corpus
    # texts (same text -> same signature -> guaranteed band hit), the
    # rest are novel (salt 100 draws disjoint hex words)
    crawl = spark.range(corpus_n, corpus_n + crawl_n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < corpus_n + dup_n,
               text_of(F.col("id") - corpus_n, 0))
         .otherwise(text_of(F.col("id"), 100)).alias("text")).cache()
    crawl.count()

    tmp = tempfile.mkdtemp(prefix="neardup_idx_")
    try:
        t0 = time.perf_counter()
        lsh_band_buckets(minhash_signatures_maponly(corpus)) \
            .write.mode("overwrite").parquet(tmp)
        build_sec = round(time.perf_counter() - t0, 3)
        idx = spark.read.parquet(tmp)

        kept_df = dedup_against_neardup(crawl, idx)
        # plan evidence BEFORE caching (an InMemoryRelation embeds its
        # child plan text and double-counts nodes): the index side must
        # reach its semi-join as a bare scan.  r15: the check is now
        # STRUCTURAL, not a HashAggregate count — the grouped signature
        # form legitimately adds the crawl-side groupBy's partial/final
        # pair (4 aggregates total, all crawl-side), so "n_agg == 2"
        # stopped encoding the invariant.  Instead walk the plan tree
        # from the index's parquet scan (the cell's only parquet scan —
        # the crawl is a Range) up to its first Join ancestor and assert
        # every node on that path is scan/filter/project/exchange
        # plumbing: any aggregate there would mean the stored index is
        # re-banded or re-aggregated per crawl.
        plan = kept_df._sc._jvm.PythonSQLUtils.explainString(
            kept_df._jdf.queryExecution(), "formatted")
        n_agg = len(re.findall(r"\n\(\d+\) HashAggregate", plan))
        tree = plan.split("\n\n")[0].splitlines()
        arrow = [(ln.find("- "), ln) for ln in tree]
        scan_rows = [i for i, (_, ln) in enumerate(arrow)
                     if "Scan parquet" in ln]
        index_side_clean = bool(scan_rows)
        for i in scan_rows:
            depth = arrow[i][0]
            for j in range(i - 1, -1, -1):
                d, ln = arrow[j]
                if d < depth or (d == -1 and "AdaptiveSparkPlan" in ln):
                    if "Join" in ln:
                        break
                    if "Aggregate" in ln:
                        index_side_clean = False
                        break
                    depth = d
                    if d <= 0:
                        break
        t0 = time.perf_counter()
        kept = kept_df.cache()
        kept_n = kept.count()
        pass_sec = round(time.perf_counter() - t0, 3)
        dups_dropped = crawl.count() - kept_n

        def bloom_arm(m_log2: int | None) -> dict:
            t1 = time.perf_counter()
            bits = neardup_index_bitset(idx, m_log2=m_log2)
            chosen = int(bits.select("m_log2").first()[0])
            bkept = neardup_bloom_filter(crawl, bits,
                                         m_log2=m_log2).cache()
            bkept_n = bkept.count()
            sec = round(time.perf_counter() - t1, 3)
            # exact-kept novel docs the Bloom filter wrongly drops
            false_drops = kept.join(bkept, "doc_id", "left_anti").count()
            # a kept doc the exact join dropped would be a false NEGATIVE
            false_keeps = bkept.join(kept, "doc_id", "left_anti").count()
            bkept.unpersist()
            return {"m_log2": chosen, "kept": bkept_n,
                    "false_drop_frac": round(false_drops / max(kept_n, 1),
                                             4),
                    "false_negatives": false_keeps, "sec": sec}

        # r13 (VERDICT r12 "What's wrong #1"): the DEFAULT arm now
        # AUTO-SIZES from the 4M-key index (previously a fixed 2^20 that
        # measured false_drop_frac 1.0 — every novel doc dropped); the
        # auto choice at 4M keys IS 2^26, so the old explicit
        # corpus-sized arm is the same build and was dropped (r12 item
        # 5: no redundant insurance).  An explicitly undersized 2^20
        # build must REFUSE loudly at the fill guard, not publish a
        # saturated filter.
        bloom_default = bloom_arm(None)        # auto-sized default
        try:
            neardup_bloom_filter(
                crawl.limit(10),
                neardup_index_bitset(idx, m_log2=20), m_log2=20).count()
            undersized_refused = False
        except Exception as e:
            undersized_refused = "bloom bitset saturated" in str(e)
        kept.unpersist()
        crawl.unpersist()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {"corpus_docs": corpus_n, "crawl_docs": crawl_n,
            "planted_dups": dup_n,
            "index_build_sec_once": build_sec,
            "crawl_pass_sec": pass_sec,
            "kept": kept_n, "dups_dropped": dups_dropped,
            "all_planted_dropped": dups_dropped >= dup_n,
            "plan_hashaggregates": n_agg,
            "index_never_reaggregated": index_side_clean,
            "bloom_default": bloom_default,
            "bloom_undersized_refused": undersized_refused}


def _se_top_fraction(spark, big: int = 4_200_000,
                     small: int = 50_000) -> dict:
    """scale_evidence (f, r12 — VERDICT r11 "What's wrong #1"):
    ``top_fraction_by``'s size dispatch at its DEFAULT
    (``rows_cap=4_000_000``) with ONE dominant group — the skew shape a
    ``partitionBy(source)`` selection hits on any real corpus.

    4.2M rows in one group (past the cap) + a 50k group: the auto call
    with NO knobs must take the banded arm (no task ever sorts the full
    group: the threshold comes from the per-group score histogram, rows
    strictly above the threshold bin pass by a map-side filter, and only
    the ~group/n_bins boundary band is sorted), and its kept set must
    fingerprint-equal the full-sort window arm's on the identical input
    — the banded arm is EXACT, not approximate.  Scores carry heavy ties
    (10^5 distinct values over 4.2M rows) so the boundary band genuinely
    exercises the key tie-break."""
    from pyspark.sql import functions as F
    from hta_spark.pipeline.sample import (_top_fraction_window,
                                           top_fraction_by)

    df = spark.range(big + small).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < big, F.lit("big")).otherwise(F.lit("small"))
         .alias("source"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(100_000))
         .cast("double") / 1000.0).alias("score")).cache()
    df.count()

    t0 = time.perf_counter()
    auto = top_fraction_by(df, 2500, "score", group_col="source")
    banded = "_tbin" in auto._jdf.queryExecution().analyzed().toString()
    auto_n, auto_h = _hash_set(auto, ["doc_id"])
    auto_sec = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    win_n, win_h = _hash_set(
        _top_fraction_window(df, 2500, "score", ["source"], "doc_id"),
        ["doc_id"])
    win_sec = round(time.perf_counter() - t0, 3)
    df.unpersist()
    expected = (big * 2500 + 9999) // 10000 + (small * 2500 + 9999) // 10000
    return {"rows": big + small, "dominant_group_rows": big,
            "default_rows_cap": 4_000_000,
            "guard_engaged": banded,
            "kept_rows": auto_n, "kept_rows_expected": expected,
            "kept_sets_equal": (auto_n, auto_h) == (win_n, win_h),
            "banded_arm_sec": auto_sec, "window_arm_sec": win_sec}


def _planted_window_corpus(spark, n: int, k: int):
    """The shared ExactSubstr scale-cell corpus: every 10th doc is 8
    unique hex tokens + the same ``k``-token planted phrase (ONE hot
    window hash at positions 8..15, n/10 occurrences), the rest are
    all-unique.  Shared by ``repeated_spans_linear`` and
    ``trim_spans_rewrite`` so their shape claims (and the trim cell's
    Generate-count comparison across the two operators' plans) stay on
    the byte-identical corpus by construction."""
    from pyspark.sql import functions as F

    planted = " ".join(f"planted{j}" for j in range(k))
    uniq = F.concat_ws(" ", *[
        F.hex(F.xxhash64(F.col("id"), F.lit(j))) for j in range(8)])
    txt = F.when(F.col("id") % 10 == 0,
                 F.concat_ws(" ", uniq, F.lit(planted))) \
           .otherwise(uniq)
    return spark.range(n).select(F.col("id").alias("doc_id"),
                                 txt.alias("text"))


def _se_repeated_spans(spark, n_docs: int = 1_000_000, k: int = 8) -> dict:
    """scale_evidence (h, r14 — VERDICT r13 item 5): the ExactSubstr
    fixed-window spans operator's linear-in-corpus-tokens shape on a
    10^6-doc corpus with a planted hot window.

    Every 10th document carries the same ``k``-token boilerplate phrase
    appended to 8 unique hex tokens (the other 9/10 are all-unique), so
    ONE window hash holds 10^5 occurrences — the boilerplate-like skew
    shape.  The occurrence-count + left-semi plan must not blow up on
    that hot hash (the count aggregate is map-side-combined; the
    semi-join ships one row per marked position, never
    occurrences^2), and the island merge stays bounded by document
    length.  Evidence recorded: the spans are EXACTLY one (8, 15) span
    per planted doc, the wall-clock at half corpus vs full corpus
    (linear => ratio ~2), and the semi-join is in the plan."""
    from pyspark.sql import functions as F
    from hta_spark.pipeline.dedup import repeated_window_spans

    def corpus(n):
        return _planted_window_corpus(spark, n, k)

    def run(n):
        t0 = time.perf_counter()
        spans = repeated_window_spans(corpus(n), k=k)
        row = spans.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when((F.col("span_start") == 8)
                         & (F.col("span_end") == 15), 0)
                  .otherwise(1)).alias("bad")).collect()[0]
        return (round(time.perf_counter() - t0, 3),
                int(row["n"] or 0), int(row["bad"] or 0))

    run(n_docs // 10)                  # untimed JIT/codegen warmup: the
    # first spans job in a session pays several seconds of compilation,
    # which would land entirely on the half-corpus sample and invert
    # the linearity ratio
    half_sec, half_n, half_bad = run(n_docs // 2)
    full_sec, full_n, full_bad = run(n_docs)
    plan_df = repeated_window_spans(corpus(n_docs), k=k)
    plan = plan_df._sc._jvm.PythonSQLUtils.explainString(
        plan_df._jdf.queryExecution(), "formatted")
    return {"corpus_docs": n_docs, "hot_window_occurrences": n_docs // 10,
            "k": k,
            "spans_full": full_n, "spans_expected": n_docs // 10,
            "spans_exact": full_bad == 0 and full_n == n_docs // 10
            and half_bad == 0 and half_n == n_docs // 20,
            "half_corpus_sec": half_sec, "full_corpus_sec": full_sec,
            "wall_ratio_full_over_half": round(full_sec
                                               / max(half_sec, 1e-9), 2),
            "plan_left_semi": "LeftSemi" in plan}


def _se_trim_spans(spark, n_docs: int = 1_000_000, k: int = 8) -> dict:
    """scale_evidence (j, r15 — VERDICT r14 item 4): the ExactSubstr
    span-REMOVAL step (``trim_repeated_spans``) at the same 10^6-doc
    planted-hot-window shape as ``repeated_spans_linear``.

    Every 10th doc is 8 unique hex tokens + the same ``k``-token
    planted phrase (one window hash, 10^5 occurrences, positions
    8..15); the rest are all-unique.  Evidence: (a) KEEP-FIRST
    preserved exactly one occurrence — doc 0 (the corpus-smallest
    witness) is untrimmed and every other planted doc loses exactly
    the 8 planted tokens; (b) the REWRITE stage adds NO corpus explode
    — the trim plan's Generate count equals the spans plan's (the
    span-array join + in-row token cut is explode-free, per the
    operator's one-extra-join budget); (c) wall-clock
    linear-or-better at half vs full corpus."""
    from pyspark.sql import functions as F
    from hta_spark.pipeline.dedup import (repeated_window_spans,
                                          trim_repeated_spans)

    def corpus(n):
        return _planted_window_corpus(spark, n, k)

    def run(n):
        t0 = time.perf_counter()
        out = trim_repeated_spans(corpus(n), k=k)
        row = out.agg(
            F.sum(F.when(F.col("n_trimmed") == 8, 1).otherwise(0))
            .alias("cut8"),
            F.sum(F.when(F.col("n_trimmed").isin(0, 8), 0).otherwise(1))
            .alias("bad"),
            F.sum(F.when(F.col("doc_id") == 0, F.col("n_trimmed")))
            .alias("doc0_trimmed"),
            F.sum("n_trimmed").alias("tok_cut")).collect()[0]
        return (round(time.perf_counter() - t0, 3),
                {f: int(row[f] or 0)
                 for f in ("cut8", "bad", "doc0_trimmed", "tok_cut")})

    run(n_docs // 10)                  # untimed JIT/codegen warmup
    half_sec, half = run(n_docs // 2)
    full_sec, full = run(n_docs)

    def n_generates(df):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        return plan.count("Generate")

    gen_trim = n_generates(trim_repeated_spans(corpus(n_docs), k=k))
    gen_spans = n_generates(repeated_window_spans(corpus(n_docs), k=k))
    exp_full, exp_half = n_docs // 10 - 1, n_docs // 20 - 1
    return {"corpus_docs": n_docs, "hot_window_occurrences": n_docs // 10,
            "k": k,
            "docs_trimmed_full": full["cut8"],
            "docs_trimmed_expected": exp_full,
            "keep_first_exact": (
                full["doc0_trimmed"] == 0 and full["bad"] == 0
                and full["cut8"] == exp_full
                and full["tok_cut"] == 8 * exp_full
                and half["doc0_trimmed"] == 0 and half["bad"] == 0
                and half["cut8"] == exp_half
                and half["tok_cut"] == 8 * exp_half),
            "plan_generates_trim": gen_trim,
            "plan_generates_spans": gen_spans,
            "rewrite_adds_no_explode": gen_trim <= gen_spans,
            "half_corpus_sec": half_sec, "full_corpus_sec": full_sec,
            "wall_ratio_full_over_half": round(full_sec
                                               / max(half_sec, 1e-9), 2)}


def _se_strip_dispatch(spark, n_docs: int = 100_000,
                       per_doc_hot: int = 8) -> dict:
    """scale_evidence (i, r14 — VERDICT r13 item 4 / note #2): the
    ``strip_boilerplate_lines`` size dispatch at its MEASURED default
    cap (``hot_broadcast_cap = 10_000``), with the broadcast arm's
    per-row structure cost swept across the boundary.

    10^6 corpus lines (10^5 docs x 8 pool + 2 unique lines) with the
    hot-pool size swept 10^3 / 10^4 (the cap) / 10^5: r14 replaced the
    old single-array ``array_contains`` (a linear string scan per line
    — 59 s at 10^5 vs the anti-join arm's 1.5 s) with an all-primitive
    md5 hash table (~16 bytes/hot line), but measurement showed the
    floor is the per-corpus-row RE-MATERIALIZATION of the joined
    broadcast structure — O(structure bytes) per row regardless of
    probe cost (13.5 s at 10^5, ~3.6 s at the cap, vs anti-join
    ~2.2 s flat on this shuffle-free local corpus).  The default cap
    sits at the measured break-even given that at CLUSTER scale the
    anti-join arm adds three network shuffles of the whole corpus
    which the broadcast arm avoids.  Both arms must
    fingerprint-identical at every size; a pool one past the cap must
    dispatch to the anti-join arm."""
    from pyspark.sql import functions as F
    from hta_spark.pipeline.text import (strip_boilerplate_arm,
                                         strip_boilerplate_lines)

    def corpus(n_hot):
        pool = F.transform(
            F.sequence(F.lit(0), F.lit(per_doc_hot - 1)),
            lambda j: F.concat(
                F.lit("hot line number "),
                F.pmod(F.col("id") * per_doc_hot + j.cast("long"),
                       F.lit(n_hot)).cast("string"),
                F.lit(" shared boilerplate padding text")))
        uniq = F.transform(
            F.sequence(F.lit(0), F.lit(1)),
            lambda j: F.concat(F.lit("unique body line "),
                               F.col("id").cast("string"), F.lit(" "),
                               j.cast("string")))
        return (spark.range(n_docs).repartition(32)
                .select(F.col("id").alias("doc_id"),
                        F.array_join(F.concat(pool, uniq), "\n")
                        .alias("text")).cache())

    sweep = {}
    arm_at_cap = arm_past_cap = None
    for n_hot in (1_000, 10_000, 100_000):
        df = corpus(n_hot)
        df.count()
        arms = {}
        for arm, cap in (("broadcast", 10 ** 9), ("antijoin", 0)):
            t0 = time.perf_counter()
            n, h = _hash_set(
                strip_boilerplate_lines(df, max_line_df=4,
                                        hot_broadcast_cap=cap),
                ["doc_id", "text", "n_removed"])
            arms[arm] = {"sec": round(time.perf_counter() - t0, 3),
                         "fp": (n, h)}
        if n_hot == 10_000:
            # dispatch binding at the default cap, on the already-cached
            # boundary corpus: exactly cap hot lines stays broadcast,
            # one slot fewer goes anti-join (the planner count sees
            # n_hot > cap)
            arm_at_cap = strip_boilerplate_arm(df, max_line_df=4)
            arm_past_cap = strip_boilerplate_arm(df, max_line_df=4,
                                                 hot_broadcast_cap=9_999)
        df.unpersist()
        sweep[n_hot] = {
            "broadcast_sec": arms["broadcast"]["sec"],
            "antijoin_sec": arms["antijoin"]["sec"],
            "arms_equal": arms["broadcast"]["fp"] == arms["antijoin"]["fp"]}
    b1k, bcap = (sweep[1_000]["broadcast_sec"],
                 sweep[10_000]["broadcast_sec"])
    return {"corpus_lines": n_docs * (per_doc_hot + 2),
            "default_cap": 10_000, "sweep": sweep,
            "arms_equal_all": all(v["arms_equal"] for v in sweep.values()),
            "broadcast_1k_to_cap_ratio": round(bcap / max(b1k, 1e-9), 2),
            "dispatch_at_cap": arm_at_cap,
            "dispatch_past_cap": arm_past_cap,
            "dispatch_binding": (arm_at_cap == "broadcast"
                                 and arm_past_cap == "antijoin")}


def _cell(label: str, fn, *args, **kw):
    """Failure-isolated bench cell (VERDICT r10 items 2/3): one crashing
    cell records ``{"error": ..., "trace_head": ...}`` instead of
    forfeiting the whole bench record — r10's broadcast OOM in ONE
    scale-evidence cell erased 10 sections of finished measurements and
    the headline itself (BENCH_r10 rc=1, parsed: null)."""
    try:
        return fn(*args, **kw)
    except BaseException as e:          # incl. py4j fatal JVM errors
        if isinstance(e, (KeyboardInterrupt, SystemExit)):
            raise
        import traceback
        tb = traceback.format_exc()
        sys.stderr.write(f"bench cell {label!r} failed:\n{tb}\n")
        return {"error": tb.strip().splitlines()[-1][:300],
                "trace_head": tb[:1500]}


def _scale_evidence(spark) -> dict:
    """VERDICT r8 #1 / r9 #1: every scale guard observed BINDING at its
    DEFAULT threshold on generated data past that threshold, each with an
    equivalence/recall check at that size — the Spark analog of the
    reference's growing-size bench matrix
    (/root/reference/tests/bench.cpp:43-88).  Forced-knob tests prove the
    mechanisms; these cells prove the DEFAULTS are live on real-sized
    input.  Each sub-cell is failure-isolated (this section found the r10
    broadcast OOM — and then took the whole bench down with it).
    Skippable for fast local iteration with
    ``SPARK_GRAFT_SCALE_EVIDENCE=0`` (the driver's per-round record keeps
    it on)."""
    return {k: _cell(f"scale_evidence.{k}", fn, spark) for k, fn in (
        ("lsh_hot_bucket", _se_lsh_hot_bucket),
        ("gemm_broadcast_guard", _se_gemm_guard),
        ("semdedup_hot_cluster", _se_semdedup_hot),
        ("throttle_auto_cap", _se_throttle_cap),
        ("ivf_subblock", _se_ivf_subblock),
        ("top_fraction_dispatch", _se_top_fraction),
        ("incremental_neardup", _se_incremental_neardup),
        ("repeated_spans_linear", _se_repeated_spans),
        ("trim_spans_rewrite", _se_trim_spans),
        ("strip_boilerplate_dispatch", _se_strip_dispatch))}


def _streaming_throughput(spark, n: int = 2 ** 21) -> dict:
    """VERDICT r4 item 6: sustained rows/s through the TRUE streaming path
    (stream_levels -> applyInPandasWithState), at the reference insert
    matrix's three spacings (/root/reference/tests/bench.cpp:80-86).

    The input is written to parquet untimed as 8 time-ordered files; the
    timed region runs a file-source stream (maxFilesPerTrigger=1 -> 8
    triggers, so per-trigger micro-batch overhead — the dominant cost at
    this batch size — is inside the figure) through the full-hierarchy
    stateful operator into a noop sink.  Two shapes per spacing:
    ``metrics=1`` (the reference bench's single-series shape — inherently
    SERIAL: state is a sequential cursor per metric, so one group = one
    task regardless of cluster size) and ``metrics=256`` (the 100 TB
    shape: state groups parallelize across cores/executors).  An untimed
    warmup stream first pays the one-time codegen/Arrow-serializer cost
    so cells are comparable.  This is the latency-path figure — rows
    arriving continuously, closed rows pushed downstream per trigger;
    bulk (re)builds route through the batch cascade
    (insert_throughput/insert_matrix), which is ~10x faster per row
    because it skips per-trigger offset/state-commit costs.

    VERDICT r5 item 5: at 2^21 rows / 8 triggers every cell is
    per-trigger-overhead-bound (metrics=256 equaled metrics=1 within
    3%), so the parallelism claim had no number.  Two fixes: (a) an
    EMPTY-TRIGGER FLOOR is measured (same 8-trigger stream, 1 row per
    file) and every cell reports ``data_sec = sec - floor`` plus
    ``net_rows_per_sec`` — the decomposition that separates trigger
    machinery from data work; (b) one 4x-bigger cell pair
    (``parallel_shape``: 2^23 rows, 2 triggers — data work per trigger
    finally above the floor) runs metrics=1 vs metrics=256 so the
    group-parallel speedup is an observed ratio, not an assertion."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from hta_spark import Meta
    from hta_spark.streaming.live import stream_levels

    start0 = 1_519_832_293_179_227_888

    def gen(rows: int, n_metrics: int, spacing: int, start: int):
        """rows over n_metrics round-robin series, each strictly
        increasing at ``spacing`` (the multi-metric dummy ramp); metric
        built non-foldable for the same reason as tools.dummy."""
        return spark.range(rows).select(
            F.concat(F.lit("m"), (F.col("id") % n_metrics).cast("string"))
            .alias("metric"),
            (F.lit(start)
             + F.call_function("div", F.col("id"), F.lit(n_metrics))
             * F.lit(spacing)).alias("time"),
            (F.col("id").cast("double") + F.lit(1.0 / 3.0)).alias("value"))

    def run_one(spacing: int, n_metrics: int, files: int,
                rows_per_file: int) -> float:
        imin = 30 * spacing
        imax = imin
        while imax * 10 < _DAY_NS:
            imax *= 10
        meta = Meta(interval_min=imin, interval_max=imax,
                    interval_factor=10)
        tmp = tempfile.mkdtemp(prefix="hta_stream_bench_")
        try:
            src = os.path.join(tmp, "src")
            os.makedirs(src)
            # sequentially-written chunk files, ascending in time both
            # within and across files (the file source processes files in
            # (mtime, path) order; zero-padded names pin the tie-break)
            for i in range(files):
                chunk_dir = os.path.join(tmp, f"chunk{i}")
                gen(rows_per_file, n_metrics, spacing,
                    start0 + (i * rows_per_file // n_metrics) * spacing) \
                    .coalesce(1).write.parquet(chunk_dir)
                part = next(f for f in sorted(os.listdir(chunk_dir))
                            if f.endswith(".parquet"))
                os.rename(os.path.join(chunk_dir, part),
                          os.path.join(src, f"{i:03d}.parquet"))
            stream = (spark.readStream
                      .schema("metric string, time long, value double")
                      .option("maxFilesPerTrigger", "1").parquet(src))
            out = stream_levels(stream, meta.level_intervals())
            t0 = time.perf_counter()
            q = (out.writeStream.format("noop")
                 .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                 .start())
            q.processAllAvailable()
            dt = time.perf_counter() - t0
            q.stop()
            return dt
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def _net(rows: int, dt: float, floor: float) -> dict:
        """Floor-decomposed cell fields.  ``net_rows_per_sec`` is NULL
        when the measured run does not exceed the empty-trigger floor
        (VERDICT r9 'What's wrong #1': ``n / max(dt - floor, 1e-9)``
        printed quadrillions/s into the record whenever the floor —
        itself a noisy median — exceeded the run; a floor-dominated cell
        has no meaningful net throughput, only a gross one)."""
        data = dt - floor
        return {"sec": round(dt, 3), "rows_per_sec": round(rows / dt),
                "data_sec": round(data, 3),
                "net_rows_per_sec": round(rows / data) if data > 0 else None,
                "floor_dominated": data <= 0}

    n_files = 8
    run_one(50_000_000, 1, 1, 2 ** 14)            # untimed warmup
    # empty-trigger floor: identical trigger count, 1 row per file — the
    # per-trigger offset/plan/state-commit machinery with ~zero data
    floor8 = _stats([run_one(50_000_000, 1, n_files, 1)
                     for _ in range(N_RUNS)])["median"]
    cells = []
    for spacing in (1_000_000_000 // 1_210_000, 50_000_000, 1_000_000_000):
        for n_metrics in (1, 256):
            dt = run_one(spacing, n_metrics, n_files, n // n_files)
            cells.append({"rows": n, "metrics": n_metrics,
                          "spacing_ns": spacing, **_net(n, dt, floor8)})
    # the conclusive parallel-shape pair: 4x rows over 2 triggers puts
    # per-trigger data work above the floor, so the metrics=256 /
    # metrics=1 ratio measures state-group parallelism itself.  This is
    # the HEADLINE streaming figure — the 8-trigger small-batch cells
    # above measure trigger machinery, not sustained data throughput.
    big = 2 ** 23
    floor2 = _stats([run_one(50_000_000, 1, 2, 1)
                     for _ in range(N_RUNS)])["median"]
    par = {}
    for n_metrics in (1, 256):
        dt = run_one(50_000_000, n_metrics, 2, big // 2)
        par[f"metrics_{n_metrics}"] = {"rows": big,
                                       **_net(big, dt, floor2)}
    d1 = par["metrics_1"]["data_sec"]
    d256 = par["metrics_256"]["data_sec"]
    par["parallel_speedup_data"] = (round(d1 / d256, 2) if d256 > 0
                                    else None)
    return {"headline": {
                "note": ("sustained net throughput at the 100 TB shape "
                         "(256 state groups, big triggers) — the "
                         "primary streaming number; small-trigger cells "
                         "below are per-trigger-overhead profiles"),
                "net_rows_per_sec_256_metrics":
                    par["metrics_256"]["net_rows_per_sec"],
                "parallel_speedup_vs_1_metric":
                    par["parallel_speedup_data"]},
            "trigger_floor_sec": {"triggers_8": floor8,
                                  "triggers_2": floor2},
            "parallel_shape": par, "cells": cells}


def _pipeline_latency(spark, qs) -> dict:
    """Informational timings for the curation-pipeline operators (not part
    of the headline total, which stays comparable across rounds).
    Per-query failure isolation: one broken query records its error and
    the rest of the section still measures."""
    out = {}
    for name in ("sample_stratified", "sample_domain_cap", "dedup_incremental",
                 "pack_contiguous",
                 "text_repetition",
                 "curation_report", "decontaminate_overlap",
                 "decontaminate_bloom", "decontaminate_bloom_fp",
                 "sketch_kmv_distinct", "sketch_hist_quantiles",
                 "text_rules", "text_classifier_score", "text_pii_scrub",
                 "q_range_join_incidents", "q_bucketed_join",
                 "mix_weights", "pipeline_funnel", "ann_knn_join",
                 "text_vocab", "text_unigram_surprisal", "q_range_frame",
                 "q_json_props", "q_unpivot", "q_dense_ids",
                 "ann_knn_join_ivf", "text_bpe_merges", "text_bpe_segment",
                 "hta_aggregate_auto", "hta_count_levels",
                 "ann_knn_label_accuracy", "sketch_hist_by_group",
                 "dedup_simhash_pairs", "text_tfidf",
                 "ann_semantic_dedup", "text_chunk_windows",
                 "dedup_incremental_neardup", "dedup_source_overlap",
                 "sample_top_quality", "pack_bin_report",
                 "dedup_ngram_jaccard_hotdrop", "dedup_neardup_bloom",
                 "text_strip_boilerplate", "dedup_repeated_spans",
                 "text_strip_boilerplate_anti", "dedup_trim_spans",
                 "ann_prototype_prune", "split_leakage_safe"):
        fn = qs.get(name)
        if fn is None:
            continue

        def one(fn=fn, name=name):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            sec = round(time.perf_counter() - t0, 3)
            _assert_windows_partitioned(df, name)
            return sec

        out[name] = _cell(f"pipeline_latency.{name}", one)
    return out


#: round-4 cold (first-pass) per-query seconds from BENCH_r04 — the delta
#: baseline for this round's report
PREV_ROUND = {
    "hta_level1_rollup": 2.363, "hta_level2_rollup": 2.209,
    "hta_aggregate_range": 2.237, "hta_retrieve_extended": 0.862,
    "hta_smooth3": 2.051, "hta_throttle": 2.451,
    "q1_pricing_summary": 0.685, "q3_shipping_priority": 1.472,
    "q5_local_supplier": 1.43, "q_sessionize": 0.827,
    "q_asof_signup": 0.546, "dedup_exact": 1.553,
    "dedup_minhash_lsh": 2.841, "dedup_embedding_cosine": 1.673,
    "dedup_simhash": 1.073, "text_quality": 0.55,
    "ann_cosine_topk": 0.562,
    # r4 insert_throughput cold_sec (first materialization incl. codegen)
    "rollup_build_16m": 8.897,
}


def _pin_page_cache() -> dict:
    """Read every input byte once, untimed, before pass 1 (VERDICT r3 item
    3: the same suite measured 18.5 s warm vs 43 s on a cold page cache —
    round-over-round deltas were dominated by cache state, not code).
    The sf0.1 inputs are ~17 MB, so pinning is cheap; the recorded
    /proc/meminfo Cached figure documents the state either way."""
    read = 0
    for d in (SF_DIR, "/root/testdata/sf0.001"):
        for root, _dirs, files in os.walk(d):
            for fn in files:
                try:
                    with open(os.path.join(root, fn), "rb") as f:
                        while chunk := f.read(1 << 20):
                            read += len(chunk)
                except OSError:
                    pass
    cached_kb = None
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("Cached:"):
                    cached_kb = int(line.split()[1])
                    break
    except OSError:
        pass
    return {"input_bytes_prewarmed": read, "meminfo_cached_kb": cached_kb}


def main() -> None:
    from hta_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="hta_spark_bench", extra_conf={
        # keep stdout clean for the one-line JSON contract
        "spark.ui.showConsoleProgress": "false"})
    # the dummy-store benches intentionally run partition-less windows
    # over TINY chunk-boundary frames: dummy()'s literal metric is
    # constant-folded out of the partition specs (a measured ~20% win on
    # the 16.7M build vs a fold-proof metric column — real stores read
    # metric from parquet and keep their keys).  WindowExec's
    # single-partition WARN is correct-but-noise for those plans, and the
    # bench tail is a parse surface, so quiet exactly that one logger.
    # COMPENSATION (VERDICT r5 item 4): every real-store benched query's
    # executed plan is asserted free of partition-less Windows instead
    # (_assert_windows_partitioned in the headline + pipeline loops), so
    # the quiet logger cannot hide a text_vocab-class regression.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR)
    except Exception:
        pass                      # cosmetic only; never fail the bench
    cache_state = _pin_page_cache()
    # housekeep=False: the gate's per-query gc pass must not run inside
    # bench-timed regions (ADVICE r14 — it lands a full JVM GC pause in
    # every pipeline_latency/headline cold figure).  Fallback covers an
    # older entry module without the kwarg.
    try:
        qs = entry_mod.queries(housekeep=False)
    except TypeError:
        qs = entry_mod.queries()
    # JVM/codegen warmup (excluded from timings): a small end-to-end pass
    warm = qs.get("hta_level1_rollup")
    if warm is not None:
        warm(spark, "/root/testdata/sf0.001") \
            .write.mode("overwrite").format("noop").save()
    canary_start = _host_canary(spark)
    timings: dict[str, float] = {}
    cold_timings: dict[str, float] = {}
    headline_runs: dict[str, dict] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        # N_RUNS cold passes (each rebuilds + re-analyzes the DataFrame —
        # the single-shot shape comparable to rounds 1-4's first pass;
        # passes 2+ reuse the codegen cache, so the FIRST pass stays the
        # cross-round cold figure) then N_RUNS steady passes re-executing
        # the SAME analyzed DataFrame (plan compiled once, page cache +
        # JIT warmed — the shape a resident engine runs).
        # `queries`/`value` carry the steady MEDIAN, `cold_queries`/
        # `cold_sec` the true first pass; full {median,min,max,n} spreads
        # for both modes go to BENCH_DETAIL (VERDICT r4 items 2-3).
        def one_query(fn=fn, name=name):
            colds: list[float] = []
            df = None
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                df.write.mode("overwrite").format("noop").save()
                colds.append(time.perf_counter() - t0)
            _assert_windows_partitioned(df, name)
            steadies: list[float] = []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                steadies.append(time.perf_counter() - t0)
            return colds, steadies

        got = _cell(f"headline.{name}", one_query)
        if isinstance(got, dict):        # isolated failure: one entry lost
            headline_runs[name] = got
            continue
        colds, steadies = got
        cold_timings[name] = round(colds[0], 3)
        timings[name] = _stats(steadies)["median"]
        headline_runs[name] = {
            "cold": {**_stats(colds), "first": round(colds[0], 3)},
            "steady": _stats(steadies)}
    insert = _cell("insert_throughput", _insert_throughput, spark)
    if "error" not in insert:
        timings["rollup_build_16m"] = insert["sec"]
        headline_runs["rollup_build_16m"] = {
            "cold": {"first": insert["cold_sec"], "n": 1},
            "steady": insert["full_runs"]}
        # the COLD entry is the first materialization (codegen included)
        # so the cold delta vs prior rounds compares first-pass to
        # first-pass; `sec` (best warm full-recompute, plan excluded) is
        # the steady figure
        cold_timings["rollup_build_16m"] = insert["cold_sec"]
    total = round(sum(timings.values()), 3)
    cold_total = round(sum(cold_timings.values()), 3)

    def mk_headline(canary_end) -> dict:
        # normalize by the effective cores-canary DURING the run (mean of
        # the before/after samples): a throttle present for the whole run
        # scales both; one arriving mid-run is caught part-way and visibly
        # disagrees between the two samples — both are in the record.
        # Before the detail cells run (or if the end canary errored) the
        # start sample alone normalizes.
        ends = ([canary_end["cores_sec"]]
                if isinstance(canary_end, dict) and "cores_sec" in canary_end
                else [])
        cores_now = (canary_start["cores_sec"] + sum(ends)) / (1 + len(ends))
        return {
            "metric": "headline_suite_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "cold_sec": cold_total,
            "cold_queries": cold_timings,
            "canary": {
                "start": canary_start, "end": canary_end,
                "ref": CANARY_REF,
                "host_speed_vs_ref": round(
                    CANARY_REF["cores_sec"] / cores_now, 3)},
            "value_normalized": _normalized(total, cores_now),
            "cold_sec_normalized": _normalized(cold_total, cores_now),
            "sf": _sf_label(SF_DIR),
        }

    def write_detail(detail: dict) -> None:
        path = os.environ.get("SPARK_GRAFT_BENCH_DETAIL") or os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
        try:
            with open(path, "w") as f:
                json.dump(detail, f, indent=1)
        except OSError:
            pass

    # Full detail (insert matrix, per-level latencies, round-over-round
    # deltas) goes to a FILE: the driver's BENCH capture keeps only a small
    # tail of stdout, and round 2's single giant line lost its head (the
    # headline) to that window.  stdout gets ONE compact parseable line.
    #
    # VERDICT r10 items 2/3: the headline record is banked BEFORE any
    # detail cell runs (partial BENCH_DETAIL on disk), every detail cell
    # is failure-isolated (_cell), and the final stdout line prints
    # unconditionally — one crashing cell can never again erase the
    # round's bench (r10 lost its entire record to one broadcast OOM).
    detail = dict(mk_headline(None))
    detail.update({"partial": True,
                   "page_cache": cache_state,
                   "headline_runs": headline_runs,
                   "insert_throughput": insert,
                   "delta_vs_prev_sec": {
                       k: round(cold_timings[k] - PREV_ROUND[k], 3)
                       for k in cold_timings if k in PREV_ROUND}})
    write_detail(detail)
    del detail["partial"]

    cells = [
        ("insert_matrix", lambda s: _insert_matrix(s)),
        ("query_latency", lambda s: _query_latency(s)),
        ("aggregate_crossover_16m", lambda s: _aggregate_crossover(s)),
        ("streaming_ingest_throughput", lambda s: _streaming_throughput(s)),
        ("ivf_skew_hot_centroid", lambda s: _ivf_skew_cell(s)),
        ("throttle_dispatch", lambda s: _throttle_dispatch_cell(s)),
        ("scale_evidence", lambda s: (
            {"skipped": "SPARK_GRAFT_SCALE_EVIDENCE=0"}
            if os.environ.get("SPARK_GRAFT_SCALE_EVIDENCE") == "0"
            else _scale_evidence(s))),
        ("pipeline_latency_sec", lambda s: _pipeline_latency(s, qs)),
    ]
    for key, fn in cells:
        detail[key] = _cell(key, fn, spark)
        write_detail(detail)          # bank progress after every cell

    canary_end = _cell("canary_end", _host_canary, spark)
    headline = mk_headline(canary_end)
    detail.update(headline)
    # flatten the latency cell's two historical top-level keys so the
    # record stays comparable with pre-r11 BENCH_DETAILs
    if isinstance(detail.get("query_latency"), dict) \
            and "flex_latency_sec" in detail["query_latency"]:
        detail.update(detail.pop("query_latency"))
    write_detail(detail)
    # leading newline: Spark's console progress bar ends lines with a bare
    # carriage return, which would glue the JSON to a progress line and
    # break line-anchored parsing of the headline
    sys.stdout.write("\n" + json.dumps(headline) + "\n")
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
