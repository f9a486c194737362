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
    "dedup_simhash",
    "text_quality",
    "ann_cosine_topk",
]


def _insert_throughput(spark, n: int = 2 ** 24) -> dict:
    """The reference's insert-throughput matrix analog
    (/root/reference/tests/bench.cpp:43-88): build the full rollup
    hierarchy over n ramp points at 50 ms spacing with recommended params
    (interval_min = 30x spacing, factor 10).  Uses the salted window path —
    a single metric is the worst-case skew shape."""
    from hta_spark import Meta
    from hta_spark.operators import build_levels
    from hta_spark.operators.tools import dummy

    df = dummy(spark, count=n, time_delta_ns=50_000_000, value=None) \
        .repartition(32)
    meta = Meta(interval_min=1_500_000_000, interval_max=1_500_000_000_000,
                interval_factor=10)

    def one_run() -> float:
        t0 = time.perf_counter()
        levels = build_levels(df, meta, salt_chunks=256)
        for lvl in levels.values():
            lvl.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    cold = one_run()     # includes codegen compilation for this pipeline
    steady = one_run()   # the throughput figure
    return {"rows": n, "sec": round(steady, 3), "cold_sec": round(cold, 3),
            "rows_per_sec": round(n / steady)}


def main() -> None:
    from hta_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="hta_spark_bench")
    qs = entry_mod.queries()
    # JVM/codegen warmup (excluded from timings): a small end-to-end pass
    warm = qs.get("hta_level1_rollup")
    if warm is not None:
        warm(spark, "/root/testdata/sf0.001") \
            .write.mode("overwrite").format("noop").save()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    insert = _insert_throughput(spark)
    timings["rollup_build_16m"] = insert["sec"]
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_label(SF_DIR),
        "insert_throughput": insert,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
