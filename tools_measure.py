#!/usr/bin/env python
"""Per-query measurement helper for the r15 optimization round.

Usage: python tools_measure.py q1,q2,... [--runs N] [--plans DIR] [--suffix before]

Times each named registry query in isolation with the noop sink on the
same session shape bench.py uses (cold = build+execute, steady = re-execute
the same analyzed frame), and optionally dumps .explain("formatted") to
DIR/<name>_<suffix>.txt.  Not part of the bench contract — a dev tool.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1].split(",")
    runs = 3
    plans_dir = None
    suffix = "before"
    args = sys.argv[2:]
    while args:
        a = args.pop(0)
        if a == "--runs":
            runs = int(args.pop(0))
        elif a == "--plans":
            plans_dir = args.pop(0)
        elif a == "--suffix":
            suffix = args.pop(0)
    from hta_spark.session import get_spark
    import __spark_entry__ as entry_mod
    spark = get_spark(app_name="r15_measure", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR)
    except Exception:
        pass
    qs = entry_mod.queries(housekeep=False)
    warm = qs.get("hta_level1_rollup")
    if warm is not None:
        warm(spark, "/root/testdata/sf0.001").write.mode(
            "overwrite").format("noop").save()
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"measure:{name}")
        colds, steadies = [], []
        df = None
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            colds.append(time.perf_counter() - t0)
        for _ in range(runs):
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            steadies.append(time.perf_counter() - t0)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"),
                      "w") as f:
                f.write(plan)
        fmt = lambda xs: "/".join(f"{x:.3f}" for x in sorted(xs))
        print(f"{name}: cold[{fmt(colds)}] steady[{fmt(steadies)}]",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
