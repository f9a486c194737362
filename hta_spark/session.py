"""SparkSession factory with the engine's required configs.

Scale notes (local[N] here; multi-executor by design):
- AQE on: runtime partition coalescing + skew-join splitting.
- shuffle.partitions sized to cores locally; on a real cluster this should be
  ~2-3x total executor cores (or left to AQE with a high initial value).
- ``nanosAsLong``: the engine's native timestamp representation is int64 ns
  (see hta_spark.chrono); parquet TIMESTAMP(NANOS) columns load losslessly as
  LongType instead of erroring.
- Arrow enabled: every pandas_udf / applyInPandas crossing is Arrow-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .compat import set_log_level


def get_spark(app_name: str = "hta_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    b = (
        SparkSession.builder
        .master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    set_log_level(spark, "WARN")
    return spark
