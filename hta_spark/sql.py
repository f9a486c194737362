"""SQL surface: expose the engine's tables and derived relations as temp
views so everything is queryable via ``spark.sql`` (Catalyst planned, same
plans as the DataFrame API).

The reference has no SQL layer (SURVEY.md §3); this is part of the
"standard surface Spark gives for free" (§2.4) — wired so a SQL user can
query raw series, every rollup level, and the HTA row shape directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .meta import Meta
from .operators.rollup import build_levels

__all__ = ["register_views", "register_store"]


def register_views(spark: SparkSession, raw: DataFrame, meta: Meta,
                   prefix: str = "hta") -> dict[str, str]:
    """Register ``<prefix>_raw`` and ``<prefix>_level_<ns>`` temp views for
    an in-memory raw DataFrame; returns view-name map.

    Example::

        register_views(spark, raw, Meta())
        spark.sql('''
          SELECT metric, interval_start,
                 integral / active_time AS mean_value
          FROM hta_level_10000000000
          WHERE interval_start BETWEEN :b AND :e
        ''')
    """
    names = {}
    raw.createOrReplaceTempView(f"{prefix}_raw")
    names["raw"] = f"{prefix}_raw"
    for iv, df in build_levels(raw, meta).items():
        nm = f"{prefix}_level_{iv}"
        df.createOrReplaceTempView(nm)
        names[iv] = nm
    return names


def register_store(spark: SparkSession, store, prefix: str = "hta") -> dict[str, str]:
    """Register a persisted :class:`~hta_spark.sources.store.HtaStore`'s
    tables (raw + all materialized levels) as temp views."""
    names = {}
    raw = store.raw()
    if raw is not None:
        raw.createOrReplaceTempView(f"{prefix}_raw")
        names["raw"] = f"{prefix}_raw"
    import os
    lvl_dir = f"{store.base}/levels"
    if os.path.isdir(lvl_dir):
        for d in sorted(os.listdir(lvl_dir)):
            if d.endswith(".tmp"):
                continue
            try:
                iv = int(d)
            except ValueError:
                continue
            df = store.level(iv)
            if df is not None:
                nm = f"{prefix}_level_{iv}"
                df.createOrReplaceTempView(nm)
                names[iv] = nm
    return names
