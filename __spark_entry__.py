"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship hierarchical-rollup query on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
training-data pipeline surface; ``oracle_sql()`` gives the DuckDB-equivalent
SQL for the driver's correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

_REQUIRED_CONF = {
    # engine-native ns timestamps: parquet TIMESTAMP(NANOS) loads as long
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}


def _conf(spark: SparkSession) -> SparkSession:
    for k, v in _REQUIRED_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception as e:
            # verify-and-warn instead of swallowing: a silently missing
            # nanosAsLong / non-UTC zone surfaces much later as an
            # unrelated-looking schema error or shifted ns values
            try:
                current = spark.conf.get(k, None)
            except Exception:
                current = None
            if current != v:
                print(f"WARNING: required conf {k}={v!r} could not be "
                      f"set (current: {current!r}): {e}", file=sys.stderr)
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: hierarchical level-1 rollup (LAST-semantics
    min/max/sum/count/integral/active_time) of the events stream."""
    from hta_spark.queries_hta import q_hta_level1
    return q_hta_level1(_conf(spark), "/root/testdata/sf0.001")


#: Entries promoted into the registry's leading block (the driver's
#: per-round correctness gate samples the leading 50).  The rotation
#: changes each round so every registry entry eventually acquires a
#: driver-green row (VERDICT r9 item 7 / r10 item 6) without removing
#: anything from the registry — every query stays present, and the
#: committed sf0.1 full sweep still covers all of them each round.
#:
#: r10 rotated the LLM-pipeline core in (all 32 driver-green in
#: CORRECTNESS_r10); r11 rotates in the remaining never-driver-gated
#: block: the three r10 ops + the new chunking query, the TPC-H
#: remainder (q1/q3/q5 are headline-benched; q2-q22 relied on the
#: sweep), and the window/scalar breadth set.  r12 candidates (added
#: during r11, currently sweep-only): dedup_incremental_neardup,
#: dedup_source_overlap, sample_top_quality, plus the remaining
#: trailing scalar/string entries.
_GATE_ROTATION = [
    "dedup_simhash_pairs", "text_tfidf", "ann_semantic_dedup",
    "text_chunk_windows",
    "q2_min_cost_supplier", "q4_order_priority", "q6_forecast_revenue",
    "q7_nation_volume", "q8_market_share", "q9_profit_by_nation",
    "q10_returned_items", "q11_important_stock", "q12_priority_case",
    "q13_order_distribution", "q14_promo_share", "q15_top_supplier",
    "q16_supplier_variety", "q17_below_avg", "q18_large_orders",
    "q19_disjunction", "q20_excess_suppliers", "q21_last_shipper",
    "q22_idle_balances",
    "q_window_funcs", "q_full_outer", "q_percentiles",
    "q_string_breadth", "q_date_breadth", "q_array_stats",
    "q_session_window", "q_range_frame", "q_json_props",
]


def _registry() -> dict[str, tuple]:
    from hta_spark.queries_extra import EXTRA_QUERIES
    from hta_spark.queries_hta import HTA_QUERIES
    from hta_spark.queries_pipeline import PIPELINE_QUERIES
    from hta_spark.queries_rel import REL_QUERIES
    from hta_spark.queries_scale import SCALE_QUERIES
    full: dict[str, tuple] = {}
    full.update(HTA_QUERIES)
    full.update(REL_QUERIES)
    full.update(PIPELINE_QUERIES)
    full.update(EXTRA_QUERIES)
    full.update(SCALE_QUERIES)
    reg: dict[str, tuple] = dict(HTA_QUERIES)
    for name in _GATE_ROTATION:
        reg[name] = full[name]
    reg.update(full)              # everything else, original order
    return reg


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {}
    for name, (fn, _sql) in _registry().items():
        def wrapped(spark, sf_dir, _fn=fn):
            return _fn(_conf(spark), sf_dir)
        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (fn, sql) in _registry().items()
            if sql is not None}
