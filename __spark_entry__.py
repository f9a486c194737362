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


#: Pipeline/scale entries promoted into the registry's leading block
#: (VERDICT r9 item 7): the driver's per-round correctness gate has
#: sampled the same leading 50 queries since r1 and never reached the
#: LLM-pipeline surface — ordering these right after the HTA core puts
#: them inside the hard gate without removing anything from the registry
#: (every query stays present; the sf0.1 full sweep still covers all).
_GATE_ROTATION = [
    "dedup_exact", "dedup_minhash_lsh", "dedup_lsh_recall",
    "dedup_simhash", "dedup_ngram_jaccard", "dedup_components",
    "dedup_cluster_keep", "dedup_incremental", "dedup_embedding_cosine",
    "text_quality", "text_lang_id", "text_token_stats",
    "text_bpe_merges", "text_bpe_segment", "text_pii_scrub",
    "text_classifier_score", "decontaminate_overlap",
    "decontaminate_bloom", "sketch_kmv_distinct", "sketch_hist_quantiles",
    "sample_stratified", "sample_domain_cap", "ann_cosine_topk",
    "ann_knn_join", "ann_knn_join_ivf", "ann_ivf_recall",
    "ann_kmeans_lite", "mix_weights", "pack_contiguous",
    "curation_report", "pipeline_funnel", "q_dense_ids",
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
