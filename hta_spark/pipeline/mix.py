"""Domain-mixture planning: turn target corpus proportions into
deterministic per-source sampling rates.

The last step of a training-data pipeline: given how many tokens each
source actually has and what share of the training budget each source
SHOULD contribute (the mixture weights of the Pile / Dolma / Llama
recipes), compute the per-source keep-rate that realizes the mixture —
then feed those rates straight into
:func:`hta_spark.pipeline.sample.stratified_sample`, whose md5 keep/drop
makes the realized sample reproducible on any engine, any partitioning.

Shape at 100 TB: one grouped token count over the corpus (map-side
combined), joined to a broadcast target frame of a few dozen rows; the
output is itself the tiny rates frame that `stratified_sample` broadcasts.
No data-sized shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens_col
from .sample import BP

__all__ = ["source_token_counts", "mix_weights"]


def source_token_counts(docs: DataFrame, source_col: str = "source",
                        text_col: str = "text") -> DataFrame:
    """Tokens and documents per source (whitespace tokenization, matching
    the rest of the pipeline)."""
    n_tok = F.size(tokens_col(F.col(text_col)))
    return (docs.groupBy(source_col)
            .agg(F.sum(n_tok).cast("long").alias("source_tokens"),
                 F.count("*").cast("long").alias("source_docs")))


def mix_weights(docs: DataFrame, targets: dict[str, float] | DataFrame,
                budget_tokens: int, source_col: str = "source",
                text_col: str = "text") -> DataFrame:
    """Per-source sampling plan for a target mixture.

    ``targets``: ``{source: share}`` (shares need not sum to 1 — they are
    normalized) or an equivalent ``(source, share)`` DataFrame.  For each
    source: ``want_tokens = budget * share / sum(shares)``,
    ``rate_bp = min(10000, floor(10000 * want / have))`` — the basis-point
    rate ``stratified_sample`` consumes — and ``expect_tokens``, the
    tokens the rate actually yields in expectation (== want unless the
    source is exhausted, i.e. ``rate_bp`` capped at 10000).  Sources with
    no target share get rate 0; target sources missing from the corpus
    are reported with ``source_tokens = 0, rate_bp = 0``.
    """
    spark = docs.sparkSession
    if isinstance(targets, dict):
        targets = spark.createDataFrame(
            sorted((str(k), float(v)) for k, v in targets.items()),
            f"{source_col} string, share double")
    # shares must normalize: a zero/empty target sum has no meaning and
    # would propagate NULL rates into every downstream join — fail fast.
    # (The collect is targets-sized driver state, same class as the
    # broadcast itself.)
    ts_row = targets.agg(F.sum("share").alias("_ts")).collect()
    total_share = float(ts_row[0]["_ts"] or 0.0) if ts_row else 0.0
    if not total_share > 0.0:
        raise ValueError(
            f"target shares sum to {total_share} — the mixture is "
            "undefined; provide at least one positive share")
    have = source_token_counts(docs, source_col, text_col)
    # no broadcast hint: Spark cannot broadcast either side of a FULL
    # outer join (every unmatched row of both sides must surface), so the
    # hint is ignored with a HintErrorLogger warning per analysis.  Both
    # sides are source-count-sized aggregates; the sort-merge join over
    # them is trivial.
    j = have.join(targets, source_col, "full")
    tokens = F.coalesce("source_tokens", F.lit(0).cast("long"))
    want = (F.lit(float(budget_tokens)) * F.coalesce("share", F.lit(0.0))
            / F.lit(total_share))
    rate = F.when(tokens > 0, F.least(
        F.lit(int(BP)).cast("long"),
        F.floor(F.lit(float(BP)) * want / tokens.cast("double"))
    )).otherwise(F.lit(0).cast("long"))
    return (j.select(
        F.col(source_col),
        tokens.alias("source_tokens"),
        F.coalesce("source_docs", F.lit(0).cast("long"))
        .alias("source_docs"),
        F.coalesce("share", F.lit(0.0)).alias("share"),
        rate.alias("rate_bp"))
        .withColumn("expect_tokens",
                    F.floor(F.col("source_tokens")
                            * F.col("rate_bp") / F.lit(int(BP)))
                    .cast("long")))
