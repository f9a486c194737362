"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

The standard LLM-corpus hygiene step (GPT-3 appendix C / PaLM / Llama style):
any training document containing an n-gram that also appears in an eval
benchmark is contaminated and must be dropped or cleaned before training.

100 TB shape: the eval side is always tiny (benchmarks are thousands of
documents; the training corpus is billions), so the eval n-gram set ships
as a BROADCAST frame and the CONTAINMENT test itself is a map-side hash
join on the training shingle stream.  Honest shuffle accounting (review
r4): the per-document gram SET is computed map-side with
``array_distinct`` (no exchange), so the only shuffle of training data
is the per-document overlap count — one hash exchange keyed by doc id,
partial-aggregated map-side, never all-pairs.  (A zero-shuffle form
would need the eval set visible inside a row expression; Spark expresses
a reusable broadcast lookup only through the join, so one grouped count
is the floor.)  Everything is
built-in JVM expressions (split / transform / explode); no Python in the
hot path.

The reference has no text surface; this extends the training-data pipeline
surface (BASELINE.json) alongside dedup / sampling / quality scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingles_from_tokens, tokens_col

__all__ = ["doc_ngrams", "eval_ngram_set", "decontaminate"]


def doc_ngrams(docs: DataFrame, n: int = 5, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """One row per DISTINCT word n-gram per document: ``(id_col, gram)``.

    Distinct-per-doc so a gram repeated inside one document counts once in
    the overlap fraction (matching the per-doc set semantics of the
    published decontamination recipes).  The per-doc set is computed
    MAP-SIDE with ``array_distinct`` before the explode — dedup within a
    document never needs a shuffle (the old ``.distinct()`` was a full
    hash exchange of the exploded gram stream)."""
    toks = tokens_col(F.col(text_col)).alias("_t")
    return (docs.select(F.col(id_col), toks)
            .select(F.col(id_col),
                    F.explode(F.array_distinct(
                        shingles_from_tokens(F.col("_t"), n)))
                    .alias("gram")))


def eval_ngram_set(eval_docs: DataFrame, n: int = 5,
                   text_col: str = "text") -> DataFrame:
    """The global distinct n-gram set of the eval benchmark — the small
    side that gets broadcast."""
    toks = tokens_col(F.col(text_col)).alias("_t")
    return (eval_docs.select(toks)
            .select(F.explode(shingles_from_tokens(F.col("_t"), n))
                    .alias("gram"))
            .distinct())


def decontaminate(train: DataFrame, eval_docs: DataFrame, n: int = 5,
                  threshold: float = 0.1, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per training document: distinct n-gram count, how many of those
    grams appear anywhere in the eval set, the overlap fraction, and the
    contamination flag (``overlap_frac >= threshold``).

    Plan: eval grams -> broadcast; train grams LEFT-SEMI-shaped via a
    broadcast hash join marker; one grouped count per doc.  Documents
    shorter than ``n`` tokens produce zero grams and are reported with
    ``n_grams = 0, overlap_frac = 0.0`` (cannot be contaminated under the
    n-gram definition).
    """
    grams = doc_ngrams(train, n, text_col, id_col)
    marks = F.broadcast(
        eval_ngram_set(eval_docs, n, text_col).withColumn("_hit", F.lit(1)))
    per_doc = (grams.join(marks, "gram", "left")
               .groupBy(id_col)
               .agg(F.count("*").cast("long").alias("n_grams"),
                    F.count("_hit").cast("long").alias("n_hit")))
    # left join keeps doc rows even with zero grams? No: zero-gram docs have
    # no gram rows at all — restore them from the train side.
    ids = train.select(F.col(id_col))
    frac = (F.col("n_hit").cast("double")
            / F.col("n_grams").cast("double"))
    return (ids.join(per_doc, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_grams", F.lit(0).cast("long"))
                    .alias("n_grams"),
                    F.coalesce("n_hit", F.lit(0).cast("long"))
                    .alias("n_hit"),
                    F.when(F.coalesce("n_grams", F.lit(0)) > 0, frac)
                    .otherwise(F.lit(0.0)).alias("overlap_frac"))
            .withColumn("contaminated",
                        F.col("overlap_frac") >= F.lit(float(threshold))))
