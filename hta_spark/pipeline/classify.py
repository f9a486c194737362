"""Hashed linear classifier scoring — the fasttext-style learned quality
filter (Joulin et al. 2016; the wiki-vs-crawl scorer of GPT-3/LLaMA corpus
curation), as the third standard filtering pass next to the rule-based
(:mod:`.rules`) and unigram-LM (``text_unigram_surprisal``) ones.

The hashing trick maps each token to one of ``dim`` buckets
(md5-derived, engine-portable); a document's score is the mean bucket
weight.  Everything is built-in JVM array expressions folded IN ROW —
scoring is map-only (zero shuffles, plan-tested), which at 100 TB makes
this pass scan-bound like the rule filter.

Weights come in two forms:

- ``weights=None`` (default): a deterministic hash-derived pseudo-model —
  integer weights in [-1000, 1000] micro-units computed from the bucket
  id itself, so the whole scoring pipeline (tokenize -> hash -> fold ->
  normalize -> threshold) is reproducible in DuckDB and oracle-gated
  (``text_classifier_score``).  Training is out of scope by design: the
  engine's job is SCORING at corpus scale; models are trained offline.
- an explicit ``weights`` list (a trained model): shipped as ONE
  broadcast row and indexed per token — same plan shape, tested against
  a numpy re-implementation.

Integer-exactness convention (the repo-wide order-robust rule): per-doc
weight sums accumulate as int64 micro-units — ``score`` is a SINGLE
division of two exact integers, so Spark and DuckDB agree bit-for-bit
regardless of token order; explicit float weights quantize to micro-units
on the way in for the same reason.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import md5_long, tokens_col

__all__ = ["CLS_DIM", "CLS_WEIGHT_SPAN", "bucket_col", "pseudo_weight_col",
           "hashed_linear_score"]

#: default hashing-trick table size; collisions are part of the method
#: (Weinberger et al. 2009), not an error
CLS_DIM = 4096
#: pseudo-model weights are integers in [-CLS_WEIGHT_SPAN, CLS_WEIGHT_SPAN]
#: micro-units (score normalizes by CLS_WEIGHT_SPAN * n_tokens)
CLS_WEIGHT_SPAN = 1000


def bucket_col(token: Column, dim: int = CLS_DIM) -> Column:
    """Token -> feature bucket in [0, dim): the hashing trick with the
    repo's md5_long convention (seed 'feat')."""
    return F.pmod(md5_long(token, "feat"), F.lit(int(dim)))


def pseudo_weight_col(bucket: Column,
                      span: int = CLS_WEIGHT_SPAN) -> Column:
    """Deterministic integer weight in [-span, span] for a bucket id —
    the hash-derived pseudo-model (seed 'w' over the DECIMAL string of
    the bucket, identical to DuckDB's CAST(h AS VARCHAR))."""
    return (F.pmod(md5_long(bucket.cast("string"), "w"),
                   F.lit(2 * int(span) + 1)) - F.lit(int(span)))


def hashed_linear_score(docs: DataFrame, dim: int = CLS_DIM,
                        threshold: float = 0.0,
                        weights: list[float] | None = None,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Per document: token count, exact integer weight sum (micro-units),
    mean-weight ``score`` and the ``keep`` verdict — one map-only pass.

    With explicit ``weights`` (len == dim) the model ships as a single
    broadcast row (a BroadcastNestedLoopJoin with one build row — no
    shuffle, same pattern as :func:`..ann.centroid_frame`), quantized to
    micro-units so the fold stays exact-integer.

    NULL ``text`` scores as the empty document (n_tokens=0, w_sum=0,
    score=0.0) rather than propagating a NULL token array (whose
    ``F.size`` is -1 and whose fold is NULL) — mirrored in the oracle's
    LEFT JOIN back to ``documents`` (ADVICE r6: real corpora have NULL
    text even though the test corpus didn't)."""
    toks = F.coalesce(tokens_col(F.col(text_col)),
                      F.array().cast("array<string>")).alias("_t")
    base = docs.select(F.col(id_col), toks)
    span = CLS_WEIGHT_SPAN
    if weights is not None:
        if len(weights) != int(dim):
            raise ValueError(
                f"weights length {len(weights)} != dim {dim}")
        q = [int(round(w * span)) for w in weights]
        wrow = docs.sparkSession.createDataFrame(
            [(q,)], "_w array<long>")
        base = base.join(F.broadcast(wrow))
        w_of = (lambda t: F.element_at(
            F.col("_w"), (bucket_col(t, dim) + 1).cast("int")))
    else:
        w_of = (lambda t: pseudo_weight_col(bucket_col(t, dim), span))
    wsum = F.aggregate(
        F.transform(F.col("_t"), w_of),
        F.lit(0).cast("long"), lambda a, x: a + x)
    n = F.size(F.col("_t")).cast("long")
    out = base.select(
        F.col(id_col), n.alias("n_tokens"), wsum.alias("w_sum"))
    score = (F.col("w_sum").cast("double")
             / (F.lit(int(span)) * F.col("n_tokens")).cast("double"))
    return (out.select(
        F.col(id_col), "n_tokens", "w_sum",
        F.when(F.col("n_tokens") > 0, score)
        .otherwise(F.lit(0.0)).alias("score"))
        .withColumn("keep", F.col("score") >= F.lit(float(threshold))))
