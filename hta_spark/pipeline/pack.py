"""Contiguous document packing — the batch-construction step of a
pretraining pipeline: documents are concatenated in a deterministic order
and sliced into fixed-size windows ("bins"); each document is assigned the
window containing its start offset.

Spark-first formulation: one windowed cumulative sum per shard (no UDF, no
driver loop).  A single global ordering would serialize at 100 TB, so
packing is sharded: each shard packs independently (`shard_col`), which is
exactly how distributed training shards its data stream anyway.  Within a
shard the assignment is a pure function of the (ordered) sizes, so reruns
reproduce the same bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_contiguous", "chunk_documents", "bin_report"]


def bin_report(packed: DataFrame, budget: int,
               shard_col: str | None = None,
               size_col: str = "n_chars") -> DataFrame:
    """Packing-efficiency report per shard over :func:`pack_contiguous`
    output — the training-batch utilization diagnostic: ``(shard?,
    n_docs, n_bins, total_size, last_bin_fill, max_docs_per_bin)``.

    Concatenate-and-slice packing is CONTIGUOUS, so every bin except the
    shard's last is exactly full by construction — the only waste in the
    stream is the last bin's unfilled tail, ``budget - last_bin_fill``.
    ``n_bins`` is the count of bins the stream actually OCCUPIES,
    ``ceil(total_size / budget)`` — NOT the count of bins containing a
    document start (a straddling doc's spill-over occupies bins no doc
    starts in, so start-bin counting undercounts and can report
    ``last_bin_fill > budget``).  ``last_bin_fill = total_size -
    (n_bins-1)*budget`` follows, always in ``[1, budget]`` for a
    non-empty shard.  ``max_docs_per_bin`` counts docs by their START
    bin (the packing assignment) and bounds the per-window document
    mixing a loader sees.  Two map-side-combined aggregations (bin then
    shard) — output is #shards rows."""
    if int(budget) < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    part = [shard_col] if shard_col else []
    per_bin = (packed.groupBy(*part, "bin_id")
               .agg(F.count("*").cast("long").alias("_docs"),
                    F.sum(size_col).cast("long").alias("_size")))
    rep = (per_bin.groupBy(*part)
           .agg(F.sum("_docs").cast("long").alias("n_docs"),
                F.sum("_size").cast("long").alias("total_size"),
                F.max("_docs").cast("long").alias("max_docs_per_bin")))
    budget_l = F.lit(int(budget))
    # greatest(1, ...): a shard whose docs are all zero-size still
    # occupies bin 0 (docs sit at offset 0), so a non-empty shard never
    # reports n_bins=0 / last_bin_fill=budget (review r12)
    n_bins = F.greatest(
        F.lit(1).cast("long"),
        F.call_function(
            "div", F.col("total_size") + budget_l - 1, budget_l)
        .cast("long"))
    rep = rep.withColumn("n_bins", n_bins)
    last_fill = (F.col("total_size")
                 - (F.col("n_bins") - 1) * budget_l)
    cols = part + ["n_docs", "n_bins", "total_size"]
    return rep.select(*cols, last_fill.alias("last_bin_fill"),
                      "max_docs_per_bin")


def chunk_documents(docs: DataFrame, size: int, stride: int | None = None,
                    text_col: str = "text", id_col: str = "doc_id",
                    min_tokens: int = 1) -> DataFrame:
    """Slice each document into fixed-token training windows: ``(doc_id,
    chunk_id, chunk_text, n_tokens)`` with chunk i covering tokens
    ``[i*stride, i*stride + size)`` (1-based slice internally).

    ``stride`` defaults to ``size`` (disjoint windows); ``stride < size``
    gives overlapping context windows.  The final partial window is kept
    when it has at least ``min_tokens`` NEW tokens past the previous
    window (so a doc is never silently truncated, and stride-overlap
    never emits a trailing window that adds nothing).  The filter applies
    ONLY to the last window of each doc (ADVICE r10): an interior window
    of an overlapping slicing contributes exactly ``stride`` new tokens
    by construction, so filtering interior windows too would silently
    drop them all whenever ``min_tokens > stride``.

    Map-only: tokens materialize once per row, windows come from one
    ``sequence`` + ``transform`` + ``posexplode`` — zero shuffles, zero
    UDFs, linear in corpus tokens regardless of document length (the
    per-doc blowup is ~size/stride, a constant).  This is the step
    between curation and packing: curated docs in, model-window rows
    out; feed ``n_tokens`` to :func:`pack_contiguous` downstream."""
    from .dedup import tokens_col

    size = int(size)
    stride = size if stride is None else int(stride)
    if size < 1 or stride < 1:
        raise ValueError(f"size and stride must be >= 1, got "
                         f"{size}/{stride}")
    if stride > size:
        raise ValueError(f"stride ({stride}) > size ({size}) would drop "
                         "tokens between consecutive windows")
    toks = docs.select(F.col(id_col),
                       tokens_col(F.col(text_col)).alias("_t"))
    n = F.size("_t")
    # windows whose start is in-range AND which contribute >= min_tokens
    # new tokens: starts 0, stride, ... while start < n (at least one)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(size)).cast("double") / F.lit(stride))
        .cast("long") + 1)
    idx = F.sequence(F.lit(0).cast("long"), n_chunks - 1)
    chunks = F.transform(
        idx, lambda i: F.slice(F.col("_t"),
                               (i * stride + 1).cast("int"), size))
    out = (toks.select(F.col(id_col), n_chunks.alias("_nc"),
                       F.posexplode(chunks).alias("chunk_id", "_c"))
           .withColumn("n_tokens", F.size("_c").cast("long")))
    # ONLY the trailing window must add >= min_tokens tokens past the
    # previous window's end (previous end = (chunk_id-1)*stride + size);
    # interior windows always add exactly `stride` new tokens and are
    # always kept
    new_toks = (F.col("chunk_id") * stride + F.col("n_tokens")
                - F.when(F.col("chunk_id") > 0,
                         (F.col("chunk_id") - 1) * stride + size)
                .otherwise(F.lit(0)))
    return (out.filter((F.col("chunk_id") == 0)
                       | (F.col("chunk_id") < F.col("_nc") - 1)
                       | (new_toks >= F.lit(int(min_tokens))))
            .select(id_col, F.col("chunk_id").cast("long").alias("chunk_id"),
                    F.concat_ws(" ", "_c").alias("chunk_text"), "n_tokens"))


def pack_contiguous(df: DataFrame, budget: int, size_col: str = "n_chars",
                    key_col: str = "doc_id",
                    shard_col: str | None = None) -> DataFrame:
    """Assign each document a bin id + start offset in the concatenated
    stream of its shard.

    ``bin_id = floor(start_offset / budget)`` — a document straddling a
    bin boundary starts in that bin and spills into the next, matching
    concatenate-and-slice token-stream packing.  ``shard_col=None`` packs
    one global stream (single window task — small corpora only).
    """
    if int(budget) < 1:
        # div-by-zero yields NULL bin_id under non-ANSI SQL — every doc
        # would collapse into one NULL bin with no error
        raise ValueError(f"budget must be >= 1, got {budget}")
    part = [shard_col] if shard_col else []
    w = (Window.partitionBy(*part).orderBy(key_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long")
    out = df.withColumn("start_offset", start).withColumn(
        "bin_id", F.call_function("div", F.col("start_offset"),
                                  F.lit(int(budget))))
    cols = [key_col] + part + [size_col, "start_offset", "bin_id"]
    return out.select(*cols)
