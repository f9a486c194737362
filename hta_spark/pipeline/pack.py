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

__all__ = ["pack_contiguous"]


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
