"""Streaming deduplication for document ingestion pipelines.

A training-data ingest stream needs the same dedup family as the batch
side (pipeline/dedup.py), expressed over Structured Streaming:

- :func:`stream_exact_dedup` — keep the first arrival per content hash.
  ``dropDuplicates`` on the md5 of normalized text; with an event-time
  watermark (``dropDuplicatesWithinWatermark``) the dedup state is bounded
  — late duplicates beyond the watermark horizon age out, the documented
  trade of exactness for bounded state every streaming dedup makes.
- Near-dup is a lambda: MinHash signatures are stateless per document
  (a doc's shingles arrive together), so the batch
  ``minhash_signatures`` runs unchanged inside ``foreachBatch`` appending
  to a signature table, and the banded LSH bucket join (``lsh_pairs``,
  which needs cross-batch buckets) runs as a periodic batch over the
  accumulated signatures (pattern tested in
  tests/test_streaming_dedup.py).

The stream reuses the batch operators' column logic, so stream and batch
agree bit-for-bit on the hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline.dedup import normalize_text

__all__ = ["stream_exact_dedup"]


def stream_exact_dedup(stream_df: DataFrame, text_col: str = "text",
                       ts_col: str | None = None,
                       watermark: str = "10 minutes",
                       allow_unbounded_state: bool = False) -> DataFrame:
    """First-arrival-wins exact dedup over a document stream.

    With ``ts_col`` the state store is watermark-bounded (the production
    shape).  Without it the dedup state grows with DISTINCT CONTENTS
    FOREVER — acceptable only for bounded backfills, so that form requires
    the explicit ``allow_unbounded_state=True`` opt-in rather than being a
    silent default."""
    out = stream_df.withColumn(
        "content_hash", F.md5(normalize_text(F.col(text_col))))
    if ts_col is not None:
        return (out.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(["content_hash"]))
    if not allow_unbounded_state:
        raise ValueError(
            "stream_exact_dedup without ts_col keeps state for every "
            "distinct content hash forever; pass a ts_col for "
            "watermark-bounded state, or allow_unbounded_state=True for a "
            "bounded backfill")
    return out.dropDuplicates(["content_hash"])
