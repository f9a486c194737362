"""Focused equivalence tests for the r15 resumed-session optimizations
(OPTIMIZATION_r15.md §10f/§10g): internals changed, results must not.

- §10f: ``centroid_frame`` assembles its one-row codebook driver-side
  instead of via a collect_list+array_sort aggregate — the frame must be
  float-BIT-identical to the legacy agg form, element order included.
- §10g: ``ngram_jaccard_pairs`` pins its exploded shingle frame on the
  classic path — the pinned plan must produce the identical pair set as
  the unpinned shape (the Connect fallback, which skips the pin).
"""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

import hta_spark.compat as compat
from hta_spark.pipeline.ann import _py_norm, centroid_frame
from hta_spark.pipeline.dedup import ngram_jaccard_pairs


def _bits(x: float) -> str:
    return struct.pack("<d", float(x)).hex()


def test_centroid_frame_matches_legacy_agg_form(spark):
    # deliberately unsorted ids, negative coords, k=5
    centroids = [(3, [0.5, -1.25, 2.0]), (0, [1.0, 1.0, 1.0]),
                 (4, [-0.875, 0.0, 3.5]), (1, [2.0, -2.0, 0.25]),
                 (2, [0.0, 0.0, 0.0])]
    new = centroid_frame(spark, centroids).collect()
    # legacy construction, verbatim from the pre-§10f code
    rows = [(int(cid), [float(x) for x in vec], _py_norm(vec))
            for cid, vec in centroids]
    cdf = spark.createDataFrame(rows, "c int, v array<double>, n double")
    old = cdf.agg(F.array_sort(F.collect_list(F.struct("c", "v", "n")))
                  .alias("_cents")).collect()
    assert len(new) == len(old) == 1

    def canon(row):
        return [(s["c"], [_bits(x) for x in s["v"]], _bits(s["n"]))
                for s in row["_cents"]]

    assert canon(new[0]) == canon(old[0])
    # and the order is ascending centroid id
    assert [s["c"] for s in new[0]["_cents"]] == [0, 1, 2, 3, 4]


def _corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "the quick brown fox leaps over the lazy dog again and again"),
        (4, "completely different text with no shared shingles at all ok"),
        (5, "another unrelated document full of its own words entirely"),
        (6, "the quick brown fox jumps over the lazy dog once more only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs_sorted(df):
    return sorted((r["a"], r["b"], _bits(r["jaccard"]))
                  for r in df.collect())


def test_ngram_pairs_pinned_equals_unpinned(spark, monkeypatch):
    docs = _corpus(spark)
    for kwargs in ({"max_df": 4096, "on_hot": "error"},
                   {"max_df": 4, "on_hot": "drop"}):
        pinned = _pairs_sorted(
            ngram_jaccard_pairs(docs, shingle_n=3, min_shared=1, **kwargs))
        monkeypatch.setattr(compat, "FORCE_FALLBACK", True)
        try:
            unpinned = _pairs_sorted(
                ngram_jaccard_pairs(docs, shingle_n=3, min_shared=1,
                                    **kwargs))
        finally:
            monkeypatch.setattr(compat, "FORCE_FALLBACK", False)
        assert pinned == unpinned and pinned, kwargs
