"""Streaming KMV distinct-count: the mergeable-sketch property, live.

A KMV sketch's whole point is that it merges: the k smallest hashes of a
union are the k smallest of the combined minima.  That makes the
streaming form trivial and EXACTLY equal to the batch sketch — the state
per group is the k-minima set (k longs, fixed size, no watermark needed),
each micro-batch folds its own minima in, and the emitted estimate after
any prefix of batches equals :func:`hta_spark.pipeline.sketch.kmv_distinct`
over the same rows (equivalence-tested in tests/test_streaming_sketch.py).

Hashes are computed by the SAME Spark expression as the batch side
(``pipeline.dedup.md5_long`` over ``CAST(value AS STRING)``) *before* the
stateful operator — the state fold only ever sees longs.  Hashing in
Python looked bit-identical but wasn't (ADVICE r3): ``str(v)`` renders
doubles differently from Spark's cast (``1e-07`` vs ``1.0E-7``) and a
NaN skipped Python-side IS hashed batch-side (only NULLs are excluded).
JVM-side hashing makes stream ≡ batch by construction for every type.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["md5_long_py", "stream_kmv_distinct", "stream_hist_quantiles"]


def md5_long_py(value, seed: str = "kmv") -> int:
    """Python twin of ``pipeline.dedup.md5_long`` (bit-identical)."""
    h = hashlib.md5(f"{seed}|{value}".encode()).hexdigest()
    return int(h[:15], 16)


_STATE_SCHEMA = T.StructType([
    T.StructField("minima", T.ArrayType(T.LongType()), True)])


def _out_schema(df: DataFrame, group_col: str) -> T.StructType:
    # group column keeps its INPUT type (hardcoding string would error at
    # runtime for long/int group keys)
    gtype = df.schema[group_col].dataType
    return T.StructType([
        T.StructField(group_col, gtype, True),
        T.StructField("n_kept", T.LongType(), True),
        T.StructField("kth_hash", T.LongType(), True),
        T.StructField("kmv_distinct", T.DoubleType(), True),
    ])


def stream_kmv_distinct(stream_df: DataFrame, value_col: str,
                        group_col: str, k: int = 64,
                        seed: str = "kmv") -> DataFrame:
    """Per-group KMV distinct estimate maintained over a stream.

    Emits one row per group per micro-batch with the estimate over ALL
    rows seen so far (same columns/arithmetic as the batch
    ``kmv_distinct``).  State is exactly the k-minima array — constant
    size per group, so no watermark or timeout is required."""
    from ..pipeline.dedup import md5_long

    kk = int(k)
    _h = 2.0 ** 60

    def _update(key, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        minima = list(state.get[0]) if state.exists else []
        have = set(minima)
        for pdf in pdfs:
            for h in pdf["_h"]:
                if h is None or h != h:
                    continue   # NULL value hashed to NULL, excluded
                h = int(h)
                if h not in have:
                    have.add(h)
                    minima.append(h)
        minima.sort()
        del minima[kk:]
        state.update((minima,))
        n = len(minima)
        kth = minima[-1] if minima else None
        est = float(n) if n < kk else (kk - 1) * _h / float(kth)
        yield pd.DataFrame({group_col: [key[0]],
                            "n_kept": [n], "kth_hash": [kth],
                            "kmv_distinct": [est]})

    # NULL hashes (NULL values) are filtered JVM-SIDE: a nullable long
    # column crosses Arrow into pandas as float64, and int() on a ~2^60
    # hash rounded to float64 loses the low ~7 bits — which would silently
    # break the bit-exact stream == batch contract for every OTHER row in
    # the same chunk (review r4 finding)
    hashed = stream_df.select(
        group_col,
        md5_long(F.col(value_col).cast("string"), seed).alias("_h")) \
        .filter(F.col("_h").isNotNull())
    return (hashed
            .groupBy(group_col)
            .applyInPandasWithState(_update,
                                    _out_schema(stream_df, group_col),
                                    _STATE_SCHEMA, "update",
                                    GroupStateTimeout.NoTimeout))


_HIST_STATE = T.StructType([
    T.StructField("counts", T.ArrayType(T.LongType()), True)])


def _hist_out_schema(df: DataFrame, group_col: str) -> T.StructType:
    gtype = df.schema[group_col].dataType
    return T.StructType([
        T.StructField(group_col, gtype, True),
        T.StructField("q", T.DoubleType(), True),
        T.StructField("target_rank", T.LongType(), True),
        T.StructField("est", T.DoubleType(), True),
    ])


def stream_hist_quantiles(stream_df: DataFrame, value_col: str,
                          group_col: str, bounds: tuple[int, int],
                          qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                          n_bins: int = 64, scale: int = 100) -> DataFrame:
    """Per-group histogram quantiles maintained over a stream — the
    fixed-bounds histogram's per-bin counts ARE the state (``n_bins``
    longs per group, constant size, no watermark), and per-bin counts add
    across micro-batches, so after any prefix of batches the emitted
    quantiles equal the batch ``hist_quantiles(..., bounds=...)`` over
    the same rows (equivalence-tested in tests/test_streaming_sketch.py).

    Like the KMV stream, everything value-dependent happens JVM-side
    BEFORE the stateful operator: the bin index is the shared
    :func:`hta_spark.pipeline.sketch.hist_bin_col` expression, and the
    Python state fn only increments longs and replays the shared
    interpolation twin (:func:`...sketch.hist_counts_to_quantiles`)."""
    from ..pipeline.sketch import (hist_bin_col, hist_counts_to_quantiles,
                                   hist_width)

    bad = [q for q in qs if not 0.0 < float(q) <= 1.0]
    if bad:
        raise ValueError(f"quantiles must be in (0, 1], got {bad}")
    lo, hi = int(bounds[0]), int(bounds[1])
    w = hist_width(lo, hi, n_bins)
    nb = int(n_bins)
    qtuple = tuple(float(q) for q in qs)
    sc = int(scale)

    def _update(key, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        counts = list(state.get[0]) if state.exists else [0] * nb
        for pdf in pdfs:
            vc = pdf["_bin"].value_counts()
            for b, n in vc.items():
                counts[int(b)] += int(n)
        state.update((counts,))
        rows = hist_counts_to_quantiles(counts, lo, w, qtuple, sc)
        yield pd.DataFrame({group_col: [key[0]] * len(rows),
                            "q": [r[0] for r in rows],
                            "target_rank": [r[1] for r in rows],
                            "est": [r[2] for r in rows]})

    # NULL bins (NULL values) filtered JVM-side, matching the batch
    # paths' NULL-exclusion semantics (bin indices <= n_bins stay exact
    # across the Arrow crossing either way, unlike the KMV hashes)
    binned = stream_df.select(
        group_col,
        hist_bin_col(value_col, lo, hi, nb, sc).alias("_bin")) \
        .filter(F.col("_bin").isNotNull())
    return (binned
            .groupBy(group_col)
            .applyInPandasWithState(_update,
                                    _hist_out_schema(stream_df, group_col),
                                    _HIST_STATE, "update",
                                    GroupStateTimeout.NoTimeout))
