"""Deterministic sampling operators for training-data pipelines.

``df.sample()`` draws from a per-partition RNG, so its output changes with
partitioning, task retries, and cluster size — useless for reproducible
100 TB pipelines.  These operators make the keep/drop decision a PURE
FUNCTION OF THE ROW KEY (md5 bits, engine-portable): reruns, backfills and
train/eval splits stay consistent forever, and the filter is map-side only
(no shuffle, no state, no driver participation — every task decides its
own rows).  The same construction gives consistent cross-table splits:
sampling two tables by the same join key keeps them aligned.

Reference has no sampling surface; this is part of the beyond-reference
pipeline surface (BASELINE.json) alongside dedup/ANN/text analysis.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long

__all__ = ["BP", "group_cap", "hash_bucket", "hash_sample",
           "stratified_sample", "top_fraction_by"]

BP = 10_000  # rate unit: basis points (1 bp = 0.01 %)


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in ``[0, 10000)`` from md5 of the salted key.

    DuckDB twin (bit-identical):
    ``('0x' || substr(md5(salt || '|' || key), 1, 15))::BIGINT % 10000``.
    Changing ``salt`` draws an independent sample (e.g. disjoint train /
    eval salts); the same salt+key always lands in the same bucket.
    """
    return F.pmod(md5_long(key.cast("string"), salt), F.lit(BP))


def hash_sample(df: DataFrame, key_col: str = "doc_id",
                rate_bp: int = 1000, salt: str = "") -> DataFrame:
    """Keep ~``rate_bp``/10000 of rows, deterministically by key."""
    return df.filter(hash_bucket(F.col(key_col), salt) < F.lit(int(rate_bp)))


def stratified_sample(df: DataFrame, rates: DataFrame | dict,
                      strata_col: str = "source", key_col: str = "doc_id",
                      default_bp: int = 0, salt: str = "") -> DataFrame:
    """Per-stratum deterministic rates (e.g. per-source mixing weights).

    ``rates``: dict ``{stratum: rate_bp}`` or a ``(strata_col, rate_bp)``
    DataFrame.  Rates ship as a broadcast frame, NOT a literal CASE chain —
    10^6 strata cost a broadcast join, not a plan-tree explosion; strata
    missing from the frame fall back to ``default_bp``.
    """
    spark = df.sparkSession
    if isinstance(rates, dict):
        rates = spark.createDataFrame(
            sorted((str(k), int(v)) for k, v in rates.items()),
            f"{strata_col} string, rate_bp int")
    j = df.join(F.broadcast(rates), strata_col, "left")
    rate = F.coalesce(F.col("rate_bp"), F.lit(int(default_bp)))
    return j.filter(hash_bucket(F.col(key_col), salt) < rate).drop("rate_bp")


def top_fraction_by(df: DataFrame, frac_bp: int, score_col: str,
                    group_col: str | None = None,
                    key_col: str = "doc_id") -> DataFrame:
    """Keep the best ``frac_bp``/10000 rows per group ranked by
    ``score_col`` DESC (``key_col`` tiebreak) — quality-based selection,
    the "keep the top 25% by quality score per source" stage of a
    curation pipeline.

    Kept count per group is exactly ``ceil(n * frac_bp / 10000)``
    (integer arithmetic — ``(n*frac_bp + 9999) div 10000`` — so the
    boundary is engine-exact; at least one row per non-empty group).
    Deterministic: the kept set is a pure function of the scores and
    keys, independent of partitioning.

    Scale shape: one shuffle on the group key with BOTH window functions
    (row_number + count) sharing the single sort — per-group ranking is
    inherently a global ordering within the group, so this operator
    shuffles the corpus once; when an approximate threshold suffices at
    100 TB, compute a per-group score quantile (sketch.hist_quantiles
    grouped) and map-filter on it instead."""
    from pyspark.sql import Window

    if not 0 <= int(frac_bp) <= BP:
        raise ValueError(f"frac_bp must be in [0, {BP}], got {frac_bp}")
    part = [group_col] if group_col else []
    w = Window.partitionBy(*part).orderBy(F.desc(score_col), F.col(key_col))
    # the group count rides the SAME ordered spec with an explicit
    # full-partition frame: one Window node / one sort instead of two
    # (a full unbounded frame is computed once per partition — O(n),
    # unlike moving unboundedFollowing frames)
    wn = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    keep = F.call_function(
        "div", F.count("*").over(wn) * F.lit(int(frac_bp)) + F.lit(BP - 1),
        F.lit(BP))
    return (df.withColumn("_rk", F.row_number().over(w).cast("long"))
            .withColumn("_keep", keep)
            .filter(F.col("_rk") <= F.col("_keep"))
            .drop("_rk", "_keep"))


def group_cap(df: DataFrame, k: int, group_col: str = "source",
              key_col: str = "doc_id", salt: str = "cap") -> DataFrame:
    """Keep at most ``k`` rows per group, chosen DETERMINISTICALLY — the
    web-curation "max N documents per domain" cap, with the same
    rerun/backfill stability contract as :func:`hash_sample`: the kept
    set is a pure function of (group, key, salt), independent of
    partitioning and cluster size.

    Selection order is (md5(salt|key), key) within each group — an
    unbiased deterministic shuffle (picking by raw key would bias toward
    low ids, which often correlate with crawl order).  The
    ``row_number() <= k`` filter over a partitioned window compiles to
    WindowGroupLimit: each task keeps its local top-k per group BEFORE
    the exchange, so shuffle volume is O(groups * k) per task, not the
    corpus (plan-tested alongside the other WindowGroupLimit operators).
    """
    from pyspark.sql import Window
    w = Window.partitionBy(group_col).orderBy(
        md5_long(F.col(key_col).cast("string"), salt), F.col(key_col))
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= F.lit(int(k))).drop("_rk"))
