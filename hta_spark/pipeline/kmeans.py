"""Iterative k-means (Lloyd's) over an embedding column — the
"genuinely non-SQL-expressible" operator class (iterative algorithms) from
the driver contract; exposed as a rows-only query entry.

Spark-first shape: each iteration is one map-side assignment pass against
broadcast centroid literals (no shuffle of the vectors) + one tiny groupBy
to recompute centroids (k rows out).  Driver-side loop over iterations —
the classic Spark iterative-algorithm pattern (centroids are
metric-k-sized state, never the data).

Deterministic: seeded by the first k vec_ids, cosine ties break to the
smaller centroid id, fixed iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..compat import pin
from .ann import _as_double, _best_centroid, _norm, centroid_frame

__all__ = ["kmeans_lite"]


def _assign(emb: DataFrame, centroids: list[tuple[int, list[float]]],
            id_col: str, vec_col: str) -> DataFrame:
    """Map-only assignment against a broadcast codebook row (see
    ann.centroid_frame) — no literal expression trees, works at any k.
    The double cast and the row norm are projected BELOW the join so
    they fold once per row, not once per centroid (r15; centroid norms
    ride the codebook — scores bit-identical, see _best_centroid)."""
    best = _best_centroid(F.col("_vd"), 9, vnorm=F.col("_vn"))
    pre = (emb.select(F.col(id_col), F.col(vec_col),
                      _as_double(F.col(vec_col)).alias("_vd"))
           .withColumn("_vn", _norm(F.col("_vd"))))
    # two-step select: the argmax struct materializes ONCE per row —
    # extracting both fields from `best` in one projection would embed
    # (and evaluate) the whole transform+array_max twice (r15, verified
    # in the physical plan; Catalyst keeps the split because the subtree
    # is non-cheap)
    return (pre.join(F.broadcast(centroid_frame(emb.sparkSession, centroids)))
            .select(F.col(id_col), F.col(vec_col), best.alias("_b"))
            .select(F.col(id_col), F.col(vec_col),
                    (-F.col("_b")["negc"]).alias("cluster"),
                    F.col("_b")["s"].alias("sim")))


def kmeans_lite(emb: DataFrame, k: int = 8, iterations: int = 3,
                id_col: str = "vec_id", vec_col: str = "embedding",
                quantize: int | None = None) -> DataFrame:
    """Returns (id, cluster, sim) after ``iterations`` Lloyd rounds with
    cosine assignment and mean-vector centroid updates.

    ``quantize``: round every updated centroid coordinate to this many
    decimals.  With it set, the whole iteration becomes reproducible
    ACROSS ENGINES: mean centroids computed by independent systems differ
    only in the last ulp (summation order), so quantizing to well above
    ulp scale lands both on identical coordinates each round — this is
    what lets the driver gate the k-means registry entry against a DuckDB
    re-implementation (see queries_pipeline._kmeans_sql) instead of a
    rows-only check.

    Each round's assignment is pinned (``compat.pin``) so the centroid
    update reads a materialized frame instead of re-deriving the full
    lineage from the source scan (plan depth stays constant in the
    iteration count), and released (``compat.release``) as soon as its
    one consumer — the k-row centroid collect — has run."""
    seeds = (emb.orderBy(id_col).limit(k)
             .select(id_col, vec_col).collect())
    centroids = [(i, [float(x) for x in r[vec_col]])
                 for i, r in enumerate(seeds)]

    # the source is read once per round; checkpoint it so deep upstream
    # lineage (e.g. a feature-extraction pipeline) is not replayed per round
    emb = pin(emb.select(id_col, vec_col), eager=False)
    assigned = _assign(emb, centroids, id_col, vec_col)
    for i in range(iterations):
        # centroid update: element-wise mean per cluster — k rows
        # collected.  The round's assignment is NOT pinned (r15): this
        # collect is its only consumer (the next round's assignment
        # re-derives from the pinned `emb` with the NEW centroid
        # literals, never from `assigned`), so the former per-round
        # pin+release merely split one job into two — measured ~0.85 s
        # of pure localCheckpoint overhead per round at sf0.1.  Plan
        # depth stays constant either way (every round's plan roots at
        # the pinned `emb`).
        sums = (assigned
                .select("cluster", F.posexplode(_as_double(F.col(vec_col)))
                        .alias("d", "x"))
                .groupBy("cluster", "d").agg(F.avg("x").alias("m"))
                .groupBy("cluster")
                .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("dm"))
                .collect())
        # half-AWAY-from-zero quantization: Python round() is half-even
        # (banker's), but Spark F.round and DuckDB round() are both
        # half-away — a dyadic mean landing exactly on a quantum midpoint
        # would diverge from the oracle from round 1 onward (review r4)
        def _q(x: float) -> float:
            if quantize is None:
                return float(x)
            scale = 10 ** quantize
            import math
            return math.copysign(
                math.floor(abs(x) * scale + 0.5), x) / scale

        centroids = [(int(r["cluster"]), [_q(float(p["m"]))
                                          for p in r["dm"]]) for r in sums]
        centroids.sort(key=lambda cv: cv[0])
        assigned = _assign(emb, centroids, id_col, vec_col)
    return assigned.select(id_col, "cluster", F.round("sim", 4).alias("sim"))
