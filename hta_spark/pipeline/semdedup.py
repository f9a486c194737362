"""Semantic deduplication (SemDeDup-style, Abbas et al. 2023): cluster
the embedding space with k-means, then search for near-duplicates ONLY
within each cluster — the trick that turns the O(n^2) all-pairs cosine
search into k independent O((n/k)^2) problems, which is how embedding
dedup runs at corpus scale (k grows with the corpus, so per-cluster work
stays bounded; a hot cluster is the same skew shape as a hot IVF
centroid and takes the same medicine).

Fully deterministic and oracle-gated: the clustering is the quantized
:func:`kmeans_lite` (bit-identical across engines), the within-cluster
pairs use the shared round(cos, 4) convention, and the cluster
transitive closure is :func:`connected_components` (min reachable id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ann import _as_double, cosine_sim
from .dedup import connected_components
from .kmeans import kmeans_lite

__all__ = ["semantic_pairs", "semantic_dedup"]


def semantic_pairs(emb: DataFrame, k: int = 8, iterations: int = 3,
                   threshold: float = 0.4, quantize: int | None = 6,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Within-cluster near-duplicate pairs ``(a, b, cluster, cos_sim)``
    with ``a < b`` and ``round(cos, 4) >= threshold``.

    The pair join's equi-key is the k-means cluster id, so the quadratic
    expansion is confined to one cluster per task — the SemDeDup
    decomposition.  Cross-cluster near-dups are the method's documented
    recall trade (a pair split across cluster boundaries is not
    compared); raise ``k`` for smaller clusters or lower it for recall,
    exactly as in the paper."""
    assigned = kmeans_lite(emb, k=k, iterations=iterations,
                           id_col=id_col, vec_col=vec_col,
                           quantize=quantize).select(id_col, "cluster")
    e = (emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
         .join(assigned, id_col))
    a = e.select(F.col(id_col).alias("a"), F.col("cluster"),
                 F.col("_v").alias("_va"))
    b = e.select(F.col(id_col).alias("b"),
                 F.col("cluster").alias("_cb"), F.col("_v").alias("_vb"))
    sim = F.round(cosine_sim(F.col("_va"), F.col("_vb")), 4)
    return (a.join(b, (F.col("cluster") == F.col("_cb"))
                   & (F.col("a") < F.col("b")))
            .select("a", "b", "cluster", sim.alias("cos_sim"))
            .filter(F.col("cos_sim") >= F.lit(float(threshold))))


def semantic_dedup(emb: DataFrame, k: int = 8, iterations: int = 3,
                   threshold: float = 0.4, quantize: int | None = 6,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Semantic dedup clusters: one row per near-duplicate component —
    ``(component, n_members)`` where ``component`` is the smallest
    member id (the canonical keeper, min-id convention shared with the
    text dedup pipeline).  Downstream keeps ``component`` and drops the
    other ``n_members - 1`` documents."""
    pairs = semantic_pairs(emb, k=k, iterations=iterations,
                           threshold=threshold, quantize=quantize,
                           id_col=id_col, vec_col=vec_col)
    comp = connected_components(pairs)
    return (comp.groupBy(F.col("comp").alias("component"))
            .agg(F.count("*").cast("long").alias("n_members"))
            .orderBy("component"))
