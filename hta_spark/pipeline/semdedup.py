"""Semantic deduplication (SemDeDup-style, Abbas et al. 2023): cluster
the embedding space with k-means, then search for near-duplicates ONLY
within each cluster — the trick that turns the O(n^2) all-pairs cosine
search into k independent O((n/k)^2) problems, which is how embedding
dedup runs at corpus scale (k grows with the corpus, so per-cluster work
stays bounded; a hot cluster is the same skew shape as a hot IVF
centroid and takes the same medicine — see ``max_cluster_rows``).

Fully deterministic and oracle-gated: the clustering is the quantized
:func:`kmeans_lite` (bit-identical across engines), the within-cluster
pairs use the shared round(cos, 4) convention, and the cluster
transitive closure is :func:`connected_components` (min reachable id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ann import (_as_double, _dot, _norm, attach_vectors,
                  hyperplane_lsh_pairs)
from .dedup import connected_components
from .kmeans import kmeans_lite
from .sample import top_fraction_by

__all__ = ["semantic_pairs", "semantic_dedup", "prototype_prune"]


def semantic_pairs(emb: DataFrame, k: int = 8, iterations: int = 3,
                   threshold: float = 0.4, quantize: int | None = 6,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   max_cluster_rows: int | None = 65536,
                   hot_n_planes: int = 72,
                   hot_rows_per_band: int = 24,
                   seed: int = 7) -> DataFrame:
    """Within-cluster near-duplicate pairs ``(a, b, cluster, cos_sim)``
    with ``a < b`` and ``round(cos, 4) >= threshold``.

    The pair join's equi-key is the k-means cluster id, so the quadratic
    expansion is confined to one cluster per task — the SemDeDup
    decomposition.  Cross-cluster near-dups are the method's documented
    recall trade (a pair split across cluster boundaries is not
    compared); raise ``k`` for smaller clusters or lower it for recall,
    exactly as in the paper.

    Hot-cluster bound (VERDICT r10 item 3): one dominant cluster —
    common on real embedding distributions, and ``k`` defaults to 8 —
    would make the within-cluster expansion O(B^2) unbounded.  Cluster
    sizes are one k-row collect (the same planner shape as
    ``kmeans_lite``'s driver rounds); clusters past ``max_cluster_rows``
    route through banded SRP search *within the cluster*
    (:func:`hyperplane_lsh_pairs` with ``group_col``) instead of the
    exact pair join — bounded bucket work in place of the quadratic
    blowup, at SRP's documented recall trade (identical vectors always
    collide, so exact duplicates are never lost; tune ``hot_n_planes`` /
    ``hot_rows_per_band`` like any SRP banding).  Clusters at or under
    the cap keep the exact expansion, so results are unchanged whenever
    no cluster exceeds the cap (the oracle-parity regime);
    ``max_cluster_rows=None`` disables the bound.

    Both pair joins re-attach vectors through :func:`attach_vectors`:
    the vector-carrying sides must never broadcast off stats-blind
    estimates (the r10 bench OOM class).

    NOTE (ADVICE r11): with ``max_cluster_rows`` set (the default) this
    function runs an EAGER Spark job at DataFrame-construction time —
    the k-row cluster-sizes collect that decides the hot routing (same
    planner discipline as ``aggregate_auto``).  On the classic path the
    assignment is localCheckpoint-pinned so that planner pass and the
    pair joins share one scan (checkpoint blocks are GC-reclaimed with
    the returned frame — no leak); on the Connect persist fallback the
    pin is SKIPPED — one extra map-only assignment pass per join beats
    leaking a session-lifetime cached Dataset per call.
    """
    from ..compat import lc_available, pin

    assigned = kmeans_lite(emb, k=k, iterations=iterations,
                           id_col=id_col, vec_col=vec_col,
                           quantize=quantize).select(id_col, "cluster")
    hot_ids: list = []
    if max_cluster_rows is not None:
        if int(max_cluster_rows) < 1:
            raise ValueError(
                f"max_cluster_rows must be >= 1, got {max_cluster_rows}")
        # pin the (id, cluster) assignment — two longs/row — BEFORE the
        # sizes collect, lazily: the collect below materializes it, so
        # the planner pass and the pair joins share ONE assignment scan
        # instead of re-running the map-only kmeans assignment (an extra
        # full corpus pass at 100 TB).  Classic path only: there is no
        # matching release (the returned lineage reads the pin), and on
        # the persist fallback that would leak one cached Dataset per
        # call for the session lifetime (ADVICE r11) — recompute instead.
        if lc_available(emb.sparkSession):
            assigned = pin(assigned, eager=False)
        # k-row planner collect (k = cluster count, driver-bounded by
        # construction): decides the plan, same discipline as the
        # aggregate auto planner's cached stats
        sizes = assigned.groupBy("cluster") \
                        .agg(F.count("*").alias("n")).collect()
        hot_ids = [r["cluster"] for r in sizes
                   if r["n"] > int(max_cluster_rows)]
    e = attach_vectors(
        assigned,
        emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v")),
        id_col)
    cold = e.filter(~F.col("cluster").isin(hot_ids)) if hot_ids else e
    # per-vector norms hoisted OUT of the quadratic pair stage (r15, the
    # cosine_pairs precedent): the formula stays dot/(na*nb) — identical
    # double arithmetic, bit-identical rounded scores — but the two
    # interpreted _norm folds move from O(pairs) to O(rows), which is
    # 2/3 of the per-pair HOF work in the cluster-confined expansion
    a = (cold.select(F.col(id_col).alias("a"), F.col("cluster"),
                     F.col("_v").alias("_va"))
         .withColumn("_na", _norm(F.col("_va"))))
    b = (cold.select(F.col(id_col).alias("b"),
                     F.col("cluster").alias("_cb"), F.col("_v").alias("_vb"))
         .withColumn("_nb", _norm(F.col("_vb"))))
    sim = F.round(_dot(F.col("_va"), F.col("_vb"))
                  / (F.col("_na") * F.col("_nb")), 4)
    pairs = (a.join(b.hint("shuffle_hash"),
                    (F.col("cluster") == F.col("_cb"))
                    & (F.col("a") < F.col("b")))
             .select("a", "b", "cluster", sim.alias("cos_sim"))
             .filter(F.col("cos_sim") >= F.lit(float(threshold))))
    if hot_ids:
        hot = (e.filter(F.col("cluster").isin(hot_ids))
               .select(F.col(id_col), F.col("cluster"),
                       F.col("_v").alias(vec_col)))
        hot_pairs = hyperplane_lsh_pairs(
            hot, threshold=float(threshold), n_planes=hot_n_planes,
            rows_per_band=hot_rows_per_band, seed=seed,
            id_col=id_col, vec_col=vec_col, group_col="cluster") \
            .select("a", "b", "cluster", "cos_sim")
        pairs = pairs.unionByName(hot_pairs)
    return pairs


def prototype_prune(emb: DataFrame, drop_bp: int = 2500, k: int = 8,
                    iterations: int = 3, quantize: int | None = 6,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    rows_cap: int = 4_000_000) -> DataFrame:
    """Prototypicality-based diversification — the second stage of the
    D4 curation pipeline (Tirumala et al. 2023, "D4: Improving LLM
    Pretraining via Document De-Duplication and Diversification"):
    after SemDeDup removes near-duplicates, D4 additionally DROPS the
    most PROTOTYPICAL ``drop_bp``/10000 fraction of every k-means
    cluster — the points most cosine-similar to their own centroid form
    the semantically redundant core of the cluster, and keeping the
    diverse tail measurably improves downstream models.

    Returns one row per input vector: ``(id_col, cluster, proto_sim,
    kept)`` where ``proto_sim`` is the round-4 cosine similarity to the
    vector's final centroid (the redundancy score) and ``kept`` is
    False for exactly ``ceil(n_cluster * drop_bp / 10000)`` rows per
    cluster — the highest-``proto_sim`` members, ``id_col``-tiebroken
    (the :func:`~hta_spark.pipeline.sample.top_fraction_by` exact-count
    convention, so the boundary is engine-exact and the labeling is a
    pure function of the embeddings — rerun/backfill-stable).

    Composition, not new machinery: clustering is the oracle-gated
    quantized :func:`~hta_spark.pipeline.kmeans.kmeans_lite` (whose
    returned ``sim`` IS the prototypicality score), and the per-cluster
    top-fraction selection is :func:`top_fraction_by` — which matters
    at scale because clusters are the archetypal HOT group (``k`` is
    small by construction, so each cluster holds ~n/k rows): past
    ``rows_cap`` the selection runs the banded histogram arm instead of
    sorting an entire cluster inside one task.  The assignment frame is
    pinned (classic path) so the planner count, the selection, and the
    label join share ONE assignment pass; there is no matching release
    because the returned lineage reads the pin (the ``semantic_pairs``
    no-release gate — on the Connect persist fallback the pin is
    skipped rather than leaked).

    The label join is ``id_col``-keyed (AQE broadcasts the drop side
    when small); the dropped fraction of a 100 TB corpus is itself
    large, and a keyed shuffle join is exactly the right plan there —
    nothing in this operator sorts or collects beyond
    :func:`top_fraction_by`'s documented planner jobs."""
    from ..compat import lc_available, pin

    assigned = (kmeans_lite(emb, k=k, iterations=iterations,
                            id_col=id_col, vec_col=vec_col,
                            quantize=quantize)
                .withColumnRenamed("sim", "proto_sim"))
    if lc_available(emb.sparkSession):
        assigned = pin(assigned, eager=False)
    drop = (top_fraction_by(assigned, int(drop_bp),
                            score_col="proto_sim", group_col="cluster",
                            key_col=id_col, rows_cap=rows_cap)
            .select(F.col(id_col), F.lit(False).alias("_k")))
    return (assigned.join(drop, id_col, "left")
            .select(id_col, "cluster", "proto_sim",
                    F.coalesce("_k", F.lit(True)).alias("kept")))


def semantic_dedup(emb: DataFrame, k: int = 8, iterations: int = 3,
                   threshold: float = 0.4, quantize: int | None = 6,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   max_cluster_rows: int | None = 65536) -> DataFrame:
    """Semantic dedup clusters: one row per near-duplicate component —
    ``(component, n_members)`` where ``component`` is the smallest
    member id (the canonical keeper, min-id convention shared with the
    text dedup pipeline).  Downstream keeps ``component`` and drops the
    other ``n_members - 1`` documents."""
    pairs = semantic_pairs(emb, k=k, iterations=iterations,
                           threshold=threshold, quantize=quantize,
                           id_col=id_col, vec_col=vec_col,
                           max_cluster_rows=max_cluster_rows)
    comp = connected_components(pairs)
    return (comp.groupBy(F.col("comp").alias("component"))
            .agg(F.count("*").cast("long").alias("n_members"))
            .orderBy("component"))
