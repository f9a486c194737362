"""Tests for the scale-surface operators: decontamination, KMV sketch,
histogram quantiles, mixture planning, grid range join."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hta_spark.operators.rangejoin import range_join_points
from hta_spark.pipeline.decontaminate import decontaminate, eval_ngram_set
from hta_spark.pipeline.mix import mix_weights
from hta_spark.pipeline.rules import rule_filter, rule_signals
from hta_spark.pipeline.sketch import hist_quantiles, kmv_distinct
from hta_spark.sources.bucketed import ensure_bucketed, write_bucketed


# -- decontamination --------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_copied_doc(spark):
    ev = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    train = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog indeed"),
        (2, "completely different words about spark plans and shuffles"),
        (3, "tiny doc"),  # < n tokens: zero grams
    ])
    out = {r["doc_id"]: r for r in
           decontaminate(train, ev, n=5, threshold=0.5).collect()}
    assert out[1]["contaminated"] and out[1]["n_hit"] == 5
    assert out[1]["n_grams"] == 6
    assert not out[2]["contaminated"] and out[2]["n_hit"] == 0
    assert out[3]["n_grams"] == 0 and not out[3]["contaminated"]
    assert out[3]["overlap_frac"] == 0.0


def test_decontaminate_repeated_gram_counts_once(spark):
    ev = _docs(spark, [(100, "a b c d e")])
    train = _docs(spark, [(1, "a b c d e x a b c d e")])
    row = decontaminate(train, ev, n=5, threshold=0.1).collect()[0]
    # 7 positions but 'a b c d e' appears twice -> 6 distinct grams, 1 hit
    assert row["n_grams"] == 6 and row["n_hit"] == 1


def test_eval_ngram_set_is_global_distinct(spark):
    ev = _docs(spark, [(1, "a b c d e"), (2, "a b c d e")])
    assert eval_ngram_set(ev, n=5).count() == 1


def test_decontaminate_plan_broadcasts_eval_side(spark):
    ev = _docs(spark, [(100, "a b c d e f")])
    train = _docs(spark, [(1, "a b c d e f g")])
    plan = decontaminate(train, ev)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


# -- KMV sketch -------------------------------------------------------------

def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", i % 10) for i in range(100)], "g string, v int")
    row = kmv_distinct(df, "v", ["g"], k=64).collect()[0]
    assert row["n_kept"] == 10
    assert row["kmv_distinct"] == 10.0


def test_kmv_estimate_accuracy_and_partition_invariance(spark):
    n = 5000
    df = spark.createDataFrame(
        [("a", i) for i in range(n)], "g string, v int")
    r1 = kmv_distinct(df, "v", ["g"], k=256).collect()[0]
    # KMV std error ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert abs(r1["kmv_distinct"] - n) / n < 0.25
    r2 = kmv_distinct(df.repartition(13), "v", ["g"], k=256).collect()[0]
    assert r1["kmv_distinct"] == r2["kmv_distinct"]
    assert r1["kth_hash"] == r2["kth_hash"]


def test_kmv_duplicates_do_not_change_sketch(spark):
    base = [("a", i) for i in range(500)]
    d1 = spark.createDataFrame(base, "g string, v int")
    d2 = spark.createDataFrame(base * 3, "g string, v int")
    assert (kmv_distinct(d1, "v", ["g"], k=64).collect()[0]["kmv_distinct"]
            == kmv_distinct(d2, "v", ["g"], k=64).collect()[0]
            ["kmv_distinct"])


def test_kmv_excludes_nulls_like_count_distinct(spark):
    rows = [("a", str(i)) for i in range(10)] + [("a", None)] * 3
    df = spark.createDataFrame(rows, "g string, v string")
    r = kmv_distinct(df, "v", ["g"], k=64).collect()[0]
    assert r["n_kept"] == 10 and r["kmv_distinct"] == 10.0


def test_kmv_plan_uses_window_group_limit(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(100)], "g string, v int")
    plan = kmv_distinct(df, "v", ["g"], k=8)._jdf.queryExecution() \
        .executedPlan().toString()
    # rank<=k filter is pushed to a per-partition top-k: the sketch merge
    # happens map-side, k rows per group per task cross the shuffle
    assert "WindowGroupLimit" in plan


# -- histogram quantiles ----------------------------------------------------

def test_hist_quantiles_uniform(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 1001)],
                               "x double")
    out = {r["q"]: r["est"]
           for r in hist_quantiles(df, "x", qs=(0.5, 0.9)).collect()}
    assert abs(out[0.5] - 500) < 20
    assert abs(out[0.9] - 900) < 20


def test_hist_quantiles_partition_invariant(spark):
    df = spark.createDataFrame([(float(i % 97),) for i in range(2000)],
                               "x double")
    a = sorted(map(tuple, hist_quantiles(df, "x").collect()))
    b = sorted(map(tuple, hist_quantiles(df.repartition(17), "x").collect()))
    assert a == b


def test_hist_quantiles_single_value(spark):
    df = spark.createDataFrame([(42.5,)] * 10, "x double")
    for r in hist_quantiles(df, "x", qs=(0.5, 0.99)).collect():
        assert r["est"] == pytest.approx(42.5, abs=0.5)


# -- mixture planning -------------------------------------------------------

def _corpus(spark):
    rows = []
    for s, n_docs, words in [("big", 20, 50), ("small", 5, 10)]:
        for i in range(n_docs):
            rows.append((f"{s}-{i}", s, " ".join(["w"] * words)))
    return spark.createDataFrame(rows, "doc_id string, source string, "
                                       "text string")


def test_mix_weights_realizes_budget(spark):
    out = {r["source"]: r for r in
           mix_weights(_corpus(spark), {"big": 0.5, "small": 0.5},
                       budget_tokens=100).collect()}
    # big: 1000 tokens, want 50 -> rate 500bp, expect 50
    assert out["big"]["rate_bp"] == 500
    assert out["big"]["expect_tokens"] == 50
    # small: 50 tokens, want 50 -> capped at 10000bp, expect all 50
    assert out["small"]["rate_bp"] == 10000
    assert out["small"]["expect_tokens"] == 50


def test_mix_weights_zero_share_sum_raises(spark):
    with pytest.raises(ValueError, match="positive share"):
        mix_weights(_corpus(spark), {"big": 0.0}, budget_tokens=100)


def test_mix_weights_untargeted_and_missing_sources(spark):
    out = {r["source"]: r for r in
           mix_weights(_corpus(spark), {"big": 1.0, "ghost": 1.0},
                       budget_tokens=100).collect()}
    assert out["small"]["rate_bp"] == 0          # no target share
    assert out["ghost"]["source_tokens"] == 0    # not in corpus
    assert out["ghost"]["rate_bp"] == 0
    assert out["big"]["rate_bp"] == 500          # 50 of 1000 tokens


# -- dense global ids -------------------------------------------------------

def test_dense_ids_match_window_row_number(spark, tmp_path):
    import random
    from pyspark.sql import Window
    from hta_spark.operators.ids import dense_ids
    rng = random.Random(3)
    rows = [(rng.random(), i) for i in range(5000)]
    df = spark.createDataFrame(rows, "key double, payload int")
    got = dense_ids(df, ["key"], str(tmp_path / "ids1"), num_partitions=7)
    exp = df.withColumn(
        "row_id", F.row_number().over(Window.orderBy("key")).cast("long"))
    assert sorted(map(tuple, got.select("key", "payload", "row_id")
                      .collect())) \
        == sorted(map(tuple, exp.collect()))
    # rerun-stable: the frame re-executes from the durable files, so
    # collecting twice (and rewriting to a new path) yields identical ids
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple,
                      dense_ids(df, ["key"], str(tmp_path / "ids2"),
                                num_partitions=7).collect()))


def test_dense_ids_rejects_duplicate_keys(spark, tmp_path):
    from hta_spark.operators.ids import dense_ids
    df = spark.createDataFrame([(1, "a"), (1, "b")], "k int, v string")
    with pytest.raises(ValueError, match="total order"):
        dense_ids(df, ["k"], str(tmp_path / "idsx"))


def test_dense_ids_start_offset(spark, tmp_path):
    from hta_spark.operators.ids import dense_ids
    df = spark.createDataFrame([(3,), (1,), (2,)], "k int")
    got = {r["k"]: r["row_id"]
           for r in dense_ids(df, ["k"], str(tmp_path / "ids3"),
                              start=100).collect()}
    assert got == {1: 100, 2: 101, 3: 102}


# -- curation funnel --------------------------------------------------------

def test_pipeline_funnel_is_monotone(spark):
    from hta_spark.queries_scale import q_pipeline_funnel
    rows = q_pipeline_funnel(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert (r["n_train"] >= r["n_rules"] >= r["n_keeper"]
                >= r["n_clean"] >= r["n_sampled"] >= 0)


# -- GEMM cosine pairs ------------------------------------------------------

def test_cosine_pairs_gemm_matches_hof(spark):
    import numpy as np
    from hta_spark.pipeline.ann import cosine_pairs, cosine_pairs_gemm
    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 16)).astype(np.float32)
    base[7] = base[3] + 0.01 * rng.normal(size=16).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(40)],
        "vec_id long, embedding array<float>")
    hof = sorted(map(tuple, cosine_pairs(emb, threshold=0.3).collect()))
    gemm = sorted(map(tuple,
                      cosine_pairs_gemm(emb, threshold=0.3).collect()))
    assert gemm == hof
    assert any(p[:2] == (3, 7) for p in gemm)   # planted near-dup found


def test_knn_join_matches_brute_force(spark):
    import numpy as np
    from hta_spark.pipeline.ann import knn_join
    rng = np.random.default_rng(5)
    m = rng.normal(size=(25, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in m[i]]) for i in range(25)],
        "vec_id long, embedding array<float>")
    got = {}
    for r in knn_join(emb, k=3).collect():
        got.setdefault(r["a"], []).append((r["rank"], r["b"], r["cos_sim"]))
    md = m.astype(np.float64)
    sims = np.round((md @ md.T)
                    / (np.linalg.norm(md, axis=1)[:, None]
                       * np.linalg.norm(md, axis=1)[None, :]), 4)
    for a in range(25):
        cand = [(-sims[a][b], b) for b in range(25) if b != a]
        cand.sort()
        want = [(i + 1, b, -s) for i, (s, b) in enumerate(cand[:3])]
        assert sorted(got[a]) == want, a


def test_knn_join_ivf_full_probe_equals_exact(spark):
    import numpy as np
    from hta_spark.pipeline.ann import knn_join, knn_join_ivf
    rng = np.random.default_rng(9)
    centers = np.eye(4, 8, dtype=np.float64) * 5
    vecs = []
    for c in range(4):
        for _ in range(8):
            vecs.append(centers[c] + rng.normal(scale=0.3, size=8))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    cents = [(c, [float(x) for x in centers[c]]) for c in range(4)]
    exact = sorted(map(tuple, knn_join(emb, k=3).collect()))
    # full probe coverage -> identical to the exact join (the GEMM and
    # HOF paths share the round(4) score convention)
    full = sorted(map(tuple,
                      knn_join_ivf(emb, cents, k=3, nprobe=4).collect()))
    assert full == exact
    # nprobe=1 on well-separated clusters still finds the true in-cluster
    # neighbors
    one = sorted(map(tuple,
                     knn_join_ivf(emb, cents, k=3, nprobe=1).collect()))
    assert one == exact
    # aggressive sub-blocking (every 8-member cluster split into 4-member
    # blocks) must not change a single row: per-block top-k merges exactly
    blocked = sorted(map(tuple,
                         knn_join_ivf(emb, cents, k=3, nprobe=4,
                                      max_cluster_rows=4).collect()))
    assert blocked == exact
    # aggressive probe-chunking (r12 2-D blocking: every cluster's probe
    # set split into 7-probe chunks, members replicated per chunk) must
    # not change a single row either — each (a, b) pair scores in exactly
    # one (chunk(a), block(b)) task
    chunked = sorted(map(tuple,
                         knn_join_ivf(emb, cents, k=3, nprobe=4,
                                      max_cluster_rows=4,
                                      max_probe_rows=7).collect()))
    assert chunked == exact


def test_knn_join_ivf_hot_centroid_subblocks(spark):
    """VERDICT r5 item 2: a hot centroid (here: ONE centroid holding every
    vector) must split into bounded sub-blocks instead of one O(n) cogroup
    task — and the per-block top-k merge keeps the output bit-identical to
    the exact join (each pair lands in exactly the block holding b; global
    top-k membership implies top-k within that block under the strict
    (-cos, b) order)."""
    import numpy as np
    from pyspark.sql import functions as F
    from hta_spark.pipeline.ann import (_as_double, _subblock_clusters,
                                        ivf_assign, knn_join, knn_join_ivf)
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 6))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>")
    cents = [(0, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0])]
    exact = sorted(map(tuple, knn_join(emb, k=3).collect()))
    hot = sorted(map(tuple, knn_join_ivf(emb, cents, k=3, nprobe=1,
                                         max_cluster_rows=8).collect()))
    assert hot == exact
    # the blocking itself: ceil(60/8) = 8 sub-blocks, md5-near-uniform
    # member spread, probes replicated once per block
    members = ivf_assign(emb, cents).select(
        F.col("vec_id").alias("b"), _as_double(F.col("embedding")).alias("_vb"),
        F.col("centroid_id").alias("_c"))
    probes = members.select(F.col("b").alias("a"),
                            F.col("_vb").alias("_va"), "_c")
    m2, p2 = _subblock_clusters(members, probes, 8, 1 << 30)
    counts = {(r["_c"], r["_blk"]): r["n"] for r in
              m2.groupBy("_c", "_blk").agg(F.count("*").alias("n")).collect()}
    assert all(blk in range(8) for (_c, blk) in counts)
    assert sum(counts.values()) == 60            # a partition, not a sample
    assert max(counts.values()) <= 3 * 8         # near-uniform, never O(n)
    assert len(counts) >= 4
    assert p2.count() == 60 * 8                  # one probe copy per block
    # probe axis (r12): 60 probes at cap 16 -> 4 chunks; members replicate
    # once per chunk, probes partition across chunks within each block
    m3, p3 = _subblock_clusters(members, probes, 8, 16)
    assert m3.count() == 60 * 4                  # one member copy per chunk
    pc = {(r["_blk"], r["_pblk"]): r["n"] for r in
          p3.groupBy("_blk", "_pblk").agg(F.count("*").alias("n")).collect()}
    assert all(pb in range(4) for (_blk, pb) in pc)
    assert sum(pc.values()) == 60 * 8            # still one copy per block
    assert max(p for (_b, p) in pc) <= 3         # chunk ids within range


def test_knn_join_ivf_plan_uses_window_group_limit(spark):
    from hta_spark.pipeline.ann import knn_join_ivf
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<float>")
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    plan = knn_join_ivf(emb, cents, k=2, nprobe=1)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_cosine_pairs_gemm_empty_and_guard(spark):
    import pytest as _pt
    from hta_spark.pipeline.ann import cosine_pairs_gemm
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert cosine_pairs_gemm(empty).count() == 0
    one = spark.createDataFrame([(1, [1.0, 0.0])],
                                "vec_id long, embedding array<float>")
    with _pt.raises(ValueError, match="broadcast"):
        cosine_pairs_gemm(one, max_broadcast_mb=0)


# -- grid range join --------------------------------------------------------

def _brute(points, intervals):
    out = set()
    for pid, p in points:
        for iid, b, e in intervals:
            if b <= p < e:
                out.add((pid, iid))
    return out


def test_range_join_matches_brute_force(spark):
    import random
    rng = random.Random(7)
    points = [(i, rng.randrange(0, 1000)) for i in range(300)]
    intervals = [(j, b, b + rng.randrange(1, 120))
                 for j, b in ((j, rng.randrange(0, 1000))
                              for j in range(60))]
    p = spark.createDataFrame(points, "pid int, t long")
    iv = spark.createDataFrame(intervals, "iid int, b long, e long")
    for cell in (7, 64, 1000):
        got = {(r["pid"], r["iid"])
               for r in range_join_points(p, iv, "t", "b", "e",
                                          cell=cell).collect()}
        assert got == _brute(points, intervals), f"cell={cell}"


def test_range_join_half_open_boundaries(spark):
    p = spark.createDataFrame([(1, 10), (2, 20)], "pid int, t long")
    iv = spark.createDataFrame([(9, 10, 20)], "iid int, b long, e long")
    got = [(r["pid"], r["iid"]) for r in
           range_join_points(p, iv, "t", "b", "e", cell=5).collect()]
    assert got == [(1, 9)]      # begin inclusive, end exclusive


def test_range_join_drops_empty_and_inverted_intervals(spark):
    p = spark.createDataFrame([(1, 100)], "pid int, t long")
    iv = spark.createDataFrame(
        [(1, 100, 100),          # empty: end == begin
         (2, 100, 90),           # inverted
         (3, 90, 200)],          # real, matches
        "iid int, b long, e long")
    got = [(r["pid"], r["iid"]) for r in
           range_join_points(p, iv, "t", "b", "e", cell=10).collect()]
    assert got == [(1, 3)]


def test_range_join_no_nested_loop_in_plan(spark):
    p = spark.createDataFrame([(1, 10)], "pid int, t long")
    iv = spark.createDataFrame([(9, 0, 100)], "iid int, b long, e long")
    plan = range_join_points(p, iv, "t", "b", "e", cell=10) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_rule_signals_values(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "x1 @@@@ http://spam.example j@k.io 7 7 7")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in rule_signals(docs).collect()}
    r = out[1]
    assert r["n_words"] == 6 and r["word_chars"] == 17
    assert r["n_alpha_words"] == 6 and r["alpha_frac"] == 1.0
    assert r["symbol_chars"] == 0 and r["n_urls"] == 0
    s = out[2]
    assert s["n_urls"] == 1 and s["n_emails"] == 1
    assert s["n_alpha_words"] == 0
    assert s["symbol_chars"] > 0


def test_rule_filter_keep_verdicts(spark):
    docs = spark.createDataFrame(
        [(1, "a good long document with many normal readable words here"),
         (2, "too short"),
         (3, "@@ ## $$ %% ^^ && ** (( )) !!")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["keep"] for r in rule_filter(docs).collect()}
    assert out[1] is True
    assert out[2] is False      # below min word count
    assert out[3] is False      # symbol soup


def test_rule_signals_plan_is_map_only(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = rule_signals(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# -- bucketed join ----------------------------------------------------------

def test_bucketed_join_has_no_exchange(spark, tmp_path):
    left = spark.createDataFrame(
        [(i, f"l{i}") for i in range(200)], "k long, lv string")
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(0, 200, 2)], "k long, rv string")
    lt = ensure_bucketed(spark, "t_bkt_left", str(tmp_path / "l"),
                         left, ["k"], 4)
    rt = ensure_bucketed(spark, "t_bkt_right", str(tmp_path / "r"),
                         right, ["k"], 4)
    j = lt.join(rt, "k")
    # at test scale the planner would rather broadcast the small side;
    # at warehouse scale neither side broadcasts — model that here
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert j.count() == 100
        # correctness identical to the unbucketed join
        exp = sorted(map(tuple, left.join(right, "k").collect()))
        assert sorted(map(tuple, j.collect())) == exp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE t_bkt_left")
    spark.sql("DROP TABLE t_bkt_right")


def test_write_bucketed_overwrites_and_ensure_is_idempotent(spark, tmp_path):
    a = spark.createDataFrame([(1, "a")], "k long, v string")
    b = spark.createDataFrame([(2, "b")], "k long, v string")
    write_bucketed(a, "t_bkt_ow", str(tmp_path / "t"), ["k"], 2)
    write_bucketed(b, "t_bkt_ow", str(tmp_path / "t"), ["k"], 2)
    assert [tuple(r) for r in spark.table("t_bkt_ow").collect()] == [(2, "b")]
    # ensure_bucketed must not rewrite an existing table
    got = ensure_bucketed(spark, "t_bkt_ow", str(tmp_path / "t"),
                          a, ["k"], 2)
    assert [tuple(r) for r in got.collect()] == [(2, "b")]
    spark.sql("DROP TABLE t_bkt_ow")


def test_range_join_extra_keys_copartition(spark):
    p = spark.createDataFrame([(1, 10, "u1"), (2, 10, "u2")],
                              "pid int, t long, k string")
    iv = spark.createDataFrame([(9, 0, 100, "u1")],
                               "iid int, b long, e long, k string")
    got = [(r["pid"], r["iid"]) for r in
           range_join_points(p, iv, "t", "b", "e", cell=10,
                             extra_keys=["k"]).collect()]
    assert got == [(1, 9)]


def test_topk_block_bitexact():
    """r13: the in-place _topk_block must match the original
    round((A@B.T)/outer, 4) + _topk_order composition BIT-FOR-BIT —
    same sims block, same selection order — across tie-heavy rounded
    values, wide/narrow member sides, and the m <= 4*take path."""
    import numpy as np
    from hta_spark.pipeline.ann import (_topk_block, _topk_buffers,
                                        _topk_order)

    rng = np.random.default_rng(7)
    for n_a, m, dim, take in ((64, 3000, 8, 6), (64, 17, 4, 6),
                              (5, 12000, 16, 3), (7, 5, 3, 9),
                              (33, 64 * 6, 8, 6), (33, 64 * 6 + 1, 8, 6),
                              (33, 500, 8, 6), (9, 130, 4, 2)):
        a = rng.random((n_a, dim)) * 2 - 1
        # quantize some coordinates so 4-decimal rounding produces ties
        b = np.round(rng.random((m, dim)) * 2 - 1, 1)
        if m > 100:
            b[m // 2] = 0.0          # zero-norm member -> NaN cosine
        an = np.linalg.norm(a, axis=1)
        bn = np.linalg.norm(b, axis=1)
        bufs = _topk_buffers(32, m)
        for lo in range(0, n_a, 32):
            hi = min(lo + 32, n_a)
            want_sims = np.round(
                (a[lo:hi] @ b.T) / (an[lo:hi, None] * bn[None, :]), 4)
            want_order = _topk_order(want_sims, take)
            got_sims, got_order = _topk_block(a, an, b, bn, lo, hi,
                                              take, *bufs)
            assert np.array_equal(got_sims, want_sims,
                                  equal_nan=True), (n_a, m, lo)
            assert np.array_equal(got_order, want_order), (n_a, m, lo)


# -- codebook norm hoist (r15) ----------------------------------------------

def test_codebook_norm_bit_identical_to_spark_fold(spark):
    # _py_norm (driver-side, rides centroid_frame as the `n` field) must
    # match Spark's _norm fold to the LAST BIT: same left fold over the
    # same doubles, same correctly-rounded sqrt.  The assignment score
    # dot/(vnorm*n) is bit-identical to cosine_sim only if this holds.
    import struct
    from hta_spark.pipeline.ann import _norm, _py_norm
    vecs = [
        [1.0, 2.0, 3.0],
        [0.1] * 64,                          # repeating non-dyadic
        [1e300, 1e-300, -7.25, 3.3],         # extreme magnitudes
        [float(i) * 0.7 for i in range(33)],  # odd length, accumulating
        [],                                   # empty -> 0.0
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vecs)],
                               "i long, v array<double>")
    got = {r["i"]: r["n"] for r in
           df.select("i", _norm(F.col("v")).alias("n")).collect()}
    for i, v in enumerate(vecs):
        a = struct.pack("<d", got[i])
        b = struct.pack("<d", _py_norm(v))
        assert a == b, f"norm bits diverge on {v!r}: {got[i]} vs {_py_norm(v)}"


def test_assignment_hoist_matches_unhoisted_cosine(spark):
    # the hoisted argmax (dot/(vnorm*n), norms folded once) must produce
    # the exact (cluster, sim) of the per-centroid cosine_sim form
    import struct
    from hta_spark.pipeline.ann import (_as_double, _best_centroid,
                                        centroid_frame, cosine_sim, _norm)
    import random
    rnd = random.Random(42)
    vecs = [[rnd.uniform(-1, 1) for _ in range(16)] for _ in range(200)]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, v array<double>")
    cents = [(c, vecs[c * 7]) for c in range(8)]
    cf = centroid_frame(spark, cents)
    # unhoisted reference: cosine_sim per centroid over the same codebook
    ref_best = F.array_max(F.transform(
        F.col("_cents"),
        lambda s: F.struct(
            F.round(cosine_sim(_as_double(F.col("v")), s["v"]), 9)
            .alias("s"), (-s["c"]).alias("negc"))))
    ref = (emb.join(F.broadcast(cf))
           .select("vec_id", (-ref_best["negc"]).alias("cluster"),
                   ref_best["s"].alias("sim")))
    hoist_best = _best_centroid(F.col("_vd"), 9, vnorm=F.col("_vn"))
    pre = (emb.select("vec_id", _as_double(F.col("v")).alias("_vd"))
           .withColumn("_vn", _norm(F.col("_vd"))))
    got = (pre.join(F.broadcast(cf))
           .select("vec_id", (-hoist_best["negc"]).alias("cluster"),
                   hoist_best["s"].alias("sim")))

    def keyed(df):
        return sorted((r["vec_id"], r["cluster"],
                       struct.pack("<d", r["sim"]).hex())
                      for r in df.collect())
    assert keyed(ref) == keyed(got)
