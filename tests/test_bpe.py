"""BPE merge training: semantics on constructed corpora.

Pins the documented conventions of hta_spark.pipeline.bpe: weighted
vocab counting, (count desc, lhs, rhs) tie-break, space-bounded literal
replace with MERGE_PASSES applications, single-symbol word safety.
"""

import pytest
from pyspark.sql import functions as F

from hta_spark.pipeline.bpe import (apply_merge, bpe_train, pair_counts,
                                    symbolize, weighted_vocab)


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")


def test_bpe_learns_frequent_pair(spark):
    # "ab" appears in every word of every doc; (a, b) must be merge 1
    docs = _docs(spark, ["abc abd abc", "abe abc"])
    merges = bpe_train(docs, n_merges=2).collect()
    assert (merges[0]["lhs"], merges[0]["rhs"]) == ("a", "b")
    assert merges[0]["pair_count"] == 5   # 5 word occurrences
    # after merging, "ab"+"c" dominates (3 of 5 words)
    assert (merges[1]["lhs"], merges[1]["rhs"]) == ("ab", "c")
    assert merges[1]["step"] == 2


def test_bpe_single_char_words_safe(spark):
    # single-symbol words contribute no pairs and must not error
    docs = _docs(spark, ["a b c a b", "a a"])
    merges = bpe_train(docs, n_merges=1).collect()
    assert merges == []   # no adjacent pairs anywhere


def test_bpe_tiebreak_lexicographic(spark):
    # (x,y) and (y,z) both appear twice -> (x,y) wins on lhs order
    docs = _docs(spark, ["xy xy yz yz"])
    merges = bpe_train(docs, n_merges=1).collect()
    assert (merges[0]["lhs"], merges[0]["rhs"]) == ("x", "y")


def test_apply_merge_run_semantics(spark):
    # documented deviation: l == r runs merge one pair per replace pass,
    # MERGE_PASSES=2 passes per round; run of 4 fully pairs up, run of 5
    # leaves a lone symbol mid-run per the literal-replace scan
    reprs = spark.createDataFrame(
        [(" a a a a ", 1), (" a a a a a ", 1), (" b a a b ", 1)],
        "repr string, freq long")
    got = {r["repr"] for r in apply_merge(reprs, "a", "a").collect()}
    assert " aa aa " in got
    assert " aa a aa " in got          # 5-run: pass1 merges pos 1+3
    assert " b aa b " in got


def test_pair_counts_weighted(spark):
    docs = _docs(spark, ["to to to", "ton"])
    pc = {(r["lhs"], r["rhs"]): r["pair_count"]
          for r in pair_counts(symbolize(weighted_vocab(docs))).collect()}
    # vocab: to(freq 3), ton(freq 1) -> (t,o) weighted 3+1
    assert pc[("t", "o")] == 4
    assert pc[("o", "n")] == 1


def test_bpe_segment_counts(spark):
    from hta_spark.pipeline.bpe import bpe_segment_counts
    docs = _docs(spark, ["abab ab", "abab"])
    # no merges: every char is a subword
    none = {r["doc_id"]: (r["n_tokens"], r["n_subwords"])
            for r in bpe_segment_counts(docs, []).collect()}
    assert none == {0: (2, 6), 1: (1, 4)}
    # merge (a,b) then (ab,ab): "abab" -> 1 subword, "ab" -> 1
    got = {r["doc_id"]: (r["n_tokens"], r["n_subwords"])
           for r in bpe_segment_counts(
               docs, [("a", "b"), ("ab", "ab")]).collect()}
    assert got == {0: (2, 2), 1: (1, 1)}


def test_grouped_hist_quantiles_matches_global_per_group(spark):
    """Per-group histogram quantiles must equal running the global sketch
    on each group's rows alone (same bins, same interpolation)."""
    from hta_spark.pipeline.sketch import (hist_quantiles,
                                           hist_quantiles_grouped)
    rows = [("a", float(i)) for i in range(100)] \
        + [("b", float(i * 3)) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, v double")
    grouped = {(r["g"], r["q"]): (r["target_rank"], r["est"])
               for r in hist_quantiles_grouped(df, "v", ["g"]).collect()}
    for g in ("a", "b"):
        solo = {r["q"]: (r["target_rank"], r["est"]) for r in
                hist_quantiles(df.filter(F.col("g") == g), "v").collect()}
        for q, want in solo.items():
            assert grouped[(g, q)] == want, (g, q)
    with pytest.raises(ValueError):
        hist_quantiles_grouped(df, "v", ["g"], qs=(0.0, 0.5))


def test_bpe_rerun_deterministic(spark):
    docs = _docs(spark, ["the cat the mat", "the hat"])
    a = [tuple(r) for r in bpe_train(docs, n_merges=4).collect()]
    b = [tuple(r) for r in
         bpe_train(docs.repartition(7), n_merges=4).collect()]
    assert a == b and len(a) == 4


def test_hist_quantiles_exclude_nulls_all_paths(spark):
    """NULL values must not shift ranks in any histogram path (they would
    inflate _total and sort differently in Spark vs DuckDB vs stream)."""
    from hta_spark.pipeline.sketch import (hist_quantiles,
                                           hist_quantiles_grouped)
    clean = [(float(i),) for i in range(200)]
    df_clean = spark.createDataFrame(clean, "v double")
    df_nulls = spark.createDataFrame(clean + [(None,)] * 20, "v double")
    a = [tuple(r) for r in hist_quantiles(df_clean, "v").collect()]
    b = [tuple(r) for r in hist_quantiles(df_nulls, "v").collect()]
    assert a == b
    f1 = [tuple(r) for r in
          hist_quantiles(df_clean, "v", bounds=(0, 19900)).collect()]
    f2 = [tuple(r) for r in
          hist_quantiles(df_nulls, "v", bounds=(0, 19900)).collect()]
    assert f1 == f2
    g1 = spark.createDataFrame([("a", v[0]) for v in clean],
                               "g string, v double")
    g2 = spark.createDataFrame([("a", v[0]) for v in clean]
                               + [("a", None)] * 5, "g string, v double")
    assert [tuple(r) for r in hist_quantiles_grouped(g1, "v", ["g"]).collect()] \
        == [tuple(r) for r in hist_quantiles_grouped(g2, "v", ["g"]).collect()]
