"""Round-10 pipeline operators: simhash_pairs (banded Hamming near-dup),
tfidf_terms, semantic dedup.  Driver-gate + sf0.1 strict sweep carry the
oracle parity; these pin the operator-level contracts the oracles can't
see (banded == brute force, cluster confinement, determinism)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_pairs_banded_equals_bruteforce(spark):
    """The banded candidate generation must lose NO pair with hamming <=
    bands-1 (pigeonhole) and the exact filter must drop band-collision
    false positives — i.e. output == brute-force all-pairs filter."""
    from hta_spark.pipeline.dedup import simhash, simhash_pairs

    rows = [(i, " ".join(f"w{(i * 7 + j * 11) % 23}" for j in range(30)))
            for i in range(40)]
    # planted near-dups: same text -> hamming 0
    rows += [(100 + i, rows[i][1]) for i in range(5)]
    docs = _docs(spark, rows)

    got = {(r["a"], r["b"], r["hamming"])
           for r in simhash_pairs(docs, max_hamming=2).collect()}

    fp = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ids = sorted(fp)
    brute = {(a, b, bin(fp[a] ^ fp[b]).count("1"))
             for i, a in enumerate(ids) for b in ids[i + 1:]
             if bin(fp[a] ^ fp[b]).count("1") <= 2}
    assert got == brute
    # the planted identical docs are found at hamming 0
    assert all((i, 100 + i, 0) in got for i in range(5))


def test_simhash_pairs_band_width_validation(spark):
    import pytest

    from hta_spark.pipeline.dedup import simhash_pairs

    with pytest.raises(ValueError, match="must divide"):
        simhash_pairs(_docs(spark, [(1, "a b c")]), bits=16, bands=3)


def test_tfidf_rare_terms_outrank_common(spark):
    """A term appearing in one doc must outscore (per occurrence) a term
    appearing in every doc; ranks are (score desc, term asc)."""
    from hta_spark.pipeline.text import tfidf_terms

    docs = _docs(spark, [
        (1, "common zebra common common"),
        (2, "common common yak yak"),
        (3, "common common common ant"),
    ])
    out = {(r["doc_id"], r["rank"]): (r["term"], r["score"])
           for r in tfidf_terms(docs, top=2).collect()}
    # rarity ratio: df=1 -> (3-1+0.5)/1.5 = 5/3; df=3 -> 0.5/3.5 = 1/7
    assert out[(1, 1)][0] == "zebra"
    assert out[(2, 1)][0] == "yak"          # tf=2 on a df=1 term
    assert out[(3, 1)][0] == "ant"
    # the ubiquitous term ranks second everywhere with the tiny ratio
    assert out[(1, 2)][0] == "common"
    assert out[(1, 2)][1] < out[(1, 1)][1]


def test_semantic_pairs_confined_to_clusters(spark):
    """Every emitted pair shares its kmeans cluster (the SemDeDup
    decomposition), and near-identical planted vectors are found."""
    import numpy as np

    from hta_spark.pipeline.kmeans import kmeans_lite
    from hta_spark.pipeline.semdedup import semantic_dedup, semantic_pairs

    rng = np.random.default_rng(3)
    base = rng.normal(size=(30, 8))
    rows = [(i, [float(x) for x in base[i]]) for i in range(30)]
    # planted near-dups of vectors 0..4 (tiny perturbation -> cos ~1)
    rows += [(100 + i, [float(x + 0.01) for x in base[i]])
             for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    pairs = semantic_pairs(emb, k=4, iterations=2, threshold=0.95,
                           quantize=6).collect()
    clu = {r["vec_id"]: r["cluster"]
           for r in kmeans_lite(emb, k=4, iterations=2,
                                quantize=6).collect()}
    assert pairs, "planted near-identical pairs must survive"
    for r in pairs:
        assert clu[r["a"]] == clu[r["b"]] == r["cluster"]
        assert r["cos_sim"] >= 0.95

    comp = semantic_dedup(emb, k=4, iterations=2, threshold=0.95,
                          quantize=6).collect()
    found = {r["component"] for r in comp}
    # each planted duplicate pair forms a component rooted at the base id
    assert {0, 1, 2, 3, 4} <= found
    assert all(r["n_members"] >= 2 for r in comp)
