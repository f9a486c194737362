"""Round-11 ADVICE fixes: simhash_pairs' honest hot-bucket contract,
chunk_documents' last-window-only min_tokens filter, and the weak-keyed
localCheckpoint capability cache."""

from __future__ import annotations

import weakref

import pytest
from pyspark.sql import functions as F

from hta_spark.pipeline.dedup import simhash_pairs
from hta_spark.pipeline.pack import chunk_documents


@pytest.fixture(scope="module")
def boiler_docs(spark):
    """5 identical docs (identical simhash -> every band shares one
    5-member bucket) + distinct tails."""
    rows = [(i, "the same boilerplate text appears in every copy")
            for i in range(5)]
    rows += [(10 + i, f"unique document number {i} with words w{i} x{i}")
             for i in range(3)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_pairs_error_on_hot_bucket(boiler_docs):
    # default hot_action='error': the exactness contract must refuse,
    # naming the knob, instead of silently star-dropping true pairs
    with pytest.raises(Exception) as ei:
        simhash_pairs(boiler_docs, max_bucket=2).collect()
    assert "max_bucket" in str(ei.value)


def test_simhash_pairs_star_optin(boiler_docs):
    # star keeps B-1 anchored pairs for the 5-member bucket (components
    # intact, pair set reduced) — the explicit MinHash-style opt-in
    got = {(r["a"], r["b"])
           for r in simhash_pairs(boiler_docs, max_bucket=2,
                                  hot_action="star").collect()
           if r["b"] < 10}
    assert got == {(0, 1), (0, 2), (0, 3), (0, 4)}, got


def test_simhash_pairs_exact_under_cap(boiler_docs):
    # all 10 identical-doc pairs present when the bucket fits the cap
    got = {(r["a"], r["b"], r["hamming"])
           for r in simhash_pairs(boiler_docs).collect() if r[1] < 10}
    assert {(a, b, 0) for a in range(5) for b in range(a + 1, 5)} <= got


def test_simhash_pairs_bad_action(boiler_docs):
    with pytest.raises(ValueError, match="hot_action"):
        simhash_pairs(boiler_docs, hot_action="warn").collect()


# -- chunk_documents (ADVICE r10: min_tokens must only gate the LAST window) --

def _chunks(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(df, **kw).orderBy("chunk_id").collect()
    return [(r["chunk_id"], r["n_tokens"], r["chunk_text"]) for r in rows]


def test_chunk_overlap_keeps_interior_windows(spark):
    # 20 tokens, size 8, stride 3: interior windows add exactly stride=3
    # new tokens; min_tokens=5 > stride must NOT drop them (the r10 bug
    # dropped every interior window), only the final window (adds 3 < 5)
    text = " ".join(f"t{i}" for i in range(20))
    got = _chunks(spark, text, size=8, stride=3, min_tokens=5)
    assert [c for c, _, _ in got] == [0, 1, 2, 3]
    assert all(n == 8 for _, n, _ in got)
    assert got[1][2] == " ".join(f"t{i}" for i in range(3, 11))


def test_chunk_trailing_filter_still_applies(spark):
    text = " ".join(f"t{i}" for i in range(10))
    # size=4 disjoint: windows of 4,4,2; the 2-token tail is dropped at
    # min_tokens=3 and kept at min_tokens=2
    assert [c for c, _, _ in
            _chunks(spark, text, size=4, min_tokens=3)] == [0, 1]
    got = _chunks(spark, text, size=4, min_tokens=2)
    assert [(c, n) for c, n, _ in got] == [(0, 4), (1, 4), (2, 2)]


def test_chunk_single_window_always_kept(spark):
    got = _chunks(spark, "one two", size=10, min_tokens=5)
    assert got == [(0, 2, "one two")]


def test_chunk_validation(spark):
    df = None
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, size=4, stride=5)
    with pytest.raises(ValueError, match=">= 1"):
        chunk_documents(df, size=0)


# -- compat: weak-keyed localCheckpoint probe cache (ADVICE r10) --------------

def test_lc_cache_is_weak(spark):
    from hta_spark import compat
    assert isinstance(compat._LC_OK, weakref.WeakKeyDictionary)
    first = compat._lc_supported(spark)
    assert compat._lc_supported(spark) is first   # cached verdict reused
    assert spark in compat._LC_OK


# -- top_fraction_by (r11 quality selection) ----------------------------------

def test_top_fraction_ceil_and_tiebreak(spark):
    from hta_spark.pipeline.sample import top_fraction_by
    rows = [(i, "g", float(100 - i)) for i in range(10)]   # scores desc by id
    rows += [(100, "h", 1.0), (101, "h", 1.0), (102, "h", 1.0)]
    df = spark.createDataFrame(rows, "doc_id long, g string, score double")
    # 25% of 10 -> ceil(2.5) = 3; 25% of 3 -> ceil(0.75) = 1 (never empty)
    got = top_fraction_by(df, 2500, "score", group_col="g")
    by_g = {}
    for r in got.collect():
        by_g.setdefault(r["g"], []).append(r["doc_id"])
    assert sorted(by_g["g"]) == [0, 1, 2]
    assert by_g["h"] == [100]          # equal scores -> smallest key wins


def test_top_fraction_bounds(spark):
    from hta_spark.pipeline.sample import top_fraction_by
    df = spark.createDataFrame([(1, 1.0)], "doc_id long, score double")
    assert top_fraction_by(df, 10_000, "score").count() == 1
    import pytest as _pt
    with _pt.raises(ValueError, match="frac_bp"):
        top_fraction_by(df, 10_001, "score")


def test_bin_report_fields(spark):
    from hta_spark.pipeline.pack import bin_report, pack_contiguous
    df = spark.createDataFrame(
        [(1, 60), (2, 50), (3, 30), (4, 10)],    # offsets 0,60,110,140
        "doc_id long, n_chars long")
    packed = pack_contiguous(df, 100)            # bins 0,0,1,1
    got = bin_report(packed, 100).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_docs"], r["n_bins"], r["total_size"]) == (4, 2, 150)
    assert r["last_bin_fill"] == 50              # 150 - 1*100
    assert r["max_docs_per_bin"] == 2
    import pytest as _pt
    with _pt.raises(ValueError, match="budget"):
        bin_report(packed, 0)


def test_bin_report_counts_occupied_bins(spark):
    # ADVICE r11: two 9-char docs at budget 10 start in bin 0 but the
    # stream occupies 2 bins; start-bin counting reported n_bins=1 and
    # last_bin_fill=18 > budget
    from hta_spark.pipeline.pack import bin_report, pack_contiguous
    df = spark.createDataFrame([(1, 9), (2, 9)], "doc_id long, n_chars long")
    r = bin_report(pack_contiguous(df, 10), 10).collect()[0]
    assert (r["n_bins"], r["total_size"], r["last_bin_fill"]) == (2, 18, 8)
    # a single doc exceeding budget occupies ceil(25/10)=3 bins
    df2 = spark.createDataFrame([(1, 25)], "doc_id long, n_chars long")
    r2 = bin_report(pack_contiguous(df2, 10), 10).collect()[0]
    assert (r2["n_bins"], r2["last_bin_fill"]) == (3, 5)


def test_simhash_default_knobs_survive_100k_docs(spark):
    """VERDICT r11 item 5: the DEFAULT simhash_pairs knobs are the scale
    ones (bits=64 -> 16-bit bands) — a 10^5-doc corpus must run without
    tripping the hot-bucket guard, and planted duplicate pairs must
    surface (identical text -> identical fingerprint -> hamming 0)."""
    n, planted = 100_000, 20
    base = F.when(F.col("id") < planted, F.col("id") % (planted // 2)) \
            .otherwise(F.col("id"))
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[F.hex(F.xxhash64(base, F.lit(j)))
                           for j in range(12)]).alias("text"))
    pairs = simhash_pairs(docs)                 # ALL defaults, error-guard
    got = {(r.a, r.b) for r in
           pairs.filter(F.col("b") < planted).collect()}
    want = {(i, i + planted // 2) for i in range(planted // 2)}
    assert want <= got
