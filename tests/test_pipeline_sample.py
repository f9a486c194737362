"""Deterministic sampling + repetition-stats operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hta_spark.pipeline.sample import BP, hash_bucket, hash_sample, \
    stratified_sample
from hta_spark.pipeline.text import repetition_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 4}", f"word{i} " * 3) for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string") \
        .repartition(4).cache()


def test_hash_sample_deterministic_and_partition_invariant(docs):
    a = sorted(r.doc_id for r in hash_sample(docs, rate_bp=2000,
                                             salt="t").collect())
    b = sorted(r.doc_id for r in
               hash_sample(docs.repartition(13), rate_bp=2000,
                           salt="t").collect())
    assert a == b and len(a) > 0


def test_hash_sample_rate_accuracy(docs):
    n = hash_sample(docs, rate_bp=2500, salt="t").count()
    assert abs(n / 2000 - 0.25) < 0.05   # md5 uniformity at n=2000


def test_hash_sample_nested_rates(docs):
    """A lower-rate sample with the same salt is a SUBSET of a higher-rate
    one (bucket < r1 implies bucket < r2) — lets pipelines grow a sample
    without resampling everything."""
    small = {r.doc_id for r in hash_sample(docs, rate_bp=500,
                                           salt="t").collect()}
    big = {r.doc_id for r in hash_sample(docs, rate_bp=3000,
                                         salt="t").collect()}
    assert small <= big


def test_distinct_salts_independent(docs):
    a = {r.doc_id for r in hash_sample(docs, rate_bp=2000,
                                       salt="train").collect()}
    b = {r.doc_id for r in hash_sample(docs, rate_bp=2000,
                                       salt="eval").collect()}
    # independent draws: overlap near rate^2, far below either set's size
    assert 0 < len(a & b) < min(len(a), len(b)) * 0.5


def test_stratified_rates_respected(docs):
    out = stratified_sample(docs, {"src0": BP, "src1": 0},
                            strata_col="source", default_bp=5000, salt="t")
    by_src = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src.get("src0") == 500          # rate 100% keeps all
    assert "src1" not in by_src               # rate 0 drops all
    for s in ("src2", "src3"):                # default ~50%
        assert 150 < by_src.get(s, 0) < 350


def test_pack_contiguous_semantics(spark):
    from hta_spark.pipeline.pack import pack_contiguous
    rows = [(1, 300), (2, 300), (3, 500), (4, 100)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = {r.doc_id: r for r in
           pack_contiguous(df, 512, size_col="n_chars").collect()}
    assert [out[i].start_offset for i in (1, 2, 3, 4)] == [0, 300, 600, 1100]
    assert [out[i].bin_id for i in (1, 2, 3, 4)] == [0, 0, 1, 2]


def test_pack_sharded_independent(spark):
    from hta_spark.pipeline.pack import pack_contiguous
    rows = [(i, i % 2, 200) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, shard long, n_chars long")
    out = pack_contiguous(df, 500, size_col="n_chars", shard_col="shard")
    # each shard packs its own stream: 5 docs x 200 -> offsets 0..800
    for r in out.collect():
        assert r.start_offset == (r.doc_id // 2) * 200
        assert r.bin_id == r.start_offset // 500


def test_repetition_stats_values(spark):
    rows = [
        (1, "a a a a"),          # one token repeated: dup 0.75, top 1.0
        (2, "a b c d"),          # all distinct
        (3, "a b a b a b"),      # alternating: 3-grams 'a b a'/'b a b' x2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert out[1].dup_token_frac == 0.75 and out[1].top_token_frac == 1.0
    assert out[1].dup_shingle_frac == 0.5    # 2 shingles, 1 distinct
    assert out[2].dup_token_frac == 0.0 and out[2].top_token_frac == 0.25
    assert out[2].dup_shingle_frac == 0.0
    assert out[3].n_tokens == 6 and out[3].dup_token_frac == round(4 / 6, 4)
    assert out[3].dup_shingle_frac == 0.5    # 4 shingles, 2 distinct


def test_group_cap_deterministic_and_bounded(spark):
    """group_cap: at most k per group, identical kept set under any
    repartitioning (pure function of group/key/salt), and the rank filter
    compiles to WindowGroupLimit (per-task top-k before the exchange)."""
    from hta_spark.pipeline.sample import group_cap
    rows = [(i, "g%d" % (i % 3)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = group_cap(df, 7).select("source", "doc_id")
    got = sorted(map(tuple, kept.collect()))
    per = {}
    for s, _d in got:
        per[s] = per.get(s, 0) + 1
    assert per == {"g0": 7, "g1": 7, "g2": 7}
    again = sorted(map(tuple,
                       group_cap(df.repartition(13), 7)
                       .select("source", "doc_id").collect()))
    assert again == got
    plan = group_cap(df, 7)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


# -- top_fraction_by: exact banded arm (VERDICT r11 "What's wrong #1") ------

def _kept(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def _tf_frame(spark, n=400, groups=3, ties=True, nulls=True):
    rows = []
    for i in range(n):
        g = "g%d" % (i % groups)
        if nulls and i % 17 == 0:
            s = None
        elif ties:
            s = float((i * 7919) % 50)        # heavy score ties
        else:
            s = float((i * 7919) % 100_003)
        rows.append((i, g, s))
    return spark.createDataFrame(rows, "doc_id long, source string, "
                                       "score double")


@pytest.mark.parametrize("frac_bp", [0, 1, 2500, 9999, BP])
def test_top_fraction_banded_equals_window(spark, frac_bp):
    """The banded arm keeps the bit-identical set the window arm keeps —
    including score ties resolved by key, NULL scores sorting last, and
    the exact ceil boundary — at several bin resolutions (n_bins=1
    forces EVERYTHING through the boundary band; n_bins huge makes every
    band a single score)."""
    from hta_spark.pipeline.sample import _top_fraction_banded, \
        _top_fraction_window
    df = _tf_frame(spark)
    exact = _kept(_top_fraction_window(df, frac_bp, "score", ["source"],
                                       "doc_id"))
    for n_bins in (1, 8, 1024):
        got = _kept(_top_fraction_banded(df, frac_bp, "score", ["source"],
                                         "doc_id", n_bins, 1_000_000))
        assert got == exact, f"n_bins={n_bins}"


def test_top_fraction_banded_ungrouped_and_all_null(spark):
    from hta_spark.pipeline.sample import _top_fraction_banded, \
        _top_fraction_window
    df = _tf_frame(spark, n=100, groups=1).drop("source")
    exact = _kept(_top_fraction_window(df, 3000, "score", [], "doc_id"))
    got = _kept(_top_fraction_banded(df, 3000, "score", [], "doc_id",
                                     64, 1_000_000))
    assert got == exact and len(got) == 30
    # a group whose scores are ALL NULL: keep = ceil(n*frac) lowest keys
    allnull = spark.createDataFrame([(i, None) for i in range(10)],
                                    "doc_id long, score double")
    got2 = _kept(_top_fraction_banded(allnull, 5000, "score", [], "doc_id",
                                      64, 1_000_000))
    assert got2 == list(range(5))


def test_top_fraction_dispatch_and_equality(spark):
    """top_fraction_by dispatches on the largest group: under the cap the
    single-window plan runs; past it the banded arm runs and keeps the
    identical set.  The oversized plan never full-sorts a group — its
    row_number window sits above the boundary-band filter."""
    from hta_spark.pipeline.sample import top_fraction_by
    df = _tf_frame(spark, n=600, groups=2)
    small = top_fraction_by(df, 2500, "score", "source",
                            rows_cap=4_000_000)
    big = top_fraction_by(df, 2500, "score", "source", rows_cap=10)
    assert _kept(small) == _kept(big)
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "_tbin" not in plan_small          # window arm chosen
    assert "row_number" in plan_big
    # the banded arm's only row_number window consumes the band filter
    assert "_tbin" in plan_big, "banded arm missing threshold routing"
    # partition-invariance of the banded kept set
    again = top_fraction_by(df.repartition(13), 2500, "score", "source",
                            rows_cap=10)
    assert _kept(again) == _kept(big)


def test_top_fraction_banded_nonfinite_scores(spark):
    """Review r12: NaN sorts ABOVE every finite score under Spark desc
    and NULL last; ±Inf saturates the long cast — an -Inf score made the
    span arithmetic wrap int64 and silently INVERT bin order.  The
    banded arm must keep the window arm's exact set through all of it."""
    from hta_spark.pipeline.sample import _top_fraction_banded, \
        _top_fraction_window
    rows = [(0, float("nan")), (1, float("inf")), (2, float("-inf")),
            (3, 5.0), (4, 5.0), (5, -3.0), (6, None), (7, float("nan")),
            (8, 0.0), (9, 1e18)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    for frac in (1, 2000, 5000, 9000, 10_000):
        exact = _kept(_top_fraction_window(df, frac, "score", [],
                                           "doc_id"))
        got = _kept(_top_fraction_banded(df, frac, "score", [], "doc_id",
                                         8, 1_000_000))
        assert got == exact, f"frac={frac}: {got} != {exact}"
    # grouped, with one all-NaN group and one -Inf-heavy group
    rows2 = [(i, "a", float("nan")) for i in range(4)]
    rows2 += [(10 + i, "b", float("-inf") if i % 2 else float(i))
              for i in range(6)]
    df2 = spark.createDataFrame(rows2, "doc_id long, g string, score double")
    exact2 = _kept(_top_fraction_window(df2, 5000, "score", ["g"],
                                        "doc_id"))
    got2 = _kept(_top_fraction_banded(df2, 5000, "score", ["g"], "doc_id",
                                      8, 1_000_000))
    assert got2 == exact2


def test_bin_report_zero_size_shard(spark):
    """Review r12: a shard whose docs are all zero-size still occupies
    bin 0 — n_bins must be 1 (not 0) and last_bin_fill 0 (not budget)."""
    from hta_spark.pipeline.pack import bin_report, pack_contiguous
    df = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, n_chars long")
    r = bin_report(pack_contiguous(df, 10), 10).collect()[0]
    assert (r["n_docs"], r["n_bins"], r["total_size"],
            r["last_bin_fill"], r["max_docs_per_bin"]) == (2, 1, 0, 0, 2)


def test_top_fraction_null_group_keys(spark):
    """ADVICE r12 high: a plain equi-join never matches NULL group keys,
    so the banded arm silently dropped every NULL-keyed row while the
    window arm's partitionBy kept NULL as a group.  Both arms (and the
    public dispatch past rows_cap) must keep the identical set."""
    from hta_spark.pipeline.sample import _top_fraction_banded, \
        _top_fraction_window, top_fraction_by
    rows = [(i, None if i % 3 == 0 else "g%d" % (i % 2), float(i % 37))
            for i in range(300)]
    df = spark.createDataFrame(rows,
                               "doc_id long, source string, score double")
    for frac in (1, 2500, 5000, 9999):
        exact = _kept(_top_fraction_window(df, frac, "score", ["source"],
                                           "doc_id"))
        got = _kept(_top_fraction_banded(df, frac, "score", ["source"],
                                         "doc_id", 16, 1_000_000))
        assert got == exact, f"frac={frac}"
    # the ADVICE repro shape: dispatch engages the banded arm on data
    # with NULL group keys; kept count for the NULL group is exact
    pub = top_fraction_by(df, 5000, "score", "source", rows_cap=10)
    assert _kept(pub) == _kept(
        _top_fraction_window(df, 5000, "score", ["source"], "doc_id"))
    n_null = df.filter(F.col("source").isNull()).count()
    kept_null = pub.filter(F.col("source").isNull()).count()
    assert kept_null == (n_null * 5000 + BP - 1) // BP > 0


def test_key_band_value_monotone_string_and_long(spark):
    """The single-score band's key projection must be monotone
    NON-INCREASING along the window arm's ASCENDING key order (it is the
    negated natural order), NULLs strictly first — for binary-tricky
    strings (prefixes, NUL bytes, multi-byte UTF-8) and clamped longs."""
    from hta_spark.pipeline.sample import _key_band_value
    keys = ["", "a", "ab", "abc", "abcdefgh", "abcdefgz", "z", "Z", "zz",
            "a\x00b", "é", "€x", None]
    df = spark.createDataFrame([(k,) for k in keys], "doc_id string")
    proj = {r.doc_id: r.kv for r in df.select(
        "doc_id", _key_band_value(df, "doc_id").alias("kv")).collect()}
    native = [r.doc_id for r in df.orderBy(F.col("doc_id").asc()).collect()]
    vals = [proj[k] for k in native]
    assert all(vals[i] >= vals[i + 1] for i in range(len(vals) - 1)), vals
    assert native[0] is None and vals[0] > vals[1]   # NULL strictly first
    longs = [None, -(1 << 62), -5, 0, 7, (1 << 62)]
    df2 = spark.createDataFrame([(k,) for k in longs], "doc_id long")
    proj2 = {r.doc_id: r.kv for r in df2.select(
        "doc_id", _key_band_value(df2, "doc_id").alias("kv")).collect()}
    native2 = [r.doc_id for r in
               df2.orderBy(F.col("doc_id").asc()).collect()]
    vals2 = [proj2[k] for k in native2]
    assert all(vals2[i] >= vals2[i + 1] for i in range(len(vals2) - 1))
    assert native2[0] is None and vals2[0] > vals2[1]


def test_top_fraction_single_score_groups(spark):
    """VERDICT r12 item 4: groups sharing ONE score (incl. all-NaN and
    all-NULL) band on the key projection instead of degenerating the
    whole group into the boundary band — kept set identical to the
    window arm for long keys, string keys, and unsupported key types
    (which keep the documented band sort)."""
    from hta_spark.pipeline.sample import _key_band_value, \
        _top_fraction_banded, _top_fraction_window
    rows = [(i, "one", 7.5) for i in range(200)]
    rows += [(1000 + i, "nan", float("nan")) for i in range(60)]
    rows += [(2000 + i, "null", None) for i in range(60)]
    rows += [(3000 + i, "mix", float(i % 9)) for i in range(120)]
    df = spark.createDataFrame(rows,
                               "doc_id long, source string, score double")
    for frac in (500, 2500, 7500):
        exact = _kept(_top_fraction_window(df, frac, "score", ["source"],
                                           "doc_id"))
        got = _kept(_top_fraction_banded(df, frac, "score", ["source"],
                                         "doc_id", 16, 1_000_000))
        assert got == exact, f"frac={frac}"
    # string keys, single score: tiebreak is binary string order
    srows = [("doc%05d" % i if i % 7 else "Z%d" % i, 1.0)
             for i in range(300)]
    sdf = spark.createDataFrame(srows, "doc_id string, score double")
    sexact = sorted(r.doc_id for r in _top_fraction_window(
        sdf, 2500, "score", [], "doc_id").collect())
    sgot = sorted(r.doc_id for r in _top_fraction_banded(
        sdf, 2500, "score", [], "doc_id", 16, 1_000_000).collect())
    assert sgot == sexact
    # unsupported key type (double): _one path disabled, still exact
    drows = [(float(i) / 3.0, 2.0) for i in range(100)]
    ddf = spark.createDataFrame(drows, "doc_id double, score double")
    assert _key_band_value(ddf, "doc_id") is None
    dexact = sorted(r.doc_id for r in _top_fraction_window(
        ddf, 4000, "score", [], "doc_id").collect())
    dgot = sorted(r.doc_id for r in _top_fraction_banded(
        ddf, 4000, "score", [], "doc_id", 16, 1_000_000).collect())
    assert dgot == dexact


def test_top_fraction_one_score_raw_vs_cast_and_null_mix(spark):
    """r13 self-review: (a) single-score detection must compare the RAW
    score column — two distinct long scores past 2^53 collapse to one
    double, and a cast-based check would falsely key-band a group the
    window arm still separates by score; (b) a group mixing ONE non-null
    score with NULLs key-bands on two levels (value rows above, NULLs
    below) instead of degenerating."""
    from hta_spark.pipeline.sample import _top_fraction_banded, \
        _top_fraction_window
    big = 1 << 60
    rows = [(i, "big", big + (i % 2)) for i in range(100)]   # 2 raw scores
    df = spark.createDataFrame(rows,
                               "doc_id long, source string, score long")
    for frac in (100, 2500, 5000):
        exact = _kept(_top_fraction_window(df, frac, "score", ["source"],
                                           "doc_id"))
        got = _kept(_top_fraction_banded(df, frac, "score", ["source"],
                                         "doc_id", 16, 1_000_000))
        assert got == exact, f"2^60 scores, frac={frac}"
        # the window arm keeps ODD doc_ids first (score 2^60+1 > 2^60)
        if frac == 2500:
            assert all(d % 2 == 1 for d in got)
    # one score + NULLs mixed: keep must take value rows (key asc) first
    rows2 = [(i, "mix", 3.25 if i % 3 else None) for i in range(300)]
    df2 = spark.createDataFrame(rows2,
                                "doc_id long, source string, score double")
    for frac in (1000, 6000, 8000):
        exact = _kept(_top_fraction_window(df2, frac, "score", ["source"],
                                           "doc_id"))
        got = _kept(_top_fraction_banded(df2, frac, "score", ["source"],
                                         "doc_id", 16, 1_000_000))
        assert got == exact, f"null-mix, frac={frac}"


def test_top_fraction_arms_hypothesis_differential(spark):
    """Model-differential over random frames: scores drawn from a SMALL
    pool (heavy ties, NaN, NULL, single-score groups arise naturally),
    group keys including NULL, random frac — the banded arm must keep
    the window arm's set every time, at a bin resolution coarse enough
    to exercise boundary bands."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from hta_spark.pipeline.sample import _top_fraction_banded, \
        _top_fraction_window

    pool = [None, float("nan"), float("-inf"), float("inf"),
            -1.5, 0.0, 0.25, 0.25, 3.0]
    rows_st = st.lists(
        st.tuples(st.sampled_from([None, "a", "b", "c"]),
                  st.sampled_from(pool)),
        min_size=1, max_size=60)

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(rows=rows_st, frac=st.sampled_from([1, 1700, 5000, 9999]))
    def run(rows, frac):
        data = [(i, g, s) for i, (g, s) in enumerate(rows)]
        df = spark.createDataFrame(
            data, "doc_id long, source string, score double")
        exact = _kept(_top_fraction_window(df, frac, "score", ["source"],
                                           "doc_id"))
        got = _kept(_top_fraction_banded(df, frac, "score", ["source"],
                                         "doc_id", 4, 1_000_000))
        assert got == exact

    run()
