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
