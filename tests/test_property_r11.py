"""Hypothesis model-differentials for the r11 operators: chunk windows
and per-group top-fraction selection against pure-Python references —
the same property discipline as test_streaming_property (random shapes
catch the boundary arithmetic unit fixtures miss)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hta_spark.pipeline.pack import chunk_documents
from hta_spark.pipeline.sample import top_fraction_by


def _model_chunks(tokens: list[str], size: int, stride: int,
                  min_tokens: int) -> list[tuple[int, str, int]]:
    """Reference semantics, straight from the docstring: windows start at
    0, stride, ...; n_chunks = max(1, ceil((n-size)/stride)+1); only the
    LAST window must add >= min_tokens new tokens past the previous
    window's end."""
    n = len(tokens)
    nc = max(1, math.ceil((n - size) / stride) + 1)
    out = []
    for i in range(nc):
        w = tokens[i * stride: i * stride + size]
        if i == nc - 1 and i > 0:
            new = i * stride + len(w) - ((i - 1) * stride + size)
            if new < min_tokens:
                continue
        out.append((i, " ".join(w), len(w)))
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.integers(1, 60),                 # token count per doc
              st.integers(1, 12),                 # size
              st.integers(1, 12),                 # stride (clamped <= size)
              st.integers(1, 8)),                 # min_tokens
    min_size=1, max_size=4))
def test_chunk_documents_matches_model(spark, cases):
    for n_tok, size, stride, min_tokens in cases:
        stride = min(stride, size)
        tokens = [f"w{j}" for j in range(n_tok)]
        df = spark.createDataFrame([(1, " ".join(tokens))],
                                   "doc_id long, text string")
        got = sorted(
            (r["chunk_id"], r["chunk_text"], r["n_tokens"])
            for r in chunk_documents(df, size=size, stride=stride,
                                     min_tokens=min_tokens).collect())
        want = sorted(_model_chunks(tokens, size, stride, min_tokens))
        assert got == want, (n_tok, size, stride, min_tokens)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 3),          # group
                          st.integers(0, 5)),         # score (ties likely)
                min_size=1, max_size=40),
       st.integers(1, 10_000))
def test_top_fraction_matches_model(spark, rows, frac_bp):
    data = [(i, f"g{g}", float(s)) for i, (g, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, g string, score double")
    got = sorted(r["doc_id"] for r in
                 top_fraction_by(df, frac_bp, "score",
                                 group_col="g").collect())
    want = []
    by_g: dict[str, list[tuple[float, int]]] = {}
    for i, (g, s) in enumerate(rows):
        by_g.setdefault(f"g{g}", []).append((-float(s), i))
    for members in by_g.values():
        members.sort()
        keep = (len(members) * frac_bp + 9999) // 10_000
        want.extend(i for _, i in members[:keep])
    assert got == sorted(want)
    # the EXACT banded arm (r12 scale dispatch) must keep the identical
    # set: rows_cap=1 forces it through the public API, n_bins=4
    # stresses band boundaries so most groups resolve via the
    # boundary-band top-up
    banded = sorted(r["doc_id"] for r in
                    top_fraction_by(df, frac_bp, "score", group_col="g",
                                    rows_cap=1, n_bins=4).collect())
    assert banded == sorted(want)
