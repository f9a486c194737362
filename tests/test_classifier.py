"""Hashed linear classifier scoring (pipeline/classify.py): explicit
trained weights must reproduce a numpy re-implementation exactly (micro-
unit quantized), the pseudo-model path must stay map-only (zero
exchanges — the 100 TB property), and both paths share one plan shape.
"""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from hta_spark.pipeline.classify import (CLS_WEIGHT_SPAN,
                                         hashed_linear_score)
from hta_spark.pipeline.dedup import md5_long


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "the quick brown fox"),
         (2, "lazy dogs sleep all day long"),
         (3, "the the the"),                 # repeated token
         (4, ""),                            # empty text -> one '' token
         (5, "Mixed CASE  gets   normalized")],
        "doc_id long, text string").cache()


def test_explicit_weights_match_numpy(spark, docs):
    dim = 64
    rng = np.random.default_rng(3)
    weights = [float(w) for w in rng.normal(scale=0.5, size=dim)]
    got = {r["doc_id"]: r for r in
           hashed_linear_score(docs, dim=dim, weights=weights,
                               threshold=0.1).collect()}
    # bucket ids via the same md5 convention, computed through Spark once
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), " "))
        .alias("tok"))
    buckets = [(r["doc_id"], r["b"]) for r in toks.select(
        "doc_id", F.pmod(md5_long(F.col("tok"), "feat"),
                         F.lit(dim)).alias("b")).collect()]
    q = [int(round(w * CLS_WEIGHT_SPAN)) for w in weights]
    per: dict[int, list[int]] = {}
    for did, b in buckets:
        per.setdefault(did, []).append(q[b])
    for did, ws in per.items():
        r = got[did]
        assert r["n_tokens"] == len(ws)
        assert r["w_sum"] == sum(ws)                       # exact int64
        want = sum(ws) / (CLS_WEIGHT_SPAN * len(ws))
        assert r["score"] == want                          # one division
        assert r["keep"] == (r["score"] >= 0.1)


def test_pseudo_model_map_only(docs):
    """The oracle-gated pseudo path must be a pure projection: no
    Exchange anywhere in the plan (the fold runs inside the row)."""
    plan = _plan(hashed_linear_score(docs))
    assert not re.search(r"\bExchange\b", plan), plan[:3000]
    assert "Window" not in plan


def test_explicit_weights_single_broadcast(docs):
    """A trained model adds exactly one broadcast of the one-row weight
    frame — still no shuffle of the corpus."""
    plan = _plan(hashed_linear_score(docs, dim=8, weights=[0.0] * 8))
    assert "BroadcastNestedLoopJoin" in plan
    assert not re.search(r"Exchange hashpartitioning", plan), plan[:3000]


def test_weights_length_validated(docs):
    with pytest.raises(ValueError, match="length"):
        hashed_linear_score(docs, dim=16, weights=[0.0] * 4)


def test_empty_text_scores(docs):
    r = {x["doc_id"]: x for x in hashed_linear_score(docs).collect()}[4]
    # '' splits to one empty-string token (both engines agree) — the doc
    # gets a definite verdict, never a NULL ratio
    assert r["n_tokens"] == 1 and r["score"] is not None
    assert r["keep"] in (True, False)


def test_null_text_matches_oracle(spark):
    """ADVICE r6: a NULL text document must score as the EMPTY document
    (n_tokens=0, w_sum=0, score=0.0, keep=(0>=threshold)) and the DuckDB
    oracle must keep the doc too — pinned here with an inline duckdb run
    on a corpus containing NULLs (the gated corpus has none)."""
    import duckdb

    from hta_spark.queries_scale import SQL_CLASSIFIER_SCORE
    rows = [(1, "some ordinary words"), (2, None), (3, "more text here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in hashed_linear_score(docs).collect()}
    assert got[2]["n_tokens"] == 0 and got[2]["w_sum"] == 0
    assert got[2]["score"] == 0.0 and got[2]["keep"] is True

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    oracle = {r[0]: r for r in con.execute(SQL_CLASSIFIER_SCORE).fetchall()}
    assert set(oracle) == {1, 2, 3}
    for did in (1, 2, 3):
        o = oracle[did]
        g = got[did]
        assert (g["n_tokens"], g["w_sum"], g["score"], g["keep"]) \
            == (o[1], o[2], o[3], o[4]), (did, g, o)
