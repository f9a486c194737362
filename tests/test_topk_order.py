"""The argpartition top-k selector (r10) must reproduce the previous
stable-argsort selection EXACTLY, including ties under 4-decimal rounding
— column order is ascending-b_id at both call sites, so any deviation
changes `knn_join`/`knn_join_ivf`'s deterministic (-round(cos,4), b)
ranking contract.  Pure numpy: no Spark session."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hta_spark.pipeline.ann import _topk_order


def _reference_order(sims: np.ndarray, take: int) -> np.ndarray:
    """The pre-r10 selection: full-row stable argsort on -sims (stability
    = ties keep ascending column order)."""
    take = min(take, sims.shape[1])
    return np.argsort(-sims, axis=1, kind="stable")[:, :take]


def test_matches_reference_on_heavy_ties():
    rng = np.random.default_rng(7)
    # quantized to 2 decimals: with 40 columns over ~20 distinct values,
    # every row's top-k boundary lands inside a tie group
    sims = np.round(rng.uniform(-1, 1, size=(64, 40)), 2)
    for take in (1, 3, 6, 39, 40, 50):
        got = _topk_order(sims, take)
        exp = _reference_order(sims, take)
        assert got.shape == exp.shape
        assert (got == exp).all(), (take, np.argwhere(got != exp)[:5])


def test_all_equal_row_selects_leading_columns():
    sims = np.full((3, 1000), 0.5)
    got = _topk_order(sims, 6)
    assert (got == np.arange(6)).all()


def test_wide_row_argpartition_path():
    # m >> 4*take forces the argpartition branch; quantize to 4 decimals
    # (the callers' rounding) so boundary ties exist at realistic scale
    rng = np.random.default_rng(11)
    sims = np.round(rng.uniform(-1, 1, size=(8, 70_000)), 4)
    got = _topk_order(sims, 6)
    exp = _reference_order(sims, 6)
    assert (got == exp).all()


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 2 ** 31 - 1), st.integers(1, 8),
       st.integers(1, 64), st.sampled_from([1, 2, 3, 4]))
def test_property_equivalence(seed, rows, cols, decimals):
    rng = np.random.default_rng(seed)
    sims = np.round(rng.uniform(-1, 1, size=(rows, cols)), decimals)
    take = int(rng.integers(1, cols + 2))
    assert (_topk_order(sims, take)
            == _reference_order(sims, take)).all()
