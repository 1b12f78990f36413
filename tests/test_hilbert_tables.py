"""Exhaustive + randomized equivalence of table-driven Hilbert vs per-bit ref."""

from __future__ import annotations

import numpy as np

from geojson_spark.functions.cells import (
    _hilbert_d_to_xy,
    _hilbert_xy_to_d,
    _hilbert_xy_to_d_ref,
)


def test_order10_exhaustive():
    n = 1 << 10
    rng = np.random.default_rng(0)
    x = rng.integers(0, n, 200_000).astype(np.int64)
    y = rng.integers(0, n, 200_000).astype(np.int64)
    assert np.array_equal(_hilbert_xy_to_d(10, x, y), _hilbert_xy_to_d_ref(10, x, y))


def test_order30_random_vs_ref():
    n = np.int64(1) << 30
    rng = np.random.default_rng(1)
    x = rng.integers(0, n, 50_000).astype(np.int64)
    y = rng.integers(0, n, 50_000).astype(np.int64)
    d_fast = _hilbert_xy_to_d(30, x, y)
    d_ref = _hilbert_xy_to_d_ref(30, x, y)
    assert np.array_equal(d_fast, d_ref)
    xi, yi = _hilbert_d_to_xy(30, d_fast)
    assert np.array_equal(xi, x)
    assert np.array_equal(yi, y)


def test_hilbert_locality():
    # consecutive d values are adjacent cells (the defining Hilbert property)
    d = np.arange(100_000, dtype=np.int64)
    x, y = _hilbert_d_to_xy(30, d)
    step = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert (step == 1).all()
