"""Gather/scatter window ops: correctness vs naive indexing and adjointness."""

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.ops.windows import (
    gather_cells,
    scatter_axis,
    scatter_cells,
    window_axis,
)


@pytest.mark.parametrize("n_cells,window", [(1, 2), (4, 2), (3, 5), (5, 9)])
def test_window_axis_1d(n_cells, window):
    s = window - 1
    x = np.random.default_rng(0).normal(size=n_cells * s + 1)
    w = np.asarray(window_axis(jnp.asarray(x), 0, window))
    for c in range(n_cells):
        assert np.allclose(w[c], x[c * s : c * s + window])


@pytest.mark.parametrize("n_cells,window", [(1, 3), (4, 2), (3, 5)])
def test_scatter_is_adjoint_1d(n_cells, window):
    rng = np.random.default_rng(1)
    s = window - 1
    x = rng.normal(size=n_cells * s + 1)
    y = rng.normal(size=(n_cells, window))
    lhs = np.vdot(np.asarray(window_axis(jnp.asarray(x), 0, window)), y)
    rhs = np.vdot(x, np.asarray(scatter_axis(jnp.asarray(y), 0)))
    assert lhs == pytest.approx(rhs, rel=1e-12)


@pytest.mark.parametrize("cells,p", [((2, 3), 2), ((2, 2, 3), 3), ((1, 1, 1), 4)])
def test_gather_cells_nd(cells, p):
    window = p + 1
    rng = np.random.default_rng(2)
    shape = tuple(c * p + 1 for c in cells)
    x = rng.normal(size=shape)
    w = np.asarray(gather_cells(jnp.asarray(x), window))
    # check a few random cells against naive slicing
    for _ in range(5):
        ci = tuple(rng.integers(0, c) for c in cells)
        sl = tuple(slice(i * p, i * p + window) for i in ci)
        idx = tuple(v for i in ci for v in (i, slice(None)))
        assert np.allclose(w[idx], x[sl])


@pytest.mark.parametrize("cells,p", [((2, 3), 2), ((2, 2, 3), 3)])
def test_scatter_cells_adjoint_nd(cells, p):
    window = p + 1
    rng = np.random.default_rng(3)
    shape = tuple(c * p + 1 for c in cells)
    x = rng.normal(size=shape)
    wshape = tuple(v for c in cells for v in (c, window))
    y = rng.normal(size=wshape)
    lhs = np.vdot(np.asarray(gather_cells(jnp.asarray(x), window)), y)
    rhs = np.vdot(x, np.asarray(scatter_cells(jnp.asarray(y), window)))
    assert lhs == pytest.approx(rhs, rel=1e-12)
