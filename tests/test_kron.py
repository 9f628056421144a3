"""Globally-separable (Kronecker) banded operator vs the cell-based oracle.

The factorization sum_cells kron(...) == kron(sum_cells ...) must make the
banded-sweep operator EXACTLY equal (in exact arithmetic) to the assembled
cell-based operator; tests pin f32/df64 rounding-level agreement across
dims and degrees on anisotropic bricks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.mesh.brick import BrickMesh, DofGrid
from multigrid_tpu.ops.df64 import split_f64
from multigrid_tpu.ops.laplace import LaplaceOperator
from multigrid_tpu.ops.laplace_dense import DenseLaplaceOzaki
from multigrid_tpu.ops.laplace_kron import (KronLaplaceDf64, KronLaplaceF32,
                                            assembled_1d)


def make_grid(dim, degree, cells=(3, 2, 4)):
    mesh = BrickMesh(coarse_cells=cells[:dim], origin=(-0.4,) * dim,
                     lengths=(1.3, 0.9, 1.7)[:dim], n_levels=1)
    return DofGrid(mesh, 0, degree)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("degree", [1, 2, 4, 5])
def test_kron_matches_quadrature_operator(dim, degree):
    grid = make_grid(dim, degree)
    ref = LaplaceOperator(grid, jnp.float64)
    kron64 = KronLaplaceDf64(grid)
    kron32 = KronLaplaceF32(grid)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(grid.shape))
    y_ref = np.asarray(ref.vmult(x))
    scale = np.abs(y_ref).max()
    y_dp = np.asarray(kron64.vmult(x))
    np.testing.assert_allclose(y_dp, y_ref, atol=2e-13 * scale)
    y_sp = np.asarray(kron32.vmult(x))
    np.testing.assert_allclose(y_sp, y_ref, atol=2e-6 * scale)


def test_assembled_1d_matches_dense_kron():
    """kron of the assembled 1-D matrices equals the assembled 3-D matrix
    (via the dense element-matrix operator on a random vector)."""
    grid = make_grid(3, 3)
    dense = DenseLaplaceOzaki(grid)
    kron = KronLaplaceDf64(grid)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(grid.shape))
    y_a = np.asarray(dense.vmult(x))
    y_b = np.asarray(kron.vmult(x))
    scale = np.abs(y_a).max()
    np.testing.assert_allclose(y_b, y_a, atol=2e-13 * scale)


def test_pair_interface_consistent():
    grid = make_grid(3, 4, cells=(2, 2, 2))
    kron = KronLaplaceDf64(grid)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(grid.shape))
    y64 = np.asarray(kron.vmult(x))
    xh, xl = split_f64(jnp.asarray(x))
    yh, yl = kron.vmult_pair(xh, xl)
    y_pair = np.asarray(yh).astype(np.float64) + np.asarray(yl)
    scale = np.abs(y64).max()
    np.testing.assert_allclose(y_pair, y64, atol=1e-13 * scale)


def test_residual_pair_consistent():
    grid = make_grid(3, 4, cells=(2, 2, 2))
    kron = KronLaplaceDf64(grid)
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.standard_normal(grid.shape))
    x = jnp.asarray(rng.standard_normal(grid.shape))
    want = np.asarray(kron.vmult_residual(r, x))
    rh, rl = split_f64(r)
    xh, xl = split_f64(x)
    dh, dl = kron.vmult_residual_pair(rh, rl, xh, xl)
    got = np.asarray(dh).astype(np.float64) + np.asarray(dl)
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=1e-13 * scale)


def test_banded_diagonals_cover_matrix():
    grid = make_grid(3, 4, cells=(3, 2, 2))
    for a in range(3):
        M, L = assembled_1d(grid, a)
        n = M.shape[0]
        p = grid.degree
        for G in (M, L):
            for i in range(n):
                for j in range(n):
                    if abs(i - j) > p:
                        assert G[i, j] == 0.0
