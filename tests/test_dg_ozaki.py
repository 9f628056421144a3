"""Ozaki-scheme dp DG operator vs the verified f64 fused operator (and
the oracle pattern's accuracy bar, matvec_dg/program.cc:206-207)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.ops.dg import DGGrid, DGLaplace
from multigrid_tpu.ops.dg_ozaki import DGLaplaceOzaki


@pytest.mark.parametrize("kind", ["hermite", "gll", "gauss"])
def test_dg_ozaki_matches_f64(kind):
    dim, cells = 3, (3, 4, 2)
    J = np.eye(dim) * 0.6
    J[0, 1] = 0.15
    grid = DGGrid(cells=cells, jacobian=tuple(tuple(r) for r in J),
                  degree=3, kind=kind)
    ref = DGLaplace(grid, jnp.float64)
    oz = DGLaplaceOzaki(grid)
    # face couplings have rank exactly 2 n^{dim-1} (value + normal deriv)
    assert all(r == 2 * grid.n ** (dim - 1) for r in oz.ranks)
    u = jnp.asarray(np.random.default_rng(0).normal(size=grid.shape))
    y1 = np.asarray(ref.vmult(u))
    y2 = np.asarray(oz.vmult(u))
    assert np.abs(y1 - y2).max() < 1e-11 * np.abs(y1).max()


def test_dg_ozaki_residual():
    grid = DGGrid(cells=(2, 3), jacobian=((0.5, 0.0), (0.0, 0.7)),
                  degree=2, kind="gauss")
    ref = DGLaplace(grid, jnp.float64)
    oz = DGLaplaceOzaki(grid)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.normal(size=grid.shape))
    x = jnp.asarray(rng.normal(size=grid.shape))
    r1 = np.asarray(ref.vmult_residual(b, x))
    r2 = np.asarray(oz.vmult_residual(b, x))
    assert np.abs(r1 - r2).max() < 1e-11 * np.abs(r1).max()
