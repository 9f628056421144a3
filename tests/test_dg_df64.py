"""df64 DG operator matches native f64 (TPU dp path for DG)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.ops.dg import DGGrid, DGLaplace
from multigrid_tpu.ops.dg_df64 import DGLaplaceDF64


@pytest.mark.parametrize("kind", ["gauss", "gll", "hermite"])
def test_dg_df64_matches(kind):
    cells = (3, 2, 4)
    J = np.diag([0.9 / c for c in cells]) + 0.05  # sheared
    grid = DGGrid(cells=cells, jacobian=tuple(tuple(r) for r in J),
                  degree=3, kind=kind)
    op = DGLaplace(grid, jnp.float64)
    opd = DGLaplaceDF64(grid)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(grid.shape))
    y64 = op.apply(x)
    y = jax.jit(opd.apply)(x)
    rel = float(jnp.linalg.norm(y - y64) / jnp.linalg.norm(y64))
    assert rel < 1e-13
