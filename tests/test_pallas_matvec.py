"""Pallas-fused dp matvec: correctness in interpreter mode (CPU).

The compiled-mode path is exercised by bench.py on real TPU hardware.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.mesh.brick import DofGrid, poisson_cube_mesh
from multigrid_tpu.ops.laplace import LaplaceOperator
from multigrid_tpu.ops.pallas_matvec import PallasOzakiLaplace


def test_pallas_ozaki_interpret():
    mesh = poisson_cube_mesh(8)
    grid = DofGrid(mesh, mesh.max_level, 4)
    op64 = LaplaceOperator(grid, jnp.float64)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(grid.shape))
    y64 = op64.vmult(x)
    pop = PallasOzakiLaplace(grid, interpret=True)
    y = pop.vmult(x)
    rel = float(jnp.linalg.norm(y - y64) / jnp.linalg.norm(y64))
    assert rel < 5e-11
