"""MXU dense-element operators: f32 path and Ozaki fp64-from-bf16 path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.mesh.brick import DofGrid, poisson_cube_mesh
from multigrid_tpu.ops.laplace import LaplaceOperator
from multigrid_tpu.ops.laplace_dense import DenseLaplaceF32, DenseLaplaceOzaki


@pytest.fixture(scope="module")
def setup():
    mesh = poisson_cube_mesh(4)
    grid = DofGrid(mesh, mesh.max_level, 4)
    op = LaplaceOperator(grid, jnp.float64)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(grid.shape))
    return grid, op.vmult(x), x


def test_dense_f32(setup):
    grid, y64, x = setup
    op = DenseLaplaceF32(grid)
    y = jax.jit(op.vmult)(x.astype(jnp.float32))
    rel = float(jnp.linalg.norm(y.astype(jnp.float64) - y64) / jnp.linalg.norm(y64))
    assert rel < 5e-7


def test_dense_ozaki(setup):
    grid, y64, x = setup
    op = DenseLaplaceOzaki(grid)
    y = jax.jit(op.vmult)(x)
    rel = float(jnp.linalg.norm(y - y64) / jnp.linalg.norm(y64))
    assert rel < 5e-11
    r = jax.jit(op.vmult_residual)(x * 0.5, x)
    r64 = x * 0.5 - y64
    r64 = jnp.where(op.interior, r64, x * 0.5 - x)
    assert float(jnp.linalg.norm(r - r64) / jnp.linalg.norm(r64)) < 1e-9


def test_dense_ozaki_chunked(setup):
    from multigrid_tpu.ops.laplace_dense import DenseLaplaceOzakiChunked

    grid, y64, x = setup
    op = DenseLaplaceOzakiChunked(grid)
    y = jax.jit(op.vmult)(x)
    rel = float(jnp.linalg.norm(y - y64) / jnp.linalg.norm(y64))
    assert rel < 5e-11


def test_dense_f32_chunked(setup):
    from multigrid_tpu.ops.laplace_dense import DenseLaplaceF32Chunked

    grid, y64, x = setup
    op = DenseLaplaceF32Chunked(grid)
    y = jax.jit(op.vmult)(x.astype(jnp.float32))
    rel = float(jnp.linalg.norm(y.astype(jnp.float64) - y64) / jnp.linalg.norm(y64))
    assert rel < 5e-7
