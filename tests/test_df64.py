"""Double-float arithmetic and df64 operator accuracy (dp path on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.mesh.brick import DofGrid, poisson_cube_mesh
from multigrid_tpu.ops.df64 import (
    SplitMatrix,
    apply_1d_df64,
    join_f64,
    split_f64,
    two_prod,
    two_sum,
)
from multigrid_tpu.ops.laplace import LaplaceOperator
from multigrid_tpu.ops.laplace_df64 import LaplaceOperatorDF64


def test_two_prod_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    p, e = jax.jit(two_prod)(a, b)
    true = a.astype(jnp.float64) * b.astype(jnp.float64)
    assert float(jnp.max(jnp.abs(p.astype(jnp.float64) + e.astype(jnp.float64) - true))) == 0.0


def test_two_sum_exact():
    rng = np.random.default_rng(1)
    a = jnp.asarray((rng.standard_normal(4096) * 1e3).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    s, e = jax.jit(two_sum)(a, b)
    true = a.astype(jnp.float64) + b.astype(jnp.float64)
    assert float(jnp.max(jnp.abs(s.astype(jnp.float64) + e.astype(jnp.float64) - true))) == 0.0


def test_apply_1d_df64():
    rng = np.random.default_rng(2)
    M = rng.standard_normal((5, 5))
    x = rng.standard_normal((64, 7, 5))
    xh, xl = split_f64(jnp.asarray(x))
    yh, yl = jax.jit(lambda h, l: apply_1d_df64(h, l, SplitMatrix(M), 2))(xh, xl)
    ytrue = np.einsum("abi,oi->abo", x, M)
    rel = np.abs(np.asarray(join_f64(yh, yl)) - ytrue).max() / np.abs(ytrue).max()
    assert rel < 1e-13


@pytest.mark.parametrize("size,degree", [(2, 4), (4, 3)])
def test_df64_operator_matches_f64(size, degree):
    mesh = poisson_cube_mesh(size)
    grid = DofGrid(mesh, mesh.max_level, degree)
    op = LaplaceOperator(grid, jnp.float64)
    opd = LaplaceOperatorDF64(grid)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(grid.shape))
    y64 = op.vmult(x)
    ydf = jax.jit(opd.vmult)(x)
    rel = float(jnp.linalg.norm(ydf - y64) / jnp.linalg.norm(y64))
    assert rel < 1e-12
    r64 = op.vmult_residual(x * 0.5, x)
    rdf = jax.jit(opd.vmult_residual)(x * 0.5, x)
    assert float(jnp.linalg.norm(rdf - r64) / jnp.linalg.norm(r64)) < 1e-10
