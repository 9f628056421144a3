"""Fused CG/Chebyshev entry points reproduce the unfused algorithms."""

import jax
import jax.numpy as jnp
import numpy as np

from multigrid_tpu.mesh.brick import DofGrid, poisson_cube_mesh
from multigrid_tpu.ops.laplace import LaplaceOperator
from multigrid_tpu.solvers.fused import vmult_with_cg_update, vmult_with_chebyshev_update


def test_fused_cg_matches_plain():
    mesh = poisson_cube_mesh(4)
    grid = DofGrid(mesh, mesh.max_level, 2)
    op = LaplaceOperator(grid, jnp.float64)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(grid.shape))
    b = jnp.where(op.interior, b, 0)

    # plain CG, 5 iterations
    x = jnp.zeros_like(b)
    r = b
    p = r
    rz = jnp.vdot(r, r)
    for _ in range(5):
        q = op.vmult(p)
        a = rz / jnp.vdot(p, q)
        x = x + a * p
        r = r - a * q
        rz2 = jnp.vdot(r, r)
        p = r + (rz2 / rz) * p
        rz = rz2
    x_ref = x

    # fused interface (reference-style driver: deal.II SolverCG fast path)
    x = jnp.zeros_like(b)
    r = b
    q = r  # first iteration: p initialized from q
    p = jnp.zeros_like(b)
    alpha, beta = 0.0, 0.0
    rz = jnp.vdot(r, r)
    for _ in range(5):
        x, p, q, sums = vmult_with_cg_update(op.vmult, alpha, beta, r, q, p, x)
        alpha = rz / sums[0]
        r = r - alpha * q
        rz2 = jnp.vdot(r, r)
        beta = rz2 / rz
        rz = rz2
        q = r
    x = x + alpha * p  # final deferred update
    assert np.allclose(np.asarray(x), np.asarray(x_ref), atol=1e-12)


def test_fused_chebyshev_step():
    mesh = poisson_cube_mesh(4)
    grid = DofGrid(mesh, mesh.max_level, 2)
    op = LaplaceOperator(grid, jnp.float64)
    inv_diag = op.inverse_diagonal()
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(grid.shape))
    x = jnp.asarray(rng.standard_normal(grid.shape))
    x_old = jnp.asarray(rng.standard_normal(grid.shape))
    f1, f2 = 0.3, 0.7
    x_new, x_prev = vmult_with_chebyshev_update(
        op.vmult, lambda r: inv_diag * r, b, f1, f2, x, x_old
    )
    expect = f2 * inv_diag * (b - op.vmult(x)) + (1 + f1) * x - f1 * x_old
    assert np.allclose(np.asarray(x_new), np.asarray(expect), atol=1e-13)
    assert np.allclose(np.asarray(x_prev), np.asarray(x))
