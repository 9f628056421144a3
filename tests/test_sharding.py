"""Multi-device domain decomposition on a virtual 8-device CPU mesh.

The reference can only exercise its MPI path on a real cluster
(SURVEY.md §4: "multi-node testing: none without a cluster"); here GSPMD
sharding is validated against the single-device result bit-for-bit-ish.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiments.poisson_cube import build_solver, exact_fn, rhs_fn
from multigrid_tpu.mesh.brick import BrickMesh
from multigrid_tpu.parallel.sharding import grid_sharding, make_mesh, shard_grid_array
from multigrid_tpu.solvers.multigrid import MultigridSolver


@pytest.fixture(scope="module")
def solver():
    mesh = BrickMesh(coarse_cells=(8, 2, 2), origin=(-0.9,) * 3,
                     lengths=(1.9,) * 3, n_levels=2)
    return MultigridSolver(mesh, 2, exact_fn, rhs_fn, n_cycles=1)


from multigrid_tpu.parallel.sharding import wrap_padded


def test_vmult_sharded_matches(solver):
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8, ("z",))
    op = solver.ops_dp[solver.maxlevel]
    shape = solver.grids[-1].shape
    x = jnp.asarray(np.random.default_rng(0).standard_normal(shape))
    y_ref = np.asarray(jax.jit(op.vmult)(x))
    wrapped, pad, unpad = wrap_padded(op.vmult, shape, mesh)
    sh = grid_sharding(mesh, 3)
    xp = jax.device_put(pad(x), sh)
    y_sh = np.asarray(
        jax.jit(wrapped, in_shardings=(sh,), out_shardings=sh)(xp)
    )[: shape[0]]
    assert np.allclose(y_ref, y_sh, atol=1e-12)


def test_vcycle_sharded_matches(solver):
    mesh = make_mesh(8, ("z",))
    shape = solver.grids[-1].shape
    d = solver.rhs[solver.maxlevel].astype(jnp.float32)
    f = lambda b: solver.v_cycle(solver.maxlevel, b, 1)
    y_ref = np.asarray(jax.jit(f)(d))
    wrapped, pad, unpad = wrap_padded(f, shape, mesh)
    sh = grid_sharding(mesh, 3)
    y_sh = np.asarray(
        jax.jit(wrapped, in_shardings=(sh,), out_shardings=sh)(
            jax.device_put(pad(d), sh)
        )
    )[: shape[0]]
    assert np.allclose(y_ref, y_sh, atol=2e-5 * np.abs(y_ref).max())


def test_cg_solve_sharded(solver):
    mesh = make_mesh(8, ("z",))
    shape = solver.grids[-1].shape
    A = solver.dp_ops[solver.maxlevel].vmult

    def steps(b):
        x = jnp.zeros_like(b)
        r = b
        z = solver._precond(r)
        p = z
        rz = jnp.vdot(r, z)
        for _ in range(3):
            q = A(p)
            alpha = rz / jnp.vdot(p, q)
            x = x + alpha * p
            r = r - alpha * q
            z = solver._precond(r)
            rz_new = jnp.vdot(r, z)
            p = z + (rz_new / rz) * p
            rz = rz_new
        return x

    b = solver.rhs[solver.maxlevel]
    x_ref = np.asarray(jax.jit(steps)(b))
    wrapped, pad, unpad = wrap_padded(steps, shape, mesh)
    sh = grid_sharding(mesh, 3)
    x_sh = np.asarray(
        jax.jit(wrapped, in_shardings=(sh,), out_shardings=sh)(
            jax.device_put(pad(b), sh)
        )
    )[: shape[0]]
    assert np.allclose(x_sh, x_ref, atol=1e-8)
