"""Degree-sweep regression (VERDICT r2 item 6): the reference exercises
poisson_cube at p = 1..9 (/root/reference/poisson_cube/program.cc:67-69)
and matvec_dg at p = 1..16 for all three DG element types
(/root/reference/matvec_dg/program.cc:34-35).  These tests pin the same
sweeps at CPU-small sizes: solver quality must stay mesh-independent at
every degree, and the fused DG operator must agree with the face-based
oracle at the degree extremes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiments.poisson_cube import exact_fn, rhs_fn
from multigrid_tpu.mesh.brick import poisson_cube_mesh
from multigrid_tpu.ops.dg import DGGrid, DGLaplace
from multigrid_tpu.ops.dg_face import DGLaplaceFaceBased
from multigrid_tpu.solvers.multigrid import MultigridSolver


def test_poisson_cube_degree_sweep():
    """CG+V-cycle converges with mesh-independent iteration counts at
    every reference degree 1..9; dp accuracy holds (Ozaki where
    certified, df64 fallback beyond — see ops/laplace_dense.py).  On the
    fixed 4^3 mesh of a 3-wave sine, the MMS L2 error must drop
    monotonically (and sharply) with the degree."""
    errs = []
    for degree in range(1, 10):
        mesh = poisson_cube_mesh(4)
        s = MultigridSolver(mesh, degree, exact_fn, rhs_fn, n_pre=2,
                            n_post=2, n_cycles=2)
        sol, its, red = s.solve_cg()
        assert its <= 13, (degree, its)
        errs.append(float(s.l2_error(s.maxlevel, sol)))
    for a, b in zip(errs, errs[1:]):
        assert b < 0.7 * a, errs
    assert errs[-1] < 1e-6, errs


@pytest.mark.parametrize("degree", [1, 2, 5, 8, 12, 16])
@pytest.mark.parametrize("kind", ["hermite", "gll", "gauss"])
def test_matvec_dg_degree_sweep(degree, kind):
    """Fused cell+face SIP operator == face-based oracle on a sheared
    mesh at the degree extremes, all three element types."""
    dim = 3
    left = np.array([-1.0 + 0.05 * (d + 1) for d in range(dim)])
    right = np.array([0.95 - 0.06 * d for d in range(dim)])
    base = (2, 2, 2)
    h = (right - left) / np.array(base)
    trafo = np.eye(dim)
    for a in range(dim):
        for b in range(dim):
            trafo[a, b] += 0.12 * (a + 1) * (b + 1)
    J = trafo @ np.diag(h)
    grid = DGGrid(cells=base, jacobian=tuple(tuple(r) for r in J),
                  degree=degree, kind=kind)
    x = jnp.asarray(
        np.random.default_rng(degree).standard_normal(grid.shape))
    y = jax.jit(DGLaplace(grid, jnp.float64).vmult)(x)
    y_ref = jax.jit(DGLaplaceFaceBased(grid, jnp.float64).vmult)(x)
    err = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))
    assert err < 5e-12, (degree, kind, err)
