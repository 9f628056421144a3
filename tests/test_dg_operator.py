"""SIP-DG operator verification (oracle pattern, SURVEY.md §4 tier 1-2).

Mirrors the reference's cross-verification strategy
(/root/reference/matvec_dg/program.cc:206-207): instead of a second
independent operator we verify (a) symmetry, (b) exact energy agreement
with the (independently dense-verified) continuous FE_Q operator on
embedded continuous functions, and (c) p+1 convergence of dense solves of
the full weak form including weak Dirichlet data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.core.dg_basis import DG_TYPES, GAUSS, GLL, HERMITE, make_dg_basis
from multigrid_tpu.mesh.brick import BrickMesh, DofGrid
from multigrid_tpu.ops.dg import DGGrid, DGLaplace
from multigrid_tpu.ops.laplace import LaplaceOperator
from multigrid_tpu.ops.windows import gather_cells


def make_dg_grid(cells, degree, kind=GAUSS, h=None, shear=0.0):
    dim = len(cells)
    h = h or [1.0 / c for c in cells]
    J = np.diag(h)
    if shear:
        T = np.eye(dim)
        for a in range(dim):
            for b in range(dim):
                T[a, b] += shear * (a + 1) * (b + 1)
        J = T @ J
    return DGGrid(cells=cells, jacobian=tuple(tuple(r) for r in J),
                  degree=degree, kind=kind)


@pytest.mark.parametrize("kind", DG_TYPES)
@pytest.mark.parametrize("cells,degree,shear", [((3, 2), 2, 0.0), ((2, 2, 2), 3, 0.0), ((3, 3), 3, 0.12)])
def test_dg_symmetric(cells, degree, shear, kind):
    grid = make_dg_grid(cells, degree, kind, shear=shear)
    op = DGLaplace(grid, jnp.float64)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(grid.shape))
    v = jnp.asarray(rng.standard_normal(grid.shape))
    a1 = float(jnp.vdot(op.apply(u), v))
    a2 = float(jnp.vdot(u, op.apply(v)))
    assert a1 == pytest.approx(a2, rel=1e-12)
    # positive semi-definite energy
    assert float(jnp.vdot(op.apply(u), u)) > 0


@pytest.mark.parametrize("kind", [GAUSS, GLL, HERMITE])
def test_dg_energy_matches_cg_on_continuous(kind):
    """Embedded continuous function with zero boundary values: all face
    terms vanish and the DG energy equals the CG energy."""
    cells = (2, 3)
    degree = 3
    mesh = BrickMesh(coarse_cells=cells, origin=(0.0, 0.0), lengths=(1.0, 1.0))
    cg_grid = DofGrid(mesh, 0, degree)
    cg_op = LaplaceOperator(cg_grid, jnp.float64)
    dg_grid = make_dg_grid(cells, degree, kind)
    dg_op = DGLaplace(dg_grid, jnp.float64)

    rng = np.random.default_rng(1)
    u = rng.standard_normal(cg_grid.shape)
    u = np.where(cg_grid.boundary_mask(), 0.0, u)
    uj = jnp.asarray(u)
    e_cg = float(jnp.vdot(cg_op.vmult(uj), uj))
    # embed: gather nodal (GLL) values to cells, convert to the DG basis
    w = gather_cells(uj, degree + 1)
    dim = 2
    w = w.transpose(0, 2, 1, 3)  # [C0,C1,n,n]
    b = make_dg_basis(degree, kind)
    E = jnp.asarray(b.nodal_from_gll)
    u_dg = w
    for d in range(dim):
        op_ = dg_op
        u_dg = op_._apply(u_dg, E, d)
    e_dg = float(jnp.vdot(dg_op.apply(u_dg), u_dg))
    assert e_dg == pytest.approx(e_cg, rel=1e-11)


@pytest.mark.parametrize("kind", [GAUSS, HERMITE])
def test_dg_mms_convergence(kind):
    """Dense solves of the SIP system incl. weak BC data converge at p+1."""
    degree = 2
    errs = []
    for nc in (2, 4):
        cells = (nc, nc)
        grid = make_dg_grid(cells, degree, kind, h=[0.9 / nc, 1.1 / nc])
        op = DGLaplace(grid, jnp.float64)
        N = grid.n_dofs
        A = np.asarray(
            jax.vmap(lambda e: op.apply(e.reshape(grid.shape)).reshape(-1))(
                jnp.asarray(np.eye(N))
            )
        ).T

        def exact(x, y):
            return np.sin(2.1 * x + 0.3) * np.cos(1.7 * y - 0.2)

        def f(x, y):
            return (2.1**2 + 1.7**2) * exact(x, y)

        b = grid.basis
        hx, hy = 0.9 / nc, 1.1 / nc
        qx = (np.arange(nc)[:, None] * hx + hx * b.quad_points[None, :])
        qy = (np.arange(nc)[:, None] * hy + hy * b.quad_points[None, :])
        X = qx[:, None, :, None]
        Y = qy[None, :, None, :]
        f_quad = jnp.asarray(np.broadcast_to(f(X, Y), grid.shape))
        g_bc = {}
        for d, s in [(0, 0), (0, 1), (1, 0), (1, 1)]:
            # boundary trace values at face quad points (full arrays; the
            # rhs routine masks to the boundary layer)
            if d == 0:
                xv = np.full((nc, nc, grid.n), 0.0 if s == 0 else 0.9)
                yv = np.broadcast_to(qy[None, :, :], (nc, nc, grid.n))
            else:
                xv = np.broadcast_to(qx[:, None, :], (nc, nc, grid.n))
                yv = np.full((nc, nc, grid.n), 0.0 if s == 0 else 1.1)
            g_bc[(d, s)] = jnp.asarray(exact(xv, yv))
        rhs = op.compute_rhs(f_quad, g_bc)
        u = np.linalg.solve(A, np.asarray(rhs).reshape(-1)).reshape(grid.shape)
        ex_quad = jnp.asarray(np.broadcast_to(exact(X, Y), grid.shape))
        errs.append(float(op.l2_error(jnp.asarray(u), ex_quad)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > degree + 0.5, (errs, rate)
