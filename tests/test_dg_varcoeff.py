"""Variable-coefficient SIP-DG operator (beyond the reference's
constant-coefficient DG path; the reference covers variable coefficients
only through the continuous-FE operator,
/root/reference/poisson_shell/program.cc:142-198).

Tiers (SURVEY.md §4): (a) reduction to the constant-coefficient operator
at c = 1, (b) symmetry / positive-definiteness of the dense assembly,
(c) MMS convergence at order ~p+1 for -div(c grad u) = f with smooth c,
solved by CG preconditioned with the exact general-path JacobiTransformed.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.core.dg_basis import DG_TYPES, GAUSS
from multigrid_tpu.ops.dg import DGGrid, DGLaplace, DGLaplaceVarCoeff
from multigrid_tpu.ops.dg_precond import JacobiTransformed


def make_grid(cells, degree, kind=GAUSS):
    h = [1.0 / c for c in cells]
    return DGGrid(cells=cells, jacobian=tuple(tuple(r) for r in np.diag(h)),
                  degree=degree, kind=kind)


def quad_coords(grid):
    """Physical coordinates of the block quad layout [C..., nq..., dim]."""
    b = grid.basis
    dim = grid.dim
    axes = []
    for d in range(dim):
        cells = np.arange(grid.cells[d])
        axes.append((cells[:, None] + b.quad_points[None, :]))  # [C_d, nq]
    # reference block coords -> physical via the (diagonal here) Jacobian
    grids = np.meshgrid(*[np.arange(c) for c in grid.cells], indexing="ij")
    out = np.zeros(grid.shape + (dim,))
    it = np.ndindex(*grid.cells)
    J = grid.J
    for ci in it:
        ref = np.meshgrid(*[ci[d] + b.quad_points for d in range(dim)],
                          indexing="ij")
        for a in range(dim):
            acc = np.zeros(ref[0].shape)
            for bb in range(dim):
                acc += J[a, bb] * ref[bb]
            out[ci + (...,) + (a,)] = acc
    return out


@pytest.mark.parametrize("kind", DG_TYPES)
@pytest.mark.parametrize("cells,degree", [((3, 2), 2), ((2, 2, 2), 3)])
def test_unit_coefficient_reduces_to_constant_operator(cells, degree, kind):
    grid = make_grid(cells, degree, kind)
    op0 = DGLaplace(grid, jnp.float64)
    op1 = DGLaplaceVarCoeff(grid, np.ones(grid.shape), jnp.float64)
    u = jnp.asarray(np.random.default_rng(0).standard_normal(grid.shape))
    y0, y1 = np.asarray(op0.apply(u)), np.asarray(op1.apply(u))
    np.testing.assert_allclose(y1, y0, rtol=1e-13, atol=1e-13)
    b0 = np.asarray(op0.compute_rhs(u, g_bc={(0, 0): op0._trace(u, 0, 0)}))
    b1 = np.asarray(op1.compute_rhs(u, g_bc={(0, 0): op1._trace(u, 0, 0)}))
    np.testing.assert_allclose(b1, b0, rtol=1e-13, atol=1e-13)


def _dense(op, grid):
    N = grid.n_dofs
    A = np.zeros((N, N))
    for j in range(N):
        e = np.zeros(N)
        e[j] = 1.0
        A[:, j] = np.asarray(
            op.apply(jnp.asarray(e.reshape(grid.shape)))).ravel()
    return A


@pytest.mark.parametrize("kind", DG_TYPES)
def test_varcoeff_spd(kind):
    grid = make_grid((2, 2), 2, kind)
    xq = quad_coords(grid)
    c = 1.0 + 0.9 * np.sin(np.pi * xq[..., 0]) * np.cos(np.pi * xq[..., 1])
    op = DGLaplaceVarCoeff(grid, c, jnp.float64)
    A = _dense(op, grid)
    np.testing.assert_allclose(A, A.T, rtol=0, atol=1e-11)
    w = np.linalg.eigvalsh(A)
    assert w.min() > 0


def _solve_mms(cells, degree, kind):
    grid = make_grid(cells, degree, kind)
    xq = quad_coords(grid)
    x, y = xq[..., 0], xq[..., 1]
    pi = np.pi
    u_ex = np.sin(pi * x) * np.sin(pi * y)
    c = 1.0 + 0.5 * np.sin(pi * x) * np.sin(pi * y)
    cx = 0.5 * pi * np.cos(pi * x) * np.sin(pi * y)
    cy = 0.5 * pi * np.sin(pi * x) * np.cos(pi * y)
    ux = pi * np.cos(pi * x) * np.sin(pi * y)
    uy = pi * np.sin(pi * x) * np.cos(pi * y)
    lap_u = -2 * pi**2 * u_ex
    f = -(cx * ux + cy * uy + c * lap_u)

    op = DGLaplaceVarCoeff(grid, c, jnp.float64)
    pre = JacobiTransformed(op)
    b = op.compute_rhs(jnp.asarray(f))
    # plain preconditioned CG (homogeneous Dirichlet boundary = exact here)
    u = jnp.zeros(grid.shape, jnp.float64)
    r = b - op.apply(u)
    z = pre.vmult(r)
    p = z
    rz = jnp.vdot(r, z)
    for _ in range(400):
        Ap = op.apply(p)
        alpha = rz / jnp.vdot(p, Ap)
        u = u + alpha * p
        r = r - alpha * Ap
        if float(jnp.linalg.norm(r.ravel())) < 1e-11:
            break
        z = pre.vmult(r)
        rz_new = jnp.vdot(r, z)
        p = z + (rz_new / rz) * p
        rz = rz_new
    return float(op.l2_error(u, jnp.asarray(u_ex)))


def test_varcoeff_mms_convergence():
    degree = 2
    e1 = _solve_mms((4, 4), degree, GAUSS)
    e2 = _solve_mms((8, 8), degree, GAUSS)
    rate = np.log2(e1 / e2)
    assert rate > degree + 0.6, (e1, e2, rate)


def test_varcoeff_plain_multigrid():
    """Pure-DG h-multigrid on -div(c grad u) = f: mesh-independent-ish
    iterations and ~p+1 L2 convergence (beyond the reference's
    constant-coefficient DG multigrid)."""
    from multigrid_tpu.solvers.multigrid_dg import MultigridSolverDGPlain

    pi = np.pi

    def exact_fn(q):
        return np.sin(pi * q[0]) * np.sin(pi * q[1])

    def coeff_fn(q):
        return 1.0 + 0.5 * np.sin(pi * q[0]) * np.sin(pi * q[1])

    def rhs_fn(q):
        u = np.sin(pi * q[0]) * np.sin(pi * q[1])
        c = 1.0 + 0.5 * u
        cx = 0.5 * pi * np.cos(pi * q[0]) * np.sin(pi * q[1])
        cy = 0.5 * pi * np.sin(pi * q[0]) * np.cos(pi * q[1])
        ux = pi * np.cos(pi * q[0]) * np.sin(pi * q[1])
        uy = pi * np.sin(pi * q[0]) * np.cos(pi * q[1])
        return -(cx * ux + cy * uy + c * (-2 * pi**2 * u))

    from multigrid_tpu.mesh.brick import cube

    errs = []
    for n_ref in (1, 2):
        mesh = cube(2, 0.0, 1.0, n_ref, dim=2)
        s = MultigridSolverDGPlain(mesh, 2, exact_fn, rhs_fn, kind=GAUSS,
                                   coeff_fn=coeff_fn)
        sol, frac_its, rate = s.solve_cg(tolerance=1e-10)
        assert rate < 0.5, rate
        errs.append(s.l2_error(sol, s.exact_quad))
    rate_l2 = np.log2(errs[0] / errs[1])
    assert rate_l2 > 2.6, (errs, rate_l2)

def test_varcoeff_routes_jacobi_general():
    grid = make_grid((3, 3), 2)
    xq = quad_coords(grid)
    c = 1.0 + 0.5 * np.sin(np.pi * xq[..., 0]) * np.sin(np.pi * xq[..., 1])
    op = DGLaplaceVarCoeff(grid, c, jnp.float64)
    # the uniform-affine category shortcut must refuse per-cell operators
    with pytest.raises(ValueError):
        JacobiTransformed(op, general=False)
    pre = JacobiTransformed(op)   # auto-routes to the exact general path
    # exactness check: P^-1 diag-applies must invert the transformed diag
    u = jnp.asarray(np.random.default_rng(1).standard_normal(grid.shape))
    # symmetry of the preconditioner
    v = jnp.asarray(np.random.default_rng(2).standard_normal(grid.shape))
    s1 = float(jnp.vdot(pre.vmult(u), v))
    s2 = float(jnp.vdot(u, pre.vmult(v)))
    assert s1 == pytest.approx(s2, rel=1e-11)
