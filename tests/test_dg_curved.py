"""Curved-geometry SIP-DG operator (ops/dg_curved.py).

The reference's DG path is Cartesian/affine only; this extends the repo
beyond it (its curved runs use the continuous-FE path).  Oracles:

* exact reduction to the affine fused operator on linear charts;
* symmetry of the bilinear form;
* MMS p+1 convergence on a genuinely curved chart (the reference
  MyManifold deformation, poisson_cube/program.cc:405-484, applied so the
  boundary stays fixed and the manufactured solution remains valid);
* weak (Nitsche) Dirichlet data on a chart with inhomogeneous boundary;
* the pure-DG h-multigrid solver on the curved hierarchy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.ops.dg import DGGrid, DGLaplace
from multigrid_tpu.ops.dg_curved import DGCurvedGrid, DGLaplaceCurved
from multigrid_tpu.ops.dg_precond import JacobiTransformed
from multigrid_tpu.solvers.cg import cg_solve

FACTOR = 0.08


def _deform(p):
    s = FACTOR * np.prod(np.sin(np.pi * p), axis=1)
    return p + s[:, None]


def _exact(xs):
    u = 1.0
    for x in xs:
        u = u * np.sin(np.pi * x)
    return u


@pytest.mark.parametrize("kind", ["gauss", "gll", "hermite"])
@pytest.mark.parametrize("dim,cells", [(2, (4, 3)), (3, (2, 3, 2))])
def test_affine_reduction_and_symmetry(kind, dim, cells):
    rng = np.random.default_rng(0)
    A = np.eye(dim) + 0.1 * rng.standard_normal((dim, dim))
    h = 1.0 / np.asarray(cells)
    ga = DGGrid(cells=cells, jacobian=tuple(tuple(r) for r in (A @ np.diag(h))),
                degree=3, kind=kind)
    oa = DGLaplace(ga, jnp.float64)
    gc = DGCurvedGrid(cells, lambda p: p @ A.T, 3, kind)
    oc = DGLaplaceCurved(gc, jnp.float64)
    u = jnp.asarray(rng.standard_normal(ga.shape))
    w = jnp.asarray(rng.standard_normal(ga.shape))
    ya, yc = oa.apply(u), oc.apply(u)
    scale = float(jnp.max(jnp.abs(ya)))
    assert float(jnp.max(jnp.abs(ya - yc))) < 1e-13 * scale
    sym = float(jnp.vdot(oc.apply(u), w) - jnp.vdot(u, oc.apply(w)))
    assert abs(sym) < 1e-12 * scale


def test_mms_convergence_2d():
    errs = []
    for C in (4, 8, 16):
        g = DGCurvedGrid((C, C), _deform, 3)
        op = DGLaplaceCurved(g, jnp.float64)
        jac = JacobiTransformed(op)
        rhs = op.compute_rhs(jnp.asarray(2 * np.pi**2 * _exact(g.quad_phys)))
        res = cg_solve(op.vmult, rhs, jac.vmult, max_iterations=2000,
                       abs_tol=1e-14, rtol=1e-12)
        errs.append(float(op.l2_error(res.x, jnp.asarray(_exact(g.quad_phys)))))
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert min(rates) > 3.4, (errs, rates)


def test_mms_convergence_3d():
    errs = []
    for C in (2, 4, 8):
        g = DGCurvedGrid((C,) * 3, _deform, 3)
        op = DGLaplaceCurved(g, jnp.float64)
        jac = JacobiTransformed(op)
        rhs = op.compute_rhs(jnp.asarray(3 * np.pi**2 * _exact(g.quad_phys)))
        res = cg_solve(op.vmult, rhs, jac.vmult, max_iterations=2000,
                       abs_tol=1e-14, rtol=1e-12)
        errs.append(float(op.l2_error(res.x, jnp.asarray(_exact(g.quad_phys)))))
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert min(rates) > 3.3, (errs, rates)


def test_weak_dirichlet_inhomogeneous():
    """Chart shifted so the MMS u = prod sin(pi x_d) is NONZERO on the
    boundary; weak Nitsche data from the face quad points must recover
    p+1 convergence."""

    def chart(p):
        return 0.15 + 0.7 * _deform(p)

    def exact(xs):
        return _exact(xs)

    errs = []
    for C in (4, 8, 16):
        g = DGCurvedGrid((C, C), chart, 3)
        op = DGLaplaceCurved(g, jnp.float64)
        jac = JacobiTransformed(op)
        g_bc = {}
        for d in range(2):
            for s in (0, 1):
                g_bc[(d, s)] = jnp.asarray(
                    exact(g.boundary_quad_coords(d, s)))
        rhs = op.compute_rhs(
            jnp.asarray(2 * np.pi**2 * exact(g.quad_phys)), g_bc=g_bc)
        res = cg_solve(op.vmult, rhs, jac.vmult, max_iterations=2000,
                       abs_tol=1e-14, rtol=1e-12)
        errs.append(float(op.l2_error(res.x, jnp.asarray(exact(g.quad_phys)))))
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert min(rates) > 3.4, (errs, rates)


def test_curved_varcoeff_composition():
    """coeff_fn folded into the per-point tables: MMS for
    -div(c grad u) = f on the curved chart, c = 1 + 0.5 u."""

    def coeff(xs):
        return 1.0 + 0.5 * _exact(xs)

    def rhs_fn(xs):
        # f = -(grad c . grad u + c lap u), c = 1 + u/2 => grad c = grad u/2
        gd = 0.0
        for d in range(len(xs)):
            du = np.pi
            for e, x in enumerate(xs):
                du = du * (np.cos(np.pi * x) if e == d else np.sin(np.pi * x))
            gd = gd + 0.5 * du * du
        u = _exact(xs)
        return -(gd + (1.0 + 0.5 * u) * (-len(xs) * np.pi**2 * u))

    errs = []
    for C in (4, 8, 16):
        g = DGCurvedGrid((C, C), _deform, 3, coeff_fn=coeff)
        op = DGLaplaceCurved(g, jnp.float64)
        jac = JacobiTransformed(op)
        rhs = op.compute_rhs(jnp.asarray(rhs_fn(g.quad_phys)))
        res = cg_solve(op.vmult, rhs, jac.vmult, max_iterations=3000,
                       abs_tol=1e-14, rtol=1e-12)
        errs.append(float(op.l2_error(res.x, jnp.asarray(_exact(g.quad_phys)))))
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert min(rates) > 3.4, (errs, rates)


@pytest.mark.parametrize("kind", ["gauss", "hermite"])
def test_curved_hmg_solver(kind):
    """Pure-DG h-multigrid on the curved hierarchy: near-mesh-independent
    fractional iterations and consistent solutions across element types
    (MultigridSolverDGPlain(mapping=...))."""
    from multigrid_tpu.mesh.brick import BrickMesh
    from multigrid_tpu.solvers.multigrid_dg import MultigridSolverDGPlain

    def exact(xs):
        return _exact(xs)

    def rhs_fn(xs):
        return len(xs) * np.pi**2 * exact(xs)

    its = []
    for n_levels in (2, 3):
        mesh = BrickMesh(coarse_cells=(4, 4), origin=(0.0, 0.0),
                         lengths=(1.0, 1.0), n_levels=n_levels)
        s = MultigridSolverDGPlain(mesh, 3, exact, rhs_fn, kind=kind,
                                   mapping=_deform)
        sol, frac_its, rate = s.solve_cg(tolerance=1e-3)
        its.append(frac_its)
        assert rate < 0.35, rate
        err = s.l2_error(sol, s.exact_quad)
        assert err < 2e-4 / (4 ** (n_levels - 2)), err
    assert abs(its[0] - its[1]) < 2.0, its
