"""Adaptive-mesh (hanging-node) stack tests: forest invariants, constrained
operator correctness, nested transfers, multigrid quality, Kelly marking
(SURVEY.md §4 tiers a-d for the poisson_l machinery)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.mesh.adaptive import AdaptiveGrid, Cell, QuadForest
from multigrid_tpu.ops.laplace_adaptive import AdaptiveLaplace, KellyEstimator
from multigrid_tpu.solvers.multigrid_adaptive import (
    AdaptiveMultigridSolver,
    NestedTransfer,
)


def square_boundary(xy):
    tol = 1e-9
    x, y = xy[:, 0], xy[:, 1]
    return (np.abs(x + 1) < tol) | (np.abs(x - 1) < tol) | \
           (np.abs(y + 1) < tol) | (np.abs(y - 1) < tol)


def make_hanging_forest(extra=1):
    """Full square, one corner region refined ``extra`` more times."""
    f = QuadForest(2, -1.0, 2.0).uniform_refine()
    for _ in range(extra):
        marks = [c for c in f.active
                 if f.cell_corner(c)[0] < -0.49 and f.cell_corner(c)[1] < -0.49]
        f = f.refine(marks)
    return f


def test_forest_balance_and_coverage():
    f = make_hanging_forest(3)
    # partition: areas sum to the square's area
    area = sum(f.h(c.level) ** 2 for c in f.active)
    assert area == pytest.approx(4.0, rel=1e-12)
    # 2:1: every face neighbor resolves
    for c in f.active:
        for d in (0, 1):
            for s in (0, 1):
                f.find_active_neighbor(c, d, s)  # raises if unbalanced


def test_coarsen_global_nested_partition():
    f = make_hanging_forest(2)
    c = f.coarsen_global()
    area = sum(c.h(q.level) ** 2 for q in c.active)
    assert area == pytest.approx(4.0, rel=1e-12)
    assert max(q.level for q in c.active) <= max(q.level for q in f.active)
    # nested: every fine cell lies inside some coarse active cell
    anc_or_self = c.active | c.ancestors
    for q in f.active:
        qq = q
        while qq.level >= 0 and qq not in c.active:
            qq = qq.parent
        assert qq.level >= 0


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_hanging_operator_symmetric_pd_and_diag(degree):
    f = make_hanging_forest(1)
    g = AdaptiveGrid(f, degree, square_boundary)
    assert g.n_constraints > 0
    op = AdaptiveLaplace(g, jnp.float64)
    N = g.n_dofs
    eye = np.eye(N)
    cols = np.stack(
        [np.asarray(op.apply_cells(jnp.asarray(eye[i]))) for i in range(N)],
        axis=1)
    interior = ~g.boundary
    A = cols[np.ix_(interior, interior)]
    assert np.abs(A - A.T).max() < 1e-12 * np.abs(A).max()
    assert np.linalg.eigvalsh(0.5 * (A + A.T)).min() > 0
    d_exact = np.diag(cols).copy()
    d_exact[g.boundary] = 1.0
    d_ours = 1.0 / np.asarray(op.inverse_diagonal())
    assert np.abs(d_exact - d_ours).max() < 1e-12 * np.abs(d_exact).max()


def test_hanging_interpolation_exactness():
    """A global polynomial of degree p lies in the constrained space
    exactly (hanging interpolation is conforming): its discrete energy
    u^T A u equals the analytic Dirichlet energy.
    For u = x^2 + x*y on [-1,1]^2: int |grad u|^2 = 8."""
    degree = 2
    for extra in (1, 2):
        f = make_hanging_forest(extra)
        g = AdaptiveGrid(f, degree, square_boundary)
        assert g.n_constraints > 0
        op = AdaptiveLaplace(g, jnp.float64)
        xy = g.dof_xy
        u = jnp.asarray(xy[:, 0] ** 2 + xy[:, 0] * xy[:, 1])
        energy = float(jnp.vdot(u, op.apply_cells(u)))
        assert energy == pytest.approx(8.0, rel=1e-13)


def test_nested_transfer_preserves_polynomials():
    degree = 2
    fc = make_hanging_forest(0)
    ff = make_hanging_forest(1)
    gc = AdaptiveGrid(fc, degree, square_boundary)
    gf = AdaptiveGrid(ff, degree, square_boundary)
    tr = NestedTransfer(gf, gc, jnp.float64)
    xyc, xyf = gc.dof_xy, gf.dof_xy
    pc = jnp.asarray(xyc[:, 0] ** 2 + 0.3 * xyc[:, 1])
    pf_expect = xyf[:, 0] ** 2 + 0.3 * xyf[:, 1]
    # interior-only comparison (transfer is the constrained flavor)
    uf = np.asarray(jnp.sum(pc[tr.idx] * tr.w, axis=-1))
    assert np.abs(uf - pf_expect).max() < 1e-12


def test_adaptive_multigrid_mms():
    """Smooth MMS on a hanging-node hierarchy: mesh-independent iterations
    and correct errors."""
    exact = lambda c: np.sin(np.pi * c[0]) * np.sin(np.pi * c[1])
    rhs = lambda c: 2 * np.pi**2 * np.sin(np.pi * c[0]) * np.sin(np.pi * c[1])
    forests = [make_hanging_forest(0), make_hanging_forest(1),
               make_hanging_forest(2)]
    errs = []
    for upto in (2, 3):
        grids = [AdaptiveGrid(f, 2, square_boundary) for f in forests[:upto]]
        s = AdaptiveMultigridSolver(grids, exact, rhs)
        sol, its, red = s.solve_cg()
        assert its <= 10
        errs.append(s.l2_error(sol))
    assert errs[1] < errs[0]


def test_kelly_marks_singular_corner():
    """On the L-domain, the estimator must concentrate on the reentrant
    corner (program.cc:527-533 behavior)."""
    from experiments.poisson_l import boundary_fn, exact_fn, l_forest, rhs_fn

    f = l_forest(2)
    g = AdaptiveGrid(f, 2, boundary_fn)
    grids = [AdaptiveGrid(l_forest(k), 2, boundary_fn) for k in (0, 1, 2)]
    s = AdaptiveMultigridSolver(grids, exact_fn, rhs_fn)
    sol, its, _ = s.solve_cg()
    eta2 = KellyEstimator(s.op_dp)(sol)
    order = np.argsort(eta2)[::-1]
    cells = g.cells
    # the top-marked cell touches the corner (0,0)
    top = cells[order[0]]
    x0, y0 = f.cell_corner(top)
    h = f.h(top.level)
    assert abs(x0 + h - 0.0) < 1e-9 or abs(x0) < 1e-9
    assert abs(y0 + h - 0.0) < 1e-9 or abs(y0) < 1e-9


def test_adaptive_beats_uniform():
    """Equal-dofs comparison on the corner singularity: the adaptive
    hierarchy reaches lower H1 error than uniform refinement — the
    poisson_l acceptance criterion."""
    from experiments.poisson_l import (
        boundary_fn, l_forest, refine_and_coarsen_fixed_number, run_cycle)

    forest = l_forest(1)
    rows = []
    for _ in range(5):
        row, sol, eta2, s = run_cycle(forest, 2)
        rows.append(row)
        forest = refine_and_coarsen_fixed_number(forest, eta2, 0.15, 0.03)
    uniform_forest = l_forest(2)
    urow, *_ = run_cycle(uniform_forest, 2)
    # find adaptive row with <= uniform dofs but better H1 error
    best = min((r for r in rows if r["dofs"] <= urow["dofs"]),
               key=lambda r: r["grad_L2"])
    assert best["grad_L2"] < urow["grad_L2"]
