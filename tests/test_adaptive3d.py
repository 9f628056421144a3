"""3-D octree AMR tests: forest invariants, face+edge hanging-node
constraints, conformity (energy exactness), multigrid quality, and the
3-D poisson_l loop (the reference's extruded-L variant,
/root/reference/poisson_l/program.cc:478-601)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.mesh.adaptive import AdaptiveGrid, Cell, OctForest
from multigrid_tpu.ops.laplace_adaptive import AdaptiveLaplace, KellyEstimator
from multigrid_tpu.solvers.multigrid_adaptive import AdaptiveMultigridSolver


def cube_boundary(xyz):
    tol = 1e-9
    out = np.zeros(xyz.shape[0], bool)
    for d in range(3):
        out |= (np.abs(xyz[:, d] + 1) < tol) | (np.abs(xyz[:, d] - 1) < tol)
    return out


def make_hanging_forest(extra=1):
    """Full cube, the (-1,-1,-1) corner region refined ``extra`` times."""
    f = OctForest(2, -1.0, 2.0)
    for _ in range(extra):
        marks = [c for c in f.active
                 if all(x < -0.49 for x in f.cell_corner(c))]
        f = f.refine(marks)
    return f


def test_octforest_balance_and_coverage():
    f = make_hanging_forest(3)
    vol = sum(f.h(c.level) ** 3 for c in f.active)
    assert vol == pytest.approx(8.0, rel=1e-12)
    for c in f.active:
        for d in range(3):
            for s in (0, 1):
                f.find_active_neighbor(c, d, s)  # raises if unbalanced


def test_3d_hanging_nodes_exist_on_faces_and_edges():
    f = make_hanging_forest(1)
    g = AdaptiveGrid(f, 2, cube_boundary)
    # one refined corner cell: 8 children, each 3 hanging faces worth of
    # constraints plus edge constraints between coarse neighbors
    assert g.n_constraints > 0
    # conformity across the 2:1 interface: continuity of the interpolated
    # space is checked via energy exactness below


@pytest.mark.parametrize("degree", [1, 2])
def test_3d_hanging_operator_symmetric_pd_and_diag(degree):
    f = make_hanging_forest(1)
    g = AdaptiveGrid(f, degree, cube_boundary)
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


def test_3d_hanging_interpolation_exactness():
    """u = x^2 + x*y + z on [-1,1]^3 lies in the constrained FE_Q(2) space
    exactly; its discrete energy u^T A u equals int |grad u|^2 = 24."""
    for extra in (1, 2):
        f = make_hanging_forest(extra)
        g = AdaptiveGrid(f, 2, cube_boundary)
        assert g.n_constraints > 0
        op = AdaptiveLaplace(g, jnp.float64)
        xyz = g.dof_xy
        u = jnp.asarray(xyz[:, 0] ** 2 + xyz[:, 0] * xyz[:, 1] + xyz[:, 2])
        energy = float(jnp.vdot(u, op.apply_cells(u)))
        assert energy == pytest.approx(24.0, rel=1e-12)


def test_3d_adaptive_multigrid_mms():
    exact = lambda c: (np.sin(np.pi * c[0]) * np.sin(np.pi * c[1])
                       * np.sin(np.pi * c[2]))
    rhs = lambda c: 3 * np.pi**2 * (np.sin(np.pi * c[0])
                                    * np.sin(np.pi * c[1])
                                    * np.sin(np.pi * c[2]))
    forests = [make_hanging_forest(0), make_hanging_forest(1),
               make_hanging_forest(2)]
    errs = []
    for upto in (2, 3):
        grids = [AdaptiveGrid(f, 2, cube_boundary) for f in forests[:upto]]
        s = AdaptiveMultigridSolver(grids, exact, rhs)
        sol, its, red = s.solve_cg()
        assert its <= 12
        errs.append(s.l2_error(sol))
    assert errs[1] < errs[0]


def test_poisson_l_3d_adaptive_cycle():
    """Two cycles of the 3-D extruded-L loop: Kelly concentrates on the
    reentrant edge, iterations stay mesh-independent, L2 error drops."""
    from experiments.poisson_l import (l_forest,
                                       refine_and_coarsen_fixed_number,
                                       run_cycle)

    forest = l_forest(1, dim=3)
    row0, sol0, eta2, s0 = run_cycle(forest, 2)
    assert row0["solver_its"] <= 10
    # top-marked cell touches the reentrant edge x=0, y=0
    g = s0.grids[-1]
    top = g.cells[int(np.argmax(eta2))]
    corner = g.forest.cell_corner(top)
    h = g.forest.h(top.level)
    assert min(abs(corner[0]), abs(corner[0] + h)) < 1e-9
    assert min(abs(corner[1]), abs(corner[1] + h)) < 1e-9
    forest = refine_and_coarsen_fixed_number(forest, eta2, 0.15, 0.03)
    row1, *_ = run_cycle(forest, 2)
    assert row1["solver_its"] <= 10
    assert row1["val_L2"] < row0["val_L2"]
    assert row1["constraints"] > 0
