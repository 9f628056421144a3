"""Local-smoothing multigrid (solvers/multigrid_local.py): level-mesh
extraction, refinement-edge masks, exact preconditioner symmetry, reduction
to the textbook V-cycle on uniform forests, and adaptive L-domain solves
matching the global-coarsening solver (the reference's poisson_l
preconditioner, /root/reference/poisson_l/program.cc:338-416)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.mesh.adaptive import AdaptiveGrid, OctForest, QuadForest
from multigrid_tpu.solvers.multigrid_adaptive import AdaptiveMultigridSolver
from multigrid_tpu.solvers.multigrid_local import (
    LocalSmoothingMultigrid,
    level_forest,
)

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))
from poisson_l import (  # noqa: E402
    boundary_fn,
    exact_fn,
    l_forest,
    mg_ladder,
    refine_and_coarsen_fixed_number,
    rhs_fn,
)
from poisson_l import run_cycle as _l_run_cycle  # noqa: E402


def _adaptive_l_forest(cycles=2, dim=2, initial=2):
    """A few Kelly-style corner refinements of the L-domain (deterministic:
    refine cells nearest the reentrant corner)."""
    f = l_forest(initial, dim)
    for _ in range(cycles):
        marks = []
        for c in f.active:
            corner = f.cell_corner(c)
            h = f.h(c.level)
            r = max(abs(corner[0] + h / 2), abs(corner[1] + h / 2))
            if r < 0.3:
                marks.append(c)
        f = f.refine(marks)
    return f


def test_level_forest_partition_and_nesting():
    f = _adaptive_l_forest(2)
    L = f.max_active_level
    # level meshes cover shrinking nested regions; level 0 covers the domain
    areas = []
    for l in range(L + 1):
        lf = level_forest(f, l)
        assert all(c.level == l for c in lf.active)
        areas.append(sum(lf.h(c.level) ** 2 for c in lf.active))
    assert areas[0] == pytest.approx(3.0, rel=1e-12)   # L-domain area
    assert all(a2 <= a1 + 1e-12 for a1, a2 in zip(areas, areas[1:]))


def test_edge_masks_and_copy_partition():
    f = _adaptive_l_forest(2)
    g = AdaptiveGrid(f, 2, boundary_fn)
    s = LocalSmoothingMultigrid(g, exact_fn, rhs_fn)
    # coarsest level covers the whole domain: no refinement edge
    assert not s.levels[0].edge.any()
    # refined levels of a locally refined mesh have a nonempty edge
    assert s.levels[-1].edge.any()
    # the copy tables partition the global dofs exactly once
    counts = np.zeros(g.n_dofs, int)
    for gl in s.copy_glb:
        counts[np.asarray(gl)] += 1
    assert (counts == 1).all()


def test_preconditioner_is_symmetric():
    f = _adaptive_l_forest(2)
    g = AdaptiveGrid(f, 2, boundary_fn)
    s = LocalSmoothingMultigrid(g, exact_fn, rhs_fn, v_dtype=jnp.float64)
    rng = np.random.default_rng(5)
    interior = ~g.boundary
    r1 = jnp.asarray(np.where(interior, rng.standard_normal(g.n_dofs), 0.0))
    r2 = jnp.asarray(np.where(interior, rng.standard_normal(g.n_dofs), 0.0))
    B = jax.jit(s.v_cycle)
    a = float(jnp.vdot(B(r1), r2))
    b = float(jnp.vdot(r1, B(r2)))
    assert a == pytest.approx(b, rel=1e-12)


def test_uniform_forest_reduces_to_global_coarsening():
    """On a uniformly refined forest the level meshes coincide with the
    global-coarsening ladder and the copy rule sends everything to the
    finest level: both solvers must run the same textbook V-cycle."""
    f = l_forest(2, 2)   # uniform depth-2 L-domain
    grids = mg_ladder(f, 2)
    gc = AdaptiveMultigridSolver(grids, exact_fn, rhs_fn)
    # equal smoother interval (the GC solver hard-codes range 20; the LS
    # default is the reference poisson_l's 15, program.cc:355)
    ls = LocalSmoothingMultigrid(grids[-1], exact_fn, rhs_fn,
                                 smoothing_range=20.0)
    for l in range(ls.maxlevel + 1):
        assert not ls.levels[l].edge.any()
    sol_gc, its_gc, red_gc = gc.solve_cg()
    sol_ls, its_ls, red_ls = ls.solve_cg()
    assert its_ls == its_gc
    assert red_ls == pytest.approx(red_gc, rel=0.05)
    np.testing.assert_allclose(np.asarray(sol_ls), np.asarray(sol_gc),
                               atol=1e-9)


@pytest.mark.parametrize("cycles", [1, 3])
def test_adaptive_solve_matches_global_coarsening(cycles):
    f = _adaptive_l_forest(cycles)
    g = AdaptiveGrid(f, 2, boundary_fn)
    assert g.n_constraints > 0
    ls = LocalSmoothingMultigrid(g, exact_fn, rhs_fn)
    sol, its, red = ls.solve_cg()
    err_ls = ls.l2_error(sol)
    gc = AdaptiveMultigridSolver(mg_ladder(f, 2), exact_fn, rhs_fn)
    sol_gc, its_gc, _ = gc.solve_cg()
    err_gc = gc.l2_error(sol_gc)
    # same converged solution (CG to 1e-9 on the same system)
    np.testing.assert_allclose(np.asarray(sol), np.asarray(sol_gc),
                               atol=2e-7)
    assert err_ls == pytest.approx(err_gc, rel=1e-4)
    # mesh-independent preconditioner quality
    assert its <= its_gc + 3
    assert red < 0.35


def test_kelly_driven_amr_iterations_stay_bounded():
    """Run the driver's actual AMR loop (Kelly marking) with the
    local-smoothing solver; iteration counts must stay flat across
    cycles (the reference's table, program.cc:572-601)."""
    from multigrid_tpu.ops.laplace_adaptive import KellyEstimator

    f = l_forest(2, 2)
    its_hist = []
    for _ in range(3):
        row, sol, eta2, s = _l_run_cycle(f, 2, local_smoothing=True)
        its_hist.append(row["solver_its"])
        f = refine_and_coarsen_fixed_number(f, eta2, 0.15, 0.03)
    assert max(its_hist) <= min(its_hist) + 2
    assert max(its_hist) <= 12


def test_local_smoothing_3d_extruded_l():
    f = l_forest(1, 3)
    marks = [c for c in f.active
             if abs(f.cell_corner(c)[0] + f.h(c.level) / 2) < 0.55
             and abs(f.cell_corner(c)[1] + f.h(c.level) / 2) < 0.55]
    f = f.refine(marks)
    g = AdaptiveGrid(f, 2, boundary_fn)
    assert g.n_constraints > 0
    ls = LocalSmoothingMultigrid(g, exact_fn, rhs_fn)
    sol, its, red = ls.solve_cg()
    assert its <= 14
    gc = AdaptiveMultigridSolver(mg_ladder(f, 2), exact_fn, rhs_fn)
    sol_gc, _, _ = gc.solve_cg()
    np.testing.assert_allclose(np.asarray(sol), np.asarray(sol_gc),
                               atol=5e-7)
