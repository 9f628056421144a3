"""End-to-end FMG/CG solver tests: solver-quality invariants vs the
reference transcript (/root/reference/README.md:136-159) — SURVEY.md §4
tiers c and d.

Targets (p=4, 3-D poisson_cube, mixed fp32/fp64, 2 V-cycles, 2+2 smoothing):

* 8 cells/dim   (512 cells, 35937 dofs):  cg_its = 8, cg_red ~ 6.7e-2,
  V-cycle reduction ~ 0.13, fmg_L2error ~ 4.0e-4
* CG converges to rtol 1e-9 in 8 iterations, mesh-independently.
"""

import numpy as np
import pytest

from experiments.poisson_cube import build_solver
from multigrid_tpu.mesh.brick import poisson_cube_mesh


@pytest.fixture(scope="module")
def solver8():
    return build_solver(poisson_cube_mesh(8), degree=4, n_cycles=2)


def test_fmg_discretization_accuracy(solver8):
    sol = solver8.solve()
    err = solver8.l2_error(solver8.maxlevel, sol)
    # reference fmg_L2error = 4.037e-4 at 35937 dofs (README.md:143)
    assert err < 5.0e-4
    assert err > 2.0e-4


def test_vcycle_reduction(solver8):
    _, report, reduction = solver8.solve_analyze()
    # reference reduction = 0.1319 (README.md:143); allow implementation slack
    assert reduction < 0.2


def test_cg_iterations(solver8):
    sol, its, red = solver8.solve_cg()
    err = solver8.l2_error(solver8.maxlevel, sol)
    # reference: cg_its=8, cg_reduction=6.689e-2, cg_L2error=3.822e-4
    assert its <= 9
    assert red < 0.09
    assert err < 6.0e-4


def test_mms_convergence_rates():
    """L2 error must shrink at ~(p+1)-th order under refinement (tier c)."""
    degree = 2
    errors = []
    for size in (4, 8):
        s = build_solver(poisson_cube_mesh(size), degree=degree, n_cycles=2)
        sol, its, _ = s.solve_cg()
        errors.append(s.l2_error(s.maxlevel, sol))
    rate = np.log2(errors[0] / errors[1])
    assert rate > degree + 0.5  # optimal is p+1
