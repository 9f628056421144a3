"""poisson_shell (variable coefficient, curved) and minimal_surface
(Newton) regression tests."""

import numpy as np

from experiments.poisson_shell import coef_fn, exact_fn, rhs_fn
from multigrid_tpu.mesh.shapes import hyper_shell
from multigrid_tpu.solvers.multigrid_general import GeneralMultigridSolver


def test_shell_variable_coefficient():
    """CG+V-cycle stays mesh-robust with the 1e6-varying coefficient
    (/root/reference/poisson_shell/program.cc:142-198)."""
    mesh = hyper_shell(0.5, 1.0, n_levels=2, coarse_tangential=2)
    s = GeneralMultigridSolver(mesh, 2, exact_fn, rhs_fn, coef_fn=coef_fn,
                               n_cycles=2)
    sol, its, red = s.solve_cg(max_iterations=60)
    assert its <= 20
    assert red < 0.35
    # discretization error present but bounded (coarse mesh, strong coef)
    assert s.l2_error(s.maxlevel, sol) < 0.5


def test_minimal_surface_newton():
    from experiments.minimal_surface import MinimalSurfaceNewton

    n = MinimalSurfaceNewton(n_levels=2, degree=2)
    u, res = n.solve(tol=1e-9, max_newton=25, verbose=False)
    assert res[-1] < 1e-6, res
    # quadratic tail: last step contracts strongly
    assert res[-1] < 0.1 * res[-2]
