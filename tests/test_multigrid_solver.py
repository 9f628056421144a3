"""End-to-end FMG/CG solver tests: solver-quality invariants vs the
reference transcript (/root/reference/README.md:136-159) — SURVEY.md §4
tiers c and d.

Exact-parity assertions (p=4, 3-D poisson_cube, mixed fp32/fp64, 2 V-cycles,
2+2 smoothing).  Reference rows (cells, dofs, reduction, fmg_L2error,
cg_its, cg_reduction):

* size 2:   8 cells,   729 dofs, red 1.092e-1, err 1.737e-1, 8, 5.677e-2
* size 4:  64 cells,  4913 dofs, red 1.613e-1, err 1.166e-2, 8, 6.789e-2
* size 8: 512 cells, 35937 dofs, red 1.319e-1, err 4.037e-4, 8, 6.689e-2

The V-cycle reduction and cg_reduction must match deal.II to ~2% — this
pins the full Chebyshev semantics chain (1.2-boosted Lanczos estimate,
interval ratio = smoothing_range, error polynomial degree n_pre+1).
"""

import numpy as np
import pytest

from experiments.poisson_cube import build_solver
from multigrid_tpu.mesh.brick import poisson_cube_mesh

# size -> (reduction, fmg_L2error, cg_its, cg_reduction, cg_L2error)
REFERENCE_ROWS = {
    2: (1.092e-1, 1.737e-1, 8, 5.677e-2, 1.725e-1),
    4: (1.613e-1, 1.166e-2, 8, 6.789e-2, 1.027e-2),
    8: (1.319e-1, 4.037e-4, 8, 6.689e-2, 3.822e-4),
}


@pytest.fixture(scope="module")
def solver8():
    return build_solver(poisson_cube_mesh(8), degree=4, n_cycles=2)


def test_fmg_discretization_accuracy(solver8):
    sol = solver8.solve()
    err = solver8.l2_error(solver8.maxlevel, sol)
    assert err == pytest.approx(REFERENCE_ROWS[8][1], rel=0.02)


def test_vcycle_reduction(solver8):
    _, report, reduction = solver8.solve_analyze()
    assert reduction == pytest.approx(REFERENCE_ROWS[8][0], rel=0.02)


def test_cg_iterations(solver8):
    sol, its, red = solver8.solve_cg()
    err = solver8.l2_error(solver8.maxlevel, sol)
    assert its == REFERENCE_ROWS[8][2]
    assert red == pytest.approx(REFERENCE_ROWS[8][3], rel=0.02)
    assert err == pytest.approx(REFERENCE_ROWS[8][4], rel=0.1)


@pytest.mark.parametrize("size", [2, 4])
def test_transcript_rows(size):
    ref_red, ref_fmg, ref_its, ref_cgred, ref_cgerr = REFERENCE_ROWS[size]
    s = build_solver(poisson_cube_mesh(size), degree=4, n_cycles=2)
    sol, _, red = s.solve_analyze()
    assert red == pytest.approx(ref_red, rel=0.02)
    assert s.l2_error(s.maxlevel, sol) == pytest.approx(ref_fmg, rel=0.02)
    solc, its, cgred = s.solve_cg()
    assert its == ref_its
    assert cgred == pytest.approx(ref_cgred, rel=0.02)


def test_single_level_coarse_solver():
    """size 3 is a one-level mesh: the CG preconditioner is the
    Chebyshev-as-coarse-solver; reference row: 3 its, red 3.157e-4."""
    s = build_solver(poisson_cube_mesh(3), degree=4, n_cycles=2)
    sol, its, red = s.solve_cg()
    assert its == 3
    assert red == pytest.approx(3.157e-4, rel=0.05)


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


def test_stepped_cg_matches_while_loop_cg():
    """cg_solve_stepped (host-stepped, donated carries — the 135M-dof
    path) produces the same iterates as the lax.while_loop solver."""
    import jax

    from multigrid_tpu.solvers.cg import cg_solve, cg_solve_stepped

    s = build_solver(poisson_cube_mesh(4), degree=3, n_cycles=2)
    L = s.maxlevel
    shape = s.grids[L].shape
    A = s.dp_ops[L].vmult
    res_ref = jax.jit(
        lambda b: cg_solve(A, b, precond=s._precond, rtol=1e-9)
    )(s.rhs[L])
    res_step = cg_solve_stepped(
        lambda pf: A(pf.reshape(shape)).reshape(-1),
        s.rhs[L].reshape(-1),
        precond=lambda rf: s._precond(rf.reshape(shape)).reshape(-1),
        rtol=1e-9,
    )
    assert int(res_step.iterations) == int(res_ref.iterations)
    np.testing.assert_allclose(
        np.asarray(res_step.x).reshape(shape), np.asarray(res_ref.x),
        rtol=0, atol=1e-12,
    )
