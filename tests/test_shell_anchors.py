"""Shell solver-quality regression anchors (VERDICT r3 weak #1).

The cube path pins the reference transcript row-for-row
(tests/test_multigrid_solver.py); the shell path had no anchor, so a
general-path smoothing regression would pass CI silently.  These values
were measured 2026-08-20 on the CPU path (poisson_shell coefficient,
degree 3) and match the hardware ladder's class (cg_its 19-27,
cg_reduction 0.33-0.46 at scale — docs/tpu_r3/shell_df64_resume.log; the
reference README warns this example converges slowly, README.md:11).

Iteration counts are pinned EXACTLY; reductions and L2 errors to small
relative bands.  Any smoothing/transfer/coefficient regression on the
general path moves cg_its or cg_reduction far beyond these bands.
"""

import numpy as np
import pytest

from experiments.poisson_shell import coef_fn, exact_fn, rhs_fn
from multigrid_tpu.mesh.shapes import hyper_shell, hyper_shell_12
from multigrid_tpu.solvers.chebyshev import FOURTH_KIND
from multigrid_tpu.solvers.multigrid_general import GeneralMultigridSolver

# (mesh builder, n_levels, pure_double) -> expected
# (dofs, fmg_L2, cg_its, cg_reduction, cg_L2)
ANCHORS = {
    ("shell6", 2, False): (1526, 2.346556e-01, 15, 0.232046, 1.823688e-01),
    ("shell6", 2, True): (1526, 3.355221e-01, 22, 0.377363, 1.823688e-01),
    ("shell12", 2, False): (3038, 2.150496e-01, 13, 0.191005, 1.319676e-01),
    ("shell12", 2, True): (3038, 2.436254e-01, 20, 0.342541, 1.319676e-01),
    ("shell6", 3, False): (11258, 7.347376e-02, 16, 0.264773, 3.525010e-02),
    ("shell6", 3, True): (11258, 1.607104e-01, 26, 0.445591, 3.525010e-02),
}
_MESHES = {"shell6": hyper_shell, "shell12": hyper_shell_12}


@pytest.mark.parametrize("key", sorted(ANCHORS), ids=lambda k: f"{k[0]}-l{k[1]}-{'pd' if k[2] else 'mixed'}")
def test_shell_anchor(key):
    name, n_levels, pure_double = key
    dofs, fmg_l2, its_exp, red_exp, cg_l2 = ANCHORS[key]
    kw = dict(n_pre=3, n_post=3, n_cycles=1)
    if pure_double:
        kw.update(pure_double=True, chebyshev_kind=FOURTH_KIND)
    mesh = _MESHES[name](0.5, 1.0, n_levels=n_levels)
    s = GeneralMultigridSolver(mesh, 3, exact_fn, rhs_fn, coef_fn=coef_fn,
                               **kw)
    assert s.grids[s.maxlevel].n_dofs == dofs
    sol = s.solve()
    got_fmg = s.l2_error(s.maxlevel, sol)
    # FMG rides the f32 V-cycle in the mixed path: small relative band
    assert abs(got_fmg - fmg_l2) / fmg_l2 < 1e-3, got_fmg
    sol_cg, its, red = s.solve_cg()
    assert its == its_exp, (its, its_exp)
    assert abs(red - red_exp) / red_exp < 0.02, (red, red_exp)
    got_cg = s.l2_error(s.maxlevel, sol_cg)
    assert abs(got_cg - cg_l2) / cg_l2 < 1e-5, got_cg
