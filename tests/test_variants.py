"""Coverage for reference variants: pure-double solver with fourth-kind
Chebyshev (the reference's second MultigridSolver specialization,
/root/reference/common/multigrid_solver.h:789-1285, esp. 945-963) and the
doubling-mesh ladder (/root/reference/poisson_cube/program.cc:509-528)."""

import jax.numpy as jnp
import numpy as np

from experiments.poisson_cube import exact_fn, rhs_fn
from multigrid_tpu.mesh.brick import doubling_mesh, poisson_cube_mesh
from multigrid_tpu.solvers.chebyshev import FOURTH_KIND
from multigrid_tpu.solvers.multigrid import MultigridSolver


def test_pure_double_fourth_kind():
    mesh = poisson_cube_mesh(4)
    s = MultigridSolver(mesh, 3, exact_fn, rhs_fn, n_cycles=2,
                        v_dtype=jnp.float64, f_dtype=jnp.float64,
                        chebyshev_kind=FOURTH_KIND)
    sol, its, red = s.solve_cg()
    assert its <= 12
    assert red < 0.2
    err = s.l2_error(s.maxlevel, sol)
    assert err < 0.08  # 4^3 cells p=3 on a 3-wave solution: preasymptotic
    sol_fmg = s.solve()
    assert s.l2_error(s.maxlevel, sol_fmg) < 2.0 * err


def test_doubling_mesh_ladder():
    """Doubling meshes have anisotropic extents with cubic cells; solver
    quality must hold."""
    errs = []
    for cycle in (6, 9):  # 4^3 and 8^3 cells (asymptotic regime)
        mesh = doubling_mesh(cycle)
        assert mesh.is_isotropic()
        s = MultigridSolver(mesh, 2, exact_fn, rhs_fn, n_cycles=2)
        sol, its, red = s.solve_cg()
        assert its <= 10
        errs.append(s.l2_error(s.maxlevel, sol))
    assert np.log2(errs[0] / errs[1]) > 2.3  # ~p+1
