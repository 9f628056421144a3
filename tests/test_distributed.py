"""End-to-end distributed multigrid: full mixed-precision FMG + CG on the
8-device virtual mesh must match the single-device solve (VERDICT item 5;
reference anchor /root/reference/common/multigrid_solver.h:151-200)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from experiments.poisson_cube import exact_fn, rhs_fn
from multigrid_tpu.mesh.brick import BrickMesh
from multigrid_tpu.parallel.distributed import DistributedMultigrid, level_spec
from multigrid_tpu.parallel.sharding import make_mesh
from multigrid_tpu.solvers.multigrid import MultigridSolver


def _mesh_geo(n_levels=3):
    return BrickMesh(
        coarse_cells=(2, 2, 2), origin=(-0.9,) * 3, lengths=(1.9,) * 3,
        n_levels=n_levels,
    )


def _solver(degree=4, n_levels=3):
    return MultigridSolver(
        _mesh_geo(n_levels), degree, exact_fn, rhs_fn,
        n_pre=2, n_post=2, n_cycles=2,
    )


@pytest.fixture(scope="module")
def single_device_results():
    s = _solver()
    sol = np.asarray(s.solve())
    sol_cg, its, red = s.solve_cg()
    return sol, np.asarray(sol_cg), its, red, s.l2_error(s.maxlevel, jnp.asarray(sol))


@pytest.mark.parametrize("axes", [("z",), ("z", "y")])
def test_distributed_fmg_and_cg_match_single_device(axes, single_device_results):
    sol_ref, cg_ref, its_ref, red_ref, err_ref = single_device_results
    s = _solver()
    dm = DistributedMultigrid(s, make_mesh(8, axes))
    # the fine levels must actually be decomposed, the coarsest replicated
    dist = dm.distributed_levels()
    assert dist[-1], "finest level must be sharded"
    if axes == ("z",):
        # 9 planes over 8 z-devices -> below min_local=2 -> replicated;
        # over the (2,4) z-y mesh the coarse level legitimately still splits
        assert not dist[0], "coarsest level (9^3) must replicate on 8-way z"

    sol = dm.solve()
    # the compiled FMG must contain real inter-device communication: the
    # window-shift halos lower to collective-permute / all-to-all traffic and
    # the replicate-below-threshold coarse levels force gathers
    hlo = s._fmg_jit.lower(s.rhs, s.u_bc, s._build_rhs_win()).compile().as_text()
    assert any(c in hlo for c in
               ("collective-permute", "all-gather", "all-to-all",
                "all-reduce")), "no collectives in compiled distributed FMG"
    # the sp V-cycle sums in a different (partitioned) order, so FMG results
    # agree to f32 rounding scale; the dp-converged CG solution is the
    # stringent cross-check below
    np.testing.assert_allclose(np.asarray(sol), sol_ref, rtol=0, atol=1e-6)
    err = s.l2_error(s.maxlevel, sol)
    assert abs(err - err_ref) <= 1e-3 * abs(err_ref)

    sol_cg, its, red = dm.solve_cg()
    assert its == its_ref
    assert abs(red - red_ref) < 1e-4
    np.testing.assert_allclose(np.asarray(sol_cg), cg_ref, rtol=0, atol=1e-9)


def test_level_spec_replicates_small_axes():
    mesh = make_mesh(8, ("z", "y"))
    # 33 planes over 2 z-devices -> split; 5 over 4 y-devices -> replicated
    assert level_spec((33, 5, 33), mesh, min_local=2) == P("z", None, None)
    assert level_spec((3, 3, 3), mesh, min_local=2) == P(None, None, None)
