"""dp Ozaki banded-matmul transfer vs the df64 window path.

The MXU flavor (ops/transfer.OzakiMatmulTransfer) must reproduce the
elementwise-compensated window flavor to df64 accuracy, stay exactly
adjoint, and leave FMG results unchanged when enabled via
MGT_DP_MM_TRANSFER=1 (cf. deal.II MGTransferMatrixFree semantics,
/root/reference/common/multigrid_solver.h:208-222)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.mesh.brick import BrickMesh, DofGrid
from multigrid_tpu.ops.transfer import OzakiMatmulTransfer, Transfer

MESH = BrickMesh(coarse_cells=(2, 3, 2), origin=(-0.9,) * 3,
                 lengths=(1.9, 1.3, 1.1), n_levels=3)


@pytest.mark.parametrize("constrained", [True, False])
def test_matches_df64_window_path(constrained):
    gf, gc = DofGrid(MESH, 2, 4), DofGrid(MESH, 1, 4)
    t0 = Transfer(gf, gc, jnp.float64, constrained=constrained)
    t1 = OzakiMatmulTransfer(gf, gc, jnp.float64, constrained=constrained)
    rng = np.random.default_rng(0)
    uc = jnp.asarray(rng.standard_normal(gc.shape))
    uf = jnp.asarray(rng.standard_normal(gf.shape))
    p0, p1 = np.asarray(t0.prolongate(uc)), np.asarray(t1.prolongate(uc))
    r0, r1 = np.asarray(t0.restrict(uf)), np.asarray(t1.restrict(uf))
    assert np.max(np.abs(p0 - p1)) < 1e-13 * np.max(np.abs(p0))
    assert np.max(np.abs(r0 - r1)) < 1e-13 * np.max(np.abs(r0))
    # adjointness: <P uc, uf> == <uc, R uf>
    a = float(jnp.vdot(t1.prolongate(uc), uf))
    b = float(jnp.vdot(uc, t1.restrict(uf)))
    assert abs(a - b) < 1e-11 * max(abs(a), 1.0)


def test_fmg_unchanged_under_knob():
    from experiments.poisson_cube import exact_fn, rhs_fn
    from multigrid_tpu.solvers.multigrid import MultigridSolver

    def build():
        return MultigridSolver(MESH, degree=2, exact_fn=exact_fn,
                               rhs_fn=rhs_fn, n_pre=2, n_post=2, n_cycles=2)

    ref = np.asarray(build().solve())
    os.environ["MGT_DP_MM_TRANSFER"] = "1"
    try:
        solver = build()
        from multigrid_tpu.ops.transfer import OzakiMatmulTransfer as T
        assert isinstance(solver.transfers_nobc[1], T)
        sol = np.asarray(solver.solve())
    finally:
        del os.environ["MGT_DP_MM_TRANSFER"]
    dev = np.max(np.abs(sol - ref)) / np.max(np.abs(ref))
    assert dev < 1e-12, dev


def test_reduced_limb_knob():
    """MGT_DPMM_LIMBS=5: ~2^-35 per-line transfer accuracy, and the FMG
    V-cycle contracts the prolongation perturbation so the final solve's
    L2 error is unchanged to well below discretization accuracy."""
    gf, gc = DofGrid(MESH, 2, 4), DofGrid(MESH, 1, 4)
    t0 = Transfer(gf, gc, jnp.float64, constrained=False)
    t5 = OzakiMatmulTransfer(gf, gc, jnp.float64, constrained=False,
                             n_limbs=5)
    rng = np.random.default_rng(1)
    uc = jnp.asarray(rng.standard_normal(gc.shape))
    p0, p5 = np.asarray(t0.prolongate(uc)), np.asarray(t5.prolongate(uc))
    dev = np.max(np.abs(p0 - p5)) / np.max(np.abs(p0))
    assert dev < 5e-10, dev          # 3 axes x 2^-35 per line
    assert dev > 1e-14, dev          # and it genuinely ran fewer limbs

    from experiments.poisson_cube import exact_fn, rhs_fn
    from multigrid_tpu.solvers.multigrid import MultigridSolver

    def build():
        return MultigridSolver(MESH, degree=2, exact_fn=exact_fn,
                               rhs_fn=rhs_fn, n_pre=2, n_post=2, n_cycles=2)

    ref = build()
    err_ref = float(ref.l2_error(ref.maxlevel, ref.solve()))
    os.environ["MGT_DP_MM_TRANSFER"] = "1"
    os.environ["MGT_DPMM_LIMBS"] = "5"
    try:
        s5 = build()
        assert isinstance(s5.transfers_nobc[1], OzakiMatmulTransfer)
        assert s5.transfers_nobc[1]._N_LIMBS == 5
        err_5 = float(s5.l2_error(s5.maxlevel, s5.solve()))
    finally:
        del os.environ["MGT_DP_MM_TRANSFER"]
        del os.environ["MGT_DPMM_LIMBS"]
    assert abs(err_5 - err_ref) < 1e-6 * err_ref, (err_5, err_ref)
