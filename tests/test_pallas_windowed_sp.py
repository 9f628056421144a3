"""Windowed fused sp matvec (interpret mode) vs the dense sp oracle, and
the windowed V-cycle smoother path vs the node-grid solver.

The sp kernel's 3 x 8-bit limb split is an EXACT decomposition of the f32
input, and the dropped cross terms are ~2^-24 relative — the accuracy
class of DenseLaplaceF32's HIGHEST-precision matmul, so the two paths must
agree to f32 roundoff.  The solver equivalence tier pins iteration counts
and reductions: the windowed smoother must leave the transcript anchors
(tests/test_multigrid_solver.py) intact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.mesh.brick import BrickMesh, DofGrid
from multigrid_tpu.ops.laplace import LaplaceOperator, make_diag_coef
from multigrid_tpu.ops.laplace_dense import DenseLaplaceF32
from multigrid_tpu.ops.pallas_windowed_sp import (
    PallasWindowedSP, windowed_inv_diag_factory)


def make_grid(cells):
    mesh = BrickMesh(coarse_cells=cells, origin=(-0.9,) * 3,
                     lengths=(1.9, 1.3, 1.1), n_levels=1)
    return DofGrid(mesh, 0, 4)


@pytest.mark.parametrize("cells,cy_chunk", [((3, 4, 4), 4),
                                            ((4, 8, 4), 4),   # nyc=2: carry
                                            ((2, 6, 8), 2)])  # nyc=3
def test_windowed_sp_matches_dense(cells, cy_chunk):
    grid = make_grid(cells)
    ref = DenseLaplaceF32(grid)
    op = PallasWindowedSP(grid, cy_chunk=cy_chunk, interpret=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(grid.shape),
                    jnp.float32)
    y_ref = np.asarray(ref.vmult(x))
    y = np.asarray(op.vmult(x))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y, y_ref, atol=2e-6 * scale)


def test_windowed_sp_roundtrip_and_dups():
    grid = make_grid((2, 4, 4))
    op = PallasWindowedSP(grid, cy_chunk=2, interpret=True)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(grid.shape),
                    jnp.float32)
    back = np.asarray(op.from_windowed(op.to_windowed(x)))
    np.testing.assert_allclose(back, np.asarray(x), rtol=0, atol=0)
    # kernel output duplicate-slot consistency (j=p block == j=0 shifted)
    xm = jnp.where(op.interior, x, 0)
    yw = np.asarray(op.vmult_windowed(op.to_windowed(xm)))
    cx, p = op.cx, op.p
    j0 = yw[:, :, 0 * cx: 1 * cx]
    jp = yw[:, :, p * cx: (p + 1) * cx]
    np.testing.assert_allclose(jp[..., : cx - 1], j0[..., 1:], atol=0)


def test_perm_matmul_conversions_match_reshape():
    """The MXU permutation-matmul relayout (TPU path) must equal the
    reshape/concat relayout bit-for-bit (0/1 matrix, 2-limb bf16 split:
    every output lane receives exactly one exact product)."""
    grid = make_grid((2, 3, 4))
    op = PallasWindowedSP(grid, interpret=True)
    x = jnp.asarray(np.random.default_rng(9).standard_normal(grid.shape),
                    jnp.float32)
    w_ref = op.to_windowed(x)                  # reshape path (interpret)
    w_mm = jnp.pad(op.xmap.win(x, interpret=False),
                   ((0, 0), (0, op.Yp - op.Y), (0, 0)))
    np.testing.assert_array_equal(np.asarray(w_mm), np.asarray(w_ref))
    back_mm = op.xmap.unwin(w_ref[:, :op.Y], interpret=False)
    np.testing.assert_array_equal(np.asarray(back_mm),
                                  np.asarray(op.from_windowed(w_ref)))


def test_xwindowmap_first_use_inside_jit_does_not_leak():
    """Regression: XWindowMap memoizes its permutation matrices on first
    use; when that first use happened INSIDE a jit trace the cache held
    tracers and the next independent trace died with UnexpectedTracerError
    (measured at 513^3: solve_analyze after solve).  The matrices must be
    numpy constants, safe to materialize under tracing."""
    grid = make_grid((2, 3, 4))
    op = PallasWindowedSP(grid, interpret=True)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(grid.shape),
                    jnp.float32)
    f1 = jax.jit(lambda a: op.xmap.win(a, interpret=False))
    y1 = f1(x)                                   # first use under trace
    f2 = jax.jit(lambda a: op.xmap.win(a, interpret=False))
    y2 = f2(x)                                   # independent second trace
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert isinstance(op.xmap._mats()[0], np.ndarray)


def test_cheb_fused_output_dup_consistency():
    """cheb_fused output must keep duplicate x-window slots consistent
    (it feeds the next kernel pass, which reads the j=p block)."""
    from multigrid_tpu.ops.pallas_windowed_sp import FusedChebyshev

    grid = make_grid((2, 4, 4))
    op = PallasWindowedSP(grid, cy_chunk=2, interpret=True)
    lap = LaplaceOperator(grid, jnp.float32, make_diag_coef(grid))
    op.install_diag_factors(lap)
    inv = windowed_inv_diag_factory(op, lap)
    fus = FusedChebyshev(op, inv, 1.7, 1.3, 3, 1.0, 0.1)
    rng = np.random.default_rng(12)
    b = op.to_windowed(jnp.where(
        op.interior, jnp.asarray(rng.standard_normal(grid.shape),
                                 jnp.float32), 0))
    yw = np.asarray(fus.vmult(b))
    cx, p = op.cx, op.p
    np.testing.assert_allclose(yw[:, :, p * cx: p * cx + cx - 1],
                               yw[:, :, 1:cx], atol=0)


def test_windowed_inv_diag_matches_node():
    grid = make_grid((2, 3, 4))
    opw = PallasWindowedSP(grid, interpret=True)
    lap = LaplaceOperator(grid, jnp.float32, make_diag_coef(grid))
    inv_fn = windowed_inv_diag_factory(opw, lap)
    got = np.asarray(opw.from_windowed(inv_fn()))
    want = np.asarray(lap.inverse_diagonal())
    interior = np.asarray(opw.interior)
    np.testing.assert_allclose(got[interior], want[interior], rtol=1e-6)


def test_fused_chebyshev_matches_generic():
    """FusedChebyshev (in-kernel action-3 epilogue) must reproduce the
    generic Chebyshev recurrence on windowed vectors to f32 roundoff."""
    from multigrid_tpu.ops.pallas_windowed_sp import FusedChebyshev
    from multigrid_tpu.solvers.chebyshev import Chebyshev

    grid = make_grid((2, 4, 4))
    opw = PallasWindowedSP(grid, cy_chunk=2, interpret=True)
    lap = LaplaceOperator(grid, jnp.float32, make_diag_coef(grid))
    opw.install_diag_factors(lap)
    inv = windowed_inv_diag_factory(opw, lap)
    theta, delta, deg = 1.7, 1.3, 3
    gen = Chebyshev(vmult_op=opw.vmult_windowed,
                    precond=lambda r: inv() * r,
                    theta=theta, delta=delta, degree=deg,
                    max_eig=1.0, min_eig=0.1)
    fus = FusedChebyshev(opw, inv, theta, delta, deg, 1.0, 0.1)
    x = jnp.asarray(np.random.default_rng(5).standard_normal(grid.shape),
                    jnp.float32)
    b = opw.to_windowed(jnp.where(opw.interior, x, 0))
    x0 = opw.to_windowed(jnp.where(
        opw.interior,
        jnp.asarray(np.random.default_rng(6).standard_normal(grid.shape),
                    jnp.float32), 0))
    for name, got, want in [
        ("vmult", fus.vmult(b), gen.vmult(b)),
        ("step", fus.step(x0, b), gen.step(x0, b)),
    ]:
        got, want = np.asarray(got), np.asarray(want)
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=3e-6 * scale, err_msg=name)


def test_windowed_vcycle_solver_matches_node_path():
    """Full FMG + CG with sp_impl="pallas_windowed" (interpret): iteration
    counts must match the node path exactly and solutions to sp-smoother
    tolerance (the preconditioner differs only by f32 rounding)."""
    from experiments.poisson_cube import build_solver
    from multigrid_tpu.mesh.brick import poisson_cube_mesh

    mesh = poisson_cube_mesh(4)
    ref = build_solver(mesh, 4, dp_impl="ozaki")
    s = build_solver(mesh, 4, sp_impl="pallas_windowed", dp_impl="ozaki")
    assert s._sp_win, "windowed smoother path not installed"
    sol_ref, its_ref, red_ref = ref.solve_cg()
    sol, its, red = s.solve_cg()
    assert its == its_ref
    assert red == pytest.approx(red_ref, rel=2e-2)
    np.testing.assert_allclose(np.asarray(sol), np.asarray(sol_ref),
                               atol=1e-9)
    # FMG stops after a fixed cycle count, so the two smoothers' rounding
    # difference (bf16-limb vs XLA HIGHEST, both ~2^-24/op) shows directly
    # in the transient — ~1e-5 here, far below the 1.2e-2 discretization
    # error at 4913 dofs.  The converged CG comparison above is the tight
    # equivalence check.
    f_ref = np.asarray(ref.solve())
    f = np.asarray(s.solve())
    np.testing.assert_allclose(f, f_ref, atol=3e-5 * np.abs(f_ref).max())
    L = ref.maxlevel
    e_ref = float(ref.l2_error(L, jnp.asarray(f_ref)))
    e = float(s.l2_error(L, jnp.asarray(f)))
    assert e == pytest.approx(e_ref, rel=1e-3)


def test_non_p4_degree_falls_back_cleanly():
    """sp_impl=pallas_windowed on a degree != 4 problem must install no
    windowed levels and still solve with transcript-grade behavior."""
    from experiments.poisson_cube import build_solver
    from multigrid_tpu.mesh.brick import poisson_cube_mesh

    s = build_solver(poisson_cube_mesh(6), 2, sp_impl="pallas_windowed",
                     dp_impl="ozaki")
    assert not s._sp_win
    sol, its, red = s.solve_cg()
    assert its <= 9 and red < 0.12


def test_windowed_disables_under_distributed():
    """DistributedMultigrid replaces the sharding hook; the windowed sp
    path (single-device layout) must silently step aside and the
    distributed solve must still match the reference anchors."""
    from experiments.poisson_cube import build_solver
    from multigrid_tpu.mesh.brick import poisson_cube_mesh
    from multigrid_tpu.parallel.distributed import DistributedMultigrid
    from multigrid_tpu.parallel.sharding import make_mesh

    mesh = poisson_cube_mesh(4)
    s = build_solver(mesh, 4, sp_impl="pallas_windowed", dp_impl="ozaki")
    assert s._sp_win
    DistributedMultigrid(s, make_mesh(2, ("z",)))
    assert s._constrain is not s._constrain_default
    sol, its, red = s.solve_cg()
    assert its == 8
    assert red == pytest.approx(6.709e-2, rel=2e-2)


def test_fully_windowed_pair_cg():
    """dp pair CG + windowed sp preconditioner (interpret): the
    zero-relayout hot loop (cg.cg_solve_stepped_pair precond_win) must
    reproduce the node-path CG iteration count and solution."""
    from experiments.poisson_cube import build_solver
    from multigrid_tpu.mesh.brick import poisson_cube_mesh

    mesh = poisson_cube_mesh(4)
    ref = build_solver(mesh, 4, dp_impl="ozaki")
    sol_ref, its_ref, red_ref = ref.solve_cg()
    s = build_solver(mesh, 4, sp_impl="pallas_windowed",
                     dp_impl="pallas_windowed")
    assert s._sp_win and getattr(s.dp_ops[s.maxlevel], "win", None) is not None
    sol, its, red = s.solve_cg()
    assert "step_pc" in s._cg_step_cache   # the pair-stepped path ran
    assert its == its_ref
    assert red == pytest.approx(red_ref, rel=2e-2)
    np.testing.assert_allclose(np.asarray(sol), np.asarray(sol_ref),
                               atol=1e-9)


def test_cheb_alias_inplace_bitexact(monkeypatch):
    """The in-place cheb pass (MGT_CHEB_ALIAS: output aliases x_old's
    buffer, no _finish pad pass) must be BIT-identical to the blocked+pad
    path on invariant-respecting inputs (boundary-zero, zero pad rows)."""
    from multigrid_tpu.ops.pallas_windowed_sp import FusedChebyshev

    grid = make_grid((2, 4, 4))
    op = PallasWindowedSP(grid, cy_chunk=2, interpret=True)
    lap = LaplaceOperator(grid, jnp.float32, make_diag_coef(grid))
    op.install_diag_factors(lap)
    inv = windowed_inv_diag_factory(op, lap)
    rng = np.random.default_rng(21)

    def wvec(seed):
        r = np.random.default_rng(seed).standard_normal(grid.shape)
        return op.to_windowed(jnp.where(
            op.interior, jnp.asarray(r, jnp.float32), 0))

    x, x_old, b = wvec(1), wvec(2), wvec(3)
    ref = np.asarray(op.cheb_fused(x, x_old, b, 0.37, 0.81))
    monkeypatch.setenv("MGT_CHEB_ALIAS", "1")
    got = np.asarray(op.cheb_fused(x, x_old, b, 0.37, 0.81))
    np.testing.assert_array_equal(got, ref)
    # whole-smoother equivalence under the knob (vmult + step)
    fus = FusedChebyshev(op, inv, 1.7, 1.3, 3, 1.0, 0.1)
    monkeypatch.delenv("MGT_CHEB_ALIAS")
    want_v, want_s = fus.vmult(b), fus.step(x_old, b)
    monkeypatch.setenv("MGT_CHEB_ALIAS", "1")
    np.testing.assert_array_equal(np.asarray(fus.vmult(b)),
                                  np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(fus.step(x_old, b)),
                                  np.asarray(want_s))
