"""Interpret-mode correctness of the fused Mosaic DG kernels
(ops/pallas_dg) vs the sweep operator oracle (ops/dg.DGLaplace).

CPU/interpret parity is NECESSARY but not sufficient: TPU precision and
Mosaic fusion behaviour require the hardware gate
(experiments/debug_dg.py tier + matvec_dg --impl pallas rows) before any
default flip — CLAUDE.md kernel-change rule.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.ops.dg import DGGrid, DGLaplace
from multigrid_tpu.ops.dg_stencil import DGLaplaceStencil
from multigrid_tpu.ops.pallas_dg import PallasDGOzaki, PallasDGSP


def _grid(cells, p, kind, seed=0):
    rng = np.random.default_rng(seed)
    J = np.diag(1.0 / np.array(cells)) @ (np.eye(3)
                                          + 0.08 * rng.random((3, 3)))
    return DGGrid(cells=cells, jacobian=tuple(map(tuple, J)), degree=p,
                  kind=kind)


CASES = [
    ((3, 2, 4), 3),
    ((2, 3, 2), 4),
    ((1, 1, 1), 3),   # all faces Dirichlet-mirrored
    ((1, 2, 1), 4),
    ((4, 1, 3), 3),
]


@pytest.mark.parametrize("h", [0.25, 1.0, (0.25, 0.3, 0.21)])
def test_diagonal_pow2_jacobian(h):
    """Regression: an axis-aligned J = diag(h) with power-of-two entries
    puts the gn/value trace-magnitude ratio ON a power-of-two boundary;
    per-(d, s) channel balancing then picked DIFFERENT betas for the two
    sides of a direction and the cross-side wire routing broke at 9e-3
    (caught by solver parity, 2026-08-20).  Betas are per-direction now."""
    hs = (h, h, h) if not isinstance(h, tuple) else h
    g = DGGrid(cells=(4, 4, 4), jacobian=tuple(
        tuple(hs[i] if i == j else 0.0 for j in range(3)) for i in range(3)),
        degree=3, kind="hermite")
    op = DGLaplace(g, jnp.float64)
    u = np.random.default_rng(0).standard_normal(g.shape)
    y0 = np.asarray(op.vmult(jnp.asarray(u)))
    den = np.abs(y0).max()
    ysp = np.asarray(PallasDGSP(g, interpret=True).vmult(
        jnp.asarray(u, jnp.float32)))
    ydp = np.asarray(PallasDGOzaki(g, interpret=True).vmult(jnp.asarray(u)))
    assert np.abs(ysp - y0).max() / den < 3e-6
    assert np.abs(ydp - y0).max() / den < 5e-11


@pytest.mark.parametrize("kind", ["hermite", "gll", "gauss"])
@pytest.mark.parametrize("cells,p", CASES)
def test_stencil_matches_sweep_operator(kind, cells, p):
    """Dense-stencil factorization == sweep operator at f64 (1e-14)."""
    g = _grid(cells, p, kind)
    op = DGLaplace(g, jnp.float64)
    st = DGLaplaceStencil(g)
    u = jnp.asarray(np.random.default_rng(1).standard_normal(g.shape))
    y0 = np.asarray(op.vmult(u))
    y1 = np.asarray(st.vmult_natural(u))
    assert np.abs(y1 - y0).max() / np.abs(y0).max() < 1e-14


@pytest.mark.parametrize("kind", ["hermite", "gll", "gauss"])
@pytest.mark.parametrize("cells,p", CASES)
def test_sp_kernel_interpret(kind, cells, p):
    """f32 fused kernel: f32-HIGHEST accuracy class vs the f64 oracle."""
    g = _grid(cells, p, kind)
    op = DGLaplace(g, jnp.float64)
    k = PallasDGSP(g, interpret=True)
    u = np.random.default_rng(2).standard_normal(g.shape)
    y0 = np.asarray(op.vmult(jnp.asarray(u)))
    y1 = np.asarray(k.vmult(jnp.asarray(u, jnp.float32)))
    assert np.abs(y1 - y0).max() / np.abs(y0).max() < 3e-6


@pytest.mark.parametrize("kind", ["hermite", "gll", "gauss"])
@pytest.mark.parametrize("cells,p", CASES)
def test_dp_kernel_interpret(kind, cells, p):
    """Pair-dp fused kernel: ~1e-11 class (the hardware-verified accuracy
    of the XLA dp DG operator, docs/tpu_r4/matvec_dg_dp34.log)."""
    g = _grid(cells, p, kind)
    op = DGLaplace(g, jnp.float64)
    k = PallasDGOzaki(g, interpret=True)
    u = np.random.default_rng(3).standard_normal(g.shape)
    y0 = np.asarray(op.vmult(jnp.asarray(u)))
    y1 = np.asarray(k.vmult(jnp.asarray(u)))
    assert np.abs(y1 - y0).max() / np.abs(y0).max() < 5e-11


def test_lane_padding_matches_unpadded():
    """A padded lane geometry (f_pad > cy*cx) must not change any output
    value (pad lanes zero end-to-end; the hardware default pads F to the
    128-lane tile)."""
    g = _grid((2, 2, 3), 3, "hermite")
    u = np.random.default_rng(4).standard_normal(g.shape)
    a = PallasDGSP(g, interpret=True)
    b = PallasDGSP(g, interpret=True, f_pad=16)
    ya = np.asarray(a.vmult(jnp.asarray(u, jnp.float32)))
    yb = np.asarray(b.vmult(jnp.asarray(u, jnp.float32)))
    np.testing.assert_array_equal(ya, yb)
    # pair kernel too
    c = PallasDGOzaki(g, interpret=True)
    d = PallasDGOzaki(g, interpret=True, f_pad=16)
    yc = np.asarray(c.vmult(jnp.asarray(u)))
    yd = np.asarray(d.vmult(jnp.asarray(u)))
    np.testing.assert_array_equal(yc, yd)


def test_kernel_layout_roundtrip():
    g = _grid((2, 3, 2), 4, "gll")
    k = PallasDGSP(g, interpret=True, f_pad=8)
    u = jnp.asarray(
        np.random.default_rng(5).standard_normal(g.shape), jnp.float32)
    w = k.to_kernel(u)
    assert w.shape == (g.cells[0] + 1, k.N, 8)
    np.testing.assert_array_equal(np.asarray(k.from_kernel(w[:-1])),
                                  np.asarray(u))
    kp = PallasDGOzaki(g, interpret=True, f_pad=8)
    u64 = jnp.asarray(np.random.default_rng(6).standard_normal(g.shape))
    wp = kp.to_kernel_pair(u64)
    # the (hi, lo) pair carries 48 mantissa bits: roundtrip is 2^-48 class
    np.testing.assert_allclose(
        np.asarray(kp.from_kernel_pair(wp[:-1])), np.asarray(u64),
        rtol=0, atol=2e-14)


def test_vmult_residual():
    g = _grid((2, 2, 2), 3, "gauss")
    k = PallasDGSP(g, interpret=True)
    op = DGLaplace(g, jnp.float64)
    rng = np.random.default_rng(7)
    b = rng.standard_normal(g.shape)
    x = rng.standard_normal(g.shape)
    r0 = np.asarray(op.vmult_residual(jnp.asarray(b), jnp.asarray(x)))
    r1 = np.asarray(k.vmult_residual(jnp.asarray(b, jnp.float32),
                                     jnp.asarray(x, jnp.float32)))
    assert np.abs(r1 - r0).max() / max(np.abs(r0).max(), 1e-30) < 1e-5


def test_solver_kernel_layout_parity():
    """MultigridSolverDG with the Pallas operators + kernel-layout
    smoother (dg_sp_impl='pallas', dp_impl='pallas') reproduces the XLA
    path: same CG rate class, L2 to f32-smoother accuracy."""
    from multigrid_tpu.mesh.brick import cube
    from multigrid_tpu.solvers.multigrid_dg import MultigridSolverDG

    K = 3

    def exact_fn(coords):
        out = 1.0
        for c in coords:
            out = out * np.sin(np.pi * K * c)
        return out

    def rhs_fn(coords):
        return len(coords) * (np.pi * K) ** 2 * exact_fn(coords)

    mesh = cube(2, 0.0, 1.0, 1, dim=3)
    a = MultigridSolverDG(mesh, 3, exact_fn, rhs_fn, n_pre=3, n_post=3)
    b = MultigridSolverDG(mesh, 3, exact_fn, rhs_fn, n_pre=3, n_post=3,
                          dg_sp_impl="pallas", dp_impl="pallas")
    assert b._kdg is not None
    xa, _, ra = a.solve_cg()
    xb, _, rb = b.solve_cg()
    assert abs(ra - rb) < 0.02
    ea = a.l2_error(xa, a.exact_quad)
    eb = b.l2_error(xb, b.exact_quad)
    assert abs(ea - eb) / ea < 1e-3


def test_fused_cheb_matches_reference_smoother():
    """FusedChebyshevDG tracks the f64 smoother truth.

    Accuracy contract (understood r5): on SMOOTH iterates the SIP
    operator cancels ~1e5x against the input, and the sp kernel's dense
    [N,N] limb matmuls round their f32 accumulation at the PRE-cancel
    magnitude — the same class as the shipped brick sp smoother
    (dense-element design trade-off; the sum-factorized XLA form
    localizes cancellation per 1-D stage instead).  The smoother role
    tolerates this: solver-level parity (rate + L2) is pinned by
    test_solver_kernel_layout_parity.  Here we pin (a) the fused apply
    stays within the smoother-class band of the f64 truth and (b) the
    dp kernel — which the outer CG depends on — tracks the truth to
    ~1e-6 on the SAME smooth iterate (the jump-form + compensated wire
    combine guarantee; it was 1e-1 before them)."""
    from multigrid_tpu.ops.dg_precond import JacobiTransformed
    from multigrid_tpu.ops.pallas_dg import FusedChebyshevDG, PallasDGOzaki
    from multigrid_tpu.solvers.chebyshev import FIRST_KIND, Chebyshev

    g = _grid((3, 2, 3), 3, "hermite")
    op32 = DGLaplace(g, jnp.float32)
    op64 = DGLaplace(g, jnp.float64)
    jac = JacobiTransformed(op32)
    jac64 = JacobiTransformed(op64, dtype=jnp.float64)
    spk = PallasDGSP(g, interpret=True)
    ref = Chebyshev.create(
        op32.vmult, None, smoothing_range=20.0, degree=3,
        eig_cg_n_iterations=15, kind=FIRST_KIND, precond=jac.vmult,
        example=jnp.zeros(g.shape, jnp.float32))
    truth = Chebyshev(vmult_op=op64.vmult, precond=jac64.vmult,
                      theta=ref.theta, delta=ref.delta, degree=ref.degree,
                      max_eig=ref.max_eig, min_eig=ref.min_eig,
                      kind=FIRST_KIND)

    T3 = np.kron(np.kron(np.asarray(g.basis.T), np.asarray(g.basis.T)),
                 np.asarray(g.basis.T))
    inv_diag_k = spk.to_kernel(jac.inv_diag)
    spk.install_jacobi(T3, inv_diag_k)
    T3f = jnp.asarray(T3, jnp.float32)
    T3tf = jnp.asarray(T3.T, jnp.float32)

    def jac_k(u):
        hp = jax.lax.Precision.HIGHEST
        y = jnp.einsum("mn,znf->zmf", T3tf, u, precision=hp)
        return jnp.einsum("mn,znf->zmf", T3f, y * inv_diag_k, precision=hp)

    fused = FusedChebyshevDG(spk, jac_k, theta=ref.theta, delta=ref.delta,
                             degree=ref.degree)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(g.shape), jnp.float32)
    y64 = np.asarray(truth.vmult(b.astype(jnp.float64)))
    den = np.abs(y64).max()
    y_k = np.asarray(spk.from_kernel(fused.vmult(spk.to_kernel(b))[:-1]))
    assert np.abs(y_k - y64).max() / den < 0.3          # smoother class
    # (b) dp kernel on the same smooth iterate: outer-CG-grade accuracy
    x = jac.vmult(b) * (1.0 / ref.theta)
    yA64 = np.asarray(op64.vmult(x.astype(jnp.float64)))
    kp = PallasDGOzaki(g, interpret=True)
    yA = np.asarray(kp.vmult(x.astype(jnp.float64)))
    assert np.abs(yA - yA64).max() / np.abs(yA64).max() < 1e-5
