"""Chebyshev smoother with CG-Lanczos eigenvalue estimation.

TPU-native reimplementation of the deal.II ``PreconditionChebyshev``
semantics the reference relies on (/root/reference/common/multigrid_solver.h:268-291):

* eigenvalue estimation by ``eig_cg_n_iterations`` steps of diagonal-
  preconditioned CG, reading the Lanczos tridiagonal off the CG
  coefficients; deterministic ``i % 11 - mean`` start vector;
* Chebyshev interval ``[max_eig / smoothing_range, 1.2 * max_eig]`` for
  smoothing (range > 1), or ``[min(0.9 max, min_est), 1.2 max]`` with an
  automatically chosen degree for the Chebyshev-as-coarse-solver mode
  (smoothing_range = 1e-3, degree = invalid in the reference);
* first-kind recurrence with factors ``factor1 = rho_new * rho_old``,
  ``factor2 = 2 rho_new / delta`` — the exact update the reference fuses
  into its DG kernel (/root/reference/common/laplace_operator_dg.h:1839-1860);
* fourth-kind (Phillips/Lottes) variant used by the pure-double solver
  specialization (/root/reference/common/multigrid_solver.h:945-963).

``degree`` counts preconditioner applications: ``vmult`` (zero initial
guess) costs ``degree`` diagonal scalings and ``degree - 1`` operator
applications, ``step`` costs ``degree`` of each.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

FIRST_KIND = "first_kind"
FOURTH_KIND = "fourth_kind"


def _vdot(a, b):
    """f64 dots ride ops/df64.dot_f64: XLA:TPU f64 reductions are ~100x
    slow AND pick a reduced-precision strategy inside scan bodies
    (CLAUDE.md); f32 dots stay native."""
    if a.dtype == jnp.float64:
        from ..ops.df64 import dot_f64

        return dot_f64(a, b)
    return jnp.vdot(a, b)


def eig_estimate_start_vector(shape, dtype, mask=None) -> jnp.ndarray:
    """deal.II's deterministic high-frequency start vector: global index
    mod 11, mean subtracted.  Built ON DEVICE (iota % 11 − closed-form
    mean): the host-materialized version shipped the full vector over the
    device link — 540 MB ≈ 36 s of the flagship smoother setup."""
    n = int(np.prod(shape))
    # exact mean of (i % 11) over i < n, in f64 on the host
    q, r = divmod(n, 11)
    mean = (q * 55.0 + r * (r - 1) / 2.0) / n

    @jax.jit
    def build():
        i = jax.lax.iota(jnp.int32, n)
        v = (i % 11).astype(dtype) - jnp.asarray(mean, dtype)
        return v.reshape(shape)

    return build()


def _lanczos_init(precond: Callable, rhs: jnp.ndarray, dot=None):
    dot = _vdot if dot is None else dot
    z0 = precond(rhs)
    rz0 = dot(rhs, z0)
    # stop contributing once CG has converged to rounding level (the
    # reference's full-size coarse-level estimate relies on deal.II's
    # CG stopping early; stagnated Lanczos tails would pollute T)
    eps = jnp.finfo(rhs.dtype).eps
    floor = (100.0 * eps) ** 2 * rz0
    return (rhs, z0, rz0, jnp.asarray(True)), floor


def _lanczos_step(vmult: Callable, precond: Callable, floor, carry,
                  dot=None):
    """One CG-Lanczos iteration (shared by the scan and host-stepped
    sweeps — the recurrences MUST stay identical).  ``dot``: override for
    duplicated-representation vectors (block-padded layout: dedup-weighted
    inner products keep the estimate identical to the true dof space)."""
    dot = _vdot if dot is None else dot
    r, p, rz, valid = carry
    q = vmult(p)
    pq = dot(p, q)
    ok = valid & (pq > 0) & (rz > floor)
    alpha = jnp.where(ok, rz / jnp.where(pq == 0, 1.0, pq), 0.0)
    r2 = r - alpha * q
    z = precond(r2)
    rz2 = dot(r2, z)
    beta = jnp.where(ok, rz2 / jnp.where(rz == 0, 1.0, rz), 0.0)
    p2 = z + beta * p
    carry = (
        jnp.where(ok, r2, r),
        jnp.where(ok, p2, p),
        jnp.where(ok, rz2, rz),
        ok & (rz2 > 0),
    )
    return carry, (alpha, beta, ok)


def lanczos_body(
    vmult: Callable,
    precond: Callable,
    n_iterations: int,
    rhs: jnp.ndarray,
    dot=None,
):
    """Traced CG-Lanczos sweep: one ``lax.scan`` returning the CG
    coefficient streams (alphas, betas, validity mask).  Kept jit-free so
    callers can bake it into larger jitted programs with the operator's
    coefficients as ARGUMENTS (one compile across Newton steps)."""
    carry, floor = _lanczos_init(precond, rhs, dot)
    _, (alphas, betas, oks) = jax.lax.scan(
        lambda c, _: _lanczos_step(vmult, precond, floor, c, dot),
        carry, None, length=n_iterations)
    return alphas, betas, oks


def lanczos_host_stepped(
    vmult: Callable,
    precond: Callable,
    n_iterations: int,
    rhs: jnp.ndarray,
    dot=None,
):
    """Host-stepped CG-Lanczos for the LONG coarse-level estimates (the
    reference runs the coarsest estimate to the full matrix size,
    /root/reference/common/multigrid_solver.h:284).  A length-n
    ``lax.scan`` over the tiny coarse operator is a pathological XLA:TPU
    compile — measured 982 s at n = 125 dofs on the remote-compile path
    (docs/tpu_r3/bench_setuptiming.log) — while one stepped iteration
    compiles in ~1 s.  The step writes its (alpha, beta, ok) stream into
    donated device buffers, dispatches queue asynchronously, and the
    host syncs ONCE at the end; the recurrence is _lanczos_step, shared
    with the scan path (identical math)."""
    carry0, floor = jax.jit(lambda r: _lanczos_init(precond, r, dot))(rhs)

    # CHUNKED dispatch: one host round-trip per CHUNK Lanczos steps, not
    # per step — at 125 steps on a slow tunnel day the per-dispatch
    # latency alone cost 64 s of setup (bench_setup26, 2026-08-20) while
    # the same estimate ran in 6.4 s on a fast day.  A short fixed-length
    # in-step scan compiles in seconds (vs 982 s for the full-length
    # scan); the remainder chunk is a second small program.  The step
    # recurrence is _lanczos_step, shared with the scan path — the
    # (alpha, beta, ok) streams are IDENTICAL to the one-step form.
    CHUNK = 8

    def _make_stepper(k):
        @partial(jax.jit, donate_argnums=(0,))
        def stepk(state, floor):
            carry, alphas, betas, oks, i = state
            carry, (a, b, ok) = jax.lax.scan(
                lambda c, _: _lanczos_step(vmult, precond, floor, c, dot),
                carry, None, length=k)
            alphas = jax.lax.dynamic_update_slice_in_dim(alphas, a, i, 0)
            betas = jax.lax.dynamic_update_slice_in_dim(betas, b, i, 0)
            oks = jax.lax.dynamic_update_slice_in_dim(oks, ok, i, 0)
            return (carry, alphas, betas, oks, i + k)

        return stepk

    dt = rhs.dtype
    state = (carry0, jnp.zeros(n_iterations, dt), jnp.zeros(n_iterations, dt),
             jnp.zeros(n_iterations, bool), jnp.asarray(0, jnp.int32))
    n_full, rem = divmod(n_iterations, CHUNK)
    if n_full:
        step_full = _make_stepper(CHUNK)
        for _ in range(n_full):
            state = step_full(state, floor)
    if rem:
        state = _make_stepper(rem)(state, floor)
    return state[1], state[2], state[3]


def tridiag_extremes(alphas_d, betas_d, oks) -> tuple[float, float]:
    """Host part: Lanczos tridiagonal off the CG coefficients -> extreme
    Ritz values."""
    oks = np.asarray(oks)
    k = int(oks.sum())
    alphas = [float(a) for a in np.asarray(alphas_d)[:k]]
    betas = [float(b) for b in np.asarray(betas_d)[:k]]
    if not alphas:
        return 1.0, 1.0
    diag = np.array([
        1.0 / alphas[i] + (betas[i - 1] / alphas[i - 1] if i > 0 else 0.0)
        for i in range(k)
    ])
    off = np.array([np.sqrt(betas[i]) / alphas[i] for i in range(k - 1)])
    try:
        # O(k^2) tridiagonal solver: the coarse level runs the estimate to
        # the full matrix size (k ~ n_dofs), where the dense O(k^3) eigvalsh
        # costs ~25 s of single-core setup time at k ~ 5000
        from scipy.linalg import eigvalsh_tridiagonal

        eigs = eigvalsh_tridiagonal(diag, off)
    except ImportError:  # pragma: no cover
        T = np.diag(diag)
        T[np.arange(k - 1), np.arange(1, k)] = off
        T[np.arange(1, k), np.arange(k - 1)] = off
        eigs = np.linalg.eigvalsh(T)
    return float(eigs[-1]), float(eigs[0])


def estimate_eigenvalues(
    vmult: Callable,
    precond: Callable,
    n_iterations: int,
    rhs: jnp.ndarray,
    dot=None,
) -> tuple[float, float]:
    """Largest/smallest eigenvalue estimate of P^{-1} A by CG-Lanczos.

    Runs the whole CG as one ``lax.scan`` (a single device program — eager
    per-iteration dispatch is prohibitively slow over remote-TPU links);
    breakdown iterations are masked out and trimmed on the host.
    """
    import os
    import time

    if (n_iterations > 64
            and os.environ.get("MGT_EIG_SCAN") in (None, "", "0")):
        # long coarse-level estimates: host-stepped (see
        # lanczos_host_stepped — kills a pathological length-n scan
        # compile on XLA:TPU)
        t0 = time.perf_counter()
        alphas_d, betas_d, oks = lanczos_host_stepped(
            vmult, precond, n_iterations, rhs, dot)
        oks = jax.block_until_ready(oks)
        if os.environ.get("MGT_SETUP_TIMING"):
            print(f"#   eig-estimate n={rhs.size} (host-stepped, "
                  f"{n_iterations} its): {time.perf_counter()-t0:.2f} s",
                  flush=True)
        return tridiag_extremes(alphas_d, betas_d, oks)

    run = jax.jit(lambda r: lanczos_body(vmult, precond, n_iterations, r,
                                         dot))
    if os.environ.get("MGT_SETUP_TIMING"):
        # split compile (trace+lower+backend compile) from the device run
        # so setup-time hot spots attribute correctly (setup smoother[l])
        t0 = time.perf_counter()
        compiled = run.lower(rhs).compile()
        t1 = time.perf_counter()
        alphas_d, betas_d, oks = jax.block_until_ready(compiled(rhs))
        t2 = time.perf_counter()
        print(f"#   eig-estimate n={rhs.size}: compile {t1-t0:.2f} s, "
              f"run {t2-t1:.2f} s", flush=True)
    else:
        alphas_d, betas_d, oks = run(rhs)
    return tridiag_extremes(alphas_d, betas_d, oks)


def interval_from_spectrum(
    max_eig: float,
    min_eig: float,
    smoothing_range: float,
    degree: Optional[int],
    kind: str = FIRST_KIND,
) -> tuple[float, float, int]:
    """deal.II PreconditionChebyshev interval + degree conventions
    (see :meth:`Chebyshev.create`); returns (theta, delta, n_apps)."""
    max_est = 1.2 * max_eig
    if smoothing_range > 1.0:
        alpha_lb = max_est / smoothing_range
    else:
        alpha_lb = min(0.9 * max_est, min_eig)
    if degree is None:
        actual_range = max_est / alpha_lb if alpha_lb > 0 else 1e4
        sigma = (1.0 - np.sqrt(1.0 / actual_range)) / (
            1.0 + np.sqrt(1.0 / actual_range)
        )
        eps = smoothing_range
        degree = int(
            1
            + np.log(1.0 / eps + np.sqrt(1.0 / eps / eps - 1.0))
            / np.log(1.0 / sigma)
        )
    n_apps = int(degree) + 1 if kind == FIRST_KIND else int(degree)
    theta = 0.5 * (max_est + alpha_lb)
    delta = 0.5 * (max_est - alpha_lb)
    return float(theta), float(delta), n_apps


@dataclass
class Chebyshev:
    """Smoother object bound to one level's operator and diagonal."""

    vmult_op: Callable            # x -> A x
    precond: Callable             # r -> P^{-1} r
    theta: float
    delta: float
    degree: int
    max_eig: float
    min_eig: float
    kind: str = FIRST_KIND

    @staticmethod
    def create(
        vmult_op: Callable,
        inv_diag: Optional[jnp.ndarray],
        smoothing_range: float,
        degree: Optional[int],
        eig_cg_n_iterations: int,
        kind: str = FIRST_KIND,
        max_estimate_iterations: Optional[int] = None,
        precond: Optional[Callable] = None,
        example: Optional[jnp.ndarray] = None,
    ) -> "Chebyshev":
        if precond is None:
            precond = lambda r: inv_diag * r
        if example is None:
            example = inv_diag
        # the reference's coarse level runs the estimate to the full matrix
        # size (multigrid_solver.h:284); no silent cap
        n_it = eig_cg_n_iterations
        if max_estimate_iterations is not None:
            n_it = min(n_it, max_estimate_iterations)
        rhs0 = eig_estimate_start_vector(example.shape, example.dtype)
        max_eig, min_eig = estimate_eigenvalues(vmult_op, precond, n_it, rhs0)
        # deal.II PreconditionChebyshev interval conventions: the Lanczos
        # top Ritz value is boosted by the 1.2 safety factor FIRST
        # (max_eigenvalue_estimate = 1.2 * lambda_hat) and BOTH interval
        # ends derive from the boosted value, so the interval ratio is
        # exactly ``smoothing_range``.  (Getting this wrong — boosting only
        # the upper end — widens the ratio to 1.2*range and visibly changes
        # the reference's V-cycle reductions and CG iteration counts.)
        # ``degree`` carries deal.II semantics: k operator applications in
        # ``vmult`` and an error polynomial of degree k+1 per pass.  The
        # recurrence below counts preconditioner applications, i.e. its
        # count is k+1 (vmult: k+1 diagonal scalings, k matvecs).  The
        # k+1-degree polynomial (not k, not 2k) together with the exact
        # interval (interval_from_spectrum) reproduces the reference
        # transcript's V-cycle reductions 0.109/0.161/0.182/0.132 and
        # cg_its = 8 row-for-row (/root/reference/README.md:136-159).
        theta, delta, n_apps = interval_from_spectrum(
            max_eig, min_eig, smoothing_range, degree, kind
        )
        return Chebyshev(
            vmult_op=vmult_op,
            precond=precond,
            theta=theta,
            delta=delta,
            degree=n_apps,
            max_eig=max_eig,
            min_eig=min_eig,
            kind=kind,
        )

    # ------------------------------------------------------- first kind
    def _first_kind_loop(self, x, x_old, b):
        """degree-1 iterations of the first-kind recurrence, rolled into a
        fori_loop (large auto-degrees on the coarse level would otherwise
        unroll into huge XLA graphs)."""
        th, de = self.theta, self.delta
        # ``degree`` may be a traced scalar (pytree-parameterized solvers
        # pass the auto-chosen coarse degree as a jit argument so Newton
        # steps don't recompile); fori_loop accepts dynamic trip counts
        static_deg = isinstance(self.degree, (int, np.integer))
        if static_deg and self.degree <= 1:
            return x

        def body(_, s):
            x, x_old, rho = s
            r = b - self.vmult_op(x)
            rho_new = 1.0 / (2.0 * th / de - rho)
            f1 = rho_new * rho
            f2 = 2.0 * rho_new / de
            x_new = x + f1 * (x - x_old) + f2 * self.precond(r)
            return (x_new, x, rho_new)

        rho0 = jnp.asarray(de / th, x.dtype)
        # NOTE: measured at the 135M flagship — the fori_loop form has a
        # LOWER peak than unrolling (the loop carries force in-place buffer
        # reuse that the scheduler does not reproduce on the unrolled graph)
        x, _, _ = jax.lax.fori_loop(0, self.degree - 1, body, (x, x_old, rho0))
        return x

    def vmult(self, b: jnp.ndarray) -> jnp.ndarray:
        """dst = Cheb(A, P) b with zero initial guess."""
        if self.kind == FOURTH_KIND:
            return self._fourth(jnp.zeros_like(b), b, first_residual_is_b=True)
        x_old = jnp.zeros_like(b)
        x = self.precond(b) * (1.0 / self.theta)
        return self._first_kind_loop(x, x_old, b)

    def step(self, x0: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """One smoothing pass starting from ``x0`` (deal.II ``step``)."""
        if self.kind == FOURTH_KIND:
            return self._fourth(x0, b, first_residual_is_b=False)
        r = b - self.vmult_op(x0)
        x = x0 + self.precond(r) * (1.0 / self.theta)
        return self._first_kind_loop(x, x0, b)

    # ------------------------------------------------------ fourth kind
    def _fourth(self, x0, b, first_residual_is_b: bool):
        """Fourth-kind Chebyshev (Phillips/Lottes), deal.II variant used at
        /root/reference/common/multigrid_solver.h:951-952."""
        rho = 1.2 * self.max_eig  # upper bound of the spectrum
        if first_residual_is_b:
            r = b
            x = jnp.zeros_like(b)
        else:
            r = b - self.vmult_op(x0)
            x = x0
        dx = (4.0 / 3.0) / rho * self.precond(r)
        x = x + dx

        def body(k, s):
            x, dx, r = s
            kf = k.astype(x.dtype)
            r = r - self.vmult_op(dx)
            z = self.precond(r)
            dx = ((2.0 * kf - 3.0) / (2.0 * kf + 1.0)) * dx + (
                (8.0 * kf - 4.0) / ((2.0 * kf + 1.0) * rho)
            ) * z
            return (x + dx, dx, r)

        x, _, _ = jax.lax.fori_loop(2, self.degree + 1, body, (x, dx, r))
        return x
