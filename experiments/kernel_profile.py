"""Windowed-kernel micro-profile at the flagship level (pure windowed I/O).

fmg_profile's smoother probes wrap every piece in to/from_windowed node
relayouts (~19 ms each way at 513^3), which muddies the per-pass numbers.
This probe times the fused kernels and the pair vector ops on PERSISTENT
windowed operands — the layouts the solve hot loops actually use — plus
cy_chunk kernel variants, to locate the remaining gap between the
measured passes and their HBM/MXU speed-of-light (docs/GAPS.md #3: the
L7 V-cycle body).

All pieces are donated-carry jit chains (dispatch RTT amortized);
executables are dropped between probes (jit executables occupy HBM,
fmg_profile note).  Cf. the reference's per-level timing matrix
(/root/reference/common/multigrid_solver.h:347-371).

Usage: python experiments/kernel_profile.py [size=128] [reps=10] [impl=auto]
(``impl=win`` forces the windowed paths — CPU/interpret smoke tier)
"""

import gc
import sys
import time

sys.path.insert(0, ".")


def _timed(name, fn, x0, reps, extra=(), donate=True, keep=False):
    import jax

    f = jax.jit(fn, donate_argnums=0 if donate else ())
    x = f(x0, *extra)
    jax.block_until_ready(x)  # warm/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        x = f(x, *extra)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:<46s} {dt*1e3:9.2f} ms", flush=True)
    del x, f
    if not keep:
        gc.collect()
        jax.clear_caches()
    return dt


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    impl = sys.argv[3] if len(sys.argv) > 3 else "auto"
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from experiments.poisson_cube import (build_solver, resolve_dp_impl,
                                          resolve_sp_impl)
    from multigrid_tpu.mesh.brick import poisson_cube_mesh
    from multigrid_tpu.ops import pairvec as pv

    if impl == "win":
        sp_i = dp_i = "pallas_windowed"
    else:
        sp_i, dp_i = resolve_sp_impl(impl), resolve_dp_impl(impl)
    solver = build_solver(poisson_cube_mesh(size), 4,
                          sp_impl=sp_i, dp_impl=dp_i)
    L = solver.maxlevel
    g = solver.grids[L]
    print(f"# windowed kernel profile at {g.n_dofs} dofs ({size}^3 cells), "
          f"reps={reps}")
    assert L in solver._sp_win, "windowed smoother path not installed"
    opw, smw = solver._sp_win[L]
    win = solver.dp_ops[L].win
    Z, Yp, G = g.shape[0], opw.Yp, opw.G

    def spw0():
        return jnp.zeros((Z, Yp, G), jnp.float32)

    def pair0():
        return jnp.zeros((Z, 2, Yp, G), jnp.float32)

    # ---- sp kernel passes (windowed in/out, zero relayouts) ----
    t_mv = _timed("sp vmult_windowed (bare pass)",
                  opw.vmult_windowed, spw0(), reps)
    _timed("sp resid_fused (b - Ax pass)",
           opw.resid_fused, spw0(), reps, extra=(spw0(),))
    _timed("sp cheb_fused (x+f1(x-xo)+f2 D^-1 r pass)",
           lambda x, xo, b: opw.cheb_fused(x, xo, b, 0.5, 0.3),
           spw0(), reps, extra=(spw0(), spw0()))
    _timed("  smoother vmult (windowed, in-layout)",
           smw.vmult, spw0(), reps)
    _timed("  smoother step (windowed, in-layout)",
           smw.step, spw0(), reps, extra=(spw0(),))
    _timed("  node relayout roundtrip (reference pt)",
           lambda d: opw.from_windowed(opw.to_windowed(d)),
           jnp.zeros(g.shape, jnp.float32), reps)

    # ---- V-cycle composition on windowed operands ----
    wt = solver._win_transfers.get(L)
    if wt is not None:
        _timed("win transfer roundtrip (restrict+prolong)",
               lambda w: wt.prolongate_win(wt.restrict_win(w)), spw0(), reps)
    _timed(f"subtree v_cycle(L{L-1}, n=1) (node in/out)",
           lambda d: solver.v_cycle(L - 1, d, 1),
           jnp.zeros(solver.grids[L - 1].shape, jnp.float32), reps)
    _timed(f"v_cycle core(L{L}, n=1) (windowed in/out)",
           lambda d: solver._v_cycle_windowed_core(L, d, 1), spw0(), reps)
    _timed(f"v_cycle core(L{L}, n={solver.n_cycles}) (windowed in/out)",
           lambda d: solver._v_cycle_windowed_core(L, d, solver.n_cycles),
           spw0(), reps)

    # ---- dp pair kernel + pair vector ops (the CG iteration set) ----
    t_dp = _timed("dp pair vmult_windowed (bare pass)",
                  win.vmult_windowed, pair0(), reps)
    rhs_w = jax.jit(lambda r: win.to_windowed(
        jnp.where(win.interior, r, 0)))(solver.rhs[L])
    _timed("dp residual_defect_win_pair (scalar carry)",
           lambda s, x, r: s + win.residual_defect_win_pair(r, x)[0, 0, 0],
           jnp.zeros((), jnp.float32), reps, extra=(pair0(), rhs_w))
    del rhs_w
    w = win.dup_weights()
    _timed("pair_axpy (y += a x)",
           lambda y, x: pv.pair_axpy(y, x, 0.7), pair0(), reps,
           extra=(pair0(),))
    _timed("pair_dot (scalar carry)",
           lambda s, a, b: s + pv.pair_dot(a, b, w),
           jnp.zeros((), jnp.float64), reps, extra=(pair0(), pair0()))
    _timed("pair_norm_f32 (scalar carry)",
           lambda s, a: s + pv.pair_norm_f32(a, w),
           jnp.zeros((), jnp.float32), reps, extra=(pair0(),))
    pro = getattr(solver, "_pro_win", {}).get(L)
    if pro is not None:
        _timed("pair FMG prolongate (scalar carry)",
               lambda s, c: s + pro.prolongate_win(c)[0, 0, 0, 0],
               jnp.zeros((), jnp.float32), reps,
               extra=(jnp.zeros(solver.grids[L - 1].shape, jnp.float64),))

    # ---- kernel-variant sweep: cy_chunk grid-step size ----
    del solver, opw, smw, win
    gc.collect()
    jax.clear_caches()
    from multigrid_tpu.ops.pallas_windowed import PallasWindowedOzaki
    from multigrid_tpu.ops.pallas_windowed_sp import PallasWindowedSP

    interp = jax.default_backend() != "tpu"
    for cyc in (16, 32, 64, 128):
        if cyc > g.cells[1]:
            continue
        op = PallasWindowedSP(g, None, cy_chunk=cyc, interpret=interp)
        _timed(f"sp vmult_windowed cy_chunk={cyc}",
               op.vmult_windowed, spw0(), reps)
        del op
        gc.collect()
        jax.clear_caches()
    for cyc in (16, 32, 64):
        if cyc > g.cells[1]:
            continue
        op = PallasWindowedOzaki(g, None, cy_chunk=cyc, interpret=interp)
        _timed(f"dp pair vmult_windowed cy_chunk={cyc}",
               op.vmult_windowed, pair0(), reps)
        del op
        gc.collect()
        jax.clear_caches()

    # HBM/MXU speed-of-light context for the bare passes
    plane = Z * Yp * G * 4 / 1e9
    print(f"# one windowed plane = {plane:.3f} GB; bare sp pass streams "
          f"2 planes, cheb streams 4; dp pair pass streams 4.")
    print(f"# sp bare {t_mv*1e3:.1f} ms vs ~{2*plane/0.8*1e3:.1f} ms at "
          f"0.8 TB/s; dp bare {t_dp*1e3:.1f} ms vs "
          f"~{max(4*plane/0.8, 1.97)*1e3:.1f} ms (HBM vs 28-block MXU).")


if __name__ == "__main__":
    main()
