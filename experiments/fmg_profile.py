"""Decompose the flagship FMG wall time into per-level jitted pieces.

The FMG solve is ONE device program (solvers/multigrid.MultigridSolver
.solve), so driver-side timers cannot attribute its cost.  This probe
times each constituent piece as its own donated-carry jit chained
back-to-back (reps queued, one block — dispatch RTT amortized exactly like
the solve loops), which bounds the pieces' standalone cost.  The pieces
overlap less well than inside the fused program, so the sum is an UPPER
bound on the in-program cost; large gaps between the sum and the measured
FMG time indicate glue XLA schedules away, small pieces that blow up
standalone indicate relayout overhead.

Usage: python experiments/fmg_profile.py [size=128] [reps=5]
(cf. the reference's per-level timing matrix,
/root/reference/common/multigrid_solver.h:347-371)
"""

import sys
import time

sys.path.insert(0, ".")


def _timed(name, build_fn, x0, reps, extra=()):
    """Time ``build_fn(carry, *extra)`` as a donated-carry chain.  ``extra``
    operands (e.g. the solver's rhs/u_bc lists) MUST ride as jit arguments:
    as closure constants they embed into the compile payload (1.2 GB of
    rhs at the flagship hung the remote compile server).  Each piece's
    executable is dropped afterwards: jit executables occupy device
    memory, and at the flagship the accumulated pieces exhaust HBM and
    hang the NEXT piece's compile (observed: the dp-transfer piece never
    returned after whole-FMG + v_cycle + residual stayed cached)."""
    import gc

    import jax

    f = jax.jit(build_fn, donate_argnums=0)
    x = f(x0, *extra)
    jax.block_until_ready(x)  # warm/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        x = f(x, *extra)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:<42s} {dt*1e3:9.2f} ms", flush=True)
    del x, f
    gc.collect()
    jax.clear_caches()
    return dt


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from experiments.poisson_cube import (build_solver, resolve_dp_impl,
                                          resolve_sp_impl)
    from multigrid_tpu.mesh.brick import poisson_cube_mesh

    solver = build_solver(poisson_cube_mesh(size), 4,
                          sp_impl=resolve_sp_impl("auto"),
                          dp_impl=resolve_dp_impl("auto"))
    L = solver.maxlevel
    n_dofs = solver.grids[L].n_dofs
    print(f"# fmg decomposition at {n_dofs} dofs ({size}^3 cells), "
          f"reps={reps}")

    # whole solve first (the number the pieces should explain)
    # scalar output + carry dependency: queued reps must not each hold a
    # 1.08 GB solution buffer (HBM rule), and must still serialize
    # NOTE [0, 0, 0]: the probe's carry must stay a SCALAR — an earlier
    # [0, 0] version returned a length-X row, so the carry changed shape
    # after the warm-up call and the first timed rep silently recompiled
    # the entire flagship FMG (~215 s burned into a 5-rep average).
    t_fmg = _timed("fmg solve (1 program)",
                   lambda u, rhs, ubc: (solver._fmg(rhs, ubc)[-1][0, 0, 0]
                                        .astype(jnp.float32) + u),
                   jnp.zeros((), jnp.float32), reps,
                   extra=(solver.rhs, solver.u_bc))

    total = 0.0
    n_tail = 4
    for l in range(L, max(L - n_tail, 0), -1):
        g = solver.grids[l]
        # donate_argnums=0 consumes the carry's buffer — every _timed call
        # needs its OWN zeros array (a shared one is deleted by the first)
        sp0 = lambda _g=g: jnp.zeros(_g.shape, solver.v_dtype)
        dp0 = jnp.zeros(g.shape, solver.f_dtype)
        # FMG runs n_cycles V-cycles at every level from l upward
        t_v = _timed(f"v_cycle(L{l}, n={solver.n_cycles})",
                     lambda d, _l=l: solver.v_cycle(
                         _l, d, solver.n_cycles), sp0(), reps)
        t_r = _timed(f"dp residual(L{l})",
                     lambda s, b, _l=l: solver.dp_ops[_l].vmult_residual(
                         b, s), dp0, reps, extra=(solver.rhs[l],))
        cp0 = jnp.zeros(solver.grids[l - 1].shape, solver.f_dtype)
        t_p = _timed(f"dp prolongate+restrict roundtrip(L{l})",
                     lambda c, _l=l: solver.transfers_nobc[_l].restrict(
                         solver.transfers_nobc[_l].prolongate(c)), cp0, reps)
        total += t_v + t_r + t_p
        # the V-cycle's own sp transfers (constrained): 2 restrict +
        # 2 prolongate per n=2 cycle at this level — glue suspect #2
        cs0 = jnp.zeros(solver.grids[l - 1].shape, solver.v_dtype)
        _timed(f"  sp prolongate+restrict roundtrip(L{l})",
               lambda c, _l=l: solver.transfers[_l].restrict(
                   solver.transfers[_l].prolongate(c)), cs0, reps)
        if l in getattr(solver, "_sp_win", {}):
            opw, smw = solver._sp_win[l]
            _timed(f"  windowed smoother vmult(L{l})",
                   lambda d, _s=smw, _o=opw: _o.from_windowed(
                       _s.vmult(_o.to_windowed(d))), sp0(), reps)
            _timed(f"  windowed smoother step(L{l})",
                   lambda d, _s=smw, _o=opw: _o.from_windowed(
                       _s.step(_o.to_windowed(d), _o.to_windowed(d))),
                   sp0(), reps)
            _timed(f"  windowed resid_fused(L{l})",
                   lambda d, _o=opw: _o.from_windowed(
                       _o.resid_fused(_o.to_windowed(d), _o.to_windowed(d))),
                   sp0(), reps)
            _timed(f"  to/from_windowed relayout(L{l})",
                   lambda d, _o=opw: _o.from_windowed(_o.to_windowed(d)),
                   sp0(), reps)
        else:
            _timed(f"  node smoother vmult(L{l})",
                   lambda d, _l=l: solver.smoothers[_l].vmult(d), sp0(), reps)
    print(f"{f'sum of pieces ({n_tail} finest levels)':<42s} "
          f"{total*1e3:9.2f} ms   vs fmg {t_fmg*1e3:.2f} ms")


if __name__ == "__main__":
    main()
