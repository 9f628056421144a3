"""Micro-probe for the fmg_profile4 anomalies (docs/tpu_r3/fmg_profile4.log).

Two standalone costs came out wildly off-scale at the 128^3 flagship:

1. dp residual at the SMALL levels scales inversely with size
   (L4 = 194 ms at 0.27M dofs, L5 = 45 ms at 2.1M, vs L6 = 23 ms at 17M)
   — suspects: the unchunked DenseLaplaceOzaki glue at L4, f64-emulated
   elementwise tails, per-piece dispatch overhead of the probe itself.
2. The L7 OzakiMatmulTransfer prolongate+restrict roundtrip measured
   813 ms standalone while the whole FMG (which uses one prolongate per
   level) runs in 759 ms — so one side (or the HBM pressure of the
   roundtrip's f64 intermediates) must dominate.

This probe times each side/stage separately with the same donated-carry
chain methodology as experiments/fmg_profile.py.

Usage: python experiments/debug_dpsmall.py [size=128] [reps=10]
"""

import sys
import time

sys.path.insert(0, ".")


def _timed(name, build_fn, x0, reps, extra=()):
    import gc

    import jax

    f = jax.jit(build_fn, donate_argnums=0)
    x = f(x0, *extra)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(reps):
        x = f(x, *extra)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:<52s} {dt*1e3:9.2f} ms", flush=True)
    del x, f
    gc.collect()
    jax.clear_caches()
    return dt


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from experiments.poisson_cube import (build_solver, resolve_dp_impl,
                                          resolve_sp_impl)
    from multigrid_tpu.mesh.brick import poisson_cube_mesh
    from multigrid_tpu.ops.laplace import make_diag_coef
    from multigrid_tpu.ops.laplace_dense import (DenseLaplaceOzaki,
                                                 DenseLaplaceOzakiChunked)

    solver = build_solver(poisson_cube_mesh(size), 4,
                          sp_impl=resolve_sp_impl("auto"),
                          dp_impl=resolve_dp_impl("auto"))
    L = solver.maxlevel
    print(f"# dp small-level / transfer probe at {size}^3, reps={reps}")

    # ---- anomaly 1: small-level dp residual stages
    for l in (L - 3, L - 2):                      # L4, L5 at the flagship
        g = solver.grids[l]
        op = solver.dp_ops[l]
        print(f"# L{l}: {g.n_dofs} dofs, cells {g.cells}, "
              f"op {type(op).__name__}")
        dp0 = lambda: jnp.zeros(g.shape, jnp.float64)
        _timed(f"  dp vmult_residual(L{l})",
               lambda s, b, _op=op: _op.vmult_residual(b, s),
               dp0(), reps, extra=(solver.rhs[l],))
        _timed(f"  dp vmult(L{l})",
               lambda s, _op=op: _op.vmult(s), dp0(), reps)
        # elementwise tail alone: f64 where/sub on the node grid
        _timed(f"  f64 where/sub tail(L{l})",
               lambda s, b, _op=op: jnp.where(_op.interior, b - s, b),
               dp0(), reps, extra=(solver.rhs[l],))
        # the other operator flavor at this size
        try:
            alt_cls = (DenseLaplaceOzakiChunked
                       if isinstance(op, DenseLaplaceOzaki)
                       and not isinstance(op, DenseLaplaceOzakiChunked)
                       else DenseLaplaceOzaki)
            alt = alt_cls(g, getattr(op, "coef", None)
                          or make_diag_coef(g, 1.0))
            _timed(f"  dp vmult(L{l}, {alt.__class__.__name__})",
                   lambda s, _op=alt: _op.vmult(s), dp0(), reps)
        except ValueError:
            pass

    # ---- anomaly 2: L7 dp transfer, sides separated
    tr = solver.transfers_nobc[L]
    print(f"# transfer L{L}: {type(tr).__name__}")
    # one-sided probes: the donated carry keeps its own shape, the other
    # side's output folds in as a full-reduction scalar (sum needs every
    # element — no dead-code narrowing of the transfer)
    cp0 = jnp.zeros(solver.grids[L - 1].shape, jnp.float64)
    _timed("  dp prolongate(L7) alone",
           lambda c, _t=tr: c + _t.prolongate(c).astype(jnp.float32).sum()
           .astype(jnp.float64), cp0, reps)
    f0 = jnp.zeros(solver.grids[L].shape, jnp.float64)
    _timed("  dp restrict(L7) alone",
           lambda f, _t=tr: f + _t.restrict(f).astype(jnp.float32).sum()
           .astype(jnp.float64), f0, reps)
    cp1 = jnp.zeros(solver.grids[L - 1].shape, jnp.float64)
    _timed("  dp prolongate+restrict roundtrip(L7)",
           lambda c, _t=tr: _t.restrict(_t.prolongate(c)), cp1, reps)


if __name__ == "__main__":
    main()
