"""Benchmark: flagship poisson_cube FMG solve (the reference's headline).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Headline metric: full mixed-precision FMG solve throughput (DoFs/s) on the
largest ladder size that fits one chip — the reference solves the
135,005,697-dof FE_Q(4) problem in 3.6128 s on 12-core Broadwell
(/root/reference/README.md:159, BASELINE.md).  vs_baseline is the wall-time
ratio against the reference's measured FMG time AT THE SAME SIZE, so
fallback sizes stay comparable.  Secondary dp-matvec numbers go to stderr.

Env knobs: BENCH_SIZES ("128 112 96 80 64"), BENCH_METRIC=fmg|matvec.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# reference FMG wall times per ladder size (README.md:136-159, 12-core)
REF_FMG_SECONDS = {
    40: 0.1151, 48: 0.1906, 56: 0.3182, 64: 0.4564,
    80: 0.9125, 96: 1.538, 112: 2.452, 128: 3.613,
}
REF_MV_DOFS_PER_S = 8.7355e8   # dp matvec at 135M dofs (README.md:124)


def bench_fmg(size: int, dp_impl: str | None = None,
              sp_impl: str | None = None):
    import jax

    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from experiments.poisson_cube import (build_solver, resolve_dp_impl,
                                          resolve_sp_impl)
    from multigrid_tpu.mesh.brick import poisson_cube_mesh

    mesh = poisson_cube_mesh(size)
    t0 = time.perf_counter()
    solver = build_solver(
        mesh, 4,
        sp_impl=resolve_sp_impl(
            sp_impl or os.environ.get("BENCH_SP_IMPL", "auto")),
        dp_impl=resolve_dp_impl(
            dp_impl or os.environ.get("BENCH_DP_IMPL", "auto")))
    print(f"# setup({size}): {time.perf_counter()-t0:.1f} s", file=sys.stderr)
    n_dofs = solver.grids[solver.maxlevel].n_dofs
    best = np.inf
    sol = None
    for _ in range(3):
        sol = None   # never hold the previous solution while computing the
        #              next (HBM rule, CLAUDE.md)
        t0 = time.perf_counter()
        sol = solver.solve()
        sol.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    # correctness guard: a Mosaic kernel that compiles but miscompiles
    # (observed once on v5e, RESULTS_R3 finding 5) must not produce a
    # wrong-but-fast headline — any real FMG solve at these sizes has
    # L2 error <= ~1.5e-7 (host-side error analysis, HBM-free)
    err = float(solver.l2_error(solver.maxlevel, sol))
    print(f"# fmg({size}) L2 error: {err:.4e}", file=sys.stderr)
    import math
    if not math.isfinite(err) or err > 1e-5:
        raise RuntimeError(f"FMG L2 error {err:.3e} out of range "
                           "(kernel miscompile?)")
    # secondary: dp matvec on the same operator
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        solver.grids[solver.maxlevel].shape), jnp.float64)
    x = solver.matvec_native(x)   # one-time conversion to the persistent
    #                               dp vector layout (windowed pair on the
    #                               hybrid path), outside the timed loop
    solver.do_matvec(x).block_until_ready()
    n_rep = 10
    best_mv = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_rep):
            y = solver.do_matvec(x)
        y.block_until_ready()
        best_mv = min(best_mv, (time.perf_counter() - t0) / n_rep)
    print(f"# fmg({size}): {n_dofs} DoFs in {best:.4f} s "
          f"(ref {REF_FMG_SECONDS.get(size, float('nan')):.4f} s); "
          f"dp matvec {best_mv:.5f} s = {n_dofs/best_mv:.4g} DoFs/s "
          f"({n_dofs/best_mv/REF_MV_DOFS_PER_S:.2f}x ref mv baseline)",
          file=sys.stderr)
    return dict(size=size, dofs=n_dofs, fmg_seconds=best,
                mv_seconds=best_mv)


def main():
    sizes = [int(s) for s in os.environ.get(
        "BENCH_SIZES", "128 112 96 80 64").split()]
    metric = os.environ.get("BENCH_METRIC", "fmg")
    result = None
    path = "fused"
    import gc

    def _attempt(size, **kw):
        """One bench attempt; returns (result, error_repr).  The failure
        path MUST not hold the exception: its traceback references the
        frame owning the ~3 GB solver, so a retry inside the except block
        doubles device residency and OOM-cascades every later size
        (observed on hardware — all sizes down to 64 reported
        RESOURCE_EXHAUSTED once the first attempt failed)."""
        try:
            return bench_fmg(size, **kw), None
        except Exception as e:
            return None, repr(e)

    for size in sizes:
        result, err = _attempt(size)
        if result is not None:
            break
        # traceback frames form cycles; collect BEFORE the retry so the
        # failed attempt's device arrays are actually released
        gc.collect()
        import jax
        jax.clear_caches()
        print(f"# size {size} failed: {err}", file=sys.stderr)
        # a Mosaic/pallas failure must not forfeit the flagship size:
        # retry once on the pure-XLA paths before shrinking
        result, err2 = _attempt(size, dp_impl="ozaki_chunked",
                                sp_impl="dense_chunked")
        if result is not None:
            path = "xla_fallback"   # marked in the JSON line so a
            #                         broken kernel path can't hide
            #                         behind a plausible number
            break
        gc.collect()
        jax.clear_caches()
        print(f"# size {size} (xla fallback) failed: {err2}",
              file=sys.stderr)
    if result is None:
        print(json.dumps({"metric": "fmg_solve_throughput", "value": 0.0,
                          "unit": "DoFs/s", "vs_baseline": 0.0}))
        return
    if metric == "matvec":
        print(json.dumps({
            "metric": "dp_matvec_throughput",
            "value": result["dofs"] / result["mv_seconds"],
            "unit": "DoFs/s",
            "vs_baseline": (result["dofs"] / result["mv_seconds"])
                           / REF_MV_DOFS_PER_S,
            "path": path,
        }))
        return
    ref = REF_FMG_SECONDS.get(result["size"])
    vs = (ref / result["fmg_seconds"]) if ref else 0.0
    print(json.dumps({
        "metric": "fmg_solve_throughput",
        "value": result["dofs"] / result["fmg_seconds"],
        "unit": "DoFs/s",
        "vs_baseline": vs,
        "path": path,
    }))


if __name__ == "__main__":
    main()
