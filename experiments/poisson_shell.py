"""poisson_shell experiment: variable-coefficient Poisson on a 3-D shell.

Port of /root/reference/poisson_shell/program.cc: coefficient
``1 + 1e6 prod_e cos^2(2 pi x_e + 0.1 e)``, solution ``sin(2 pi (x+y))``,
spherical shell r in [0.5, 1], mixed fp32/fp64 FMG + CG-V-cycle,
alternating the 6-block cubed-sphere and the 12-block rhombic-dodecahedron
coarse shells per cycle as the reference does (program.cc:424-431).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # noqa: E402  (repo-root import when run as a script)


import argparse
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

from multigrid_tpu.mesh.shapes import hyper_shell, hyper_shell_12
from multigrid_tpu.solvers.multigrid_general import GeneralMultigridSolver


def exact_fn(coords):
    return np.sin(2 * np.pi * (coords[0] + coords[1]))


def grad_exact(coords):
    g = 2 * np.pi * np.cos(2 * np.pi * (coords[0] + coords[1]))
    return [g, g] + [0.0 * coords[0] for _ in range(len(coords) - 2)]


def laplacian_exact(coords):
    return -2 * (2 * np.pi) ** 2 * exact_fn(coords)


def coef_fn(coords):
    prod = 1.0
    for e, c in enumerate(coords):
        prod = prod * np.cos(2 * np.pi * c + 0.1 * e) ** 2
    return 1.0 + 1.0e6 * prod


def grad_coef(coords):
    out = []
    for d in range(len(coords)):
        prod = 1.0
        for e, c in enumerate(coords):
            t = np.cos(2 * np.pi * c + 0.1 * e)
            if e == d:
                prod = prod * (-4 * np.pi * t * np.sin(2 * np.pi * c + 0.1 * e))
            else:
                prod = prod * t * t
        out.append(1.0e6 * prod)
    return out


def rhs_fn(coords):
    """-(c Lap(u) + grad(c).grad(u)) (program.cc:216-225)."""
    gc = grad_coef(coords)
    gu = grad_exact(coords)
    dot = sum(a * b for a, b in zip(gc, gu))
    return -(coef_fn(coords) * laplacian_exact(coords) + dot)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("degree", type=int, nargs="?", default=4)
    ap.add_argument("maxsize", type=int, nargs="?", default=2_000_000)
    # reference defaults: n_mg_cycles 1, pre/post 3 (program.cc:522-524)
    ap.add_argument("n_mg_cycles", type=int, nargs="?", default=1)
    ap.add_argument("n_pre_smooth", type=int, nargs="?", default=3)
    ap.add_argument("n_post_smooth", type=int, nargs="?", default=3)
    ap.add_argument("--pure-double", action="store_true",
                    help="all-double V-cycle with fourth-kind Chebyshev — "
                         "the reference poisson_shell solver specialization "
                         "(multigrid_solver.h:789-1285, 945-963)")
    ap.add_argument("--cycles", type=int, default=8)
    ap.add_argument("--min-cycle", type=int, default=0,
                    help="first cycle to run (cycles are independent; "
                         "resume an interrupted ladder without redoing "
                         "the small rows)")
    args = ap.parse_args()

    kw = {}
    if args.pure_double:
        from multigrid_tpu.solvers.chebyshev import FOURTH_KIND

        kw = dict(pure_double=True, chebyshev_kind=FOURTH_KIND)

    rows = []
    for cycle in range(args.min_cycle, args.cycles):
        n_levels = 1 + cycle // 2
        if cycle % 2 == 0:
            mesh = hyper_shell(0.5, 1.0, n_levels=n_levels)
        else:
            mesh = hyper_shell_12(0.5, 1.0, n_levels=n_levels)
        g_dofs = None
        s = GeneralMultigridSolver(
            mesh, args.degree, exact_fn, rhs_fn, coef_fn=coef_fn,
            n_pre=args.n_pre_smooth, n_post=args.n_post_smooth,
            n_cycles=args.n_mg_cycles, **kw,
        )
        g_dofs = s.grids[s.maxlevel].n_dofs
        if g_dofs > args.maxsize:
            print("Max size reached, terminating.")
            break
        print(f"Cycle {cycle}: {g_dofs} dofs")
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            sol = s.solve()
            sol.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        fmg_err = s.l2_error(s.maxlevel, sol)
        # per-level wall-time table for one analyzed V-cycle pass, the
        # reference prints this after every solve (multigrid_solver.h:347-371)
        from multigrid_tpu.utils.timing import LevelTimings

        try:
            timings = LevelTimings()
            defect = s.rhs[s.maxlevel].astype(s.v_dtype)
            s.v_cycle_timed(s.maxlevel, defect, args.n_mg_cycles, timings)
            timings.reset()  # discard compile-pass timings
            s.v_cycle_timed(s.maxlevel, defect, args.n_mg_cycles, timings)
            timings.print_table()
        except Exception as e:  # telemetry only — never forfeit the row
            # (cycle 10 of shell_blk lost its FMG/CG numbers to a
            # remote-compile failure INSIDE the timing table, r4)
            print(f"per-level timing table skipped: {e!r}", flush=True)
        # warm-up rep compiles the CG program (f64-emulation compiles run
        # minutes at scale on TPU); report best-of-3 steady-state like the
        # FMG loop above and the poisson_cube driver
        cg_time = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            sol_cg, its, red = s.solve_cg()
            sol_cg.block_until_ready()
            cg_time = min(cg_time, time.perf_counter() - t0)
        row = dict(cells=s.grids[s.maxlevel].n_cells, dofs=g_dofs,
                   fmg_time=best, fmg_L2error=fmg_err, cg_time=cg_time,
                   cg_its=its, cg_reduction=red,
                   cg_L2error=s.l2_error(s.maxlevel, sol_cg))
        print(row)
        rows.append(row)
        # drop the finished cycle's executables/buffers before the next,
        # larger size (accumulated device state OOMs the big rows)
        import gc

        del s, sol, sol_cg
        gc.collect()
        jax.clear_caches()

    from multigrid_tpu.utils.tables import print_convergence_table
    print_convergence_table(rows, dim=3)


if __name__ == "__main__":
    main()
