"""Bisect probe for the mid-ladder analyze/CG regression (sweep 17).

ladder_mid17 measured analyze reduction 0.98 (was 0.14 in sweep 14) and
cg_L2error 0.18 (was ~4e-9) at the 33M/57M rows while FMG L2, cg_its and
cg_reduction stayed healthy.  This probe runs ONE mid row (default 80^3
cells = 33M dofs) and prints the three verdict numbers plus which CG
branch ran, so knob A/Bs (MGT_DPMM_LIMBS=7, MGT_WIN_TRANSFER=0,
MGT_PAIR_CG_PAD=99, ...) can isolate the culprit on hardware.

Usage: python experiments/debug_mid33.py [ncells]
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 80

    import jax
    import numpy as np

    from multigrid_tpu.mesh.brick import poisson_cube_mesh
    from experiments.poisson_cube import (build_solver, resolve_dp_impl,
                                          resolve_sp_impl)

    def phase(msg):
        print(f"# [{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    phase(f"setup {n}^3 cells...")
    mesh = poisson_cube_mesh(n)
    solver = build_solver(mesh, 4, 2, 2, 2,
                          sp_impl=resolve_sp_impl("auto"),
                          dp_impl=resolve_dp_impl("auto"))
    g = solver.grids[solver.maxlevel]
    phase(f"setup done ({g.n_dofs} dofs)")

    sol = solver.solve()
    sol.block_until_ready()
    fmg_err = solver.l2_error(solver.maxlevel, sol)
    phase(f"fmg L2 = {fmg_err:.4e}")
    sol = None

    _, report, reduction = solver.solve_analyze()
    phase(f"analyze reduction = {reduction:.4f}")
    for r in report[-2:]:
        print("  ", {k: (f"{v:.3e}" if isinstance(v, float) else v)
                     for k, v in r.items()}, flush=True)

    # which CG branch will run? (mirror solve_cg's gating)
    import os
    L = solver.maxlevel
    win = getattr(solver.dp_ops[L], "win", None)
    branch = "pair"
    if win is not None and not win.interpret:
        cap_env = os.environ.get("MGT_PAIR_CG_PAD")
        cap = 1.25 if cap_env in (None, "") else float(cap_env)
        if win.cxp / g.cells[2] > cap:
            branch = ("stepped-node" if g.n_dofs > 64_000_000
                      else "in-graph")
    elif win is None:
        branch = ("stepped-node" if g.n_dofs > 64_000_000 else "in-graph")
    phase(f"cg branch: {branch}")
    t0 = time.perf_counter()
    sol_cg, its, red = solver.solve_cg()
    sol_cg.block_until_ready()
    phase(f"cg: {time.perf_counter()-t0:.1f} s, {its} its, red {red:.4e}")
    cg_err = solver.l2_error(solver.maxlevel, sol_cg)
    phase(f"cg L2 = {cg_err:.4e}")

    ok = reduction < 0.2 and cg_err < 1e-7
    print("OK" if ok else "BROKEN", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
