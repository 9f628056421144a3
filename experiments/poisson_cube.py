"""poisson_cube experiment: 3-D constant-coefficient Poisson on a cube.

TPU-native port of the reference driver
(/root/reference/poisson_cube/program.cc): analytic solution
``prod_d sin(pi k x_d)`` with k = 3, f = dim (pi k)^2 u on
``[-0.9, 1.0]^dim``, mesh ladder of cube sizes, mixed fp32/fp64 multigrid,
FMG + CG benchmarks with the same convergence-table schema.
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

from multigrid_tpu.mesh.brick import BrickMesh, doubling_mesh, poisson_cube_mesh
from multigrid_tpu.solvers.multigrid import MultigridSolver

WAVE_NUMBER = 3.0
SIZES = [1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 32, 40, 48, 56,
         64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, 448, 512]


def exact_fn(coords):
    out = 1.0
    for c in coords:
        out = out * np.sin(np.pi * WAVE_NUMBER * c)
    return out


def rhs_fn(coords):
    dim = len(coords)
    return dim * (np.pi * WAVE_NUMBER) ** 2 * exact_fn(coords)


def _rhs_separable_1d(dim):
    """Rank-1 per-axis factors of rhs_fn (f = prod_d f_d(x_d)): lets the
    solver assemble M f on device as an outer product of 1-D vectors
    instead of shipping the dense dp rhs over the device link."""
    k = np.pi * WAVE_NUMBER
    fs = [lambda x: np.sin(k * x) for _ in range(dim)]
    fs[0] = lambda x: dim * k**2 * np.sin(k * x)
    return fs


rhs_fn.separable_1d = _rhs_separable_1d


def build_solver(mesh: BrickMesh, degree: int, n_pre: int = 2, n_post: int = 2,
                 n_cycles: int = 2, sp_impl: str = "dense_chunked",
                 dp_impl: str = "ozaki_chunked") -> MultigridSolver:
    return MultigridSolver(
        mesh, degree, exact_fn, rhs_fn,
        n_pre=n_pre, n_post=n_post, n_cycles=n_cycles,
        sp_impl=sp_impl, dp_impl=dp_impl,
    )


def resolve_dp_impl(dp_impl: str = "auto") -> str:
    """"auto" = the fused windowed-pair Mosaic dp path on TPU (engages on
    eligible grids, XLA Ozaki otherwise), plain XLA Ozaki elsewhere."""
    if dp_impl != "auto":
        return dp_impl
    import jax

    return ("pallas_windowed" if jax.default_backend() == "tpu"
            else "ozaki_chunked")


def resolve_sp_impl(sp_impl: str = "auto") -> str:
    """"auto" = the fused windowed Mosaic sp smoother path on TPU (engages
    on eligible levels, dense-element XLA otherwise)."""
    if sp_impl != "auto":
        return sp_impl
    import jax

    return ("pallas_windowed" if jax.default_backend() == "tpu"
            else "dense_chunked")


def run_cycle(mesh: BrickMesh, degree: int, n_cycles: int, n_pre: int,
              n_post: int, n_fmg_repeat: int = 3, n_cg_repeat: int = 3,
              n_matvec: int = 50, verbose: bool = True,
              n_devices: int = 0, dp_impl: str = "auto",
              sp_impl: str = "auto", output_dir: str = "") -> dict:
    """One row of the reference convergence table
    (/root/reference/poisson_cube/program.cc:255-401)."""
    import jax
    import jax.numpy as jnp

    import sys as _s

    def _phase(msg):
        print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=_s.stderr,
              flush=True)

    _phase("setup...")
    solver = build_solver(mesh, degree, n_pre, n_post, n_cycles,
                          sp_impl=resolve_sp_impl(sp_impl),
                          dp_impl=resolve_dp_impl(dp_impl))
    _phase("setup done")
    if n_devices > 1:
        # domain-decomposed solves over a device mesh (GSPMD per level)
        from multigrid_tpu.parallel.distributed import DistributedMultigrid
        from multigrid_tpu.parallel.sharding import make_mesh

        axes = ("z", "y") if n_devices >= 4 else ("z",)
        DistributedMultigrid(solver, make_mesh(n_devices, axes))
    grid = solver.grids[solver.maxlevel]
    row = {"cells": mesh.n_cells(mesh.max_level), "dofs": grid.n_dofs}

    # dispatch round-trip floor: a blocking timed span on a remote device
    # (axon tunnel) includes one host<->device round trip that colocated
    # deployments do not pay; measure it so the solve rows can be read
    # net of it.  (The reference's MPI timing has no such term.)
    trivial = jax.jit(lambda a: a + 1.0)
    probe = jnp.zeros((8,), jnp.float32)
    trivial(probe).block_until_ready()
    rtt = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        trivial(probe).block_until_ready()
        rtt = min(rtt, time.perf_counter() - t0)
    row["rtt"] = rtt
    _phase(f"dispatch rtt floor: {rtt*1e3:.1f} ms")

    best = np.inf
    sol = None
    for _ in range(n_fmg_repeat):
        sol = None   # never hold the previous solution while computing the
        #              next (HBM rule, CLAUDE.md)
        t0 = time.perf_counter()
        sol = solver.solve()
        sol.block_until_ready()
        best = min(best, time.perf_counter() - t0)
        _phase(f"fmg rep: {time.perf_counter()-t0:.3f} s")
    row["fmg_time"] = best
    if grid.n_dofs < 50_000_000:
        # pipelined solve throughput: queue several solves, block once —
        # amortizes the dispatch round trip exactly like the matvec loops
        # below.  Small sizes only: two queued solves must coexist in HBM.
        n_pipe = 5
        t0 = time.perf_counter()
        sols = [solver.solve() for _ in range(n_pipe)]
        sols[-1].block_until_ready()
        row["fmg_time_piped"] = (time.perf_counter() - t0) / n_pipe
        sols = None
        _phase(f"fmg piped: {row['fmg_time_piped']:.3f} s/solve x {n_pipe}")
    _, report, reduction = solver.solve_analyze()
    _phase("analyze done")
    row["reduction"] = reduction
    row["fmg_L2error"] = solver.l2_error(solver.maxlevel, sol)
    if output_dir:
        # solution dump (reference output_results, program.cc:325-341;
        # same ~1e5-dof size guard)
        import os

        from multigrid_tpu.utils.vtk import write_solution

        os.makedirs(output_dir, exist_ok=True)
        path = f"{output_dir}/solution_{grid.n_dofs}.vtr"
        if write_solution(path, grid, np.asarray(sol), exact_fn):
            _phase(f"wrote {path}")
    if verbose and grid.n_dofs < 100_000_000:
        # per-level wall-time table for one analyzed V-cycle, the
        # reference's print_wall_times output after each solve
        # (/root/reference/common/multigrid_solver.h:347-371); skipped at
        # the flagship size where the extra per-level executables would
        # crowd HBM before the CG phase
        from multigrid_tpu.utils.timing import LevelTimings

        timings = LevelTimings()
        defect = solver.rhs[solver.maxlevel].astype(solver.v_dtype)
        solver.v_cycle_timed(solver.maxlevel, defect, n_cycles, timings)
        timings.reset()  # discard compile-pass timings
        solver.v_cycle_timed(solver.maxlevel, defect, n_cycles, timings)
        timings.print_table()
    del sol  # free the dp solution before CG: every GB counts at 135M
    if grid.n_dofs > 100_000_000:
        # the CG phase touches only the finest level's rhs/u_bc; drop the
        # sub-level setup arrays (FMG timing is done) and release the FMG/
        # analyze executables (program binaries + reserved state also live
        # in HBM on the device) to widen headroom
        import gc

        for l in range(solver.maxlevel):
            solver.rhs[l] = None
            solver.u_bc[l] = None
        solver.reset_jit_caches()
        gc.collect()
        jax.clear_caches()

    best_cg = np.inf
    sol_cg = None
    for _ in range(n_cg_repeat):
        sol_cg = None   # holding the previous solution across a repeat
        #                 costs 1.27 GB of the 135M row's headroom
        t0 = time.perf_counter()
        sol_cg, its, red = solver.solve_cg()
        sol_cg.block_until_ready()
        best_cg = min(best_cg, time.perf_counter() - t0)
        _phase(f"cg rep: {time.perf_counter()-t0:.3f} s ({its} its)")
    row["cg_time"] = best_cg
    row["cg_its"] = its
    row["cg_reduction"] = red
    row["cg_L2error"] = solver.l2_error(solver.maxlevel, sol_cg)

    # matvec benchmarks (program.cc:343-384)
    for name, fn, dtype in [
        ("mv_outer", solver.do_matvec, solver.f_dtype),
        ("mv_inner", solver.do_matvec_smoother, solver.v_dtype),
    ]:
        x = jnp.asarray(np.random.default_rng(0).normal(size=grid.shape), dtype)
        # one-time layout conversion to the operator's persistent vector
        # format (windowed on the fused-kernel paths), outside the timed
        # loop — mirroring the reference's ghosted-layout benchmark inputs
        x = (solver.matvec_native(x) if name == "mv_outer"
             else solver.matvec_native_sp(x))
        fn(x).block_until_ready()
        best_mv = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            # re-apply to the fixed input each rep: chaining y = fn(y)
            # amplifies by lambda_max per apply and overflows f32
            for _ in range(n_matvec):
                y = fn(x)
            y.block_until_ready()
            best_mv = min(best_mv, (time.perf_counter() - t0) / n_matvec)
        row[name] = best_mv
    row["mv_outer_dofs_per_s"] = row["dofs"] / row["mv_outer"]
    if verbose:
        print({k: (float(v) if isinstance(v, (np.floating, float)) else v)
               for k, v in row.items()})
        # memory telemetry (reference program.cc:273-279)
        from multigrid_tpu.utils.memory import print_memory_report

        print_memory_report(solver)
    return row


def run_deformed(args):
    """Deformed-manifold ladder on the general (mapped-mesh) path
    (/root/reference/poisson_cube/program.cc:405-484, off by default
    there too): CG + FMG solves with L2 errors at optimal p+1 rates."""
    import time as _time

    from multigrid_tpu.mesh.shapes import deformed_cube
    from multigrid_tpu.solvers.multigrid_general import GeneralMultigridSolver

    rows = []
    for n_levels in range(2, 9):
        mesh = deformed_cube(2, n_levels=n_levels, dim=args.dim)
        n_dofs = (2 ** n_levels * 2 * args.degree + 1) ** args.dim
        if n_dofs < args.minsize:
            continue
        if n_dofs > min(args.maxsize, 3_000_000):
            break
        s = GeneralMultigridSolver(mesh, args.degree, exact_fn, rhs_fn,
                                   n_pre=args.n_pre_smooth,
                                   n_post=args.n_post_smooth,
                                   n_cycles=args.n_mg_cycles)
        t0 = _time.perf_counter()
        sol = s.solve()
        sol.block_until_ready()
        fmg_t = _time.perf_counter() - t0
        fmg_err = s.l2_error(s.maxlevel, sol)
        t0 = _time.perf_counter()
        sol_cg, its, red = s.solve_cg()
        fmg = _time.perf_counter() - t0
        row = dict(cells=s.grids[-1].n_cells, dofs=s.grids[-1].n_dofs,
                   fmg_time=fmg_t,
                   fmg_L2error=float(fmg_err), cg_time=fmg, cg_its=its,
                   cg_reduction=red,
                   cg_L2error=float(s.l2_error(s.maxlevel, sol_cg)))
        print(row)
        rows.append(row)
    from multigrid_tpu.utils.tables import print_convergence_table

    print_convergence_table(rows, dim=args.dim)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("degree", type=int, nargs="?", default=4)
    ap.add_argument("minsize", type=int, nargs="?", default=0)
    ap.add_argument("maxsize", type=int, nargs="?", default=10_000_000)
    ap.add_argument("n_mg_cycles", type=int, nargs="?", default=2)
    ap.add_argument("n_pre_smooth", type=int, nargs="?", default=2)
    ap.add_argument("n_post_smooth", type=int, nargs="?", default=2)
    ap.add_argument("mesh", nargs="?", default="square",
                    choices=["square", "doubling"])
    ap.add_argument("--dim", type=int, default=3)
    ap.add_argument("--devices", type=int, default=0,
                    help="distribute solves over this many devices "
                         "(jax.sharding mesh; 0 = single device)")
    ap.add_argument("--deform", action="store_true",
                    help="sinusoidally deformed cube via the mapped-mesh "
                         "path (reference MyManifold, program.cc:405-484)")
    ap.add_argument("--dp-impl", default="auto",
                    help="dp operator implementation (auto = fused "
                         "windowed-pair Mosaic kernel on TPU)")
    ap.add_argument("--sp-impl", default="auto",
                    help="sp smoother implementation (auto = fused "
                         "windowed Mosaic kernel on TPU)")
    ap.add_argument("--output", default="",
                    help="directory for .vtr solution dumps (size-guarded "
                         "like the reference's output_results)")
    args = ap.parse_args()

    if args.deform:
        run_deformed(args)
        return

    rows = []
    for cycle, size in enumerate(SIZES):
        if args.mesh == "doubling":
            mesh = doubling_mesh(cycle, args.dim)
        else:
            mesh = poisson_cube_mesh(size, args.dim)
        grid_dofs = np.prod(
            [c * args.degree + 1 for c in mesh.cells(mesh.max_level)]
        )
        if grid_dofs < args.minsize:
            continue
        if grid_dofs > args.maxsize:
            print(f"Projected size {grid_dofs} higher than max size, terminating.")
            break
        print(f"Cycle {cycle}: {mesh.cells(mesh.max_level)} cells, {grid_dofs} dofs")
        rows.append(run_cycle(mesh, args.degree, args.n_mg_cycles,
                              args.n_pre_smooth, args.n_post_smooth,
                              n_devices=args.devices, dp_impl=args.dp_impl,
                              sp_impl=args.sp_impl, output_dir=args.output))
        # drop the finished cycle's executables/buffers: accumulated device
        # state from earlier ladder sizes otherwise OOMs the 135M setup
        import gc

        gc.collect()
        jax.clear_caches()

    from multigrid_tpu.utils.tables import print_convergence_table
    print_convergence_table(rows, dim=args.dim)


if __name__ == "__main__":
    main()
