"""poisson_dg_plain experiment: 2-D pure-DG h-multigrid, looping over the
three DG element types per mesh (port of
/root/reference/poisson_dg_plain/program.cc)."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # noqa: E402  (repo-root import when run as a script)


import argparse
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

from experiments.poisson_cube import SIZES, exact_fn, rhs_fn
from multigrid_tpu.mesh.brick import poisson_cube_mesh
from multigrid_tpu.solvers.multigrid_dg import MultigridSolverDGPlain


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("degree", type=int, nargs="?", default=3)
    ap.add_argument("minsize", type=int, nargs="?", default=0)
    ap.add_argument("maxsize", type=int, nargs="?", default=1_000_000)
    ap.add_argument("n_pre_smooth", type=int, nargs="?", default=3)
    ap.add_argument("tolerance", type=float, nargs="?", default=1e-3)
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--var-coeff", action="store_true",
                    help="solve -div(c grad u) with c = 1 + 0.5 prod sin(pi x_d)"
                         " (variable-coefficient SIP-DG; beyond the"
                         " constant-coefficient reference DG path)")
    ap.add_argument("--deform", type=float, nargs="?", const=0.05, default=None,
                    metavar="FACTOR",
                    help="curved-geometry SIP-DG: sinusoidally deform the mesh"
                         " interior by FACTOR * prod sin(pi p_d) (the reference"
                         " MyManifold chart, poisson_cube/program.cc:405-484;"
                         " boundary unchanged, so the MMS stays valid);"
                         " composes with --var-coeff")
    args = ap.parse_args()

    coeff_fn, rhs, exact = None, rhs_fn, exact_fn
    if args.var_coeff:
        # manufactured solution vanishing on the [-0.9, 1.0]^dim boundary:
        # u = prod sin(w (x_d + 0.9)), w = pi/1.9; c = 1 + u/2, so
        # grad c = grad u / 2 and f = -(|grad u|^2/2 + c lap u)
        w = np.pi / 1.9

        def exact(q):
            u = 1.0
            for qd in q:
                u = u * np.sin(w * (qd + 0.9))
            return u

        def coeff_fn(q):
            return 1.0 + 0.5 * exact(q)

        def rhs(q):
            dim = len(q)
            u = exact(q)
            grad_dot = 0.0
            for d in range(dim):
                du = w
                for e, qd in enumerate(q):
                    du = du * (np.cos(w * (qd + 0.9)) if e == d
                               else np.sin(w * (qd + 0.9)))
                grad_dot = grad_dot + 0.5 * du * du
            c = 1.0 + 0.5 * u
            return -(grad_dot + c * (-dim * w**2 * u))

    for kind in ("hermite", "gll", "gauss"):
        rows = []
        for size in SIZES:
            if size % 2:
                continue  # pure-DG h-MG needs at least one refinement
            mesh = poisson_cube_mesh(size, args.dim)
            n_dofs = mesh.n_cells(mesh.max_level) * (args.degree + 1) ** args.dim
            if n_dofs < args.minsize:
                continue
            if n_dofs > args.maxsize:
                break
            mapping = None
            if args.deform is not None:
                org = np.asarray(mesh.origin)
                lng = np.asarray(mesh.lengths)
                fac = args.deform

                def mapping(p, org=org, lng=lng, fac=fac):
                    s_ = fac * np.prod(np.sin(np.pi * p), axis=1)
                    return org[None, :] + lng[None, :] * p + s_[:, None]

            s = MultigridSolverDGPlain(mesh, args.degree, exact, rhs,
                                       kind=kind, n_pre=args.n_pre_smooth,
                                       n_post=args.n_pre_smooth,
                                       coeff_fn=coeff_fn, mapping=mapping)
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                sol, frac_its, rate = s.solve_cg(tolerance=args.tolerance)
                sol.block_until_ready()
                best = min(best, time.perf_counter() - t0)
            row = dict(cells=mesh.n_cells(mesh.max_level), dofs=n_dofs,
                       cg_time=best, cg_its=frac_its, cg_reduction=rate,
                       cg_L2error=s.l2_error(sol, s.exact_quad))
            print(kind, row)
            rows.append(row)
        from multigrid_tpu.utils.tables import print_convergence_table
        print(f"=== element type: {kind}")
        print_convergence_table(rows, dim=args.dim)


if __name__ == "__main__":
    main()
