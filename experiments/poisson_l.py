"""poisson_l experiment: adaptive-mesh Poisson with a reentrant-corner
singularity on the L-shaped domain, 2-D or 3-D (``--dim 3``).

Port of /root/reference/poisson_l/program.cc: 2-D hyper_L = [-1,1]^2 minus
[0,1]^2, deal.II ``LSingularityFunction`` solution u = r^{2/3} sin(2 phi/3)
(harmonic, f = 0, inhomogeneous Dirichlet data).  ``--dim 3`` runs the
EXTRUDED L (the reference's default 3-D variant, program.cc:478-492:
extrude_triangulation of the 2-D hyper_L with all-Dirichlet boundary; here
the prism is L x [-1,1] so octree cells stay cubic), with true 3-D octree
AMR — face and edge hanging nodes.  Executes the FULL adaptive loop
(program.cc:502-543): solve -> KellyErrorEstimator ->
refine_and_coarsen_fixed_number(0.15, 0.03) -> mesh execution with
hanging-node constraints -> solution transfer to the new mesh, with a
multigrid-preconditioned CG solve per cycle (global-coarsening hierarchy
instead of the reference's local smoothing — see
multigrid_tpu/solvers/multigrid_adaptive.py) and the reference's
cells/dofs/val_L2/grad_L2/solver_its table (program.cc:572-601).

``--uniform`` runs the same sizes with uniform refinement; the adaptive
path reaches a given error with substantially fewer dofs (the singularity
limits uniform rates to 2/3 in H1).
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

import jax.numpy as jnp

from multigrid_tpu.mesh.adaptive import AdaptiveGrid, OctForest, QuadForest
from multigrid_tpu.ops.laplace_adaptive import AdaptiveLaplace, KellyEstimator
from multigrid_tpu.solvers.multigrid_adaptive import (
    AdaptiveMultigridSolver,
    NestedTransfer,
)


def exact_fn(coords):
    """deal.II Functions::LSingularityFunction (zero in the closed first
    quadrant, which contains both reentrant edges); z-independent in 3-D
    (the extruded L keeps the 2-D corner singularity,
    /root/reference/poisson_l/program.cc:85-139)."""
    x, y = np.asarray(coords[0], float), np.asarray(coords[1], float)
    phi = np.arctan2(y, -x) + np.pi
    r2 = x * x + y * y
    val = np.cbrt(np.maximum(r2, 1e-300)) * np.sin(2.0 / 3.0 * phi)
    out = np.where((x >= 0) & (y >= 0), 0.0, val)
    if len(coords) == 3:     # broadcast across z
        out = out + 0.0 * np.asarray(coords[2], float)
    return out


def grad_exact(coords):
    x, y = np.asarray(coords[0], float), np.asarray(coords[1], float)
    phi = np.arctan2(y, -x) + np.pi
    r2 = np.maximum(x * x + y * y, 1e-300)
    r = np.sqrt(r2)
    u_r = 2.0 / 3.0 * r ** (-1.0 / 3.0) * np.sin(2.0 / 3.0 * phi)
    u_phi = r ** (2.0 / 3.0) * 2.0 / 3.0 * np.cos(2.0 / 3.0 * phi)
    gx = u_r * x / r + u_phi * (y / r2)
    gy = u_r * y / r + u_phi * (-x / r2)
    mask = (x >= 0) & (y >= 0)
    out = [np.where(mask, 0.0, gx), np.where(mask, 0.0, gy)]
    if len(coords) == 3:
        z = np.asarray(coords[2], float)
        out = [o + 0.0 * z for o in out] + [0.0 * z + 0.0 * x]
    return out


def rhs_fn(coords):
    return 0.0 * coords[0]


def boundary_fn(xy):
    """Dirichlet everywhere on the L(-prism) boundary
    (/root/reference/poisson_l/program.cc:486-491: boundary_id 0 on all
    faces of the extruded variant)."""
    x, y = xy[:, 0], xy[:, 1]
    tol = 1e-9
    on = (np.abs(x + 1) < tol) | (np.abs(y + 1) < tol)
    on |= (np.abs(x - 1) < tol) & (y <= tol)
    on |= (np.abs(y - 1) < tol) & (x <= tol)
    on |= (np.abs(x) < tol) & (y >= -tol)
    on |= (np.abs(y) < tol) & (x >= -tol)
    if xy.shape[1] == 3:
        z = xy[:, 2]
        on |= (np.abs(z + 1) < tol) | (np.abs(z - 1) < tol)
    return on


def l_forest(n_uniform: int, dim: int = 2):
    """L-shaped base: [-1,1]^dim minus the (x>0, y>0) quadrant/column."""
    if dim == 2:
        f = QuadForest(2, -1.0, 2.0,
                       root_mask=lambda ix, iy: not (ix == 1 and iy == 1))
    else:
        f = OctForest(2, -1.0, 2.0,
                      root_mask=lambda ix, iy, iz: not (ix == 1 and iy == 1))
    for _ in range(n_uniform):
        f = f.uniform_refine()
    return f


def mg_ladder(forest: QuadForest, degree: int, min_cells: int = 4):
    """Global-coarsening mesh ladder, coarsest first."""
    forests = [forest]
    while forests[0].n_cells > min_cells:
        c = forests[0].coarsen_global()
        if c.n_cells == forests[0].n_cells:
            break
        forests.insert(0, c)
    return [AdaptiveGrid(f, degree, boundary_fn) for f in forests]


def refine_and_coarsen_fixed_number(forest, eta2, top, bottom):
    """deal.II GridRefinement::refine_and_coarsen_fixed_number."""
    cells = AdaptiveGrid.__new__(AdaptiveGrid)  # only need cell order
    order = forest.sorted_cells()
    idx = np.argsort(eta2)[::-1]
    n_ref = int(top * len(order))
    n_coa = int(bottom * len(order))
    marks_r = [order[i] for i in idx[:n_ref]]
    marks_c = [order[i] for i in idx[len(order) - n_coa:]] if n_coa else []
    return forest.refine(marks_r, marks_c)


def run_cycle(forest, degree, rtol=1e-9, local_smoothing=False):
    t0 = time.perf_counter()
    if local_smoothing:
        # the reference's actual poisson_l preconditioner (deal.II Multigrid
        # with level-local smoothing + interface matrices, program.cc:338-416)
        from multigrid_tpu.solvers.multigrid_local import LocalSmoothingMultigrid

        grids = [AdaptiveGrid(forest, degree, boundary_fn)]
        s = LocalSmoothingMultigrid(grids[0], exact_fn, rhs_fn)
    else:
        grids = mg_ladder(forest, degree)
        s = AdaptiveMultigridSolver(grids, exact_fn, rhs_fn)
    setup_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    sol, its, red = s.solve_cg(rtol=rtol)
    solve_t = time.perf_counter() - t0
    g = grids[-1]
    op = s.op_dp
    dim = g.dim
    # deal.II-style absolute norms (integrate_difference, program.cc:557-578)
    qxy = op.quad_points()
    qc = [qxy[..., d] for d in range(dim)]
    uq = op._to_quad(op.gather(sol)).reshape(-1, op.N)
    ex = np.asarray(exact_fn(qc))
    jxw = np.asarray(op.jxw())
    val_l2 = float(np.sqrt((((np.asarray(uq) - ex) ** 2) * jxw).sum()))
    qshape = (-1,) + (op.n,) * dim
    gex = grad_exact([qxy[..., d].reshape(qshape) for d in range(dim)])
    grad_l2 = float(s.op_dp.h1_seminorm_error(sol, gex))
    eta2 = KellyEstimator(op)(sol)
    return dict(cells=g.n_cells, dofs=g.n_dofs, constraints=g.n_constraints,
                val_L2=val_l2, grad_L2=grad_l2, solver_its=its,
                reduction=red, estimator=float(np.sqrt(eta2.sum())),
                setup_time=setup_t, solve_time=solve_t), sol, eta2, s


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("cycles", type=int, nargs="?", default=8)
    ap.add_argument("--degree", type=int, default=2)
    ap.add_argument("--dim", type=int, default=2, choices=(2, 3),
                    help="3 = extruded-L octree AMR (program.cc:478-492)")
    ap.add_argument("--initial", type=int, default=None,
                    help="uniform refinements of the L base (ref: 5 in 2-D, "
                         "3 in 3-D; default here 3 / 1)")
    ap.add_argument("--top-fraction", type=float, default=0.15)
    ap.add_argument("--bottom-fraction", type=float, default=0.03)
    ap.add_argument("--max-dofs", type=int, default=2_000_000)
    ap.add_argument("--uniform", action="store_true",
                    help="uniform refinement instead of adaptive")
    ap.add_argument("--local-smoothing", action="store_true",
                    help="level-local smoothing + interface operators (the "
                         "reference's preconditioner) instead of global "
                         "coarsening")
    args = ap.parse_args()

    if args.initial is None:
        args.initial = 3 if args.dim == 2 else 1
    forest = l_forest(args.initial, args.dim)
    rows = []
    prev = None  # (solver, solution) for the transfer demonstration
    for cycle in range(args.cycles):
        row, sol, eta2, s = run_cycle(forest, args.degree,
                                      local_smoothing=args.local_smoothing)
        if prev is not None:
            # solution transfer across the refinement (SolutionTransfer,
            # program.cc:536-542): interpolate the previous solution to the
            # new mesh and report how close it lands to the new solution
            tr = NestedTransfer(s.grids[-1], prev[0].grids[-1], jnp.float64)
            u0 = jnp.sum(prev[1][tr.idx] * tr.w, axis=-1)
            rel = float(jnp.linalg.norm(u0 - sol) / jnp.linalg.norm(sol))
            row["transfer_rel_diff"] = rel
        print({k: (float(v) if isinstance(v, (float, np.floating)) else v)
               for k, v in row.items()})
        rows.append(row)
        prev = (s, sol)
        if row["dofs"] > args.max_dofs:
            break
        if args.uniform:
            forest = forest.uniform_refine()
        else:
            forest = refine_and_coarsen_fixed_number(
                forest, eta2, args.top_fraction, args.bottom_fraction)

    hdr = ["cells", "dofs", "val_L2", "grad_L2", "solver_its"]
    print("\n" + "  ".join(f"{h:>10s}" for h in hdr))
    for r in rows:
        print("  ".join(
            f"{r[h]:10.4g}" if isinstance(r[h], float) else f"{r[h]:10d}"
            for h in hdr))


if __name__ == "__main__":
    main()
