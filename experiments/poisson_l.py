"""poisson_l experiment: Poisson with a reentrant-corner singularity on the
L-shaped domain.

Port of /root/reference/poisson_l/program.cc: 2-D hyper_L = [-1,1]^2 minus
[0,1]^2 (3 blocks), deal.II ``LSingularityFunction`` solution
u = r^{2/3} sin(2 phi / 3) (harmonic, f = 0, inhomogeneous Dirichlet data),
L2 + H1-seminorm error tables, Kelly-type face-jump error indicator with
fixed-fraction marking (program.cc:527-540).  Adaptive execution of the
marks (hanging-node AMR with local smoothing) is scheduled for a later
round; on uniform meshes the singularity limits the H1 rate to 2/3, which
this experiment demonstrates.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from multigrid_tpu.mesh.mapped import Block, MappedMesh
from multigrid_tpu.solvers.multigrid_general import GeneralMultigridSolver


def l_domain(n_levels: int) -> MappedMesh:
    """[-1,1]^2 minus the first quadrant [0,1]^2 (hyper_L)."""
    def block(ox, oy):
        def mapping(p):
            return np.stack([ox + p[:, 0], oy + p[:, 1]], axis=1)
        return Block(cells=(1, 1), mapping=mapping)

    blocks = [block(-1, -1), block(0, -1), block(-1, 0)]

    def boundary_fn(x):
        tol = 1e-9
        on = np.zeros(x.shape[0], bool)
        on |= (np.abs(x[:, 0] + 1) < tol) | (np.abs(x[:, 1] + 1) < tol)
        on |= (np.abs(x[:, 0] - 1) < tol) & (x[:, 1] <= tol)
        on |= (np.abs(x[:, 1] - 1) < tol) & (x[:, 0] <= tol)
        # reentrant edges
        on |= (np.abs(x[:, 0]) < tol) & (x[:, 1] >= -tol)
        on |= (np.abs(x[:, 1]) < tol) & (x[:, 0] >= -tol)
        return on

    return MappedMesh(blocks=blocks, n_levels=n_levels, boundary_fn=boundary_fn)


def exact_fn(coords):
    """deal.II Functions::LSingularityFunction (zero in the closed first
    quadrant, which contains both reentrant edges)."""
    x, y = np.asarray(coords[0], float), np.asarray(coords[1], float)
    phi = np.arctan2(y, -x) + np.pi
    r2 = x * x + y * y
    val = np.cbrt(np.maximum(r2, 1e-300)) * np.sin(2.0 / 3.0 * phi)
    return np.where((x >= 0) & (y >= 0), 0.0, val)


def grad_exact(coords):
    x, y = np.asarray(coords[0], float), np.asarray(coords[1], float)
    phi = np.arctan2(y, -x) + np.pi
    r2 = np.maximum(x * x + y * y, 1e-300)
    r = np.sqrt(r2)
    u_r = 2.0 / 3.0 * r ** (-1.0 / 3.0) * np.sin(2.0 / 3.0 * phi)
    u_phi = r ** (2.0 / 3.0) * 2.0 / 3.0 * np.cos(2.0 / 3.0 * phi)
    # phi = atan2(y,-x)+pi: dphi/dx = y/r2, dphi/dy = -(-x)/r2 = x/r2? check:
    # d/dx atan2(y,-x) = (-y*(-1))/r2 = y/r2 ; d/dy atan2(y,-x) = -x/r2
    gx = u_r * x / r + u_phi * (y / r2)
    gy = u_r * y / r + u_phi * (-x / r2)
    mask = (x >= 0) & (y >= 0)
    return [np.where(mask, 0.0, gx), np.where(mask, 0.0, gy)]


def rhs_fn(coords):
    return 0.0 * coords[0]


def kelly_indicator(solver: GeneralMultigridSolver, u) -> np.ndarray:
    """Kelly face-jump estimator eta_K^2 = sum_F h/24 int_F [du/dn]^2
    (the role of deal.II KellyErrorEstimator, program.cc:527-533).
    Computed over intra-block faces of the block-structured mesh."""
    import jax.numpy as jnp

    g = solver.grids[solver.maxlevel]
    op = solver.ops_dp[solver.maxlevel]
    b = g.basis
    dim = g.dim
    n = g.n
    # physical gradients at quad points per cell
    w = op.gather(jnp.asarray(u))
    gref = op._eval_grads(w)
    Jinv = np.linalg.inv(g.jacobians).reshape((g.n_cells,) + (n,) * dim + (dim, dim))
    gphys = [
        sum(Jinv[..., bb, a] * np.asarray(gref[bb]) for bb in range(dim))
        for a in range(dim)
    ]
    # face-trace matrices from quad values
    from multigrid_tpu.core.quadrature import lagrange_values

    f0 = lagrange_values(b.quad_points, np.array([0.0]))[0]
    f1 = lagrange_values(b.quad_points, np.array([1.0]))[0]
    eta2 = np.zeros(g.n_cells)
    off = 0
    for bc in g.block_cells:
        C = int(np.prod(bc))
        sl = slice(off, off + C)
        gb = [ga[sl].reshape(bc + (n,) * dim) for ga in gphys]
        h = 1.0 / np.asarray(bc)  # param h; physical h from jacobian below
        for d in range(dim):
            # normal at faces of direction d (blocks here are axis-aligned)
            # jump of dg/dn across interior faces
            gn = gb[d]
            tr1 = np.tensordot(gn, f1, axes=([dim + d], [0]))
            tr0 = np.tensordot(gn, f0, axes=([dim + d], [0]))
            # jump[c] between cell c (right face) and c+1 (left face)
            jump = np.take(tr1, range(0, bc[d] - 1), axis=d) - np.take(
                tr0, range(1, bc[d]), axis=d
            )
            # face integral with perpendicular weights
            wq = b.quad_weights
            w2 = jump**2
            for e in range(dim - 1):
                w2 = np.tensordot(w2, wq, axes=([dim], [0]))
            hface = np.linalg.norm(g.jacobians[off].reshape((n,)*dim + (dim,dim))[(0,)*dim][:, d])
            contrib = 0.5 * hface / 24.0 * w2 * hface ** (dim - 1)
            idx_l = [slice(None)] * dim
            idx_l[d] = slice(0, bc[d] - 1)
            idx_r = [slice(None)] * dim
            idx_r[d] = slice(1, bc[d])
            e2 = np.zeros(bc)
            e2[tuple(idx_l)] += contrib
            e2[tuple(idx_r)] += contrib
            eta2[sl] += e2.reshape(-1)
        off += C
    return eta2


def h1_error(solver, u):
    import jax.numpy as jnp

    g = solver.grids[solver.maxlevel]
    op = solver.ops_dp[solver.maxlevel]
    dim, n = g.dim, g.n
    w = op.gather(jnp.asarray(u))
    gref = op._eval_grads(w)
    Jinv = np.linalg.inv(g.jacobians).reshape((g.n_cells,) + (n,) * dim + (dim, dim))
    gphys = [
        sum(Jinv[..., bb, a] * np.asarray(gref[bb]) for bb in range(dim))
        for a in range(dim)
    ]
    qc = [g.quad_coords[..., d].reshape((g.n_cells,) + (n,) * dim) for d in range(dim)]
    gex = grad_exact(qc)
    jxw = g.jxw.reshape((g.n_cells,) + (n,) * dim)
    err2 = sum(((gp - ge) ** 2 * jxw).sum() for gp, ge in zip(gphys, gex))
    return float(np.sqrt(err2))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("max_levels", type=int, nargs="?", default=5)
    ap.add_argument("--degree", type=int, default=2)
    ap.add_argument("--top-fraction", type=float, default=0.3)
    args = ap.parse_args()
    rows = []
    for L in range(2, args.max_levels + 1):
        mesh = l_domain(L)
        s = GeneralMultigridSolver(mesh, args.degree, exact_fn, rhs_fn, n_cycles=1)
        t0 = time.perf_counter()
        sol, its, red = s.solve_cg()
        dt = time.perf_counter() - t0
        l2 = s.l2_error(s.maxlevel, sol)
        h1 = h1_error(s, sol)
        eta2 = kelly_indicator(s, sol)
        order = np.argsort(eta2)[::-1]
        n_marked = int(args.top_fraction * eta2.size)
        row = dict(cells=s.grids[s.maxlevel].n_cells,
                   dofs=s.grids[s.maxlevel].n_dofs, cg_its=its,
                   cg_reduction=red, cg_L2error=l2, h1_error=h1,
                   estimator=float(np.sqrt(eta2.sum())),
                   marked=n_marked, cg_time=dt)
        print(row)
        rows.append(row)
    # singular solution: expected uniform-refinement L2 rate ~ 2*2/3
    if len(rows) > 1:
        import math
        r = [math.log2(rows[i - 1]["cg_L2error"] / rows[i]["cg_L2error"])
             for i in range(1, len(rows))]
        print("L2 rates per refinement:", [f"{x:.2f}" for x in r])


if __name__ == "__main__":
    main()
