"""matvec_dg_cheby benchmark: single-precision fused Chebyshev-update DG
matvec and transformed-Jacobi preconditioner timings
(port of /root/reference/matvec_dg_cheby/program.cc)."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # noqa: E402  (repo-root import when run as a script)


import argparse
import time

import numpy as np


def run(degree: int, kind: str, n_cell_steps: int):
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from multigrid_tpu.ops.dg import DGGrid, DGLaplace
    from multigrid_tpu.ops.dg_precond import JacobiTransformed
    from multigrid_tpu.solvers.fused import vmult_with_chebyshev_update

    dim = 3
    refinements = [1] * dim
    for c in range(n_cell_steps % dim):
        refinements[c] = 2
    base = [r * 2 ** (n_cell_steps // dim) for r in refinements]
    left = np.array([-1.0 + 0.05 * (d + 1) for d in range(dim)])
    right = np.array([0.95 - 0.06 * d for d in range(dim)])
    h = (right - left) / np.array(base)
    grid = DGGrid(cells=tuple(base), jacobian=tuple(tuple(r) for r in np.diag(h)),
                  degree=degree, kind=kind)
    op = DGLaplace(grid, jnp.float32)
    jac = JacobiTransformed(op)

    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    x = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    x_old = jnp.zeros_like(x)

    step = jax.jit(lambda rhs, x, x_old: vmult_with_chebyshev_update(
        op.vmult, jac.vmult, rhs, 0.6, 0.2, x, x_old))
    out = step(rhs, x, x_old)
    jax.block_until_ready(out)
    best = np.inf
    n_rep = max(5, min(50, 20_000_000 // grid.n_dofs))
    for _ in range(5):
        t0 = time.perf_counter()
        xx, xo = x, x_old
        for _ in range(n_rep):
            xx, xo = step(rhs, xx, xo)
        jax.block_until_ready(xx)
        best = min(best, (time.perf_counter() - t0) / n_rep)
    print(f"MF Chebyshev update {kind:8s} p={degree} n_dof={grid.n_dofs:>10d} "
          f" {best:.5f} s  DoFs/s {grid.n_dofs/best:.4g}")

    # standalone transformed-Jacobi apply (program.cc:183-252)
    pj = jax.jit(jac.vmult)
    pj(rhs).block_until_ready()
    best_j = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        y = rhs
        for _ in range(n_rep):
            y = pj(y)
        jax.block_until_ready(y)
        best_j = min(best_j, (time.perf_counter() - t0) / n_rep)
    print(f"JacobiTransformed    {kind:8s} p={degree} n_dof={grid.n_dofs:>10d} "
          f" {best_j:.5f} s  DoFs/s {grid.n_dofs/best_j:.4g}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--degrees", type=int, nargs="+", default=[3, 4, 5])
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--kind", default="gauss")
    args = ap.parse_args()
    for degree in args.degrees:
        run(degree, args.kind, args.steps)


if __name__ == "__main__":
    main()
