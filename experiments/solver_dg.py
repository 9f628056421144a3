"""solver_dg benchmark: full CG solves on the SIP-DG system with a simple
diagonal preconditioner at fixed iteration counts, comparing element types
(port of /root/reference/solver_dg/program.cc: face-based vs cell-based vs
interleaved CG there; here the fused operator under jit, where XLA performs
the reference's hand-written vector-update interleaving automatically).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # noqa: E402  (repo-root import when run as a script)


import argparse
import time

import numpy as np


def run(degree: int, kind: str, n_cell_steps: int, n_iterations: int = 50):
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from experiments.matvec_dg import run as _  # noqa: F401 (shared mesh logic)
    from multigrid_tpu.ops.dg import DGGrid, DGLaplace
    from multigrid_tpu.ops.dg_precond import JacobiTransformed

    dim = 3
    refinements = [1] * dim
    for c in range(n_cell_steps % dim):
        refinements[c] = 2
    base = [r * 2 ** (n_cell_steps // dim) for r in refinements]
    left = np.array([-1.0 + 0.05 * (d + 1) for d in range(dim)])
    right = np.array([0.95 - 0.06 * d for d in range(dim)])
    h = (right - left) / np.array(base)
    grid = DGGrid(cells=tuple(base),
                  jacobian=tuple(tuple(r) for r in np.diag(h)),
                  degree=degree, kind=kind)
    from multigrid_tpu.ops.dg_face import DGLaplaceFaceBased

    op = DGLaplace(grid, jnp.float64)
    op_face = DGLaplaceFaceBased(grid, jnp.float64)
    jac = JacobiTransformed(op, jnp.float64)

    b = jnp.asarray(np.random.default_rng(0).standard_normal(grid.shape))

    def make_cg(apply):
        @jax.jit
        def cg_fixed(b):
            x = jnp.zeros_like(b)
            r = b
            z = jac.vmult(r)
            p = z
            rz = jnp.vdot(r, z)

            def body(_, s):
                x, r, p, rz = s
                q = apply(p)
                alpha = rz / jnp.vdot(p, q)
                x = x + alpha * p
                r = r - alpha * q
                z = jac.vmult(r)
                rz2 = jnp.vdot(r, z)
                p = z + (rz2 / rz) * p
                return (x, r, p, rz2)

            x, r, *_ = jax.lax.fori_loop(0, n_iterations, body, (x, r, p, rz))
            return x, jnp.linalg.norm(r)

        return cg_fixed

    def make_cg_unfused(apply):
        """Deliberately UNFUSED CG: every sub-step is its own jit dispatch
        (separate kernels, separate HBM passes).  The fused variants above
        run the whole loop as one program — the TPU analogue of the
        reference's interleaved CG (solver_dg/program.cc:39-70), where XLA
        performs the vector-update/cell-loop interleaving the reference
        hand-schedules.  Timing both QUANTIFIES that fusion."""
        apply_j = jax.jit(apply)
        jac_j = jax.jit(jac.vmult)
        axpy = jax.jit(lambda a, x, y: x + a * y)
        dot = jax.jit(jnp.vdot)

        def cg_fixed(b):
            x = jnp.zeros_like(b)
            r = b
            z = jac_j(r)
            p = z
            rz = dot(r, z)
            for _ in range(n_iterations):
                q = apply_j(p)
                alpha = rz / dot(p, q)
                x = axpy(alpha, x, p)
                r = axpy(-alpha, r, q)
                z = jac_j(r)
                rz2 = dot(r, z)
                p = axpy(rz2 / rz, z, p)
                rz = rz2
            return x, jnp.linalg.norm(r)

        return cg_fixed

    results = {}
    for name, cg_fixed in (
        ("cell-based", make_cg(op.apply)),
        ("face-based", make_cg(op_face.vmult)),
        ("unfused", make_cg_unfused(op.apply)),
    ):
        x, rn = cg_fixed(b)
        jax.block_until_ready(x)
        best = np.inf
        for _rep in range(3):
            t0 = time.perf_counter()
            x, rn = cg_fixed(b)
            jax.block_until_ready(x)
            best = min(best, time.perf_counter() - t0)
        per_it = best / n_iterations
        results[name] = (x, per_it)
        print(f"{name:10s} {kind:8s} p={degree} n_dof={grid.n_dofs:>10d}  "
              f"{per_it:.5f} s/it  DoFs/s/it {grid.n_dofs/per_it:.4g}  "
              f"|r|={float(rn):.3e}")
    print(f"          fusion speedup (unfused / fused cell-based): "
          f"{results['unfused'][1] / results['cell-based'][1]:.2f}x")
    # cross-verify the CG solutions
    # (/root/reference/solver_dg/program.cc:240-241, 262-263)
    ref = float(jnp.max(jnp.abs(results["face-based"][0])))
    for name in ("cell-based", "unfused"):
        diff = float(jnp.max(jnp.abs(results[name][0] - results["face-based"][0])))
        print(f"          verification {name} vs face solution: {diff/ref:.2e}")
        assert diff < 1e-9 * ref, (name, diff, ref)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--degrees", type=int, nargs="+", default=[1, 2, 3, 4])
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--kinds", nargs="+", default=["gauss"])
    args = ap.parse_args()
    for degree in args.degrees:
        for kind in args.kinds:
            run(degree, kind, args.steps)


if __name__ == "__main__":
    main()
