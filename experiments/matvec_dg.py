"""matvec_dg benchmark: fused SIP-DG operator throughput on the sheared
parallelepiped mesh of /root/reference/matvec_dg/program.cc:55-77, all three
element types, with the reference's DoFs/s + GFlop/s reporting
(program.cc:176-205).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # noqa: E402  (repo-root import when run as a script)


import argparse
import time

import numpy as np


def run(degree: int, kind: str, n_cell_steps: int, dtype_name: str = "float64",
        impl: str = "fused"):
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from multigrid_tpu.ops.dg import DGGrid, DGLaplace

    dim = 3
    refinements = [1] * dim
    for c in range(n_cell_steps % dim):
        refinements[c] = 2
    base = [r * 2 ** (n_cell_steps // dim) for r in refinements]
    left = np.array([-1.0 + 0.05 * (d + 1) for d in range(dim)])
    right = np.array([0.95 - 0.06 * d for d in range(dim)])
    h = (right - left) / np.array(base)
    trafo = np.eye(dim)
    for a in range(dim):
        for b in range(dim):
            trafo[a, b] += 0.12 * (a + 1) * (b + 1)
    J = trafo @ np.diag(h)
    grid = DGGrid(cells=tuple(base), jacobian=tuple(tuple(r) for r in J),
                  degree=degree, kind=kind)
    dtype = getattr(jnp, dtype_name)
    if impl == "ozaki":
        # bf16-MXU dp path (ops/dg_ozaki.py); dp accuracy, MXU throughput
        from multigrid_tpu.ops.dg_ozaki import DGLaplaceOzaki

        op = DGLaplaceOzaki(grid)
        dtype_name = "float64"
        dtype = jnp.float64
    elif impl == "curved":
        # per-point-geometry pipeline (ops/dg_curved.py) on the SAME
        # sheared map expressed as a chart: measures the general-geometry
        # operator's throughput while staying cross-verifiable against
        # the face-based oracle (the reference pattern, matvec_dg
        # program.cc:206-207; its geometry-general analogue is the CG
        # shell path)
        from multigrid_tpu.ops.dg_curved import DGCurvedGrid, DGLaplaceCurved

        scale = right - left
        cgrid = DGCurvedGrid(
            tuple(base), lambda p: (p * scale[None, :]) @ trafo.T,
            degree, kind)
        op = DGLaplaceCurved(cgrid, dtype)
    elif impl == "df64":
        # pair-arithmetic dp operator (ops/dg_df64): the dp tier ABOVE the
        # p <= 4 Ozaki exact-accumulation bound (VERDICT r5 #8); verified
        # against the face-based f64 oracle like every other impl
        from multigrid_tpu.ops.dg_df64 import DGLaplaceDF64

        op = DGLaplaceDF64(grid)
        dtype_name = "float64"
        dtype = jnp.float64
    elif impl == "pallas":
        # fused Mosaic kernel (ops/pallas_dg): sp via --dtype float32, dp
        # (pair Ozaki, p <= 4) via float64.  The TIMED apply runs on the
        # persistent [cz, N, F] kernel layout (the DG solver vector
        # format, like the CG windowed-pair layout); verification below
        # converts through the natural layout against the face oracle.
        from multigrid_tpu.ops.pallas_dg import PallasDGOzaki, PallasDGSP

        op = (PallasDGOzaki(grid) if dtype_name == "float64"
              else PallasDGSP(grid))
    else:
        op = DGLaplace(grid, dtype)
    vmult = jax.jit(op.vmult)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(grid.shape), dtype)
    if impl == "pallas":
        to_k = (op.to_kernel_pair if dtype_name == "float64"
                else op.to_kernel)
        xk = jax.jit(to_k)(x)
        vmult_k = jax.jit(op.vmult_kernel)
        vmult_k(xk).block_until_ready()
    y = vmult(x)
    y.block_until_ready()

    # cross-verification against the independent face-based operator
    # (/root/reference/matvec_dg/program.cc:206-207: output -= reference)
    from multigrid_tpu.ops.dg_face import DGLaplaceFaceBased

    y_ref = jax.jit(DGLaplaceFaceBased(grid, dtype).vmult)(x)
    verify = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))

    n_rep = max(5, min(100, 20_000_000 // grid.n_dofs))
    timed = (lambda: vmult_k(xk)) if impl == "pallas" else (lambda: vmult(x))
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(n_rep):
            z = timed()
        z.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / n_rep)
    dofs_per_s = grid.n_dofs / best

    # throughput models in the reference's reporting style
    # (/root/reference/matvec_dg/program.cc:176-205), with the op count
    # matching THIS pipeline (batched dense contractions, no even-odd):
    # gradients + integrate: 2*dim sweeps of 2*N*n; basis change S/St for
    # non-collocation bases: 2*dim sweeps; volume quad op: (2*dim^2+dim)*N;
    # per face: value+grad traces, flux, and lifts, O(dim^2 * n^(dim-1)).
    n = degree + 1
    N = n**dim
    n_cells = int(np.prod(base))
    sweeps = 2 * dim + (0 if kind == "gauss" else 2 * dim)
    ops_cell = sweeps * 2 * N * n + (2 * dim * dim + dim) * N
    ops_face = 2 * dim * ((dim + 1) * 2 * n ** (dim - 1) * n
                          + 10 * n ** (dim - 1))
    ops = n_cells * (ops_cell + ops_face)
    nbytes = np.dtype(dtype_name).itemsize
    gbs = 1e-9 * grid.n_dofs * nbytes * 3 / best
    gflops = 1e-9 * ops / best
    label = (kind if impl == "fused"
             else f"{kind}:{dict(ozaki='ozk', curved='crv', pallas='plk', df64='d64')[impl]}")
    print(f"{label:8s} p={degree} n_dof={grid.n_dofs:>10d}  {best:.5f} s  "
          f"DoFs/s {dofs_per_s:.4g}  GFlop/s {gflops:.4g}  GB/s {gbs:.4g}  "
          f"ops/dof {ops / grid.n_dofs:.1f}  verify {verify:.2e}")
    tol = (1e-6 if dtype_name == "float32"
           else (1e-10 if impl in ("ozaki", "pallas", "df64") else 1e-11))
    assert verify < tol, verify
    return dofs_per_s


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--min-degree", type=int, default=1)
    ap.add_argument("--max-degree", type=int, default=8)
    ap.add_argument("--steps", type=int, default=12,
                    help="refinement steps (cells = 2^(steps/3))")
    ap.add_argument("--dtype", default="float64")
    ap.add_argument("--impl", default="fused",
                    choices=["fused", "ozaki", "curved", "pallas", "df64", "both"])
    args = ap.parse_args()
    for degree in range(args.min_degree, args.max_degree + 1):
        for kind in ("hermite", "gll", "gauss"):
            if args.impl in ("fused", "both"):
                run(degree, kind, args.steps, args.dtype)
            if args.impl in ("ozaki", "both") and args.dtype == "float64":
                run(degree, kind, args.steps, args.dtype, impl="ozaki")
            if args.impl == "curved":
                run(degree, kind, args.steps, args.dtype, impl="curved")
            if args.impl == "pallas":
                run(degree, kind, args.steps, args.dtype, impl="pallas")
            if args.impl == "df64":
                run(degree, kind, args.steps, args.dtype, impl="df64")


if __name__ == "__main__":
    main()
