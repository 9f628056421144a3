"""Benchmark: dp matvec throughput of the flagship poisson_cube operator.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: 8.7355e8 DoFs/s dp matvec, FE_Q(4) 3-D, 135M DoF, 12-core
Broadwell (/root/reference/README.md:124, BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_DOFS_PER_S = 8.7355e8


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from multigrid_tpu.mesh.brick import DofGrid, poisson_cube_mesh
    from multigrid_tpu.ops.laplace_dense import DenseLaplaceOzakiChunked

    degree = 4
    # pick the largest ladder size that fits comfortably in one chip's HBM
    # 128 = the reference's flagship 135M-dof case (README.md:124)
    sizes = [int(s) for s in os.environ.get("BENCH_SIZES", "128 96 64").split()]
    result = None
    use_pallas = os.environ.get("BENCH_PALLAS", "0") == "1"
    if use_pallas:
        # probe Mosaic availability in a subprocess: a failed Pallas compile
        # leaks device allocations and poisons the process
        import subprocess

        probe = (
            "import jax, jax.numpy as jnp, numpy as np, sys;"
            "sys.path.insert(0, %r);"
            "jax.config.update('jax_enable_x64', True);"
            "from multigrid_tpu.mesh.brick import DofGrid, poisson_cube_mesh;"
            "from multigrid_tpu.ops.pallas_matvec import PallasOzakiLaplace;"
            "mesh = poisson_cube_mesh(8);"
            "grid = DofGrid(mesh, mesh.max_level, 4);"
            "pop = PallasOzakiLaplace(grid);"
            "jax.jit(pop.vmult)(jnp.zeros(grid.shape)).block_until_ready();"
            "print('PALLAS_OK')"
        ) % os.path.dirname(os.path.abspath(__file__))
        try:
            r = subprocess.run([sys.executable, "-c", probe], timeout=420,
                               capture_output=True, text=True)
            use_pallas = "PALLAS_OK" in r.stdout
        except Exception:
            use_pallas = False
        print(f"# Pallas fused kernel available: {use_pallas}", file=sys.stderr)
    for size in sizes:
        try:
            mesh = poisson_cube_mesh(size)
            grid = DofGrid(mesh, mesh.max_level, degree)
            if use_pallas:
                from multigrid_tpu.ops.pallas_matvec import PallasOzakiLaplace

                op = PallasOzakiLaplace(grid)
            else:
                op = DenseLaplaceOzakiChunked(grid)
            vmult = jax.jit(op.vmult)
            x = jnp.asarray(
                np.random.default_rng(0).standard_normal(grid.shape), jnp.float64
            )
            y = vmult(x)
            y.block_until_ready()
            n_rep = 10 if grid.n_dofs > 10_000_000 else 50
            best = np.inf
            for _ in range(5):
                t0 = time.perf_counter()
                z = x
                for _ in range(n_rep):
                    z = vmult(z)
                z.block_until_ready()
                best = min(best, (time.perf_counter() - t0) / n_rep)
            result = dict(size=size, dofs=grid.n_dofs, seconds=best,
                          dofs_per_s=grid.n_dofs / best)
            break
        except Exception as e:  # OOM etc. -> try smaller
            print(f"size {size} failed: {e!r}", file=sys.stderr)
            continue
    if result is None:
        print(json.dumps({"metric": "dp_matvec_throughput", "value": 0.0,
                          "unit": "DoFs/s", "vs_baseline": 0.0}))
        return
    print(
        f"# dp matvec p=4: {result['dofs']} DoFs, {result['seconds']:.5f} s/matvec",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "dp_matvec_throughput",
                "value": result["dofs_per_s"],
                "unit": "DoFs/s",
                "vs_baseline": result["dofs_per_s"] / BASELINE_DOFS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
