"""Hardware validation of the windowed sp kernel epilogue variants.

The CLAUDE.md kernel-change rule: CPU/interpret tests cannot see TPU
precision or Mosaic-adjacent miscompiles — every change near the fused
kernels' layouts must be re-validated on hardware.  This probe checks, at
several lane geometries (incl. padded ones):

1. the in-place aliased cheb pass (MGT_CHEB_ALIAS,
   PallasWindowedSP._call_inplace) vs the blocked+pad path — BIT-exact;
2. resid_fused vs vmult_windowed + XLA subtract — BIT-exact;
3. the bare windowed matvec vs the dense-element XLA oracle — f32-class.

Usage: python experiments/debug_spwin.py [cz cy cx [cz cy cx ...]]
"""

import sys

sys.path.insert(0, ".")


def check(cells):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multigrid_tpu.mesh.brick import BrickMesh, DofGrid
    from multigrid_tpu.ops.laplace import LaplaceOperator
    from multigrid_tpu.ops.laplace_dense import DenseLaplaceF32
    from multigrid_tpu.ops.pallas_windowed_sp import PallasWindowedSP

    mesh = BrickMesh(coarse_cells=cells, origin=(-0.9,) * 3,
                     lengths=(1.9, 1.3, 1.1), n_levels=1)
    grid = DofGrid(mesh, 0, 4)
    import os

    cyc = int(os.environ.get("MGT_CY_CHUNK", "16") or "16")
    op = PallasWindowedSP(grid, cy_chunk=cyc)
    lap = LaplaceOperator(grid, jnp.float32)
    op.install_diag_factors(lap)

    rng = np.random.default_rng(0)

    def wvec(seed):
        r = np.random.default_rng(seed).standard_normal(grid.shape)
        return jax.jit(lambda a: op.to_windowed(jnp.where(
            op.interior, a, 0)))(jnp.asarray(r, jnp.float32))

    x, x_old, b = wvec(1), wvec(2), wvec(3)

    # 1. in-place aliased cheb pass vs blocked+pad path
    import os
    os.environ.pop("MGT_CHEB_ALIAS", None)
    ref = np.asarray(jax.jit(
        lambda a, o, c: op.cheb_fused(a, o, c, 0.37, 0.81))(x, x_old, b))
    os.environ["MGT_CHEB_ALIAS"] = "1"
    try:
        got = np.asarray(jax.jit(
            lambda a, o, c: op.cheb_fused(a, o, c, 0.37, 0.81))(x, x_old, b))
    finally:
        del os.environ["MGT_CHEB_ALIAS"]
    cheb_dev = float(np.max(np.abs(got - ref)))

    # 2. resid_fused vs two-step
    two = np.asarray(jax.jit(
        lambda a, c: c - op.vmult_windowed(a))(x, b))
    # the two-step reference zero-pads via _finish; b's pads are zero too
    fused = np.asarray(jax.jit(op.resid_fused)(x, b))
    rf_dev = float(np.max(np.abs(fused - two)))

    # 3. bare matvec vs dense-element XLA oracle (f32 class)
    xn = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    xn = jnp.where(jnp.asarray(~np.asarray(grid.boundary_mask())), xn, 0.0)
    oracle = DenseLaplaceF32(grid)
    y_ref = np.asarray(jax.jit(oracle.vmult)(xn))
    y = np.asarray(jax.jit(op.vmult)(xn))
    scale = np.max(np.abs(y_ref)) or 1.0
    mv_dev = float(np.max(np.abs(y - y_ref))) / scale

    print(f"cells={cells}: cheb_alias dev {cheb_dev:.2e}, resid_fused dev "
          f"{rf_dev:.2e}, matvec rel dev {mv_dev:.2e}", flush=True)
    return cheb_dev == 0.0 and rf_dev == 0.0 and mv_dev < 2e-5


def main():
    args = [int(a) for a in sys.argv[1:]]
    if args:
        shapes = [tuple(args[i:i + 3]) for i in range(0, len(args), 3)]
    else:
        shapes = [(4, 4, 128), (16, 16, 128), (8, 8, 80), (4, 16, 72)]
    ok = all([check(s) for s in shapes])
    print("ALL OK" if ok else "MISMATCH FOUND")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
