"""Hardware validation of the windowed-pair dp path vs XLA Ozaki.

The 2026-08-18 flagship sweep showed cg_L2error 4.9e-4 from the
pair-native stepped CG (and the MGT_DP_NODE_VIA_WIN=1 FMG guard tripping
at the same magnitude) while FMG via the XLA-entry dp residuals is
correct — suspicion falls on the windowed dp kernel or its pair-layout
conversions at flagship shapes.  cx must be a multiple of 128 for the
kernel, but cz/cy are free: small-cz/cy bricks reproduce the lane
geometry at a fraction of the dofs, so a mismatch localizes per axis on
hardware in seconds.

Usage: python experiments/debug_dpwin.py [cz cy cx [cz cy cx ...]]
(defaults sweep (4,4,128), (4,128,128), (64,4,128), (16,16,128))
"""

import sys

sys.path.insert(0, ".")


def check(cells):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multigrid_tpu.mesh.brick import BrickMesh, DofGrid
    from multigrid_tpu.ops.laplace_dense import DenseLaplaceOzaki
    from multigrid_tpu.ops.pallas_windowed import PallasWindowedOzaki

    mesh = BrickMesh(coarse_cells=cells, origin=(-0.9,) * 3,
                     lengths=(1.9, 1.3, 1.1), n_levels=1)
    grid = DofGrid(mesh, 0, 4)
    ref = DenseLaplaceOzaki(grid)                      # XLA Ozaki oracle
    import os

    cyc = int(os.environ.get("MGT_CY_CHUNK", "16") or "16")
    win = PallasWindowedOzaki(grid, cy_chunk=cyc)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(grid.shape), jnp.float64)
    x = jnp.where(jnp.asarray(~np.asarray(grid.boundary_mask())), x, 0.0)

    y_ref = np.asarray(jax.jit(ref.vmult)(x))

    # 1. conversion roundtrip (df64 pair: ~2^-49 reconstruction)
    xw = jax.jit(win.to_windowed)(x)
    x_rt = np.asarray(jax.jit(win.from_windowed)(xw))
    rt_dev = float(np.max(np.abs(x_rt - np.asarray(x))))

    # 2. full windowed matvec (node in/out, kernel inside)
    y_win = np.asarray(jax.jit(win.vmult)(x))
    scale = np.max(np.abs(y_ref)) or 1.0
    mv_dev = float(np.max(np.abs(y_win - y_ref))) / scale

    loc = ""
    if mv_dev > 1e-12:
        d = np.abs(y_win - y_ref)
        idx = np.unravel_index(np.argmax(d), d.shape)
        nz = np.argwhere(d > 1e-12 * scale)
        loc = (f"\n  worst at zyx={idx}; bad region z[{nz[:,0].min()}"
               f":{nz[:,0].max()+1}] y[{nz[:,1].min()}:{nz[:,1].max()+1}]"
               f" x[{nz[:,2].min()}:{nz[:,2].max()+1}]"
               f" ({len(nz)}/{d.size} wrong)")

    print(f"cells={cells}: roundtrip dev {rt_dev:.2e}, "
          f"matvec rel dev {mv_dev:.2e}{loc}", flush=True)
    # (the MGT_DP_RESID_FUSED tier was deleted with the dead kernel path
    # in r5 — it miscompiled on hardware and never shipped, dpwin_gate18)
    return mv_dev <= 1e-12 and rt_dev < 5e-15


def main():
    import jax

    # x64 ON so the pair's lo plane carries real data: without it the
    # f64 inputs silently truncate to f32 and the two_sum lo-limb paths
    # run on zeros (every r3/r4 gate log shows the truncation warning —
    # found r5; the kernel-vs-oracle bit-exactness those runs proved was
    # hi-plane-only)
    jax.config.update("jax_enable_x64", True)
    args = [int(a) for a in sys.argv[1:]]
    if args:
        shapes = [tuple(args[i:i + 3]) for i in range(0, len(args), 3)]
    else:
        shapes = [(4, 4, 128), (4, 128, 128), (64, 4, 128), (16, 16, 128),
                  # zero-padded window geometry (cxp = 128 > cx)
                  (8, 8, 80), (4, 8, 96), (4, 4, 112),
                  # 2.0x pad ratio (the default since bench_pad2)
                  (8, 8, 64), (4, 16, 72)]
    ok = all([check(s) for s in shapes])
    print("ALL OK" if ok else "MISMATCH FOUND")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
