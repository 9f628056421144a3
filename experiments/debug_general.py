"""Hardware gate + A/B timing for the general-geometry operator forms.

Compares, on the live backend, the MXU-native general operators
(ops/laplace_general_mxu: Ozaki dp sandwich, f32 HIGHEST-precision
sandwich) AND the block-padded scatter-free forms (ops/laplace_block)
against the round-3 sweep-form oracles (GeneralLaplaceDF64, einsum
GeneralLaplace) on real shell-ladder meshes with the poisson_shell
coefficient.  CPU/interpret tests cannot see TPU precision or fusion
behaviour (CLAUDE.md kernel-change rule) — run this on hardware before
defaulting MGT_GENERAL_MXU / MGT_GENERAL_BLOCK anywhere.

At cycles >= 9 the emulated-f64/df64 oracles are skipped (the df64
COMPILE alone took ~40 min at 13M — general_gate13m r4) and the flat
Ozaki form is the accuracy reference instead.

Usage: python experiments/debug_general.py [cycle ...]
(cycles index the poisson_shell ladder: even = 6-block, odd = 12-block,
n_levels = 1 + cycle//2; default 2 4 6 8)
"""

import sys
import time

sys.path.insert(0, ".")


def _time3(f, *a):
    import numpy as np

    f(*a).block_until_ready()
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        f(*a).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def check(cycle: int, degree: int = 4) -> bool:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multigrid_tpu.mesh.mapped import GeneralGrid
    from multigrid_tpu.mesh.shapes import hyper_shell, hyper_shell_12
    from multigrid_tpu.ops.laplace_block import (BlockGeneralMXU,
                                                 BlockGeneralOzaki)
    from multigrid_tpu.ops.laplace_general import GeneralLaplace
    from multigrid_tpu.ops.laplace_general_df64 import GeneralLaplaceDF64
    from multigrid_tpu.ops.laplace_general_mxu import (GeneralLaplaceMXU,
                                                       GeneralLaplaceOzaki)
    from experiments.poisson_shell import coef_fn

    n_levels = 1 + cycle // 2
    mesh = (hyper_shell if cycle % 2 == 0 else hyper_shell_12)(
        0.5, 1.0, n_levels=n_levels)
    g = GeneralGrid(mesh, mesh.max_level, degree)
    lay = g.block_layout()
    coef = g.merged_coefficient(coef_fn)
    slow_oracles = cycle < 9
    boz = BlockGeneralOzaki(g, coef=coef)
    bmx = BlockGeneralMXU(g, jnp.float32, coef=coef)

    rng = np.random.default_rng(cycle)
    x = jnp.asarray(rng.standard_normal(g.n_dofs))
    x32 = x.astype(jnp.float32)
    xb = lay.expand(x)
    xb32 = xb.astype(jnp.float32)
    gdofs = g.n_dofs / 1e9

    y_boz = np.asarray(jax.jit(boz.vmult)(xb))
    t_boz = _time3(jax.jit(boz.vmult), xb)
    y_bmx = np.asarray(jax.jit(bmx.vmult)(xb32))
    t_bmx = _time3(jax.jit(bmx.vmult), xb32)

    if not slow_oracles:
        # the FLAT forms do not even compile at 13M (the remote compile
        # server drops the 196k-cell gather program — general_gate13m,
        # twice); gate the block dp form by its dedup-weighted SYMMETRY
        # <Ax, y> = <x, Ay> (a wrong coefficient slice, seam sum or
        # window adjoint all break it) plus copy-consistency, and the sp
        # form against the dp result.
        # interior-masked inputs: vmult's identity boundary rows are not
        # part of the symmetric operator
        xi_b = jnp.where(boz.interior, xb, 0.0)
        x2b = jnp.where(boz.interior, lay.expand(
            jnp.asarray(rng.standard_normal(g.n_dofs))), 0.0)
        y1 = np.asarray(jax.jit(boz.vmult)(xi_b))
        y2 = np.asarray(jax.jit(boz.vmult)(x2b))
        w = lay.weights
        xi = np.asarray(xi_b, np.float64)
        x2 = np.asarray(x2b, np.float64)
        num = abs(float((w * y1) @ x2) - float((w * xi) @ y2))
        den_s = float(np.abs(w * y1) @ np.abs(x2))
        sym = num / den_s
        den = np.abs(y_boz).max()
        dev_bmx = float(np.max(np.abs(y_bmx - y_boz)) / den)
        print(f"cycle={cycle} dofs={g.n_dofs}: BLOCK dp {t_boz*1e3:.1f} ms"
              f" = {gdofs/t_boz:.3f} GDoF/s (sym dev {sym:.2e}) | "
              f"BLOCK sp {t_bmx*1e3:.1f} ms = {gdofs/t_bmx:.3f} GDoF/s "
              f"(dev vs dp {dev_bmx:.2e})", flush=True)
        return sym < 1e-12 and dev_bmx < 5e-5

    oz = GeneralLaplaceOzaki(g, coef=coef)
    mxu = GeneralLaplaceMXU(g, jnp.float32, coef=coef)
    y_oz = np.asarray(jax.jit(oz.vmult)(x))
    t_oz = _time3(jax.jit(oz.vmult), x)
    y_mxu = np.asarray(jax.jit(mxu.vmult)(x32))
    t_mxu = _time3(jax.jit(mxu.vmult), x32)

    if slow_oracles:
        df64 = GeneralLaplaceDF64(g, coef=coef)
        sp = GeneralLaplace(g, jnp.float32, coef=coef)
        y_ref = np.asarray(jax.jit(df64.vmult)(x))
        t_df = _time3(jax.jit(df64.vmult), x)
        t_sp = _time3(jax.jit(sp.vmult), x32)
        base = f"df64 {t_df*1e3:.1f} ms / einsum-sp {t_sp*1e3:.1f} ms, "
    else:
        y_ref = y_oz
        base = ""
    den = np.max(np.abs(y_ref))
    inv = lay.inverse
    dev_oz = float(np.max(np.abs(y_oz - y_ref)) / den)
    dev_boz = float(np.max(np.abs(y_boz - y_ref[inv])) / den)
    dev_mxu = float(np.max(np.abs(y_mxu - y_ref)) / den)
    dev_bmx = float(np.max(np.abs(y_bmx - y_ref[inv])) / den)
    print(f"cycle={cycle} dofs={g.n_dofs}: {base}"
          f"ozaki {t_oz*1e3:.1f} ms (dev {dev_oz:.2e}) | "
          f"BLOCK dp {t_boz*1e3:.1f} ms = {gdofs/t_boz:.3f} GDoF/s "
          f"(dev {dev_boz:.2e}) | mxu-sp {t_mxu*1e3:.1f} ms "
          f"(dev {dev_mxu:.2e}) | BLOCK sp {t_bmx*1e3:.1f} ms = "
          f"{gdofs/t_bmx:.3f} GDoF/s (dev {dev_bmx:.2e})",
          flush=True)
    ok = dev_boz < (1e-10 if slow_oracles else 1e-12) and dev_bmx < 5e-5
    if slow_oracles:
        ok = ok and dev_oz < 1e-10 and dev_mxu < 5e-5
    return ok


def main():
    cycles = [int(a) for a in sys.argv[1:]] or [2, 4, 6, 8]
    ok = all([check(c) for c in cycles])
    print("ALL OK" if ok else "MISMATCH FOUND")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
