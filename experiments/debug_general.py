"""Hardware gate + A/B timing for the general-geometry operator forms.

Compares, on the live backend, the MXU-native general operators
(ops/laplace_general_mxu: Ozaki dp sandwich, f32 HIGHEST-precision
sandwich) against the round-3 sweep-form oracles (GeneralLaplaceDF64,
einsum GeneralLaplace) on real shell-ladder meshes with the
poisson_shell coefficient.  CPU/interpret tests cannot see TPU
precision or fusion behaviour (CLAUDE.md kernel-change rule) — run this
on hardware before defaulting MGT_GENERAL_MXU anywhere.

Usage: python experiments/debug_general.py [cycle ...]
(cycles index the poisson_shell ladder: even = 6-block, odd = 12-block,
n_levels = 1 + cycle//2; default 2 4 6 8)
"""

import sys
import time

sys.path.insert(0, ".")


def check(cycle: int, degree: int = 4) -> bool:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multigrid_tpu.mesh.mapped import GeneralGrid
    from multigrid_tpu.mesh.shapes import hyper_shell, hyper_shell_12
    from multigrid_tpu.ops.laplace_general import GeneralLaplace
    from multigrid_tpu.ops.laplace_general_df64 import GeneralLaplaceDF64
    from multigrid_tpu.ops.laplace_general_mxu import (GeneralLaplaceMXU,
                                                       GeneralLaplaceOzaki)
    from experiments.poisson_shell import coef_fn

    n_levels = 1 + cycle // 2
    mesh = (hyper_shell if cycle % 2 == 0 else hyper_shell_12)(
        0.5, 1.0, n_levels=n_levels)
    g = GeneralGrid(mesh, mesh.max_level, degree)
    coef = g.merged_coefficient(coef_fn)
    df64 = GeneralLaplaceDF64(g, coef=coef)
    oz = GeneralLaplaceOzaki(g, coef=coef)
    sp = GeneralLaplace(g, jnp.float32, coef=coef)
    mxu = GeneralLaplaceMXU(g, jnp.float32, coef=coef)

    rng = np.random.default_rng(cycle)
    x = jnp.asarray(rng.standard_normal(g.n_dofs))
    x32 = x.astype(jnp.float32)

    fns = {
        "df64": jax.jit(df64.vmult),
        "ozaki": jax.jit(oz.vmult),
        "sp": jax.jit(sp.vmult),
        "mxu": jax.jit(mxu.vmult),
    }
    y = {}
    t = {}
    for k, f in fns.items():
        arg = x32 if k in ("sp", "mxu") else x
        y[k] = np.asarray(f(arg))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            f(arg).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        t[k] = best

    den = np.max(np.abs(y["df64"]))
    dev_dp = float(np.max(np.abs(y["ozaki"] - y["df64"])) / den)
    # each f32 form vs the dp oracle, NOT vs each other: the einsum form
    # runs its contractions at DEFAULT matmul precision, which on the MXU
    # quantizes f32 operands to bf16 (measured 2026-08-20: einsum-vs-mxu
    # dev 1.4e-2 on hardware = bf16 epsilon class, while both agree with
    # the oracle to f32 class on CPU).  The MXU form (Precision.HIGHEST)
    # is the accurate one and the one the gate enforces.
    dev_mxu = float(np.max(np.abs(y["mxu"].astype(np.float64)
                                  - y["df64"])) / den)
    dev_ein = float(np.max(np.abs(y["sp"].astype(np.float64)
                                  - y["df64"])) / den)
    gdofs = g.n_dofs / 1e9
    print(f"cycle={cycle} dofs={g.n_dofs}: dp dev {dev_dp:.2e} "
          f"(df64 {t['df64']*1e3:.1f} ms -> ozaki {t['ozaki']*1e3:.1f} ms = "
          f"{gdofs/t['ozaki']:.3f} GDoF/s, {t['df64']/t['ozaki']:.1f}x), "
          f"sp dev mxu {dev_mxu:.2e} / einsum {dev_ein:.2e} "
          f"(einsum {t['sp']*1e3:.1f} ms -> mxu {t['mxu']*1e3:.1f} ms = "
          f"{gdofs/t['mxu']:.3f} GDoF/s, {t['sp']/t['mxu']:.1f}x)",
          flush=True)
    return dev_dp < 1e-10 and dev_mxu < 5e-5


def main():
    cycles = [int(a) for a in sys.argv[1:]] or [2, 4, 6, 8]
    ok = all([check(c) for c in cycles])
    print("ALL OK" if ok else "MISMATCH FOUND")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
