"""Staged hardware bisect of the fused DG kernel (ops/pallas_dg).

First hardware run faulted with the generic "TPU device error — often a
kernel fault" (docs/tpu_r5/pallas_dg_small.log) and the tunnel carries no
detail, so this script compiles/runs PROGRESSIVELY LARGER subsets of the
kernel body on the live backend and reports the first faulting stage:

  dma    — slab DMA only, write slab[0]
  a0     — + limb split + A0 group matmuls
  t      — + T matmuls + carry write, write a t block
  tz     — + next-layer Tzb matmuls
  wire   — + full wire assembly (rolls/mirrors/carry), write a chunk
  full   — the real vmult kernel
  cmp    — full kernel vs the XLA sweep oracle (accuracy)

Usage: python experiments/debug_pallas_dg.py [cells_per_axis] [degree]
(default 4 4 -> 64 cells/layer, small).  Exits nonzero on first fault.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # noqa: E402

import functools

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import multigrid_tpu.ops.pallas_dg as pd
    from multigrid_tpu.ops.dg import DGGrid, DGLaplace

    c = int(_sys.argv[1]) if len(_sys.argv) > 1 else 4
    p = int(_sys.argv[2]) if len(_sys.argv) > 2 else 4
    J = np.diag([1.0 / c] * 3)
    g = DGGrid(cells=(c, c, c), jacobian=tuple(map(tuple, J)), degree=p,
               kind="hermite")
    k = pd.PallasDGSP(g)
    print(f"grid {g.cells} p={p} N={k.N} F={k.F} Fp={k.Fp} Q={k.Q} "
          f"interpret={k.interpret}", flush=True)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(g.shape), jnp.float32)
    xk = jax.jit(k.to_kernel)(u)
    jax.block_until_ready(xk)
    N, Fp, Q, DQ, cz = k.N, k.Fp, k.Q, k.DQ, k.cz
    _I0 = np.int32(0)

    def call(body, out_rows):
        mats = k._mats()
        const_spec = [
            pl.BlockSpec(m.stack.shape, lambda zi: (_I0, _I0),
                         memory_space=pltpu.VMEM)
            for m in mats
        ]
        return pl.pallas_call(
            body,
            grid=(cz,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), *const_spec],
            out_specs=pl.BlockSpec((1, out_rows, Fp),
                                   lambda zi: (zi, _I0, _I0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((cz, out_rows, Fp), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, N, Fp), jnp.float32),
                pltpu.VMEM((2 * Q, Fp), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=k.interpret,
        )(xk, *(m.stack for m in mats))

    def dma_body(x_hbm, a, t, z, lu0, lu1, lu2, lg0, lg1, lg2, out, slab,
                 tcar, sem):
        zi = pl.program_id(0)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(zi, 2)], slab, sem)
        cp.start()
        cp.wait()
        out[0] = slab[0]

    def a0_body(x_hbm, a, t, z, lu0, lu1, lu2, lg0, lg1, lg2, out, slab,
                tcar, sem):
        zi = pl.program_id(0)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(zi, 2)], slab, sem)
        cp.start()
        cp.wait()
        sig, big = pd._split_limbs_sp(slab[0], k.n_limbs, k.limb_bits)
        out[0] = pd._acc_sp(k.mA.terms(a, big, sig))

    def t_body(x_hbm, a, t, z, lu0, lu1, lu2, lg0, lg1, lg2, out, slab,
               tcar, sem):
        zi = pl.program_id(0)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(zi, 2)], slab, sem)
        cp.start()
        cp.wait()
        sig, big = pd._split_limbs_sp(slab[0], k.n_limbs, k.limb_bits)
        tt = pd._acc_sp(k.mT.terms(t, big, sig))
        tcar[0: Q] = tt[Q: 2 * Q]
        tcar[Q: 2 * Q] = tt[3 * Q: 4 * Q]
        out[0] = tt[: N] if tt.shape[0] >= N else jnp.pad(
            tt, ((0, N - tt.shape[0]), (0, 0)))

    def tz_body(x_hbm, a, t, z, lu0, lu1, lu2, lg0, lg1, lg2, out, slab,
                tcar, sem):
        zi = pl.program_id(0)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(zi, 2)], slab, sem)
        cp.start()
        cp.wait()
        sig_n, big_n = pd._split_limbs_sp(slab[1], k.n_limbs, k.limb_bits)
        tzv = pd._acc_sp(k.mTzb.terms(z, big_n, sig_n))
        out[0, : 2 * Q] = tzv          # partial block write (no in-kernel pad)

    def wire_body(x_hbm, a, t, z, lu0, lu1, lu2, lg0, lg1, lg2, out, slab,
                  tcar, sem):
        zi = pl.program_id(0)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(zi, 2)], slab, sem)
        cp.start()
        cp.wait()
        sig, big = pd._split_limbs_sp(slab[0], k.n_limbs, k.limb_bits)
        tt = pd._acc_sp(k.mT.terms(t, big, sig))
        sig_n, big_n = pd._split_limbs_sp(slab[1], k.n_limbs, k.limb_bits)
        tzv = pd._acc_sp(k.mTzb.terms(z, big_n, sig_n))
        (wire,) = k._wire((tt,), (tzv,), (tcar,), zi)
        tcar[0: Q] = tt[Q: 2 * Q]
        tcar[Q: 2 * Q] = tt[3 * Q: 4 * Q]
        out[0] = wire[: N]

    def l_body(x_hbm, a, t, z, lu0, lu1, lu2, lg0, lg1, lg2, out, slab,
               tcar, sem):
        zi = pl.program_id(0)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(zi, 2)], slab, sem)
        cp.start()
        cp.wait()
        sig, big = pd._split_limbs_sp(slab[0], k.n_limbs, k.limb_bits)
        tt = pd._acc_sp(k.mT.terms(t, big, sig))
        sig_n, big_n = pd._split_limbs_sp(slab[1], k.n_limbs, k.limb_bits)
        tzv = pd._acc_sp(k.mTzb.terms(z, big_n, sig_n))
        (wire,) = k._wire((tt,), (tzv,), (tcar,), zi)
        tcar[0: Q] = tt[Q: 2 * Q]
        tcar[Q: 2 * Q] = tt[3 * Q: 4 * Q]
        y = None
        lu_refs = (lu0, lu1, lu2)
        lg_refs = (lg0, lg1, lg2)
        for d in range(3):
            uch = wire[d * DQ: d * DQ + 2 * Q]
            gch = wire[d * DQ + 2 * Q: (d + 1) * DQ]
            su, bu = pd._split_limbs_sp(uch, k.n_limbs, k.limb_bits)
            sg, bg = pd._split_limbs_sp(gch, k.n_limbs, k.limb_bits)
            t1 = pd._acc_sp(k.mLu[d].terms(lu_refs[d], bu, su))
            t2 = pd._acc_sp(k.mLg[d].terms(lg_refs[d], bg, sg))
            y = t1 + t2 if y is None else y + t1 + t2
        out[0] = y

    def full_body(x_hbm, a, t, z, lu0, lu1, lu2, lg0, lg1, lg2, out, slab,
                  tcar, sem):
        out[0] = k._matvec_layer(x_hbm, a, t, z,
                                 ((lu0, lu1, lu2), (lg0, lg1, lg2)),
                                 slab, tcar, sem)

    stages = [("dma", dma_body, N), ("a0", a0_body, N), ("t", t_body, N),
              ("tz", tz_body, N), ("wire", wire_body, N),
              ("l", l_body, N), ("fullbody", full_body, N)]
    for name, body, rows in stages:
        try:
            r = call(body, rows)
            jax.block_until_ready(r)
            print(f"stage {name}: ok", flush=True)
        except Exception as e:
            print(f"stage {name}: FAULT: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            raise SystemExit(1)

    try:
        yk = k._call(xk)                  # no optimization_barrier wrappers
        jax.block_until_ready(yk)
        print("stage call_nobarrier: ok", flush=True)
    except Exception as e:
        print(f"stage call_nobarrier: FAULT: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        raise SystemExit(1)

    try:
        yk = jax.jit(k.vmult_kernel)(xk)
        jax.block_until_ready(yk)
        print("stage full: ok", flush=True)
    except Exception as e:
        print(f"stage full: FAULT: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        raise SystemExit(1)

    y0 = np.asarray(DGLaplace(g, jnp.float64).vmult(u.astype(jnp.float64)))
    yk = np.asarray(jax.jit(k.vmult)(u))
    dev = np.abs(yk - y0).max() / np.abs(y0).max()
    print(f"stage cmp: dev {dev:.2e}", flush=True)
    if dev > 3e-6:
        raise SystemExit(1)
    print("debug_pallas_dg: all ok", flush=True)


if __name__ == "__main__":
    main()
