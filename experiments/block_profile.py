"""Stage-level profile of the block-padded general operators
(ops/laplace_block): where do the 43 ns/dof/it of the shell CG go?

Times, per stage and per full apply, on a real shell-ladder mesh:
  gather   — per-block window localization (bp -> [C, N])
  matmul   — fwd grad matmuls + quad op + bwd (the arithmetic)
  scatter  — per-block additive window scatter + concat
  seam     — the O(surface) duplicate sum
for the sp (BlockGeneralMXU) and dp (BlockGeneralOzaki) forms, plus the
end-to-end vmult.  The brick flagship's equivalents are ~2.0 ns/dof/it;
VERDICT r4 #3 targets <= ~10 ns for the shell path.

Usage: python experiments/block_profile.py [cycle] (default 6; shell
ladder indexing as debug_general: n_levels = 1 + cycle//2)
"""

from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # noqa: E402


def _t(f, *a, reps=5):
    import numpy as np

    r = f(*a)
    import jax

    jax.block_until_ready(r)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from experiments.poisson_shell import coef_fn
    from multigrid_tpu.mesh.mapped import GeneralGrid
    from multigrid_tpu.mesh.shapes import hyper_shell, hyper_shell_12
    from multigrid_tpu.ops.laplace_block import (BlockGeneralMXU,
                                                 BlockGeneralOzaki)

    cycle = int(_sys.argv[1]) if len(_sys.argv) > 1 else 6
    n_levels = 1 + cycle // 2
    mesh = (hyper_shell if cycle % 2 == 0 else hyper_shell_12)(
        0.5, 1.0, n_levels=n_levels)
    g = GeneralGrid(mesh, mesh.max_level, 4)
    print(f"cycle {cycle}: {g.n_dofs} dofs, {g.n_cells} cells, "
          f"{len(g.block_layout().node_shapes)} blocks", flush=True)
    lay = g.block_layout()
    coef = g.merged_coefficient(coef_fn)
    sp = BlockGeneralMXU(g, jnp.float32, coef=coef)
    dp = BlockGeneralOzaki(g, coef=coef)
    rng = np.random.default_rng(0)
    x64 = jnp.asarray(lay.expand(jnp.asarray(
        rng.standard_normal(g.n_dofs))))
    x32 = x64.astype(jnp.float32)
    nd = g.n_dofs

    # ---- stage jits (sp)
    nb = len(lay.node_shapes)

    @jax.jit
    def sp_gather(x):
        return [sp._gather_block(x, bi) for bi in range(nb)]

    @jax.jit
    def sp_matmul(us):
        outs = []
        for bi, u in enumerate(us):
            gmat = jnp.dot(u, sp.Gf, preferred_element_type=sp.dtype,
                           precision=jax.lax.Precision.HIGHEST)
            nc = u.shape[0]
            gmat = gmat.reshape(nc, sp.dim, sp.N)
            Cq = sp._cells_of_block(sp.C, bi).reshape(nc, sp.N, -1)
            from multigrid_tpu.ops.laplace import sym_index
            t = []
            for a in range(sp.dim):
                acc = None
                for b_ in range(sp.dim):
                    term = Cq[..., sym_index(sp.dim, a, b_)] * gmat[:, b_, :]
                    acc = term if acc is None else acc + term
                t.append(acc)
            t = jnp.stack(t, axis=1).reshape(nc, sp.dim * sp.N)
            outs.append(jnp.dot(t, sp.Gb, preferred_element_type=sp.dtype,
                                precision=jax.lax.Precision.HIGHEST))
        return outs

    @jax.jit
    def sp_scatter(ys):
        return jnp.concatenate(
            [sp._scatter_block(y, bi) for bi, y in enumerate(ys)])

    @jax.jit
    def sp_seam(v):
        return lay.seam_sum(lay.pad_tail(v))

    us = jax.block_until_ready(sp_gather(x32))
    ys = jax.block_until_ready(sp_matmul(us))
    flat = jax.block_until_ready(sp_scatter(ys))
    tg = _t(sp_gather, x32)
    tm = _t(sp_matmul, us)
    ts = _t(sp_scatter, ys)
    tse = _t(sp_seam, flat)
    tv = _t(jax.jit(sp.vmult), x32)
    print(f"sp: gather {tg*1e3:8.2f} ms  matmul {tm*1e3:8.2f} ms  "
          f"scatter {ts*1e3:8.2f} ms  seam {tse*1e3:8.2f} ms  "
          f"vmult {tv*1e3:8.2f} ms  ({tv/nd*1e9:.2f} ns/dof)", flush=True)

    tvd = _t(jax.jit(dp.vmult), x64)
    print(f"dp: vmult {tvd*1e3:8.2f} ms  ({tvd/nd*1e9:.2f} ns/dof)",
          flush=True)


if __name__ == "__main__":
    main()
