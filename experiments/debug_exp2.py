"""Probe: is the backend's f32 exp2 EXACT on integer arguments?

Every Ozaki limb split in the repo derives its power-of-two row scale as
``exp2(ceil(log2(max)))`` (ops/laplace_dense, ops/transfer, the Mosaic
kernels' in-kernel sigma).  2026-08-20: XLA:CPU's f32 exp2(21.0) returned
2097153.0 = 2^21 + 1 — a non-power-of-two sigma makes ``uh / sigma`` (or
``uh * exp2(-e)``) round, silently costing the scheme 24 bits on
wide-dynamic-range rows (found via the general-geometry operator; the
brick paths' flagship L2 parity suggests the TPU's exp2 is exact, but
that was never probed directly).  This prints the verdict for the live
backend; if BAD ever appears on TPU, migrate every limb split to
ops/laplace_general_mxu.pow2_ceil_f32 and re-run hw_gate.sh.
"""

import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    print(f"backend: {jax.default_backend()}", flush=True)
    ks = np.arange(-126, 128, dtype=np.float32)
    got = np.asarray(jax.jit(jnp.exp2)(jnp.asarray(ks)), np.float64)
    ref = 2.0 ** ks.astype(np.float64)
    bad = np.nonzero(got != ref)[0]
    print(f"exp2(k), k in [-126, 127]: {len(bad)} inexact", flush=True)
    for i in bad[:8]:
        print(f"  exp2({ks[i]:.0f}) = {got[i]!r} != {ref[i]!r}")
    gotn = np.asarray(jax.jit(lambda x: jnp.exp2(-x))(jnp.asarray(ks)),
                      np.float64)
    badn = np.nonzero(gotn != 2.0 ** (-ks.astype(np.float64)))[0]
    print(f"exp2(-k): {len(badn)} inexact", flush=True)

    # ceil(log2(x)) sanity on exact powers and near-powers
    x = np.float32(2.0) ** np.arange(-20, 21, dtype=np.float32)
    cl = np.asarray(jax.jit(lambda v: jnp.ceil(jnp.log2(v)))(jnp.asarray(x)))
    badc = np.nonzero(cl != np.arange(-20, 21, dtype=np.float32))[0]
    print(f"ceil(log2(2^k)): {len(badc)} wrong", flush=True)

    ok = len(bad) == 0 and len(badn) == 0 and len(badc) == 0
    print("EXP2 EXACT" if ok else "EXP2 BAD", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
