"""Hardware gate for the DG operator family (the hw_gate.sh DG tier).

The round-4 f32 fused DG operator FAILED its own hardware verify at bf16
class (1.7e-3 vs the face-based oracle, docs/tpu_r4/matvec_dg_sp46.log) —
the third instance of the default-precision einsum quantization failure
mode that CPU/interpret tests CANNOT see (CLAUDE.md).  This script is the
permanent guard: it runs, on the live backend,

  1. fused f32 + dp(Ozaki) vs the independent face-based oracle for all
     three element types (the reference's own acceptance check,
     /root/reference/matvec_dg/program.cc:206-207),
  2. curved-geometry f32 vs the same operator in f64 (no face-based twin
     exists for the chart path — an f32-vs-f64 self check still exposes
     bf16 quantization, 1e-3 class vs the ~1e-6 f32 roundoff expected),
  3. variable-coefficient f32 vs f64 likewise,
  4. JacobiTransformed (the DG smoother preconditioner) f32 vs f64.

Each check exits nonzero on mismatch; hw_gate.sh aborts on the first.

Usage: python experiments/debug_dg.py [steps]   (default 12)
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # noqa: E402


def _grid(degree: int, kind: str, steps: int):
    import numpy as np

    from multigrid_tpu.ops.dg import DGGrid

    dim = 3
    refinements = [1] * dim
    for c in range(steps % dim):
        refinements[c] = 2
    base = [r * 2 ** (steps // dim) for r in refinements]
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
    return grid, base, left, right, trafo


def check_fused(steps: int) -> int:
    """Fused operator vs face-based oracle (reference acceptance check)."""
    from experiments.matvec_dg import run

    bad = 0
    for degree, dtype in ((4, "float32"), (5, "float32"), (3, "float64"),
                          (4, "float64")):
        for kind in ("hermite", "gll", "gauss"):
            try:
                run(degree, kind, steps, dtype)
            except AssertionError as e:
                print(f"FAIL fused {kind} p={degree} {dtype}: verify {e}")
                bad += 1
    return bad


def _self_check(name: str, mk_op, x64, tol=1e-5) -> int:
    """f32 form of an operator vs its own f64 form (bf16 quantization of a
    single einsum shows at ~1e-3; legitimate f32 roundoff is ~1e-6)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    y64 = np.asarray(jax.jit(mk_op(jnp.float64).vmult)(x64))
    y32 = np.asarray(jax.jit(mk_op(jnp.float32).vmult)(
        x64.astype(jnp.float32)))
    dev = float(np.max(np.abs(y32 - y64)) / np.max(np.abs(y64)))
    ok = dev < tol
    print(f"{'ok  ' if ok else 'FAIL'} {name}: f32-vs-f64 dev {dev:.2e} "
          f"(tol {tol:.0e})")
    return 0 if ok else 1


def check_curved(steps: int) -> int:
    import jax.numpy as jnp
    import numpy as np

    from multigrid_tpu.ops.dg_curved import DGCurvedGrid, DGLaplaceCurved

    bad = 0
    for degree, kind in ((4, "hermite"), (3, "gauss")):
        _, base, left, right, trafo = _grid(degree, kind, steps)
        scale = right - left
        cgrid = DGCurvedGrid(
            tuple(base), lambda p: (p * scale[None, :]) @ trafo.T,
            degree, kind)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal(cgrid.shape))
        bad += _self_check(f"curved {kind} p={degree}",
                           lambda dt: DGLaplaceCurved(cgrid, dt), x)
    return bad


def check_varcoeff(steps: int) -> int:
    import jax.numpy as jnp
    import numpy as np

    from multigrid_tpu.ops.dg import DGLaplaceVarCoeff

    bad = 0
    for degree, kind in ((4, "hermite"), (3, "gll")):
        grid, *_ = _grid(degree, kind, steps)
        rng = np.random.default_rng(2)
        c = jnp.asarray(1.0 + 0.5 * rng.random(grid.shape))
        x = jnp.asarray(rng.standard_normal(grid.shape))
        bad += _self_check(f"varcoeff {kind} p={degree}",
                           lambda dt: DGLaplaceVarCoeff(grid, c, dt), x)
    return bad


def check_precond(steps: int) -> int:
    import jax.numpy as jnp
    import numpy as np

    from multigrid_tpu.ops.dg import DGLaplace
    from multigrid_tpu.ops.dg_precond import JacobiTransformed

    bad = 0
    for degree, kind in ((4, "hermite"), (4, "gauss")):
        grid, *_ = _grid(degree, kind, steps)
        x = jnp.asarray(
            np.random.default_rng(3).standard_normal(grid.shape))
        bad += _self_check(
            f"jacobi_t {kind} p={degree}",
            lambda dt: JacobiTransformed(DGLaplace(grid, dt), dt), x)
    return bad


def main():
    steps = int(_sys.argv[1]) if len(_sys.argv) > 1 else 12
    import jax

    jax.config.update("jax_enable_x64", True)
    print(f"debug_dg on {jax.devices()} steps={steps}")
    bad = check_fused(steps)
    bad += check_curved(max(6, steps - 3))
    bad += check_varcoeff(max(6, steps - 3))
    bad += check_precond(max(6, steps - 3))
    if bad:
        print(f"debug_dg: {bad} FAILURES")
        raise SystemExit(1)
    print("debug_dg: all ok")


if __name__ == "__main__":
    main()
