"""minimal_surface experiment: Newton solver for the nonlinear
minimal-surface equation -div(grad u / sqrt(1 + |grad u|^2)) = 0.

Port of /root/reference/minimal_surface/program.cc: 2-D unit disc
(hyper_ball), boundary data sin(2 pi (x+y)), FE_Q(4); per-Newton-iteration
linearized coefficient tensor ``(I - w w^T/(1+|w|^2)) / sqrt(1+|w|^2)``
merged with the geometry (program.cc:102-165), solution restricted to all
multigrid levels by nodal injection (program.cc:416-457), CG rtol 1e-4
with the V-cycle preconditioner, and a halving line search
(program.cc:552-567); outer loop to ||r|| < 1e-12.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # noqa: E402  (repo-root import when run as a script)


import argparse
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)


def g_fn(coords):
    return np.sin(2 * np.pi * (coords[0] + coords[1]))


def zero_fn(coords):
    return 0.0 * coords[0]


class MinimalSurfaceNewton:
    def __init__(self, n_levels=3, degree=4):
        import jax
        import jax.numpy as jnp

        from multigrid_tpu.mesh.shapes import hyper_ball_2d
        from multigrid_tpu.ops.laplace import apply_1d, sym_components
        from multigrid_tpu.solvers.multigrid_general import GeneralMultigridSolver

        self.jnp = jnp
        self.jax = jax
        mesh = hyper_ball_2d(1.0, n_levels=n_levels)
        # block_mode off: the Newton machinery reads ops_dp fields and
        # restrict_solution, which ride the flat layout
        self.solver = GeneralMultigridSolver(
            mesh, degree, g_fn, zero_fn, n_pre=2, n_post=2, n_cycles=1,
            block_mode=False,
        )
        s = self.solver
        self.dim = 2
        # device geometry per level for coefficient evaluation
        self.Jinv = []
        self.jxw = []
        for g in s.grids:
            shape = (g.n_cells,) + (g.n,) * g.dim
            self.Jinv.append(jnp.asarray(
                np.linalg.inv(g.jacobians).reshape(shape + (g.dim, g.dim))))
            self.jxw.append(jnp.asarray(g.jxw.reshape(shape)))
        self._apply_1d = apply_1d
        self._sym = sym_components(2)

    # -------------------------------------------------------------- fields
    def phys_grad(self, level, u):
        """Physical gradient at quad points: J^{-T} grad_ref u."""
        s = self.solver
        op = s.ops_dp[level]
        g = op._eval_grads(op.gather(u))
        J = self.Jinv[level]
        return [
            sum(J[..., b, a] * g[b] for b in range(self.dim))
            for a in range(self.dim)
        ]

    def linearized_coef(self, level, u):
        """Merged Newton coefficient (program.cc:120-165):
        jxw * J^{-1} c(w) J^{-T}, c = (I - w w^T/(1+|w|^2))/sqrt(1+|w|^2)."""
        jnp = self.jnp
        w = self.phys_grad(level, u)
        J = self.Jinv[level]
        norm2 = sum(wi * wi for wi in w)
        s_ = jnp.sqrt(1.0 + norm2)
        f = 1.0 / (1.0 + norm2)
        # v_a = (J^{-1} w)_a
        v = [sum(J[..., a, b] * w[b] for b in range(self.dim)) for a in range(self.dim)]
        G = [
            [sum(J[..., a, k] * J[..., b, k] for k in range(self.dim))
             for b in range(self.dim)]
            for a in range(self.dim)
        ]
        comps = self._sym
        C = []
        for (a, b) in comps:
            C.append((G[a][b] - v[a] * v[b] * f) / s_ * self.jxw[level])
        return jnp.stack(C, axis=-1)

    def residual(self, u):
        """Nonlinear residual -(flux, grad phi) with zero Dirichlet rows
        (program.cc:169-198); u carries its boundary values."""
        jnp = self.jnp
        s = self.solver
        level = s.maxlevel
        op = s.ops_dp[level]
        w = self.phys_grad(level, u)
        norm2 = sum(wi * wi for wi in w)
        inv_s = 1.0 / jnp.sqrt(1.0 + norm2)
        flux = [wi * inv_s for wi in w]
        # reference-space test contraction: sum_a (J^{-1} flux)_a jxw
        J = self.Jinv[level]
        ref = [
            sum(J[..., a, b] * flux[b] for b in range(self.dim)) * self.jxw[level]
            for a in range(self.dim)
        ]
        acc = self._apply_1d(ref[0], op.Dt, 1)
        for d in range(1, self.dim):
            acc = acc + self._apply_1d(ref[d], op.Dt, 1 + d)
        for d in range(self.dim):
            acc = self._apply_1d(acc, op.St, 1 + d)
        r = -op.scatter_add(acc)
        return jnp.where(op.interior, r, 0.0)

    def restrict_solution(self, u_fine):
        """Pointwise FE restriction down the hierarchy
        (program.cc:416-457); returns per-level solutions."""
        s = self.solver
        sols = [None] * len(s.grids)
        sols[-1] = u_fine
        for l in range(len(s.grids) - 2, -1, -1):
            sols[l] = s.transfers_nobc[l + 1].restrict_solution(sols[l + 1])
        return sols

    # --------------------------------------------------------------- solve
    def _setup_step_jit(self):
        """One jitted Newton setup: restrict the solution down the hierarchy
        and evaluate all per-level linearized coefficients + the nonlinear
        residual.  Compiled ONCE; iterations only stream new ``u`` arrays."""
        jax = self.jax

        def f(u):
            sols = self.restrict_solution(u)
            coefs = [self.linearized_coef(l, sols[l]) for l in range(len(sols))]
            r = self.residual(u)
            return coefs, r

        return jax.jit(f)

    def solve(self, tol=1e-12, max_newton=30, verbose=True, u0=None):
        jnp = self.jnp
        s = self.solver
        if u0 is None:
            u0 = 0.0
        u = jnp.where(s.bmask[s.maxlevel], s.u_bc[s.maxlevel], u0)
        if not hasattr(self, "_setup_jit"):
            self._setup_jit = self._setup_step_jit()
            self._resnorm_jit = self.jax.jit(
                lambda u: jnp.linalg.norm(self.residual(u))
            )
        res_norms = []
        cg_total = 0
        for it in range(max_newton):
            coefs, r = self._setup_jit(u)
            s.update_coefficients(coefs)
            rn = float(jnp.linalg.norm(r))
            res_norms.append(rn)
            if verbose:
                print(f"Newton {it}: |r| = {rn:.3e}")
            if rn < tol:
                break
            delta, cg_its, _ = s.solve_cg(rtol=1e-4, b=r)
            cg_total += cg_its
            delta = jnp.where(s.bmask[s.maxlevel], 0.0, delta)
            alpha = 1.0
            for _ls in range(12):
                rn_new = float(self._resnorm_jit(u + alpha * delta))
                if rn_new < rn:
                    break
                alpha *= 0.5
            u = u + alpha * delta
            if verbose:
                print(f"  cg_its {cg_its}, step length {alpha}")
        return u, res_norms, cg_total


def run_refinement_cycles(n_cycles=2, first_levels=3, degree=4, tol=1e-12,
                          verbose=True):
    """Newton solve + global refinement cycles with solution interpolation
    (/root/reference/minimal_surface/program.cc:623-647): after each
    converged solve the ball mesh is refined once, the solution is
    interpolated (2:1 FE embedding) onto the new finest level, and Newton
    restarts warm — taking fewer iterations each cycle."""
    import jax.numpy as jnp

    results = []
    u = None
    for cyc in range(n_cycles):
        levels = first_levels + cyc
        newton = MinimalSurfaceNewton(levels, degree)
        s = newton.solver
        if u is not None:
            # the new hierarchy's second-finest level IS the previous finest
            # mesh (nested generator), so interpolation = one FE prolongation
            u0 = s.transfers_nobc[s.maxlevel].prolongate(u)
        else:
            u0 = None
        t0 = time.perf_counter()
        u, res, cg_total = newton.solve(tol=tol, verbose=verbose, u0=u0)
        dt = time.perf_counter() - t0
        results.append(dict(cycle=cyc, dofs=s.grids[s.maxlevel].n_dofs,
                            newton_its=len(res) - 1, cg_its=cg_total,
                            final_residual=res[-1], seconds=dt))
        if verbose:
            print(f"cycle {cyc}: {results[-1]}")
    return results


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--degree", type=int, default=4)
    ap.add_argument("--cycles", type=int, default=1,
                    help="refinement cycles (program.cc:623-647)")
    args = ap.parse_args()
    t0 = time.perf_counter()
    if args.cycles > 1:
        run_refinement_cycles(args.cycles, args.levels, args.degree)
    else:
        newton = MinimalSurfaceNewton(args.levels, args.degree)
        u, res, cg_total = newton.solve()
        print(f"converged in {len(res)-1} Newton steps "
              f"({cg_total} CG its), {time.perf_counter()-t0:.1f}s; "
              f"final |r| = {res[-1]:.3e}")


if __name__ == "__main__":
    main()
