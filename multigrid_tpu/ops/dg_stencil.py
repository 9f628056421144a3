"""Dense-stencil form of the fused SIP-DG operator: the kernel's matrices.

TPU re-derivation of the reference's single-sweep cell+face DG kernel
(/root/reference/common/laplace_operator_dg.h:1110-1861): on an affine
structured mesh the SIP-DG operator is a BLOCK 7-POINT STENCIL with dense
[N, N] own-cell blocks and rank-2n^2 neighbor couplings that factor through
face traces,

    y_c = A0 u_c + sum_{d,s} L_{d,s} wire_{d,s}(c),

where wire_{d,s}(c) = (u-trace, gn-trace) of the neighbor across face
(d, s) (or the Dirichlet MIRROR (-u, +gn) of cell c's own traces at the
domain boundary — laplace_operator_dg.h:1469-1485).  All quadrature
weights, penalties, Jacobian factors and basis changes fold into the
matrices at setup, so the runtime is three MXU matmul families:

    A0 [N, N]   dense own-cell block (volume + own-side face terms),
    T  [TR, N]  stacked trace extraction (all 6 faces, value + gn),
    L  [N, TR]  stacked incoming-flux lift,

plus lane rolls / a z-carry for the neighbor shifts — the shape the MXU
wants, replacing the reference's even-odd 1-D sweeps + SIMD gather
scheduling (deliberate anti-port: see SURVEY.md section 7).

Channel layout of the trace block (rows of T / columns of L): per
direction d (0=z, 1=y, 2=x), per side s (0=low, 1=high), one face block
of CH = pad8(2 n^2) rows: [0:n^2] = value trace, [n^2:2 n^2] = UNSIGNED
gn trace (gvec . grad_ref; the receiver applies its own face sign), rest
zero pad (8-row alignment so face blocks slice cleanly on TPU sublanes).
Total TR = 6 CH.

Everything is built here in numpy f64 once per (grid geometry, degree,
kind); tests pin the stencil apply against ops/dg.DGLaplace to ~1e-12.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .dg import DGGrid


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def _kron3(az, ay, ax) -> np.ndarray:
    return np.kron(np.kron(az, ay), ax)


@dataclass(frozen=True)
class DGStencil:
    """The stencil matrices of one affine DG level (all numpy f64).

    Two equivalent factorizations are exported:

    * ``A0 / T / L`` — the plain own-block + incoming-lift split
      (y = A0 u + sum L wire).  Exact in f64; used by the XLA reference.
    * ``A0v / T / LJ / LG`` — the JUMP form: A0v is the VOLUME term only
      and the face contribution is ``LJ (u_m - u_p) + LG (gn_m + gn_p)``
      per face.  Algebraically identical, but the finite-precision kernel
      MUST use this one: for smooth fields the SIP penalty cancels
      ~1e5x between u_m and u_p, and computing sigma*u_m (inside A0) and
      -sigma*u_p (inside L) as separate limb matmuls rounds each at its
      own LARGE magnitude — measured 1e-1 relative matvec error on a
      Jacobi-preconditioned iterate vs 4e-5 for the XLA sweep form,
      which subtracts the jump first (exact for nearby floats).  LG's
      per-side gn sign is folded in (Gs channels carry g_own + g_in
      unsigned)."""

    grid: DGGrid
    A0: np.ndarray          # [N, N]   volume + own-side face terms
    T: np.ndarray           # [TR, N]  outgoing traces, all faces
    L: np.ndarray           # [N, TR]  incoming lifts, all faces
    A0v: np.ndarray         # [N, N]   volume term only
    LJ: np.ndarray          # [N, TR]  jump lifts (channel layout of T)
    LG: np.ndarray          # [N, TR]  gn-sum lifts (sign folded)
    CH: int                 # rows per face block (pad8(2 n^2))
    n2: int                 # n^2 (valid rows per channel half)

    @property
    def N(self) -> int:
        return self.grid.n ** self.grid.dim

    @property
    def TR(self) -> int:
        return 2 * self.grid.dim * self.CH

    def face_rows(self, d: int, s: int) -> slice:
        return slice((2 * d + s) * self.CH, (2 * d + s + 1) * self.CH)


def build_stencil(grid: DGGrid) -> DGStencil:
    """Compose A0 / T / L from the 1-D basis + affine geometry constants
    (same semantics as ops/dg.DGLaplace.apply, matrices instead of
    sweeps)."""
    assert grid.dim == 3, "kernel path is 3-D (2-D rides the XLA operator)"
    b = grid.basis
    n = grid.n
    N = n ** 3
    n2 = n * n
    CH = _pad8(2 * n2)
    Ident = np.eye(n)

    S3 = _kron3(b.S, b.S, b.S) if grid.kind != "gauss" else np.eye(N)
    # collocation derivative along node axis e (0=z, 1=y, 2=x)
    D3 = [
        _kron3(b.D_col, Ident, Ident),
        _kron3(Ident, b.D_col, Ident),
        _kron3(Ident, Ident, b.D_col),
    ]

    # geometry constants exactly as DGLaplace.__init__ (ops/dg.py)
    J = grid.J
    Jinv = np.linalg.inv(J)
    detJ = float(abs(np.linalg.det(J)))
    G = Jinv @ Jinv.T
    Gsym = detJ * G
    qw = b.quad_weights
    w3 = np.einsum("i,j,k->ijk", qw, qw, qw).reshape(-1)

    # face trace matrices Tr_{d,s} [n2, N] (contraction of node axis d with
    # f[s]); wperp = product of the two perpendicular weight vectors
    f = [np.asarray(b.f0, np.float64), np.asarray(b.f1, np.float64)]
    Tr = {}
    wperp = {}
    for d in range(3):
        mats = [Ident, Ident, Ident]
        for s in (0, 1):
            mats_s = list(mats)
            mats_s[d] = f[s].reshape(1, n)
            Tr[(d, s)] = _kron3(*mats_s)            # [n2, N] (axis d removed)
        perp = [qw, qw, qw]
        perp.pop(d)
        wperp[d] = np.einsum("i,j->ij", *perp).reshape(-1)

    face = []
    for d in range(3):
        r = Jinv.T[:, d]
        rn = np.linalg.norm(r)
        n_unit = r / rn
        sigma = n ** 2 * np.linalg.norm(n_unit @ Jinv)
        face.append(dict(jxw=detJ * rn, gvec=G[d] / rn, sigma=sigma))

    # volume term: S3^T (sum_ef Gsym[e,f] D_e^T diag(w3) D_f) S3
    vol = np.zeros((N, N))
    for e in range(3):
        for f_ in range(3):
            vol += Gsym[e, f_] * (D3[e].T @ (w3[:, None] * D3[f_]))
    A0 = S3.T @ vol @ S3

    A0v = np.array(A0)                              # volume term only
    T = np.zeros((6 * CH, N))
    L = np.zeros((N, 6 * CH))
    LJ = np.zeros((N, 6 * CH))
    LG = np.zeros((N, 6 * CH))
    for d in range(3):
        fd = face[d]
        wf = fd["jxw"] * wperp[d]                   # [n2]
        for s in (0, 1):
            sign = 1.0 if s == 1 else -1.0
            T_u = Tr[(d, s)] @ S3                   # [n2, N]
            T_g = np.zeros_like(T_u)
            for e in range(3):
                T_g += fd["gvec"][e] * (Tr[(d, s)] @ D3[e] @ S3)
            Lift_w = Tr[(d, s)].T * wf[None, :]     # [N, n2]
            # own-side flux folded into A0:
            #   t_val += sigma u_m - 0.5 gn_m   (gn_m = sign T_g u)
            #   t_gr  += -0.5 u_m ; acc_e += lift(t_gr wf sign gvec[e])
            own = Lift_w @ (fd["sigma"] * T_u - 0.5 * sign * T_g)
            for e in range(3):
                own += sign * fd["gvec"][e] * (
                    D3[e].T @ (Lift_w @ (-0.5 * T_u)))
            A0 += S3.T @ own
            # outgoing wire block
            r0 = (2 * d + s) * CH
            T[r0: r0 + n2] = T_u
            T[r0 + n2: r0 + 2 * n2] = T_g
            # incoming lifts: u_p = u_w, gn_p = sign g_w
            #   t_val += -sigma u_w - 0.5 sign g_w ; t_gr += 0.5 u_w
            L_u = -fd["sigma"] * Lift_w
            L_g = (-0.5 * sign) * Lift_w
            for e in range(3):
                L_u += sign * fd["gvec"][e] * (D3[e].T @ (Lift_w * 0.5))
            L[:, r0: r0 + n2] = S3.T @ L_u
            L[:, r0 + n2: r0 + 2 * n2] = S3.T @ L_g
            # jump form: contribution = LJ (u_m - u_p) + LG (g_own + g_w)
            #   t_val = sigma J - 0.5 sign (g_own + g_w); t_gr = -0.5 J
            LJ_blk = fd["sigma"] * Lift_w
            for e in range(3):
                LJ_blk += sign * fd["gvec"][e] * (D3[e].T @ (Lift_w * -0.5))
            LJ[:, r0: r0 + n2] = S3.T @ LJ_blk
            LG[:, r0 + n2: r0 + 2 * n2] = S3.T @ ((-0.5 * sign) * Lift_w)

    return DGStencil(grid=grid, A0=A0, T=T, L=L, A0v=A0v, LJ=LJ, LG=LG,
                     CH=CH, n2=n2)


class DGLaplaceStencil:
    """XLA reference implementation of the stencil form (the correctness
    stepping stone between ops/dg.DGLaplace and the Pallas kernel; also a
    usable f64 operator on CPU).  Vector layout: the kernel layout
    ``[cz, N, cy*cx]`` (node-major sublanes, layer cells in lanes)."""

    def __init__(self, grid: DGGrid, dtype=None):
        import jax.numpy as jnp

        self.grid = grid
        self.st = build_stencil(grid)
        self.dtype = dtype or jnp.float64
        self.A0 = jnp.asarray(self.st.A0, self.dtype)
        self.T = jnp.asarray(self.st.T, self.dtype)
        self.L = jnp.asarray(self.st.L, self.dtype)
        cz, cy, cx = grid.cells
        self.cz, self.cy, self.cx = cz, cy, cx
        self.F = cy * cx
        self.N = self.st.N
        self.CH = self.st.CH
        self.n2 = self.st.n2

    # ------------------------------------------------- layout conversions
    def to_kernel(self, u):
        """natural [cz, cy, cx, n, n, n] -> [cz, N, F]."""
        cz, cy, cx = self.grid.cells
        return u.transpose(0, 3, 4, 5, 1, 2).reshape(cz, self.N, self.F)

    def from_kernel(self, w):
        cz, cy, cx = self.grid.cells
        nn = self.grid.n
        return w.reshape(cz, nn, nn, nn, cy, cx).transpose(0, 4, 5, 1, 2, 3)

    # ------------------------------------------------------------- apply
    def _wire(self, t):
        """Build the incoming wire block [cz, TR, F] from the outgoing
        traces t [cz, TR, F]: z/y/x neighbor shifts + Dirichlet mirrors."""
        import jax.numpy as jnp

        cz, cy, cx = self.cz, self.cy, self.cx
        CH, n2, F = self.CH, self.n2, self.F
        tin = []
        # mirror of an own face block: u rows negated, g rows kept
        msign = np.ones(CH)
        msign[:n2] = -1.0
        msign = jnp.asarray(msign.reshape(1, CH, 1), t.dtype)

        def blk(d, s):
            return t[:, (2 * d + s) * CH:(2 * d + s + 1) * CH]

        for d in range(3):
            for s in (0, 1):
                own = blk(d, s)
                opp = blk(d, 1 - s)                 # neighbor's facing side
                if d == 0:
                    if s == 0:
                        nb = jnp.concatenate(
                            [jnp.zeros_like(opp[:1]), opp[:-1]], 0)
                        bmask = np.arange(cz) == 0
                    else:
                        nb = jnp.concatenate(
                            [opp[1:], jnp.zeros_like(opp[:1])], 0)
                        bmask = np.arange(cz) == cz - 1
                    bm = jnp.asarray(bmask.reshape(cz, 1, 1))
                else:
                    t6 = opp.reshape(cz, CH, cy, cx)
                    ax = 2 if d == 1 else 3
                    sh = -1 if s == 1 else 1
                    nb = jnp.roll(t6, sh, axis=ax).reshape(cz, CH, F)
                    ids = (np.arange(F) // cx if d == 1
                           else np.arange(F) % cx)
                    c_dim = cy if d == 1 else cx
                    bmask = ids == (c_dim - 1 if s == 1 else 0)
                    bm = jnp.asarray(bmask.reshape(1, 1, F))
                tin.append(jnp.where(bm, msign * own, nb))
        return jnp.concatenate(tin, axis=1)

    def vmult(self, u):
        """y = A u on the kernel layout [cz, N, F]."""
        import jax
        import jax.numpy as jnp

        hp = jax.lax.Precision.HIGHEST
        t = jnp.einsum("rn,znf->zrf", self.T, u, precision=hp)
        tin = self._wire(t)
        y = jnp.einsum("mn,znf->zmf", self.A0, u, precision=hp)
        y = y + jnp.einsum("mr,zrf->zmf", self.L, tin, precision=hp)
        return y

    def vmult_natural(self, u):
        return self.from_kernel(self.vmult(self.to_kernel(u)))
