"""Cone algebra for symmetric cones K = R^l_+ x Q^q1 x ... x S^s1_+ x ...

TPU-native re-implementation of the capability of the reference's cone
kernels (reference: src/C/misc_solvers.c — scale/scale2/pack/unpack/sdot/
snrm2/sprod/sinv/max_step — and their Python fallbacks in
src/python/misc.py:250-1053).  The design is functional rather than
in-place: every operation is a pure, jit-traceable function over a flat cone
vector, with the cone structure carried by a static, hashable `ConeDims`.

Vector layout (matches the reference's convention,
doc/source/coneprog.rst): a cone vector u of dims (l, q, s) is a flat array

    [ u_l (l entries) |
      u_q0 (q[0] entries) ... |
      u_s0 (s[0]**2 entries, full symmetric storage) ... ]

Semidefinite blocks are stored as *full* symmetric matrices so that plain
elementwise dot products equal the trace inner product — this avoids the
reference's packed-storage gymnastics (misc_solvers.c:404-544) and keeps
every operation MXU/VPU friendly.

The Nesterov-Todd scaling W (reference misc.py:250 compute_scaling) is
represented as a pytree `NTScaling`:

  - l-cone: diagonal d  (W_l = diag(d)),
  - each second-order cone: (beta, v) with W_q = beta * (2 v v' - J),
    where J = diag(1, -1, ..., -1) and v'Jv = 1,
  - each SDP block: matrices (r, rti) with W_s: m -> r' m r and
    W_s^{-T}: m -> rti' m rti  (rti = r^{-T}).

Identities (verified by tests/test_cones.py):
  W^{-T} s = W z = lambda,   sdot(lambda, lambda) = sdot(s, z).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import config


# ---------------------------------------------------------------------------
# Cone dimensions
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ConeDims:
    """Static description of a product cone.

    l: dimension of the nonnegative orthant
    q: sizes of the second-order cone blocks
    s: orders of the semidefinite blocks
    """

    l: int = 0
    q: Tuple[int, ...] = ()
    s: Tuple[int, ...] = ()

    def __post_init__(self):
        object.__setattr__(self, "q", tuple(int(x) for x in self.q))
        object.__setattr__(self, "s", tuple(int(x) for x in self.s))
        if self.l < 0 or any(x < 1 for x in self.q) or any(x < 1 for x in self.s):
            raise ValueError("invalid cone dimensions")

    @classmethod
    def from_dict(cls, dims) -> "ConeDims":
        if isinstance(dims, ConeDims):
            return dims
        return cls(
            l=int(dims.get("l", 0)),
            q=tuple(dims.get("q", ())),
            s=tuple(dims.get("s", ())),
        )

    @property
    def size(self) -> int:
        """Length of the flat cone vector (full storage for s blocks)."""
        return self.l + sum(self.q) + sum(m * m for m in self.s)

    @property
    def degree(self) -> int:
        """Degree of the cone: l + len(q) + sum(s)."""
        return self.l + len(self.q) + sum(self.s)

    @property
    def qofs(self) -> Tuple[int, ...]:
        ofs, out = self.l, []
        for m in self.q:
            out.append(ofs)
            ofs += m
        return tuple(out)

    @property
    def sofs(self) -> Tuple[int, ...]:
        ofs, out = self.l + sum(self.q), []
        for m in self.s:
            out.append(ofs)
            ofs += m * m
        return tuple(out)

    def qblock(self, u, k):
        return jax.lax.dynamic_slice_in_dim(u, self.qofs[k], self.q[k]) \
            if False else u[self.qofs[k]:self.qofs[k] + self.q[k]]

    def sblock(self, u, k):
        m = self.s[k]
        return u[self.sofs[k]:self.sofs[k] + m * m].reshape(m, m)

    def with_extra_l(self, extra: int) -> "ConeDims":
        """Dims with `extra` leading orthant entries (nonlinear residuals in
        cpl are scaled exactly like 'l' entries — reference misc.py 'dnl')."""
        return ConeDims(l=self.l + extra, q=self.q, s=self.s)


def _set(u, sl, val):
    return u.at[sl].set(val.reshape(-1) if val.ndim > 1 else val)


# ---------------------------------------------------------------------------
# Identity element, inner products
# ---------------------------------------------------------------------------


def cone_e(dims: ConeDims, dtype=None):
    """Identity element of the cone: ones / (1,0,..) / I."""
    dtype = dtype or config.default_dtype
    e = jnp.zeros((dims.size,), dtype=dtype)
    e = e.at[: dims.l].set(1.0)
    for ofs in dims.qofs:
        e = e.at[ofs].set(1.0)
    for ofs, m in zip(dims.sofs, dims.s):
        eye = jnp.eye(m, dtype=dtype).reshape(-1)
        e = e.at[ofs:ofs + m * m].set(eye)
    return e


def sdot(dims: ConeDims, u, v):
    """Cone inner product.  With full symmetric storage this is the plain
    dot product (off-diagonals are stored twice, matching the trace inner
    product) — reference misc_solvers.c sdot uses packed tricks instead."""
    return jnp.dot(u, v)


def snrm2(dims: ConeDims, u):
    return jnp.sqrt(jnp.maximum(sdot(dims, u, u), 0.0))


def jdot(x):
    """Hyperbolic inner product x0^2 - ||x1||^2 of one SOC block."""
    return x[0] * x[0] - jnp.dot(x[1:], x[1:])


def jnrm2(x):
    """Hyperbolic norm sqrt(x0^2 - ||x1||^2), valid for interior points."""
    # Stable form: sqrt((x0 - ||x1||) * (x0 + ||x1||)).
    a = jnp.linalg.norm(x[1:])
    return jnp.sqrt(jnp.maximum((x[0] - a) * (x[0] + a), 0.0))


# ---------------------------------------------------------------------------
# Jordan algebra: sprod, ssqr, sinv
# ---------------------------------------------------------------------------


def sprod(dims: ConeDims, x, y, diag: bool = False):
    """Jordan product x o y.

    l: elementwise product; q: (x'y, x0 y1 + y0 x1);
    s: (XY + YX)/2.  With diag=True the s blocks of x are assumed diagonal
    (the lambda vector), allowing a cheaper product — mirrors the reference's
    `diag` flag (misc.py sprod).
    """
    out = x * y  # correct for the l part; q/s parts overwritten below
    for ofs, m in zip(dims.qofs, dims.q):
        xb, yb = x[ofs:ofs + m], y[ofs:ofs + m]
        head = jnp.dot(xb, yb)
        tail = xb[0] * yb[1:] + yb[0] * xb[1:]
        out = out.at[ofs].set(head)
        out = out.at[ofs + 1:ofs + m].set(tail)
    for ofs, m in zip(dims.sofs, dims.s):
        X = x[ofs:ofs + m * m].reshape(m, m)
        Y = y[ofs:ofs + m * m].reshape(m, m)
        if diag:
            lam = jnp.diagonal(X)
            Z = Y * 0.5 * (lam[:, None] + lam[None, :])
        else:
            Z = 0.5 * (X @ Y + Y @ X)
        out = out.at[ofs:ofs + m * m].set(Z.reshape(-1))
    return out


def ssqr(dims: ConeDims, x):
    """x o x (squared in the Jordan algebra)."""
    out = x * x
    for ofs, m in zip(dims.qofs, dims.q):
        xb = x[ofs:ofs + m]
        out = out.at[ofs].set(jnp.dot(xb, xb))
        out = out.at[ofs + 1:ofs + m].set(2.0 * xb[0] * xb[1:])
    for ofs, m in zip(dims.sofs, dims.s):
        X = x[ofs:ofs + m * m].reshape(m, m)
        out = out.at[ofs:ofs + m * m].set((X @ X).reshape(-1))
    return out


def sinv(dims: ConeDims, x, y):
    """Inverse Jordan product: solve x o out = y ... i.e. out = x \\o y,
    where the s blocks of x are diagonal (reference misc.py sinv: 'the
    inverse product x := (y o\\ x), when the s components of y are
    diagonal')."""
    out = y / x  # l part
    for ofs, m in zip(dims.qofs, dims.q):
        xb, yb = x[ofs:ofs + m], y[ofs:ofs + m]
        # Inverse of the arrow matrix Arw(x) = [[x0, x1'], [x1, x0 I]]:
        #   a = x0^2 - ||x1||^2
        #   Arw(x)^{-1} = (1/a) [[x0, -x1'], [-x1, (a I + x1 x1'/x0) / x0]]*a ...
        a = jdot(xb)
        c0 = (xb[0] * yb[0] - jnp.dot(xb[1:], yb[1:])) / a
        c1 = (yb[1:] - c0 * xb[1:]) / xb[0]
        # verify: x0*c0 + x1'c1 = y0;  c0 x1 + x0 c1 = y1
        out = out.at[ofs].set(c0)
        out = out.at[ofs + 1:ofs + m].set(c1)
    for ofs, m in zip(dims.sofs, dims.s):
        X = x[ofs:ofs + m * m].reshape(m, m)
        Y = y[ofs:ofs + m * m].reshape(m, m)
        lam = jnp.diagonal(X)
        Z = Y * (2.0 / (lam[:, None] + lam[None, :]))
        out = out.at[ofs:ofs + m * m].set(Z.reshape(-1))
    return out


# ---------------------------------------------------------------------------
# max_step
# ---------------------------------------------------------------------------


def max_step(dims: ConeDims, x):
    """min{t | x + t*e >= 0}: the negative of the distance of x to the cone
    boundary along e (reference misc_solvers.c:1042 max_step).  Negative iff
    x is strictly inside the cone."""
    vals = []
    if dims.l:
        vals.append(-jnp.min(x[: dims.l]))
    for ofs, m in zip(dims.qofs, dims.q):
        xb = x[ofs:ofs + m]
        vals.append(jnp.linalg.norm(xb[1:]) - xb[0])
    for ofs, m in zip(dims.sofs, dims.s):
        X = x[ofs:ofs + m * m].reshape(m, m)
        w = jnp.linalg.eigvalsh(0.5 * (X + X.T))
        vals.append(-w[0])
    if not vals:
        return jnp.asarray(0.0, dtype=x.dtype)
    return jnp.max(jnp.stack(vals))


# ---------------------------------------------------------------------------
# Nesterov-Todd scaling
# ---------------------------------------------------------------------------


class NTScaling(NamedTuple):
    """NT scaling point for the product cone (pytree).

    d:    (l,)         W_l = diag(d);  lambda_l = sqrt(s_l * z_l)
    beta: per-q scalar
    v:    per-q vector with v'Jv = 1;  W_q = beta (2 v v' - J)
    r, rti: per-s matrices; W_s(m) = r' m r, W_s^{-T}(m) = rti' m rti,
            rti = r^{-T}.
    """

    d: jnp.ndarray
    beta: Tuple[jnp.ndarray, ...]
    v: Tuple[jnp.ndarray, ...]
    r: Tuple[jnp.ndarray, ...]
    rti: Tuple[jnp.ndarray, ...]


def compute_scaling(dims: ConeDims, s, z):
    """Nesterov-Todd scaling W and scaled point lambda from a strictly
    feasible pair (s, z).  Functional equivalent of the reference's
    compute_scaling (misc.py:250); unlike the reference we recompute W from
    (s, z) every iteration instead of incrementally updating it
    (update_scaling, misc.py:422) — same mathematics, and the extra
    factorizations are cheap on the MXU.

    Returns (W, lmbda) with W z = W^{-T} s = lmbda.
    """
    lmbda = jnp.zeros((dims.size,), dtype=s.dtype)

    # l-cone: d = sqrt(s/z), lambda = sqrt(s*z)
    d = jnp.sqrt(s[: dims.l] / z[: dims.l]) if dims.l else jnp.zeros((0,), s.dtype)
    if dims.l:
        lmbda = lmbda.at[: dims.l].set(jnp.sqrt(s[: dims.l] * z[: dims.l]))

    betas, vs = [], []
    for ofs, m in zip(dims.qofs, dims.q):
        sb, zb = s[ofs:ofs + m], z[ofs:ofs + m]
        aa, bb = jnrm2(sb), jnrm2(zb)
        beta = jnp.sqrt(aa / bb)
        s_ = sb / aa
        z_ = zb / bb
        gamma = jnp.sqrt((1.0 + jnp.dot(s_, z_)) / 2.0)
        # Hyperbolic Householder construction: wbar = (s_ + J z_)/(2 gamma)
        # satisfies wbar'J wbar = 1 and (2 wbar wbar' - J) z_ = s_.  The NT
        # scaling needs the *square root* of that map, whose Householder
        # vector is v = (wbar + e)/sqrt(2 (wbar0 + 1)); then
        # W = beta (2 v v' - J) satisfies W^2 z = s.
        Jz = jnp.concatenate([z_[:1], -z_[1:]])
        wbar = (s_ + Jz) / (2.0 * gamma)
        vb = wbar.at[0].add(1.0) / jnp.sqrt(2.0 * (wbar[0] + 1.0))
        # lambda = W z = beta (2 v (v'z) - J z); scale-free form:
        lam_b = _soc_apply(beta, vb, zb)
        lmbda = lmbda.at[ofs:ofs + m].set(lam_b)
        betas.append(beta)
        vs.append(vb)

    rs, rtis = [], []
    for ofs, m in zip(dims.sofs, dims.s):
        S = s[ofs:ofs + m * m].reshape(m, m)
        Z = z[ofs:ofs + m * m].reshape(m, m)
        L1 = jnp.linalg.cholesky(0.5 * (S + S.T))
        L2 = jnp.linalg.cholesky(0.5 * (Z + Z.T))
        # SVD of L2' L1 = U diag(lam) V'
        U, lam, Vt = jnp.linalg.svd(L2.T @ L1)
        isqrt = 1.0 / jnp.sqrt(lam)
        r = L1 @ (Vt.T * isqrt[None, :])
        rti = L2 @ (U * isqrt[None, :])
        rs.append(r)
        rtis.append(rti)
        lmbda = lmbda.at[ofs:ofs + m * m].set(jnp.diag(lam).reshape(-1))

    return NTScaling(d=d, beta=tuple(betas), v=tuple(vs),
                     r=tuple(rs), rti=tuple(rtis)), lmbda


def identity_scaling(dims: ConeDims, dtype=None) -> NTScaling:
    """The identity scaling W = I (used for IPM initialization)."""
    dtype = dtype or config.default_dtype
    d = jnp.ones((dims.l,), dtype=dtype)
    betas, vs = [], []
    for m in dims.q:
        betas.append(jnp.asarray(1.0, dtype=dtype))
        # v = e gives W_q = 2 e e' - J = I
        vs.append(jnp.zeros((m,), dtype=dtype).at[0].set(1.0))
    rs = tuple(jnp.eye(m, dtype=dtype) for m in dims.s)
    return NTScaling(d=d, beta=tuple(betas), v=tuple(vs), r=rs, rti=rs)


def update_scaling(dims: ConeDims, W: NTScaling, s, z):
    """API-parity shim for the reference's incremental update_scaling
    (misc.py:422): recomputes the NT scaling from the current (s, z)."""
    return compute_scaling(dims, s, z)


def _soc_apply(beta, v, u):
    """beta * (2 v v' - J) u for one SOC block."""
    Ju = jnp.concatenate([u[:1], -u[1:]])
    return beta * (2.0 * v * jnp.dot(v, u) - Ju)


def _soc_apply_inv(beta, v, u):
    """W^{-1} u = (1/beta) (2 (Jv)(Jv)' - J) u."""
    Jv = jnp.concatenate([v[:1], -v[1:]])
    Ju = jnp.concatenate([u[:1], -u[1:]])
    return (2.0 * Jv * jnp.dot(Jv, u) - Ju) / beta


def scale(dims: ConeDims, W: NTScaling, u, trans: bool = False,
          inverse: bool = False):
    """Apply the NT scaling to a cone vector: W u, W' u, W^{-1} u, W^{-T} u
    (reference misc_solvers.c:62 scale).  W is symmetric on the l and q
    parts, so trans only matters for the s blocks."""
    out = u
    if dims.l:
        dl = W.d if not inverse else 1.0 / W.d
        out = out.at[: dims.l].set(u[: dims.l] * dl)
    for k, (ofs, m) in enumerate(zip(dims.qofs, dims.q)):
        ub = u[ofs:ofs + m]
        if not inverse:
            vb = _soc_apply(W.beta[k], W.v[k], ub)
        else:
            vb = _soc_apply_inv(W.beta[k], W.v[k], ub)
        out = out.at[ofs:ofs + m].set(vb)
    for k, (ofs, m) in enumerate(zip(dims.sofs, dims.s)):
        U = u[ofs:ofs + m * m].reshape(m, m)
        r, rti = W.r[k], W.rti[k]
        if not inverse and not trans:        # W u     = r' U r
            V = r.T @ U @ r
        elif not inverse and trans:          # W' u    = r U r'
            V = r @ U @ r.T
        elif inverse and not trans:          # W^{-1} u = rti U rti'
            V = rti @ U @ rti.T
        else:                                # W^{-T} u = rti' U rti
            V = rti.T @ U @ rti
        out = out.at[ofs:ofs + m * m].set(V.reshape(-1))
    return out


def _soc_sqrt(lam):
    """Jordan square root of an interior SOC vector."""
    a = jnrm2(lam)
    head = jnp.sqrt((lam[0] + a) / 2.0)
    return jnp.concatenate([head[None], lam[1:] / (2.0 * head)])


def scale2(dims: ConeDims, lmbda, u, inverse: bool = False):
    """Apply the cone automorphism H(lambda^{-1/2}) that maps lambda to the
    identity element e (inverse=True applies H(lambda^{1/2}), mapping e back
    to lambda).  Functional equivalent of the reference's scale2
    (misc_solvers.c:247, misc.py scale2), used for step-to-boundary
    computations: s + a*ds >= 0  <=>  e + a*scale2(lmbda, W^{-T}ds) >= 0.

      l: u / lambda           (inverse: u * lambda)
      q: H(w) u = 2 w (w'u) - jdot(w) J u  with w = lambda^{-1/2}
      s: Lam^{-1/2} U Lam^{-1/2}  elementwise u_ij / sqrt(lam_i lam_j)
         (lambda's s blocks are diagonal).
    """
    out = u * lmbda[: u.shape[0]] * 0 + u  # copy
    if dims.l:
        lam_l = lmbda[: dims.l]
        out = out.at[: dims.l].set(
            u[: dims.l] * lam_l if inverse else u[: dims.l] / lam_l)
    for ofs, m in zip(dims.qofs, dims.q):
        lam_b, ub = lmbda[ofs:ofs + m], u[ofs:ofs + m]
        sq = _soc_sqrt(lam_b)
        if inverse:
            w = sq
        else:
            w = jnp.concatenate([sq[:1], -sq[1:]]) / jdot(sq)
        Ju = jnp.concatenate([ub[:1], -ub[1:]])
        vb = 2.0 * w * jnp.dot(w, ub) - jdot(w) * Ju
        out = out.at[ofs:ofs + m].set(vb)
    for ofs, m in zip(dims.sofs, dims.s):
        lam_d = jnp.diagonal(lmbda[ofs:ofs + m * m].reshape(m, m))
        U = u[ofs:ofs + m * m].reshape(m, m)
        rt = jnp.sqrt(lam_d)
        denom = rt[:, None] * rt[None, :]
        V = U * denom if inverse else U / denom
        out = out.at[ofs:ofs + m * m].set(V.reshape(-1))
    return out


# ---------------------------------------------------------------------------
# pack / unpack (API parity with misc_solvers.c:404-544)
# ---------------------------------------------------------------------------


def pack_size(dims: ConeDims) -> int:
    return dims.l + sum(dims.q) + sum(m * (m + 1) // 2 for m in dims.s)


def pack(dims: ConeDims, u):
    """Full-storage cone vector -> packed storage: s blocks become their
    lower triangle, off-diagonals scaled by sqrt(2) so dot products are
    preserved."""
    parts = [u[: dims.l + sum(dims.q)]]
    sqrt2 = math.sqrt(2.0)
    for ofs, m in zip(dims.sofs, dims.s):
        X = u[ofs:ofs + m * m].reshape(m, m)
        rows, cols = jnp.tril_indices(m)
        w = jnp.where(rows == cols, 1.0, sqrt2).astype(u.dtype)
        parts.append(X[rows, cols] * w)
    return jnp.concatenate(parts) if parts else u


def unpack(dims: ConeDims, p):
    """Inverse of pack."""
    n0 = dims.l + sum(dims.q)
    out = jnp.zeros((dims.size,), dtype=p.dtype)
    out = out.at[:n0].set(p[:n0])
    pofs = n0
    isqrt2 = 1.0 / math.sqrt(2.0)
    for ofs, m in zip(dims.sofs, dims.s):
        npk = m * (m + 1) // 2
        blk = p[pofs:pofs + npk]
        rows, cols = jnp.tril_indices(m)
        w = jnp.where(rows == cols, 1.0, isqrt2).astype(p.dtype)
        X = jnp.zeros((m, m), dtype=p.dtype)
        X = X.at[rows, cols].set(blk * w)
        X = X + X.T - jnp.diag(jnp.diagonal(X))
        out = out.at[ofs:ofs + m * m].set(X.reshape(-1))
        pofs += npk
    return out


# ---------------------------------------------------------------------------
# Misc helpers used by the solvers
# ---------------------------------------------------------------------------


def symm(dims: ConeDims, u):
    """Symmetrize the s blocks of a cone vector (reference misc_solvers.c
    symm)."""
    out = u
    for ofs, m in zip(dims.sofs, dims.s):
        X = u[ofs:ofs + m * m].reshape(m, m)
        out = out.at[ofs:ofs + m * m].set((0.5 * (X + X.T)).reshape(-1))
    return out


def wtw_scale_cols(dims: ConeDims, W: NTScaling, G):
    """Compute W^{-T} applied to every column of G — the central operation
    in all KKT strategies (reference misc.py:1090 loop of scale() over G's
    columns).  Vectorized: the l part is a row scaling, each q block a
    rank-one update, each s block two matmuls over all columns at once."""
    n = G.shape[1]
    out = G
    if dims.l:
        out = out.at[: dims.l, :].set(G[: dims.l, :] / W.d[:, None])
    for k, (ofs, m) in enumerate(zip(dims.qofs, dims.q)):
        B = G[ofs:ofs + m, :]
        beta, v = W.beta[k], W.v[k]
        Jv = jnp.concatenate([v[:1], -v[1:]])
        JB = jnp.concatenate([B[:1, :], -B[1:, :]], axis=0)
        V = (2.0 * jnp.outer(Jv, Jv @ B) - JB) / beta
        out = out.at[ofs:ofs + m, :].set(V)
    for k, (ofs, m) in enumerate(zip(dims.sofs, dims.s)):
        B = G[ofs:ofs + m * m, :].reshape(m, m, n)
        rti = W.rti[k]
        # rti' X rti for every column X
        V = jnp.einsum("ij,jkc,kl->ilc", rti.T, B, rti)
        out = out.at[ofs:ofs + m * m, :].set(V.reshape(m * m, n))
    return out
