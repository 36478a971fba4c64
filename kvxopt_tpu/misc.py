"""Cone-algebra utility layer with the reference's misc.py surface
(reference src/python/misc.py: compute_scaling :250, update_scaling :422,
scale/scale2, pack/unpack, sdot/snrm2, sprod/sinv/ssqr, max_step, sgemv,
and the five kkt_* strategies :1055-1570).

Functional adapters over kvxopt_tpu.cones / kvxopt_tpu.kkt: where the
reference mutates matrices in place, these return new arrays (the
jit-compatible design); dims may be a ConeDims or the reference's
{'l':..., 'q':[...], 's':[...]} dict."""

import jax.numpy as jnp

from . import cones as _c
from . import kkt as _k
from .cones import ConeDims, NTScaling  # noqa: F401


def _dims(dims):
    return ConeDims.from_dict(dims)


def sdot(x, y, dims, mnl=0):
    return float(_c.sdot(_dims(dims).with_extra_l(mnl), jnp.asarray(x),
                         jnp.asarray(y)))


def snrm2(x, dims, mnl=0):
    return float(_c.snrm2(_dims(dims).with_extra_l(mnl), jnp.asarray(x)))


def sprod(x, y, dims, mnl=0, diag="N"):
    return _c.sprod(_dims(dims).with_extra_l(mnl), jnp.asarray(x),
                    jnp.asarray(y), diag=(diag == "D"))


def sinv(x, y, dims, mnl=0):
    return _c.sinv(_dims(dims).with_extra_l(mnl), jnp.asarray(y),
                   jnp.asarray(x))


def ssqr(x, dims, mnl=0):
    return _c.ssqr(_dims(dims).with_extra_l(mnl), jnp.asarray(x))


def max_step(x, dims, mnl=0, sigma=None):
    return float(_c.max_step(_dims(dims).with_extra_l(mnl),
                             jnp.asarray(x)))


def compute_scaling(s, z, lmbda=None, dims=None, mnl=0):
    d = _dims(dims).with_extra_l(mnl)
    W, lam = _c.compute_scaling(d, jnp.asarray(s), jnp.asarray(z))
    return W, lam


def update_scaling(W, lmbda, s, z, dims=None, mnl=0):
    d = _dims(dims).with_extra_l(mnl) if dims is not None else None
    if d is None:
        raise ValueError("dims required")
    return _c.update_scaling(d, W, jnp.asarray(s), jnp.asarray(z))


def scale(x, W, dims, trans="N", inverse="N", mnl=0):
    return _c.scale(_dims(dims).with_extra_l(mnl), W, jnp.asarray(x),
                    trans=(trans == "T"), inverse=(inverse == "I"))


def scale2(lmbda, x, dims, mnl=0, inverse="N"):
    return _c.scale2(_dims(dims).with_extra_l(mnl), jnp.asarray(lmbda),
                     jnp.asarray(x), inverse=(inverse == "I"))


def pack(x, dims, mnl=0):
    """Packed storage with the reference's exact element order
    (misc_solvers.c:404): s blocks stored as the lower triangle column
    by column, off-diagonals scaled by sqrt 2 (dot-product
    preserving)."""
    import math
    d = _dims(dims).with_extra_l(mnl)
    x = jnp.asarray(x)
    nlq = d.l + sum(d.q)
    parts = [x[:nlq]]
    sqrt2 = math.sqrt(2.0)
    iu = nlq
    for m in d.s:
        X = x[iu:iu + m * m].reshape(m, m)
        cols, rows = jnp.triu_indices(m)      # (c<=r) pairs in col-major
        w = jnp.where(rows == cols, 1.0, sqrt2).astype(x.dtype)
        # read the buffer's column-major 'L' entries (index c*m + r,
        # misc_solvers.c:404): X[c, r] of the row-major reshape
        parts.append(X[cols, rows] * w)
        iu += m * m
    return jnp.concatenate(parts)


def pack2(x, dims, mnl=0):
    """Functional equivalent of the reference's in-place pack2
    (misc_solvers.c:468): per column of x, the 's' components are
    repacked into packed-'L' storage (lower triangle column by column,
    off-diagonals scaled by sqrt 2) WITHIN a buffer of the same shape;
    entries past the packed length keep their previous values.  Accepts
    1-D cone vectors or 2-D matrices whose columns are cone vectors."""
    import math
    d = _dims(dims).with_extra_l(mnl)
    x = jnp.asarray(x)
    one_d = x.ndim == 1
    X = x[:, None] if one_d else x
    nlq = d.l + sum(d.q)
    sqrt2 = math.sqrt(2.0)
    out = X
    iu = ip = nlq
    for m in d.s:
        for k in range(m):
            ln = m - k
            seg = X[iu + k * (m + 1): iu + k * (m + 1) + ln, :]
            w = jnp.ones((ln, 1), X.dtype)
            if ln > 1:
                w = w.at[1:, :].set(sqrt2)
            out = out.at[ip:ip + ln, :].set(seg * w)
            ip += ln
        iu += m * m
    return out[:, 0] if one_d else out


def unpack(x, dims, mnl=0):
    """Inverse of pack (reference misc_solvers.c:544): packed-'L'
    storage back to full symmetric storage, same element order."""
    import math
    d = _dims(dims).with_extra_l(mnl)
    x = jnp.asarray(x)
    nlq = d.l + sum(d.q)
    out = jnp.zeros((d.size,), dtype=x.dtype)
    out = out.at[:nlq].set(x[:nlq])
    isqrt2 = 1.0 / math.sqrt(2.0)
    ip, iu = nlq, nlq
    for m in d.s:
        npk = m * (m + 1) // 2
        blk = x[ip:ip + npk]
        cols, rows = jnp.triu_indices(m)      # col-major (row>=col) pairs
        w = jnp.where(rows == cols, 1.0, isqrt2).astype(x.dtype)
        # reference fills the LOWER triangle only, in the buffer's
        # column-major layout (misc_solvers.c:544 dcopy into column k
        # from the diagonal down: buffer index c*m + r, r >= c); strict
        # upper entries are untouched, i.e. zero in this functional
        # form.  Writing X[c, r] then flattening row-major lands each
        # value at exactly c*m + r.
        X = jnp.zeros((m, m), dtype=x.dtype)
        X = X.at[cols, rows].set(blk * w)
        out = out.at[iu:iu + m * m].set(X.reshape(-1))
        ip += npk
        iu += m * m
    return out


def symm(x, dims, mnl=0):
    return _c.symm(_dims(dims).with_extra_l(mnl), jnp.asarray(x))


def sgemv(A, x, y, dims, trans="N", alpha=1.0, beta=0.0, mnl=0):
    """y := alpha A x + beta y over cone vectors (reference misc.py
    sgemv); functional — returns the result."""
    A = jnp.asarray(A)
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if trans == "T":
        return alpha * (A.T @ x) + beta * y
    return alpha * (A @ x) + beta * y


def jdot(x, y=None):
    x = jnp.asarray(x)
    if y is None:
        return float(_c.jdot(x))
    y = jnp.asarray(y)
    return float(x[0] * y[0] - jnp.dot(x[1:], y[1:]))


def jnrm2(x):
    return float(_c.jnrm2(jnp.asarray(x)))


# KKT strategies with the reference's names (misc.py:1055-1570)
def kkt_ldl(G, dims, A, mnl=0, kktreg=0.0):
    return _k.make_kkt_solver("ldl", _dims(dims), jnp.asarray(G),
                              jnp.asarray(A) if A is not None else None,
                              mnl=mnl, reg=kktreg)


def kkt_ldl2(G, dims, A, mnl=0, kktreg=0.0):
    return _k.make_kkt_solver("ldl2", _dims(dims), jnp.asarray(G),
                              jnp.asarray(A) if A is not None else None,
                              mnl=mnl, reg=kktreg)


def kkt_chol(G, dims, A, mnl=0):
    return _k.make_kkt_solver("chol", _dims(dims), jnp.asarray(G),
                              jnp.asarray(A) if A is not None else None,
                              mnl=mnl)


def kkt_chol2(G, dims, A, mnl=0):
    return _k.make_kkt_solver("chol2", _dims(dims), jnp.asarray(G),
                              jnp.asarray(A) if A is not None else None,
                              mnl=mnl)


def kkt_qr(G, dims, A, mnl=0):
    return _k.make_kkt_solver("qr", _dims(dims), jnp.asarray(G),
                              jnp.asarray(A) if A is not None else None,
                              mnl=mnl)


use_C = True  # parity flag: the reference toggles C kernels (misc.py:25);
              # here the accelerated path is always the jitted one.
