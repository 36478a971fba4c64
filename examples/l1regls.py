"""1-norm regularized least squares (userguide section 8.7 "Exploiting
structure"; reference examples/doc/chap8/l1regls.py):

    minimize ||A x - y||_2^2 + ||x||_1

as a coneqp with operator-form P and G and a structure-exploiting custom
KKT solver: the condensed system reduces to an m x m factorization
(A D^-1 A' + I) instead of the 2n x 2n default — the reference's central
"custom kktsolver" showcase, in this package's functional contract
(factor(W) -> solve(bx, by, bz) -> new values)."""

import numpy as np
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

from kvxopt_tpu.cones import ConeDims
from kvxopt_tpu.solvers import coneqp


def l1regls(A, y):
    A = jnp.asarray(A, dtype=jnp.float64)
    y = jnp.asarray(y, dtype=jnp.float64).reshape(-1)
    m, n = A.shape
    q = jnp.concatenate([-2.0 * (A.T @ y), jnp.ones(n)])
    h = jnp.zeros(2 * n)
    dims = ConeDims(l=2 * n)

    def P(u):
        # 2 [A'A 0; 0 0] u
        return jnp.concatenate([2.0 * (A.T @ (A @ u[:n])),
                                jnp.zeros(n)])

    def G(u, trans=False):
        # [I -I; -I -I]
        if trans:
            return jnp.concatenate([u[:n] - u[n:], -u[:n] - u[n:]])
        return jnp.concatenate([u[:n] - u[n:], -u[:n] - u[n:]])

    def kktsolver(W, H=None, Df=None):
        # Eliminate zl and x[n:]: (2A'A + 4 D1 D2 (D1+D2)^-1) x[:n] = rhs,
        # then solve through the m x m system (A D^-1 A' + I) v = ...
        # (reference l1regls.py Fkkt, same elimination).
        di = 1.0 / W.d
        d1, d2 = di[:n] ** 2, di[n:] ** 2
        ds = jnp.sqrt(2.0) * di[:n] * di[n:] / jnp.sqrt(d1 + d2)
        d3 = (d2 - d1) / (d1 + d2)
        Asc = A / ds[None, :]
        S = jnp.eye(m) + Asc @ Asc.T
        C = cho_factor(S, lower=True)

        def solve(bx, by, bz):
            x1 = 0.5 * (bx[:n] - d3 * bx[n:] +
                        d1 * (bz[:n] + d3 * bz[:n]) -
                        d2 * (bz[n:] - d3 * bz[n:]))
            x1 = x1 / ds
            v = cho_solve(C, Asc @ x1)
            x1 = (x1 - Asc.T @ v) / ds
            x2 = ((bx[n:] - d1 * bz[:n] - d2 * bz[n:]) / (d1 + d2)
                  - d3 * x1)
            # our kktsolver contract returns the *unscaled* uz
            # (= W^{-2}(G ux - bz) for the l-cone), unlike the
            # reference's W-scaled exit convention
            z1 = d1 * (x1 - x2 - bz[:n])
            z2 = d2 * (-x1 - x2 - bz[n:])
            return (jnp.concatenate([x1, x2]),
                    jnp.zeros((0,), bx.dtype),
                    jnp.concatenate([z1, z2]))

        return solve

    sol = coneqp(P, q, G, h, dims, kktsolver=kktsolver)
    return np.asarray(sol["x"])[:n], sol


def main():
    rng = np.random.default_rng(0)
    m, n = 50, 200
    A = rng.standard_normal((m, n))
    y = rng.standard_normal(m)
    x, sol = l1regls(A, y)
    return x, sol, A, y


if __name__ == "__main__":
    x, sol, A, y = main()
    print("status:", sol["status"])
    print("nnz(x) at 1e-5:", int((np.abs(x) > 1e-5).sum()), "of", len(x))
