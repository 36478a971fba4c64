"""l1-norm approximation (reference examples/doc/chap8/l1.py):
minimize ||A x - b||_1 as an LP with a structure-exploiting custom KKT
solver."""

import numpy as np
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

from kvxopt_tpu.cones import ConeDims
from kvxopt_tpu.solvers import conelp


def l1(A, b):
    """Returns the minimizer of ||Ax - b||_1 using the custom-KKT LP
    formulation."""
    A = jnp.asarray(A, dtype=jnp.float64)
    b = jnp.asarray(b, dtype=jnp.float64).reshape(-1)
    m, n = A.shape
    c = jnp.concatenate([jnp.zeros(n), jnp.ones(m)])
    h = jnp.concatenate([b, -b])
    dims = ConeDims(l=2 * m)

    def G(v, trans=False):
        if trans:
            z1, z2 = v[:m], v[m:]
            return jnp.concatenate([A.T @ (z1 - z2), -z1 - z2])
        x, u = v[:n], v[n:]
        Ax = A @ x
        return jnp.concatenate([Ax - u, -Ax - u])

    def kktsolver(W, H=None, Df=None):
        d = W.d
        p = 1.0 / d[:m] ** 2
        q = 1.0 / d[m:] ** 2
        S = p + q
        w = 4.0 * p * q / S
        C = cho_factor((A.T * w[None, :]) @ A, lower=True)

        def solve(bx, by, bz):
            bx_x, bx_u = bx[:n], bx[n:]
            bz1, bz2 = bz[:m], bz[m:]
            cu = bx_u - p * bz1 - q * bz2
            r = bx_x + A.T @ ((p - q) / S * cu + p * bz1 - q * bz2)
            x = cho_solve(C, r)
            Ax = A @ x
            u = (cu + (p - q) * Ax) / S
            return (jnp.concatenate([x, u]), jnp.zeros((0,), bx.dtype),
                    jnp.concatenate([p * (Ax - u - bz1),
                                     q * (-Ax - u - bz2)]))

        return solve

    sol = conelp(c, G, h, dims, kktsolver=kktsolver)
    return np.asarray(sol["x"])[:n], sol


def main():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((100, 30))
    b = rng.standard_normal(100)
    x, sol = l1(A, b)
    return sol


if __name__ == "__main__":
    print(main()["status"])
