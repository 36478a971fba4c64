"""Analytic centering (reference examples/book/chap8 acent): maximize
sum(log(b - Ax)) via the nonlinear solver cp with an autodiff oracle."""

import numpy as np
import jax.numpy as jnp

from kvxopt_tpu.solvers import cp


def acent(A, b):
    A = jnp.asarray(A, dtype=jnp.float64)
    b = jnp.asarray(b, dtype=jnp.float64).reshape(-1)
    m, n = A.shape

    def F(x=None, z=None):
        if x is None:
            return 0, jnp.zeros((n,), A.dtype)
        y = b - A @ x
        f = jnp.array([-jnp.sum(jnp.log(y))])
        Df = (A.T @ (1.0 / y)).reshape(1, -1)
        if z is None:
            return f, Df
        H = z[0] * (A.T * (1.0 / y ** 2)[None, :]) @ A
        return f, Df, H

    return cp(F)


def main():
    rng = np.random.default_rng(5)
    m, n = 40, 10
    A = rng.standard_normal((m, n))
    b = np.abs(A @ rng.standard_normal(n)) + rng.uniform(0.5, 2.0, m)
    sol = acent(A, b)
    x = np.asarray(sol["x"])
    assert (np.asarray(b) - np.asarray(A) @ x > 0).all()
    # optimality: gradient ~ 0
    g = np.asarray(A).T @ (1.0 / (np.asarray(b) - np.asarray(A) @ x))
    assert np.linalg.norm(g) < 1e-4 * max(1.0, np.linalg.norm(b))
    return sol


if __name__ == "__main__":
    print(main()["status"])
