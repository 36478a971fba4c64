"""mcsdp (reference examples/doc/chap8/mcsdp.py): the SDP
    minimize 1'x  s.t.  w + diag(x) >= 0
whose optimum relates to the max-cut relaxation of -w."""

import numpy as np
import jax.numpy as jnp

from kvxopt_tpu.cones import ConeDims
from kvxopt_tpu.solvers import conelp


def mcsdp(w):
    """minimize 1'x s.t. w + diag(x) PSD."""
    w = np.asarray(w, dtype=float)
    n = w.shape[0]
    c = np.ones(n)
    # s = h - G x with h = vec(-w)?  constraint: w + diag(x) = s >= 0
    # => -diag(x) + s = w  => G x + s = h with G col i = vec(-E_ii), h=vec(w)
    G = np.zeros((n * n, n))
    for i in range(n):
        G[i * n + i, i] = -1.0
    h = w.reshape(-1)
    sol = conelp(c, G, h, ConeDims(l=0, s=(n,)))
    return sol


def main(n=20):
    rng = np.random.default_rng(3)
    w = rng.standard_normal((n, n))
    w = 0.5 * (w + w.T)
    sol = mcsdp(w)
    # optimality condition: w + diag(x) PSD with min eigenvalue ~ 0
    x = np.asarray(sol["x"])
    lam = np.linalg.eigvalsh(np.asarray(w) + np.diag(x))
    assert lam[0] > -1e-6
    return sol


if __name__ == "__main__":
    print(main()["status"])
