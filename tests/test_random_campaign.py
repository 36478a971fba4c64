"""Randomized correctness campaign: many random problems per class,
each validated against KKT optimality conditions and/or scipy oracles.
The bulk-stochastic analogue of the reference's example-based tests."""

import numpy as np
import pytest
from scipy.optimize import linprog

from kvxopt_tpu import cones
from kvxopt_tpu.cones import ConeDims
from kvxopt_tpu.solvers import conelp, coneqp, lp


def _sym_cols(G, dims):
    for ofs, m in zip(dims.sofs, dims.s):
        for c in range(G.shape[1]):
            X = G[ofs:ofs + m * m, c].reshape(m, m)
            G[ofs:ofs + m * m, c] = (0.5 * (X + X.T)).ravel()
    return G


def _feasible_problem(dims, n, seed, with_eq=False):
    """Random cone LP constructed to be primal/dual feasible."""
    rng = np.random.default_rng(seed)
    N = dims.size
    G = _sym_cols(rng.standard_normal((N, n)), dims)
    # strictly feasible primal point
    from .test_cones import random_interior
    s0 = np.asarray(random_interior(dims, rng), float)
    x0 = rng.standard_normal(n)
    h = G @ x0 + s0
    # dual feasible: c = -G'z0 (- A'y0)
    z0 = np.asarray(random_interior(dims, rng), float)
    c = -G.T @ z0
    A = b = None
    if with_eq:
        p = max(1, n // 4)
        A = rng.standard_normal((p, n))
        b = A @ x0
        y0 = rng.standard_normal(p)
        c = c - A.T @ y0
    return c, G, h, A, b, dims


def _check_opt(sol, c, G, h, A, b, dims, tol=2e-5):
    assert sol["status"] == "optimal", sol["status"]
    x = np.asarray(sol["x"]); z = np.asarray(sol["z"])
    s = np.asarray(sol["s"])
    r = G.T @ z + c
    if A is not None:
        r = r + A.T @ np.asarray(sol["y"])
    assert np.linalg.norm(r) < tol * max(1, np.linalg.norm(c))
    assert np.linalg.norm(G @ x + s - h) < tol * max(1, np.linalg.norm(h))
    if A is not None:
        assert np.linalg.norm(A @ x - b) < tol * max(
            1, np.linalg.norm(b))
    assert abs(cones.sdot(dims, s, z)) < 1e-4 * max(
        1.0, abs(sol["primal objective"]))
    assert float(cones.max_step(dims, s)) < tol
    assert float(cones.max_step(dims, z)) < tol


@pytest.mark.parametrize("seed", range(6))
def test_random_lp_campaign(seed):
    dims = ConeDims(l=14)
    c, G, h, A, b, dims = _feasible_problem(dims, 7, seed,
                                            with_eq=(seed % 2 == 0))
    sol = conelp(c, G, h, dims, A, b)
    _check_opt(sol, c, G, h, A, b, dims)
    # LP cross-check vs HiGHS
    ref = linprog(c, A_ub=G, b_ub=h, A_eq=A, b_eq=b,
                  bounds=(None, None), method="highs")
    if ref.status == 0:
        np.testing.assert_allclose(sol["primal objective"], ref.fun,
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", range(4))
def test_random_socp_campaign(seed):
    dims = ConeDims(l=4, q=(4, 3))
    c, G, h, A, b, dims = _feasible_problem(dims, 6, 100 + seed)
    sol = conelp(c, G, h, dims)
    _check_opt(sol, c, G, h, A, b, dims)


@pytest.mark.parametrize("seed", range(4))
def test_random_sdp_campaign(seed):
    dims = ConeDims(l=2, s=(4,))
    c, G, h, A, b, dims = _feasible_problem(dims, 5, 200 + seed)
    sol = conelp(c, G, h, dims)
    _check_opt(sol, c, G, h, A, b, dims)


@pytest.mark.parametrize("seed", range(4))
def test_random_qp_campaign(seed):
    rng = np.random.default_rng(300 + seed)
    n, m = 8, 12
    dims = ConeDims(l=m)
    M = rng.standard_normal((n, n))
    P = M @ M.T + 0.1 * np.eye(n)
    q = rng.standard_normal(n)
    G = rng.standard_normal((m, n))
    h = G @ rng.standard_normal(n) + rng.uniform(0.3, 1.5, m)
    sol = coneqp(P, q, G, h, dims)
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"]); z = np.asarray(sol["z"])
    assert np.linalg.norm(P @ x + q + G.T @ z) < 2e-5 * max(
        1, np.linalg.norm(q))
    from scipy.optimize import minimize
    ref = minimize(lambda v: 0.5 * v @ P @ v + q @ v, np.zeros(n),
                   jac=lambda v: P @ v + q,
                   constraints=[{"type": "ineq",
                                 "fun": lambda v: h - G @ v,
                                 "jac": lambda v: -G}],
                   method="SLSQP")
    np.testing.assert_allclose(sol["primal objective"], ref.fun,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", range(3))
def test_random_infeasible_lp(seed):
    """Random primal-infeasible LPs must produce certificates."""
    rng = np.random.default_rng(400 + seed)
    n, m = 5, 10
    G = rng.standard_normal((m, n))
    # infeasible: u'G = 0, u >= 0, u'h < 0 by construction
    u = rng.uniform(0.5, 1.5, m)
    # project G so that u'G = 0
    G = G - np.outer(u, u @ G) / (u @ u)
    h = rng.standard_normal(m)
    h = h - (u @ h + 1.0) * u / (u @ u)   # u'h = -1
    c = rng.standard_normal(n)
    sol = lp(c, G, h)
    assert sol["status"] == "primal infeasible"
    z = np.asarray(sol["z"])
    assert (z >= -1e-7).all()
    np.testing.assert_allclose(G.T @ z, 0, atol=1e-5)
    np.testing.assert_allclose(h @ z, -1.0, atol=1e-5)


@pytest.mark.parametrize("seed", range(3))
def test_random_bounded_gp(seed):
    from kvxopt_tpu.solvers import gp
    rng = np.random.default_rng(4000 + seed)
    n = 4
    K = [2, 3, 2]
    F = rng.standard_normal((sum(K), n))
    Fb = np.vstack([np.eye(n), -np.eye(n)])
    K2 = [2 + 2 * n] + K[1:]
    F2 = np.vstack([F[:2], Fb, F[2:]])
    g2 = np.concatenate([rng.standard_normal(2) * 0.5, np.zeros(2 * n),
                         rng.standard_normal(sum(K) - 2) * 0.5 - 1.0])
    sol = gp(K2, F2, g2)
    assert sol["status"] == "optimal"
    from scipy.optimize import minimize
    ofs = np.concatenate([[0], np.cumsum(K2)])

    def lse(v, i):
        y = F2[ofs[i]:ofs[i + 1]] @ v + g2[ofs[i]:ofs[i + 1]]
        m = np.max(y)
        return m + np.log(np.exp(y - m).sum())

    cons = [{"type": "ineq", "fun": (lambda v, i=i: -lse(v, i))}
            for i in range(1, len(K2))]
    ref = minimize(lambda v: lse(v, 0), np.zeros(n), constraints=cons,
                   method="SLSQP")
    if ref.success:
        np.testing.assert_allclose(sol["primal objective"], ref.fun,
                                   atol=1e-3)


def test_unbounded_gp_returns_unknown():
    # a genuinely unbounded GP must come back 'unknown', not diverge
    from kvxopt_tpu.solvers import gp
    rng = np.random.default_rng(2000)
    n, K = 4, [1, 3, 2]
    F = rng.standard_normal((sum(K), n))
    g = rng.standard_normal(sum(K)) * 0.5
    sol = gp(K, F, g)
    assert sol["status"] == "unknown"


@pytest.mark.parametrize("seed", range(3))
def test_random_qcp_autodiff(seed):
    import jax.numpy as jnp
    from kvxopt_tpu.solvers import cpl
    from kvxopt_tpu.solvers.cvxprog import oracle_from_function
    rng = np.random.default_rng(3000 + seed)
    n, mq = 4, 2
    Ps = [(lambda M: M @ M.T + np.eye(n))(rng.standard_normal((n, n)))
          for _ in range(mq)]
    centers = [rng.standard_normal(n) * 0.3 for _ in range(mq)]
    rads = rng.uniform(1.0, 3.0, mq)
    c = rng.standard_normal(n)

    def fcons(x):
        return jnp.stack([
            (x - jnp.asarray(cen)) @ jnp.asarray(P) @
            (x - jnp.asarray(cen)) - float(r)
            for P, cen, r in zip(Ps, centers, rads)])

    F = oracle_from_function(fcons, np.zeros(n))
    sol = cpl(c, F)
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"])
    for P, cen, r in zip(Ps, centers, rads):
        assert (x - cen) @ P @ (x - cen) <= r + 1e-5
