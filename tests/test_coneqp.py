"""coneqp: verified against scipy oracles and KKT optimality conditions
(the reference-vs-reference oracle pattern of the reference's test suite,
SURVEY.md section 4)."""

import numpy as np
import pytest

from kvxopt_tpu import cones
from kvxopt_tpu.cones import ConeDims
from kvxopt_tpu.solvers import coneqp, qp


def check_qp_kkt(P, q, G, h, A, b, dims, sol, tol=1e-5):
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"]); z = np.asarray(sol["z"])
    s = np.asarray(sol["s"])
    y = np.asarray(sol["y"]) if A is not None else np.zeros(0)
    Av = A if A is not None else np.zeros((0, len(q)))
    bv = b if b is not None else np.zeros(0)
    # stationarity
    r = P @ x + q + G.T @ z + Av.T @ y
    assert np.linalg.norm(r) < tol * max(1, np.linalg.norm(q))
    # primal feasibility
    assert np.linalg.norm(G @ x + s - h) < tol * max(1, np.linalg.norm(h))
    if len(bv):
        assert np.linalg.norm(Av @ x - bv) < tol
    # complementarity
    assert abs(np.dot(s, z)) < 1e-4
    # cone feasibility
    assert float(cones.max_step(dims, np.asarray(s, float))) < tol
    assert float(cones.max_step(dims, np.asarray(z, float))) < tol


def test_qp_box():
    # min (1/2)||x - a||^2 s.t. 0 <= x <= 1  -> x = clip(a, 0, 1)
    rng = np.random.default_rng(0)
    n = 8
    a = rng.standard_normal(n) * 1.5
    P = np.eye(n)
    q = -a
    G = np.vstack([np.eye(n), -np.eye(n)])
    h = np.concatenate([np.ones(n), np.zeros(n)])
    sol = qp(P, q, G, h)
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]), np.clip(a, 0, 1),
                               atol=5e-4)


def test_qp_with_equalities():
    rng = np.random.default_rng(1)
    n, m, p = 10, 6, 3
    M = rng.standard_normal((n, n))
    P = M @ M.T + np.eye(n)
    q = rng.standard_normal(n)
    G = rng.standard_normal((m, n))
    h = rng.standard_normal(m) + 1.0
    A = rng.standard_normal((p, n))
    b = rng.standard_normal(p)
    sol = qp(P, q, G, h, A, b)
    dims = ConeDims(l=m)
    check_qp_kkt(P, q, G, h, A, b, dims, sol)
    # cross-check against scipy
    from scipy.optimize import minimize
    res = minimize(lambda x: 0.5 * x @ P @ x + q @ x, np.zeros(n),
                   jac=lambda x: P @ x + q,
                   constraints=[
                       {"type": "ineq", "fun": lambda x: h - G @ x},
                       {"type": "eq", "fun": lambda x: A @ x - b}],
                   method="SLSQP")
    np.testing.assert_allclose(sol["primal objective"], res.fun, rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("kktsolver", ["ldl", "ldl2", "chol", "chol2", "qr",
                                       "chol2_mixed"])
def test_qp_all_kkt_strategies(kktsolver):
    rng = np.random.default_rng(2)
    n, m = 6, 10
    M = rng.standard_normal((n, n))
    P = M @ M.T + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    G = rng.standard_normal((m, n))
    h = G @ rng.standard_normal(n) + rng.uniform(0.5, 1.5, m)
    # the f32+refinement strategy targets ~1e-6 tolerances (f32
    # refinement floor); the f64 strategies hit the defaults
    opts = ({"abstol": 1e-6, "reltol": 1e-5, "feastol": 1e-6}
            if kktsolver == "chol2_mixed" else None)
    sol = qp(P, q, G, h, kktsolver=kktsolver, options=opts)
    check_qp_kkt(P, q, G, h, None, None, ConeDims(l=m), sol, tol=1e-4)


def test_coneqp_socp_cone():
    # min ||x||^2 - a'x  s.t. ||x[1:]|| <= x[0]  (SOC constraint)
    rng = np.random.default_rng(3)
    n = 5
    a = rng.standard_normal(n)
    P = 2 * np.eye(n)
    q = -a
    # -x in SOC^n means Gx + s = 0, s in Q  with G = -I
    G = -np.eye(n)
    h = np.zeros(n)
    dims = ConeDims(l=0, q=(n,))
    sol = coneqp(P, q, G, h, dims)
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"])
    assert np.linalg.norm(x[1:]) <= x[0] + 1e-7
    # oracle: projected unconstrained optimum via scipy
    from scipy.optimize import minimize
    res = minimize(lambda v: v @ v - a @ v, np.ones(n) * 0.1,
                   constraints=[{"type": "ineq",
                                 "fun": lambda v: v[0] -
                                 np.linalg.norm(v[1:] + 1e-12)}],
                   method="SLSQP")
    np.testing.assert_allclose(sol["primal objective"], res.fun, atol=1e-5)


def test_coneqp_sdp_cone():
    # min tr(X) + ||X - C||_F^2/2 over X psd.  X is parameterized by its
    # m(m+1)/2 independent entries with a symmetric basis, so every G
    # column's s-block is symmetric (the cone-program API reads only the
    # lower triangle of s-block data — reference coneprog.rst / trisc).
    rng = np.random.default_rng(4)
    m = 3
    C = rng.standard_normal((m, m)); C = 0.5 * (C + C.T)
    pairs = [(i, j) for i in range(m) for j in range(i + 1)]
    n = len(pairs)
    basis = []
    for i, j in pairs:
        B = np.zeros((m, m)); B[i, j] = 1.0; B[j, i] = 1.0
        basis.append(B)
    w = np.array([1.0 if i == j else 2.0 for i, j in pairs])
    P = np.diag(w)
    q = np.array([(1.0 if i == j else 0.0) - w[k] * C[i, j]
                  for k, (i, j) in enumerate(pairs)])
    G = -np.stack([B.ravel() for B in basis], axis=1)
    h = np.zeros(m * m)
    dims = ConeDims(l=0, s=(m,))
    sol = coneqp(P, q, G, h, dims)
    assert sol["status"] == "optimal"
    X = np.zeros((m, m))
    for k, (i, j) in enumerate(pairs):
        X[i, j] = X[j, i] = float(sol["x"][k])
    # oracle: X = proj_psd(C - I)
    wv, V = np.linalg.eigh(C - np.eye(m))
    Xref = (V * np.maximum(wv, 0)[None, :]) @ V.T
    np.testing.assert_allclose(X, Xref, atol=1e-5)


def test_coneqp_initvals():
    rng = np.random.default_rng(5)
    n, m = 5, 8
    P = np.eye(n)
    q = rng.standard_normal(n)
    G = rng.standard_normal((m, n))
    h = G @ np.zeros(n) + np.ones(m)
    sol0 = qp(P, q, G, h)
    iv = {"x": np.zeros(n), "y": np.zeros(0), "s": np.ones(m),
          "z": np.ones(m)}
    sol1 = coneqp(P, q, G, h, {"l": m}, initvals=iv)
    np.testing.assert_allclose(np.asarray(sol0["x"]), np.asarray(sol1["x"]),
                               atol=1e-4)
