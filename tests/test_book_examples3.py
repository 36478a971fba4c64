"""Third batch of cvxbook / userguide example ports:

- doc/chap9/l2ac.py — matrix-inversion-lemma custom kktsolver for cp
  (the m << n structure-exploiting Newton solve)
- book/chap7/logreg.py — logistic regression via cp
- book/chap6/penalties.py — l1 / deadzone penalty approximation through
  the modeling DSL, log-barrier penalty via cp
- book/chap6/cvxfit.py — least-squares fit with convexity constraints
  as a QP
- book/chap6/smoothrec.py — quadratic smoothing via lapack.ptsv

Data synthesized; each asserts against an independent oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from kvxopt_tpu.models.modeling import variable, op
from kvxopt_tpu.models.modeling import sum as msum, max as mmax
from kvxopt_tpu.solvers import qp, cp


def test_l2ac_custom_kkt_inversion_lemma():
    """doc/chap9/l2ac.py: minimize (1/2)||Ax-b||^2 - sum log(1-x_i^2)
    with m << n, solved twice — with the matrix-inversion-lemma custom
    kktsolver (operator H) and with the default dense path — results
    must agree."""
    rng = np.random.default_rng(0)
    m, n = 8, 60
    A = jnp.asarray(rng.standard_normal((m, n)))
    xs = rng.uniform(-0.6, 0.6, n)
    b = jnp.asarray(np.asarray(A) @ xs)

    def F_dense(x=None, z=None):
        if x is None:
            return 0, jnp.zeros(n)
        x = jnp.asarray(x)
        if float(jnp.max(jnp.abs(x))) >= 1.0:
            return None
        r = A @ x - b
        w = x ** 2
        f = jnp.array([0.5 * jnp.dot(r, r) - jnp.sum(jnp.log(1 - w))])
        grad = (A.T @ r + 2 * x / (1 - w)).reshape(1, -1)
        if z is None:
            return f, grad
        H = z[0] * (A.T @ A + jnp.diag(2 * (1 + w) / (1 - w) ** 2))
        return f, grad, H

    sol_ref = cp(F_dense)
    assert sol_ref["status"] == "optimal"

    # custom path: H as an operator + inversion-lemma kktsolver
    def F_op(x=None, z=None):
        if x is None:
            return 0, jnp.zeros(n)
        out = F_dense(x) if z is None else F_dense(x, z)
        if out is None:
            return None
        if z is None:
            return out
        f, grad, _ = out
        x = jnp.asarray(x)
        w = x ** 2
        d = 2 * z[0] * (1 + w) / (1 - w) ** 2

        def Hmv(u):
            return z[0] * (A.T @ (A @ u)) + d * u

        return f, grad, Hmv

    state = {}

    def kktsolver(W, H=None, Df=None):
        """Extended-epigraph KKT solve by the matrix inversion lemma.

        This package's cp passes the custom kktsolver the EXTENDED
        system (variables (x, t); one nl row f0 - t with scaling d0 =
        W.d[0]); eliminating uz = -bx_t and applying the inversion lemma
        to z0 (A'A + D) gives the reference l2ac's O(m^2 n) solve."""
        x, z0 = state["x"], state["z0"]
        w = x ** 2
        dvec = 2.0 * (1 + w) / (1 - w) ** 2     # D / z0
        dsi = 1.0 / jnp.sqrt(dvec)
        Asc = A * dsi[None, :]
        S = jnp.eye(m) + Asc @ Asc.T
        d0 = W.d[0]
        r_ = A @ x - b
        g = A.T @ r_ + 2 * x / (1 - w)          # grad f0 at x

        def solve(bx, by, bz):
            bx_x, bx_t = bx[:n], bx[n]
            uz = -bx_t
            rhs = (bx_x + bx_t * g) / z0
            t_ = dsi * rhs
            v = jnp.linalg.solve(S, Asc @ t_)
            ux = dsi * (t_ - Asc.T @ v)
            ut = jnp.dot(g, ux) - bz[0] + d0 * d0 * bx_t
            return (jnp.concatenate([ux, ut[None]]), by,
                    jnp.asarray([uz]))

        return solve

    # wrap F_op to record x, z0 for the factor (the reference kktsolver
    # receives (x, z, W); ours receives W + H/Df, so carry via closure)
    def F_rec(x=None, z=None):
        if x is None:
            return F_op()
        if z is not None:
            state["x"] = jnp.asarray(x)
            state["z0"] = float(z[0])
        return F_op(x) if z is None else F_op(x, z)

    sol_c = cp(F_rec, kktsolver=kktsolver)
    assert sol_c["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol_c["x"]),
                               np.asarray(sol_ref["x"]), atol=1e-5)


def test_logreg_cp():
    """book/chap7/logreg.py: 2-parameter logistic regression via cp;
    oracle: scipy minimize on the same negative log-likelihood."""
    rng = np.random.default_rng(1)
    mpts = 60
    u = np.sort(rng.uniform(0, 10, mpts))
    yv = (rng.uniform(size=mpts) < 1 / (1 + np.exp(-(u - 5)))).astype(
        float)
    A = np.stack([u, np.ones(mpts)], axis=1)
    c = -np.array([np.dot(u, yv), yv.sum()])
    Aj, cj = jnp.asarray(A), jnp.asarray(c)

    def F(x=None, z=None):
        if x is None:
            return 0, jnp.zeros(2)
        x = jnp.asarray(x)
        w = jnp.exp(Aj @ x)
        f = jnp.array([jnp.dot(cj, x) + jnp.sum(jnp.log1p(w))])
        p = w / (1 + w)
        grad = (cj + Aj.T @ p).reshape(1, -1)
        if z is None:
            return f, grad
        H = z[0] * (Aj.T * (p * (1 - p))[None, :]) @ Aj
        return f, grad, H

    sol = cp(F)
    assert sol["status"] == "optimal"
    ab = np.asarray(sol["x"])

    from scipy.optimize import minimize

    def nll(x):
        t = A @ x
        return c @ x + np.sum(np.log1p(np.exp(t)))

    ref = minimize(nll, np.zeros(2), method="BFGS",
                   options={"gtol": 1e-10})
    np.testing.assert_allclose(ab, ref.x, atol=1e-4)


def test_penalties_dsl_and_logbarrier():
    """book/chap6/penalties.py: l1 and deadzone penalty approximations
    through the modeling DSL and the log-barrier penalty via cp; checks
    the characteristic residual distributions (l1 drives residuals to 0;
    the deadzone leaves a +-0.5 dead band; the barrier keeps residuals
    inside (-1, 1))."""
    rng = np.random.default_rng(2)
    m, n = 40, 10
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m) * 1.2

    x = variable(n)
    p1 = op(msum(abs(A * x + b)))
    p1.solve()
    assert p1.status == "optimal"
    r1 = A @ np.asarray(x.value).reshape(-1) + b
    # l1: many residuals exactly zero (basis property)
    assert np.sum(np.abs(r1) < 1e-6) >= n - 1

    x2 = variable(n)
    p2 = op(msum(mmax(abs(A * x2 + b) - 0.5, 0.0)))
    p2.solve()
    assert p2.status == "optimal"
    r2 = A @ np.asarray(x2.value).reshape(-1) + b
    # deadzone: many residuals pushed inside the dead band
    assert np.sum(np.abs(r2) <= 0.5 + 1e-6) >= n - 1

    Aj, bj = jnp.asarray(A), jnp.asarray(b)

    def F(x=None, z=None):
        if x is None:
            return 0, jnp.zeros(n)
        y = Aj @ jnp.asarray(x) + bj
        if float(jnp.max(jnp.abs(y))) >= 1.0:
            return None
        f = jnp.array([-jnp.sum(jnp.log(1.0 - y ** 2))])
        grad = (2.0 * Aj.T @ (y / (1 - y ** 2))).reshape(1, -1)
        if z is None:
            return f, grad
        H = (Aj.T * (2.0 * z[0] * (1 + y ** 2) /
                     (1 - y ** 2) ** 2)[None, :]) @ Aj
        return f, grad, H

    # scale b into the feasible region for the barrier
    bj = bj * (0.9 / float(np.abs(b).max()))
    sol = cp(F)
    assert sol["status"] == "optimal"
    y = np.asarray(Aj @ jnp.asarray(sol["x"]) + bj)
    assert np.all(np.abs(y) < 1.0)


def test_cvxfit_qp():
    """book/chap6/cvxfit.py: least-squares fit of a convex function to
    data: minimize ||yhat - y||^2 s.t. convexity (second differences of
    yhat nonnegative on a sorted grid).  Oracle: scipy lsq with the same
    constraints via SLSQP."""
    rng = np.random.default_rng(3)
    m = 25
    u = np.sort(rng.uniform(-1, 1, m))
    y = np.exp(u) + 0.1 * rng.standard_normal(m)

    # variables yhat (m); convexity: slopes nondecreasing
    P = 2.0 * np.eye(m)
    q = -2.0 * y
    rows = []
    for k in range(1, m - 1):
        r = np.zeros(m)
        d1, d2 = u[k] - u[k - 1], u[k + 1] - u[k]
        r[k - 1] = -1.0 / d1
        r[k] = 1.0 / d1 + 1.0 / d2
        r[k + 1] = -1.0 / d2
        rows.append(-r)     # -(second difference) <= 0
    G = np.stack(rows)
    h = np.zeros(len(rows))
    sol = qp(P, q, G, h)
    assert sol["status"] == "optimal"
    yhat = np.asarray(sol["x"])
    assert np.all(G @ yhat <= 1e-7)

    from scipy.optimize import minimize
    ref = minimize(lambda v: np.sum((v - y) ** 2), y, method="SLSQP",
                   constraints=[{"type": "ineq",
                                 "fun": lambda v: -G @ v}],
                   options={"maxiter": 500, "ftol": 1e-12})
    assert ref.success
    np.testing.assert_allclose(np.sum((yhat - y) ** 2), ref.fun,
                               atol=1e-6)


def test_smoothrec_ptsv():
    """book/chap6/smoothrec.py: quadratic smoothing
    minimize ||x - corr||^2 + delta ||Dx||^2 via the SPD tridiagonal
    solver lapack.ptsv; oracle: dense solve of the normal equations."""
    from kvxopt_tpu import lapack, matrix
    rng = np.random.default_rng(4)
    n = 200
    t = np.linspace(0, 4 * np.pi, n)
    corr = np.sin(t) + 0.2 * rng.standard_normal(n)
    delta = 10.0
    # (I + delta D'D) x = corr with D the first-difference operator:
    # tridiagonal with diag d, off-diagonal e
    d = 1.0 + delta * np.concatenate([[1.0], 2.0 * np.ones(n - 2),
                                      [1.0]])
    e = -delta * np.ones(n - 1)
    dm = matrix(d.copy()); em = matrix(e.copy())
    xm = matrix(corr.reshape(-1, 1).copy())
    lapack.ptsv(dm, em, xm)
    x = np.asarray(xm).reshape(-1)

    D = np.diff(np.eye(n), axis=0)
    xref = np.linalg.solve(np.eye(n) + delta * D.T @ D, corr)
    np.testing.assert_allclose(x, xref, atol=1e-9)
