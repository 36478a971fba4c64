"""The conelp/coneqp customization contract (reference
tests/test_custom_kkt.py): the same problem solved once with a
structure-exploiting custom kktsolver + operator-form G, and once with
dense defaults — results must agree.

Problems: l1-norm approximation (LP, custom solver reduces the KKT system
to A' diag(w) A, the reference's l1.py trick) and l1-regularized least
squares (coneqp path)."""

import numpy as np
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

from kvxopt_tpu import cones
from kvxopt_tpu.cones import ConeDims
from kvxopt_tpu.solvers import conelp, coneqp


def l1_problem(m, n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    return jnp.asarray(A), jnp.asarray(b)


def solve_l1_default(A, b):
    m, n = A.shape
    c = jnp.concatenate([jnp.zeros(n), jnp.ones(m)])
    G = jnp.block([[A, -jnp.eye(m)], [-A, -jnp.eye(m)]])
    h = jnp.concatenate([b, -b])
    return conelp(c, G, h, ConeDims(l=2 * m))


def solve_l1_custom(A, b):
    """Operator G + custom kktsolver exploiting the [A -I; -A -I]
    structure: the 3x3 system reduces to an n x n SPD solve with
    A' diag(4pq/(p+q)) A."""
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
        M = (A.T * w[None, :]) @ A
        C = cho_factor(M, lower=True)

        def solve(bx, by, bz):
            bx_x, bx_u = bx[:n], bx[n:]
            bz1, bz2 = bz[:m], bz[m:]
            cu = bx_u - p * bz1 - q * bz2
            r = bx_x + A.T @ ((p - q) / S * cu + p * bz1 - q * bz2)
            x = cho_solve(C, r)
            Ax = A @ x
            u = (cu + (p - q) * Ax) / S
            z1 = p * (Ax - u - bz1)
            z2 = q * (-Ax - u - bz2)
            return (jnp.concatenate([x, u]),
                    jnp.zeros((0,), bx.dtype),
                    jnp.concatenate([z1, z2]))

        return solve

    return conelp(c, G, h, dims, kktsolver=kktsolver)


def test_l1_custom_kkt_matches_default():
    A, b = l1_problem(60, 20)
    sol1 = solve_l1_default(A, b)
    sol2 = solve_l1_custom(A, b)
    assert sol1["status"] == "optimal"
    assert sol2["status"] == "optimal"
    n = A.shape[1]
    x1 = np.asarray(sol1["x"])[:n]
    x2 = np.asarray(sol2["x"])[:n]
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(A) @ x1 - np.asarray(b), 1),
        np.linalg.norm(np.asarray(A) @ x2 - np.asarray(b), 1),
        rtol=1e-6)
    np.testing.assert_allclose(x1, x2, atol=1e-4)


def test_l1regls_custom_kkt():
    """l1-regularized LS: minimize ||Ax-b||_2^2 + ||x||_1 via coneqp with
    operator P and custom kktsolver (reference test_custom_kkt.py
    l1regls)."""
    m, n = 40, 25
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((m, n)))
    b = jnp.asarray(rng.standard_normal(m))

    # variables (x, u): minimize x'A'Ax - 2b'Ax + 1'u, -u <= x <= u
    q = jnp.concatenate([-2.0 * (A.T @ b), jnp.ones(n)])
    G = jnp.block([[jnp.eye(n), -jnp.eye(n)],
                   [-jnp.eye(n), -jnp.eye(n)]])
    h = jnp.zeros(2 * n)
    dims = ConeDims(l=2 * n)
    P = jnp.block([[2.0 * A.T @ A, jnp.zeros((n, n))],
                   [jnp.zeros((n, n)), jnp.zeros((n, n))]])

    sol1 = coneqp(P, q, G, h, dims)
    assert sol1["status"] == "optimal"

    # operator form
    def Pop(v):
        return jnp.concatenate([2.0 * (A.T @ (A @ v[:n])),
                                jnp.zeros(n)])

    def Gop(v, trans=False):
        if trans:
            z1, z2 = v[:n], v[n:]
            return jnp.concatenate([z1 - z2, -z1 - z2])
        x, u = v[:n], v[n:]
        return jnp.concatenate([x - u, -x - u])

    def kktsolver(W, H=None, Df=None):
        d = W.d
        p = 1.0 / d[:n] ** 2
        qd = 1.0 / d[n:] ** 2
        S = p + qd
        w = 4.0 * p * qd / S
        M = 2.0 * A.T @ A + jnp.diag(w)
        C = cho_factor(M, lower=True)

        def solve(bx, by, bz):
            bx_x, bx_u = bx[:n], bx[n:]
            bz1, bz2 = bz[:n], bz[n:]
            cu = bx_u - p * bz1 - qd * bz2
            r = bx_x + (p - qd) / S * cu + p * bz1 - qd * bz2
            x = cho_solve(C, r)
            u = (cu + (p - qd) * x) / S
            z1 = p * (x - u - bz1)
            z2 = qd * (-x - u - bz2)
            return (jnp.concatenate([x, u]),
                    jnp.zeros((0,), bx.dtype),
                    jnp.concatenate([z1, z2]))

        return solve

    sol2 = coneqp(Pop, q, Gop, h, dims, kktsolver=kktsolver)
    assert sol2["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol1["x"])[:n],
                               np.asarray(sol2["x"])[:n], atol=1e-5)


# ---------------------------------------------------------------------------
# Custom vector spaces (the reference's third customization level:
# coneprog.py:378-402 xnewcopy/xdot/xscal/xaxpy).  Here x lives in a
# structured pytree space {'a': R^n1, 'b': R^n2}; G and P are operators and
# the custom kktsolver maps to a dense factor and back.
# ---------------------------------------------------------------------------


def test_coneqp_pytree_vector_space():
    from kvxopt_tpu import kkt

    rng = np.random.default_rng(11)
    n1, n2, m = 3, 4, 10
    n = n1 + n2
    G1 = jnp.asarray(rng.standard_normal((m, n1)))
    G2 = jnp.asarray(rng.standard_normal((m, n2)))
    Gfull = jnp.concatenate([G1, G2], axis=1)
    Pfull = jnp.asarray(np.eye(n) * 2.0)
    x0 = rng.standard_normal(n)
    h = jnp.asarray(np.asarray(Gfull) @ x0 + rng.uniform(0.5, 1.5, m))
    qv = rng.standard_normal(n)
    dims = ConeDims(l=m)

    # dense reference solve
    sol_dense = coneqp(Pfull, qv, Gfull, h, dims)
    assert sol_dense["status"] == "optimal"

    # pytree-space solve: x = {'a': (n1,), 'b': (n2,)}
    qtree = {"a": jnp.asarray(qv[:n1]), "b": jnp.asarray(qv[n1:])}

    def Gop(u, trans=False):
        if trans:
            return {"a": G1.T @ u, "b": G2.T @ u}
        return G1 @ u["a"] + G2 @ u["b"]

    def Pop(u):
        return {"a": 2.0 * u["a"], "b": 2.0 * u["b"]}

    dense_factor = kkt.make_kkt_solver("chol2", dims, Gfull,
                                       jnp.zeros((0, n)), Pfull)

    def kktsolver(W, H=None, Df=None):
        solve_dense = dense_factor(W)

        def solve(bx, by, bz):
            bxc = jnp.concatenate([bx["a"], bx["b"]])
            ux, uy, uz = solve_dense(bxc, by, bz)
            return {"a": ux[:n1], "b": ux[n1:]}, uy, uz

        return solve

    sol_tree = coneqp(Pop, qtree, Gop, h, dims, kktsolver=kktsolver,
                      xnewcopy=lambda u: u)
    assert sol_tree["status"] == "optimal"
    xcat = np.concatenate([np.asarray(sol_tree["x"]["a"]),
                           np.asarray(sol_tree["x"]["b"])])
    np.testing.assert_allclose(xcat, np.asarray(sol_dense["x"]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(sol_tree["z"]),
                               np.asarray(sol_dense["z"]), atol=1e-7)


def test_conelp_pytree_vector_space():
    """conelp over a structured pytree x-space agrees with the dense path
    (and exercises the tau/kappa embedding with abstract x)."""
    from kvxopt_tpu import kkt

    rng = np.random.default_rng(12)
    n1, n2, m = 2, 3, 9
    n = n1 + n2
    G1 = jnp.asarray(rng.standard_normal((m, n1)))
    G2 = jnp.asarray(rng.standard_normal((m, n2)))
    Gfull = jnp.concatenate([G1, G2], axis=1)
    x0 = rng.standard_normal(n)
    h = jnp.asarray(np.asarray(Gfull) @ x0 + rng.uniform(0.5, 1.5, m))
    # bounded LP: c in the row space of G with positive multipliers
    zc = rng.uniform(0.5, 1.5, m)
    cv = -np.asarray(Gfull).T @ zc
    dims = ConeDims(l=m)

    sol_dense = conelp(cv, Gfull, h, dims)
    assert sol_dense["status"] == "optimal"

    ctree = {"a": jnp.asarray(cv[:n1]), "b": jnp.asarray(cv[n1:])}

    def Gop(u, trans=False):
        if trans:
            return {"a": G1.T @ u, "b": G2.T @ u}
        return G1 @ u["a"] + G2 @ u["b"]

    dense_factor = kkt.make_kkt_solver("chol2", dims, Gfull,
                                       jnp.zeros((0, n)))

    def kktsolver(W, H=None, Df=None):
        solve_dense = dense_factor(W)

        def solve(bx, by, bz):
            bxc = jnp.concatenate([bx["a"], bx["b"]])
            ux, uy, uz = solve_dense(bxc, by, bz)
            return {"a": ux[:n1], "b": ux[n1:]}, uy, uz

        return solve

    sol_tree = conelp(ctree, Gop, h, dims, kktsolver=kktsolver,
                      xnewcopy=lambda u: u)
    assert sol_tree["status"] == "optimal"
    xcat = np.concatenate([np.asarray(sol_tree["x"]["a"]),
                           np.asarray(sol_tree["x"]["b"])])
    np.testing.assert_allclose(xcat, np.asarray(sol_dense["x"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sol_tree["z"]),
                               np.asarray(sol_dense["z"]), atol=1e-6)
