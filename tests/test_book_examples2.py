"""More cvxbook example ports: chap8 linear discrimination (linsep) and
maximum-volume inscribed ellipsoid (centers), chap7 Chernoff bounds
(chernoff), chap8 quadratic placement (placement).  Reference:
examples/book/chap8/linsep.py, centers.py, placement.py and
examples/book/chap7/chernoff.py (data synthesized — the reference's
.bin files are cvxopt pickles)."""

import numpy as np

import jax.numpy as jnp

from kvxopt_tpu.models.modeling import variable, op
from kvxopt_tpu.models.modeling import sum as msum
from kvxopt_tpu.solvers import qp, lp, cpl
from kvxopt_tpu.solvers.cvxprog import oracle_from_function


def _two_clouds(rng, N, M, margin=1.0):
    X = rng.standard_normal((2, N)) + np.array([[2.5], [2.5]])
    Y = rng.standard_normal((2, M)) - np.array([[2.5], [2.5]])
    return X, Y


def test_linsep_lp_discrimination():
    """book/chap8/linsep.py (first figure): approximate linear
    discrimination via LP through the modeling DSL; oracle: scipy
    linprog on the same LP."""
    rng = np.random.default_rng(0)
    N, M = 25, 25
    X, Y = _two_clouds(rng, N, M)

    a = variable(2); b = variable()
    u = variable(N); v = variable(M)
    prob = op(msum(u) + msum(v),
              [X.T * a - b >= 1 - u,
               Y.T * a - b <= -1 + v,
               u >= 0, v >= 0])
    prob.solve()
    assert prob.status == "optimal"
    av = np.asarray(a.value).reshape(-1)
    bv = float(np.asarray(b.value).reshape(-1)[0])
    obj = float(prob.objective.value()[0])

    # scipy oracle on the same LP
    from scipy.optimize import linprog
    # variables: [a(2), b, u(N), v(M)]
    nv = 3 + N + M
    cvec = np.zeros(nv); cvec[3:] = 1.0
    A_ub = np.zeros((N + M, nv)); b_ub = np.zeros(N + M)
    A_ub[:N, :2] = -X.T; A_ub[:N, 2] = 1.0
    A_ub[:N, 3:3 + N] = -np.eye(N); b_ub[:N] = -1.0
    A_ub[N:, :2] = Y.T; A_ub[N:, 2] = -1.0
    A_ub[N:, 3 + N:] = -np.eye(M); b_ub[N:] = -1.0
    res = linprog(cvec, A_ub=A_ub, b_ub=b_ub,
                  bounds=[(None, None)] * 3 + [(0, None)] * (N + M),
                  method="highs")
    assert res.status == 0
    np.testing.assert_allclose(obj, res.fun, atol=1e-6)
    # the clouds are separable: zero misclassification penalty
    assert obj < 1e-6
    assert np.all(X.T @ av - bv >= 1 - 1e-6)
    assert np.all(Y.T @ av - bv <= -1 + 1e-6)


def test_chernoff_qp_distances():
    """book/chap7/chernoff.py core: squared distances from the origin to
    polyhedral (Voronoi-like) regions via QP min x'x s.t. Ax <= b;
    oracle: scipy minimize with the same constraints."""
    rng = np.random.default_rng(1)
    P = np.eye(2); q = np.zeros(2)
    from scipy.optimize import minimize
    for k in range(5):
        A = rng.standard_normal((3, 2))
        x0 = rng.standard_normal(2) + np.array([2.0, 1.0])
        b = A @ x0 + rng.uniform(0.1, 1.0, 3)
        sol = qp(P, q, A, b)
        assert sol["status"] == "optimal"
        d2 = float(np.asarray(sol["x"]) @ np.asarray(sol["x"]))
        ref = minimize(lambda x: x @ x, x0, jac=lambda x: 2 * x,
                       constraints=[{"type": "ineq",
                                     "fun": lambda x: b - A @ x}],
                       method="SLSQP", options={"ftol": 1e-12})
        assert ref.success
        np.testing.assert_allclose(d2, ref.x @ ref.x, atol=1e-6)


def test_placement_quadratic():
    """book/chap8/placement.py (first part): quadratic placement of free
    points minimizing total squared wire length — a least-squares QP;
    oracle: the normal equations."""
    rng = np.random.default_rng(2)
    nfree, nfix, nw = 6, 4, 18
    fixed = rng.standard_normal((nfix, 2)) * 3
    # wires: (i, j) with i a free point, j free or fixed
    A = np.zeros((nw, nfree)); B = np.zeros((nw, 2))
    for w in range(nw):
        i = rng.integers(nfree)
        if rng.random() < 0.5:
            j = rng.integers(nfree)
            if j == i:
                j = (j + 1) % nfree
            A[w, i] = 1.0; A[w, j] = -1.0
        else:
            A[w, i] = 1.0
            B[w] = -fixed[rng.integers(nfix)]
    # minimize ||A X + B||_F^2 over X (nfree, 2): solve per coordinate
    P = 2.0 * A.T @ A + 1e-9 * np.eye(nfree)
    for d in range(2):
        qd = 2.0 * A.T @ B[:, d]
        sol = qp(P, qd, -np.eye(nfree), 1e3 * np.ones(nfree))
        assert sol["status"] == "optimal"
        xref = np.linalg.lstsq(A, -B[:, d], rcond=None)[0]
        np.testing.assert_allclose(np.asarray(sol["x"]), xref,
                                   atol=1e-5)


def test_centers_max_volume_ellipsoid():
    """book/chap8/centers.py (maximum-volume inscribed ellipsoid):
    maximize log det L over {L u + c : ||u|| <= 1} contained in a
    polyhedron {g_k' y <= h_k}, via cpl with autodiff oracles
    (oracle_from_function).  Containment: ||L' g_k|| + g_k' c <= h_k.
    Oracle checks: feasibility, and the ellipsoid beats the Chebyshev
    ball's volume."""
    # a fixed, well-conditioned polygon (pentagon-ish)
    G = np.array([[1.0, 0.2], [-0.3, 1.0], [-1.0, -0.1],
                  [0.1, -1.0], [0.8, 0.9]])
    h = np.array([2.0, 1.8, 2.2, 1.5, 2.5])
    m = G.shape[0]

    # variables x = (l11, l21, l22, c1, c2), L lower-triangular
    def fcon(x):
        l11, l21, l22, c1, c2 = x[0], x[1], x[2], x[3], x[4]
        L = jnp.array([[l11, 0.0], [l21, l22]])
        c = jnp.array([c1, c2])
        Gj = jnp.asarray(G); hj = jnp.asarray(h)
        norms = jnp.sqrt(jnp.sum((Gj @ L) ** 2, axis=1) + 1e-300)
        return norms + Gj @ c - hj

    x0 = np.array([0.2, 0.0, 0.2, 0.2, 0.1])

    def F(x=None, z=None):
        if x is None:
            return m, jnp.asarray(x0)   # mnl constraints, f0 separate
        x = jnp.asarray(x)
        if float(x[0]) <= 0 or float(x[2]) <= 0:
            return None
        f0 = -jnp.log(x[0]) - jnp.log(x[2])
        fc = fcon(x)
        f = jnp.concatenate([jnp.array([f0]), fc])
        import jax
        Df = jax.jacfwd(lambda y: jnp.concatenate(
            [jnp.array([-jnp.log(y[0]) - jnp.log(y[2])]), fcon(y)]))(x)
        if z is None:
            return f, Df
        H = jax.hessian(lambda y: jnp.dot(jnp.asarray(z),
                        jnp.concatenate([jnp.array(
                            [-jnp.log(y[0]) - jnp.log(y[2])]),
                            fcon(y)])))(x)
        return f, Df, H

    from kvxopt_tpu.solvers import cp
    sol = cp(F)
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"])
    L = np.array([[x[0], 0.0], [x[1], x[2]]])
    c = x[3:5]
    # containment with small slack
    norms = np.linalg.norm(G @ L, axis=1)
    assert np.all(norms + G @ c <= h + 1e-6)
    vol = abs(np.linalg.det(L))

    # Chebyshev ball for comparison (max r: g_k'c + r||g_k|| <= h_k)
    from scipy.optimize import linprog
    cv = np.zeros(3); cv[2] = -1.0
    A_ub = np.hstack([G, np.linalg.norm(G, axis=1)[:, None]])
    res = linprog(cv, A_ub=A_ub, b_ub=h, bounds=[(None, None)] * 2 +
                  [(0, None)], method="highs")
    assert res.status == 0
    r = res.x[2]
    assert vol >= r * r * (1.0 - 1e-6)   # ellipsoid at least the ball
