"""Fourth batch of cvxbook example ports:

- book/chap6/robls.py — robust least squares with structured
  uncertainty as an SDP (the [I P(x) r; P(x)' vI 0; r' 0 t] LMI)
- book/chap8/ellipsoids.py — minimum-volume ellipsoid covering points
  (Loewner-John) via cp with a log-det objective
- book/chap6/polapprox.py — polynomial data fitting in the Chebyshev
  norm via LP

Data synthesized; oracles: direct numeric evaluation of the robust /
covering objectives and scipy references."""

import numpy as np

import jax.numpy as jnp

from kvxopt_tpu.solvers import lp, sdp, cp


def _robust_obj(A, Aps, b, x, nsamp=400, rng=None):
    """max_{||u||<=1} || (A + sum u_i Ap_i) x - b ||: evaluated exactly —
    the residual is r0 + P(x) u, affine in u, so the max over the ball
    is ||r0|| with the P-component maximized: max_u ||r0 + P u|| =
    sigma-dependent; compute by noting the max over the unit ball of a
    convex function is attained at an extreme point — here solved in
    closed form through the SVD lifting max_{||u||=1} ||r0 + Pu||, which
    for P with full column rank equals the largest root of a secular
    equation; we bound it numerically by polished sampling."""
    r0 = A @ x - b
    P = np.stack([Ap @ x for Ap in Aps], axis=1)
    rng = rng or np.random.default_rng(0)
    best = np.linalg.norm(r0)
    for _ in range(nsamp):
        u = rng.standard_normal(P.shape[1])
        u /= np.linalg.norm(u)
        # one fixed-point polish step: u <- P'(r0+Pu)/||.||
        for _ in range(50):
            g = P.T @ (r0 + P @ u)
            nv = np.linalg.norm(g)
            if nv < 1e-14:
                break
            u2 = g / nv
            if np.linalg.norm(u2 - u) < 1e-12:
                u = u2
                break
            u = u2
        best = max(best, np.linalg.norm(r0 + P @ u))
    return best


def test_robls_sdp():
    """book/chap6/robls.py: the robust LS SDP; the robust solution's
    worst-case residual must beat the plain LS solution's."""
    rng = np.random.default_rng(5)
    m, n, p = 8, 4, 3
    A = rng.standard_normal((m, n))
    Aps = [0.35 * rng.standard_normal((m, n)) for _ in range(p)]
    b = A @ rng.standard_normal(n) + 0.5 * rng.standard_normal(m)

    # SDP: minimize t + v s.t.
    # [ I       P(x)   r(x) ]
    # [ P(x)'   v*I    0    ]  >= 0,  r(x) = A x - b
    # [ r(x)'   0      t    ]
    M = m + p + 1
    nv = n + 2                       # x, v, t
    Gs = np.zeros((M * M, nv))

    def put(Smat, col):
        Gs[:, col] += -Smat.reshape(-1)   # G column = -coefficient

    for k in range(n):
        S = np.zeros((M, M))
        for j in range(p):
            S[m + j, :m] = Aps[j][:, k]
            S[:m, m + j] = Aps[j][:, k]
        S[M - 1, :m] = A[:, k]
        S[:m, M - 1] = A[:, k]
        put(S, k)
    Sv = np.zeros((M, M))
    Sv[m:m + p, m:m + p] = np.eye(p)
    put(Sv, n)
    St = np.zeros((M, M))
    St[M - 1, M - 1] = 1.0
    put(St, n + 1)
    hs = np.zeros((M, M))
    hs[:m, :m] = np.eye(m)
    hs[M - 1, :m] = -b
    hs[:m, M - 1] = -b
    c = np.zeros(nv); c[n] = 1.0; c[n + 1] = 1.0

    sol = sdp(c, Gs=[Gs], hs=[hs])
    assert sol["status"] == "optimal"
    x_rob = np.asarray(sol["x"])[:n]

    x_ls = np.linalg.lstsq(A, b, rcond=None)[0]
    r_rob = _robust_obj(A, Aps, b, x_rob)
    r_ls = _robust_obj(A, Aps, b, x_ls)
    assert r_rob <= r_ls + 1e-8
    # the SDP objective t + v upper-bounds the squared worst case:
    # worst-case residual^2 <= t*(1+...)  (schur structure); sanity:
    assert r_rob ** 2 <= float(sol["primal objective"]) + 1e-6


def test_ellipsoids_min_volume_cover():
    """book/chap8/ellipsoids.py (Loewner-John): minimum-volume ellipsoid
    {y : ||Ly + c|| <= 1} covering points, via cp on the Cholesky
    parameterization minimizing -log l11 - log l22.  Checks: all points
    covered, at least 2 points on the boundary (support), and volume no
    larger than the bounding ball's."""
    rng = np.random.default_rng(6)
    mpts = 30
    T = np.array([[2.0, 0.6], [0.0, 0.8]])
    pts = (T @ rng.standard_normal((2, mpts))).T + np.array([1.0, -0.5])

    # minimize -log det L over L lower-tri (l11,l21,l22), c (2):
    # s.t. ||L p_k + c||^2 <= 1
    def fcon(x):
        L = jnp.array([[x[0], 0.0], [x[1], x[2]]])
        c = x[3:5]
        y = pts @ L.T + c[None, :]
        return jnp.sum(y * y, axis=1) - 1.0

    import jax

    def F(x=None, z=None):
        if x is None:
            # start from a small ball mapped inside: L = eps I
            return mpts, jnp.asarray([0.1, 0.0, 0.1, -0.1, 0.05])
        x = jnp.asarray(x)
        if float(x[0]) <= 0 or float(x[2]) <= 0:
            return None
        f0 = -jnp.log(x[0]) - jnp.log(x[2])
        fc = fcon(x)
        if not bool(jnp.all(jnp.isfinite(fc))):
            return None
        full = lambda y: jnp.concatenate(
            [jnp.array([-jnp.log(y[0]) - jnp.log(y[2])]), fcon(y)])
        f = full(x)
        Df = jax.jacfwd(full)(x)
        if z is None:
            return f, Df
        H = jax.hessian(lambda y: jnp.dot(jnp.asarray(z), full(y)))(x)
        return f, Df, H

    sol = cp(F)
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"])
    L = np.array([[x[0], 0.0], [x[1], x[2]]])
    c = x[3:5]
    y = pts @ L.T + c[None, :]
    nrm = np.linalg.norm(y, axis=1)
    assert np.all(nrm <= 1.0 + 1e-6)          # covered
    assert np.sum(nrm > 1.0 - 1e-4) >= 2      # support points
    # volume = pi / det(L); compare to the bounding circle around the
    # centroid (the Loewner-John ellipsoid is no bigger)
    ctr = pts.mean(axis=0)
    R = np.max(np.linalg.norm(pts - ctr, axis=1))
    vol_ell = np.pi / np.linalg.det(L)
    assert vol_ell <= np.pi * R * R * 1.0001


def test_polapprox_chebyshev_lp():
    """book/chap6/polapprox.py: Chebyshev-norm polynomial fit as an LP
    (minimize t s.t. -t <= V a - y <= t); oracle: scipy linprog."""
    rng = np.random.default_rng(7)
    m, deg = 40, 4
    u = np.linspace(-1, 1, m)
    y = np.cos(2 * u) + 0.05 * rng.standard_normal(m)
    V = np.vander(u, deg + 1, increasing=True)

    nv = deg + 2                     # coefficients + t
    c = np.zeros(nv); c[-1] = 1.0
    G = np.zeros((2 * m, nv)); h = np.zeros(2 * m)
    G[:m, :deg + 1] = V; G[:m, -1] = -1.0; h[:m] = y
    G[m:, :deg + 1] = -V; G[m:, -1] = -1.0; h[m:] = -y
    sol = lp(c, G, h)
    assert sol["status"] == "optimal"
    t = float(sol["primal objective"])

    from scipy.optimize import linprog
    res = linprog(c, A_ub=G, b_ub=h, bounds=[(None, None)] * nv,
                  method="highs")
    assert res.status == 0
    np.testing.assert_allclose(t, res.fun, atol=1e-7)
    a = np.asarray(sol["x"])[:deg + 1]
    np.testing.assert_allclose(np.max(np.abs(V @ a - y)), t, atol=1e-6)
