"""Final batch of reference example ports (closes the examples item):

- book/chap6/consumerpref.py — consumer preference analysis: a family
  of LPs over concavity/monotonicity/preference constraints built with
  the modeling DSL (reference examples/book/chap6/consumerpref.py:88-113)
- book/chap6/inputdesign.py — regularized least-norm input design via
  lapack.gels (reference examples/book/chap6/inputdesign.py:27-37)
- book/chap7/probbounds.py — Chebyshev probability lower bounds via
  solvers.sdp (reference examples/book/chap7/probbounds.py:48-103)
- filterdemo — Chebyshev FIR lowpass design through the DSL:
  op(max(abs(G2*h)), [G1*h <= d1, G1*h >= 1/d1])
  (reference examples/filterdemo/filterdemo_cli design_lowpass)

Oracle: the actual reference package (built by tools/build_reference.py)
run on the same (reduced-size) data; skipped if unavailable, in which
case independent numpy/feasibility oracles still run.
"""

import sys
from math import cos, pi, sqrt

import numpy as np
import pytest

from kvxopt_tpu import lapack, matrix
from kvxopt_tpu.models.modeling import variable, op
from kvxopt_tpu.models.modeling import max as mmax
from kvxopt_tpu.solvers import sdp


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, ".")
    from tools.build_reference import build
    prefix = build()
    if prefix is None:
        pytest.skip("reference oracle unavailable")
    if prefix not in sys.path:
        sys.path.insert(0, prefix)
    import kvxopt
    from kvxopt import modeling, solvers
    solvers.options["show_progress"] = False
    return kvxopt


# ---------------------------------------------------------------------------
# consumerpref (reduced to the first 12 baskets for test runtime)

_B40 = [
    0.45, 0.96, 0.21, 0.34, 0.28, 0.87, 0.96, 0.03, 0.08, 0.92,
    0.02, 0.22, 0.00, 0.39, 0.26, 0.64, 0.35, 0.97, 0.91, 0.78,
    0.12, 0.14, 0.58, 0.84,
]
_M = 12
_B = np.asarray(_B40, dtype=float).reshape(_M, 2).T  # (2, m) column baskets


def _utility(x, y):
    return (1.1 * np.sqrt(x) + 0.8 * np.sqrt(y)) / 1.9


def _classify(solve_pair):
    """Reference classification loop (consumerpref.py:97-113): basket k
    is 'rejected' if minimize -u[k] is optimal with positive value, else
    'preferred' if minimize u[k] is optimal with positive value, else
    'neutral'.  Unbounded/infeasible solves (non-'optimal' statuses) are
    part of the semantics.  Returns (labels, values) with values[k] =
    (neg_max, min) np.nan where not optimal."""
    labels, vals = [], np.full((_M, 2), np.nan)
    for k in range(_M):
        st, v = solve_pair(k, -1)
        if st == "optimal":
            vals[k, 0] = v
        if st == "optimal" and v > 1e-7:
            labels.append("rejected")
            continue
        st, v = solve_pair(k, +1)
        if st == "optimal":
            vals[k, 1] = v
        if st == "optimal" and v > 1e-7:
            labels.append("preferred")
        else:
            labels.append("neutral")
    return labels, vals


def _pref_solver_ours():
    """Build the consumerpref LP family with this package's DSL; return
    a (k, sign) -> (status, objective value) closure."""
    m = _M
    B = _B
    order = np.argsort(_utility(B[0], B[1]))
    u, gx, gy = variable(m), variable(m), variable(m)
    gxc, gyc = variable(1), variable(1)
    cons = [gx >= 0, gy >= 0, gxc >= 0, gyc >= 0]
    cons += [u[int(order[j + 1])] >= u[int(order[j])] + 1.0
             for j in range(m - 1)]
    cons += [u[j] <= u[i] + gx[i] * (B[0, j] - B[0, i])
             + gy[i] * (B[1, j] - B[1, i])
             for i in range(m) for j in range(m)]
    cons += [0 <= u[i] + gx[i] * (0.5 - B[0, i]) + gy[i] * (0.5 - B[1, i])
             for i in range(m)]
    cons += [u[j] <= gxc * (B[0, j] - 0.5) + gyc * (B[1, j] - 0.5)
             for j in range(m)]

    def solve_pair(k, sign):
        p = op(sign * u[k], cons)
        p.solve()
        v = float(np.asarray(p.objective.value()).reshape(-1)[0]) \
            if p.status == "optimal" else np.nan
        return p.status, v

    return solve_pair


def _pref_solver_ref(kv):
    from kvxopt.modeling import variable as rvar, op as rop
    m = _M
    B = kv.matrix(list(_B.T.reshape(-1)), (2, m))
    order = np.argsort(_utility(_B[0], _B[1]))
    u, gx, gy = rvar(m), rvar(m), rvar(m)
    gxc, gyc = rvar(1), rvar(1)
    cons = [gx >= 0, gy >= 0, gxc >= 0, gyc >= 0]
    cons += [u[int(order[j + 1])] >= u[int(order[j])] + 1.0
             for j in range(m - 1)]
    cons += [u[j] <= u[i] + gx[i] * (B[0, j] - B[0, i])
             + gy[i] * (B[1, j] - B[1, i])
             for i in range(m) for j in range(m)]
    cons += [0 <= u[i] + gx[i] * (0.5 - B[0, i]) + gy[i] * (0.5 - B[1, i])
             for i in range(m)]
    cons += [u[j] <= gxc * (B[0, j] - 0.5) + gyc * (B[1, j] - 0.5)
             for j in range(m)]

    def solve_pair(k, sign):
        p = rop(sign * u[k], cons)
        p.solve()
        v = p.objective.value()[0] if p.status == "optimal" else np.nan
        return p.status, v

    return solve_pair


def test_consumerpref_analysis(ref):
    """book/chap6/consumerpref.py: the preferred / rejected /
    inconclusive classification of every basket agrees with the
    reference, and the decisive LP optimal values agree where both
    sides report 'optimal' (consumerpref.py:97-113)."""
    labels_o, vals_o = _classify(_pref_solver_ours())
    labels_r, vals_r = _classify(_pref_solver_ref(ref))
    assert labels_o == labels_r
    both = np.isfinite(vals_o) & np.isfinite(vals_r)
    assert both.any()  # at least some decisive solves on both sides
    np.testing.assert_allclose(vals_o[both], vals_r[both],
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# inputdesign


def test_inputdesign_gels():
    """book/chap6/inputdesign.py:27-37 — tracking/magnitude/derivative
    tradeoff solved by lapack.gels; checked against numpy lstsq for the
    three (delta, eta) settings of the figure."""
    m = n = 201
    H = np.zeros((m, m))
    for t in range(m):
        H += np.diag(np.full(m - t, (1.0 / 9.0) * 0.9 ** t
                             * (1.0 - 0.4 * cos(2 * t))), -t)
    ydes = np.concatenate([np.zeros(40), np.ones(50), -np.ones(50),
                           np.zeros(61)])
    I = np.eye(n)
    D = np.zeros((n - 1, n))
    D[np.arange(n - 1), np.arange(n - 1)] = -1.0
    D[np.arange(n - 1), np.arange(1, n)] = 1.0
    for delta, eta in [(0.0, 0.005), (0.0, 0.05), (0.3, 0.05)]:
        AA = np.vstack([H, sqrt(eta) * I, sqrt(delta) * D])
        bb = np.concatenate([ydes, np.zeros(2 * n - 1)])
        A_m = matrix(AA.copy())
        x_m = matrix(bb.copy().reshape(-1, 1))
        lapack.gels(A_m, x_m)
        u = np.asarray(x_m)[:n, 0]
        u_np = np.linalg.lstsq(AA, bb, rcond=None)[0]
        np.testing.assert_allclose(u, u_np, rtol=1e-8, atol=1e-8)


# ---------------------------------------------------------------------------
# probbounds

def _voronoi_data():
    m = 6
    V = np.array([[1.0, -1.0, -2.0, -2.0, 0.0, 1.5, 1.0],
                  [1.0, 2.0, 1.0, -1.0, -2.0, -1.0, 1.0]])
    A0 = np.column_stack([-(V[1, :m] - V[1, 1:]), V[0, :m] - V[0, 1:]])
    b0 = (A0 * V[:, :m].T).sum(axis=1)
    return m, A0, b0


def _cheb_ours(A, b, Sigma):
    """Chebyshev lower bound on Prob(Ax <= b), x ~ (0, Sigma)
    (probbounds.py:48-103) through this package's solvers.sdp."""
    m = A.shape[0]
    novars = 6 + m
    c = np.zeros(novars)
    c[0], c[1], c[2] = Sigma[0, 0], 2 * Sigma[1, 0], Sigma[1, 1]
    c[5] = 1.0
    Gs, hs = [], []
    for k in range(m + 1):
        Gk = np.zeros((9, novars))
        Gk[0, 0] = -1.0
        Gk[1, 1] = -1.0
        Gk[4, 2] = -1.0
        Gk[2, 3] = -1.0
        Gk[5, 4] = -1.0
        Gk[8, 5] = -1.0
        if k < m:
            Gk[2, 6 + k] = 0.5 * A[k, 0]
            Gk[5, 6 + k] = 0.5 * A[k, 1]
            Gk[8, 6 + k] = -b[k]
        Gs.append(Gk)
        hk = np.zeros((3, 3))
        if k < m:
            hk[2, 2] = -1.0
        hs.append(hk)
    Gl = np.zeros((m, novars))
    Gl[np.arange(m), 6 + np.arange(m)] = -1.0
    hl = np.zeros(m)
    sol = sdp(c, Gl, hl, Gs, hs)
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"]).reshape(-1)
    P = x[[0, 1, 1, 2]].reshape(2, 2)
    q = x[[3, 4]]
    r = x[5]
    bound = 1.0 - Sigma[0, 0] * P[0, 0] - 2 * Sigma[1, 0] * P[1, 0] \
        - Sigma[1, 1] * P[1, 1] - r
    return bound, P, q, r, sol


def _cheb_ref(kv, A, b, Sigma):
    from kvxopt import solvers, spmatrix
    solvers.options["show_progress"] = False
    m = A.shape[0]
    novars = 6 + m
    c = kv.matrix(0.0, (novars, 1))
    c[0], c[1], c[2] = Sigma[0, 0], 2 * Sigma[1, 0], Sigma[1, 1]
    c[5] = 1.0
    Gs = [spmatrix([], [], [], (9, novars)) for _ in range(m + 1)]
    for k in range(m + 1):
        Gs[k][0, 0] = -1.0
        Gs[k][1, 1] = -1.0
        Gs[k][4, 2] = -1.0
        Gs[k][2, 3] = -1.0
        Gs[k][5, 4] = -1.0
        Gs[k][8, 5] = -1.0
    for k in range(m):
        Gs[k][2, 6 + k] = 0.5 * A[k, 0]
        Gs[k][5, 6 + k] = 0.5 * A[k, 1]
        Gs[k][8, 6 + k] = -b[k]
    hs = [kv.matrix(8 * [0.0] + [-1.0], (3, 3)) for _ in range(m)] \
        + [kv.matrix(0.0, (3, 3))]
    Gl = spmatrix(-1.0, range(m), range(6, 6 + m), (m, novars))
    hl = kv.matrix(0.0, (m, 1))
    sol = solvers.sdp(c, Gl, hl, Gs, hs)
    assert sol["status"] == "optimal"
    x = sol["x"]
    P = np.array([[x[0], x[1]], [x[1], x[2]]])
    q = np.array([x[3], x[4]])
    r = x[5]
    bound = 1.0 - Sigma[0, 0] * P[0, 0] - 2 * Sigma[1, 0] * P[1, 0] \
        - Sigma[1, 1] * P[1, 1] - r
    return bound, P, q, r


def test_probbounds_chebyshev_sdp(ref):
    """book/chap7/probbounds.py: the Chebyshev detection-probability
    lower bound for the Voronoi cell of symbol 0, at two noise levels,
    matches the reference sdp solve; the bounding ellipsoid recovery via
    lapack.posv (probbounds.py:112-115) is exercised too."""
    m, A0, b0 = _voronoi_data()
    for sigma in (1.0, 1.5):
        Sigma = sigma ** 2 * np.eye(2)
        bound, P, q, r, sol = _cheb_ours(A0, b0, Sigma)
        rbound, rP, rq, rr = _cheb_ref(ref, A0, b0, Sigma)
        assert 0.0 <= bound <= 1.0 + 1e-8
        np.testing.assert_allclose(bound, rbound, atol=2e-5)
        np.testing.assert_allclose(P, rP, atol=2e-4)
        np.testing.assert_allclose(q, rq, atol=2e-4)
        np.testing.assert_allclose(r, rr, atol=2e-4)
    # ellipse {x | x'Px + 2q'x + r = 1} -> xc + L^{-T} u form
    L_m = matrix(P.copy())
    xc_m = matrix((-q).reshape(2, 1))
    lapack.posv(L_m, xc_m)
    xc = np.asarray(xc_m).reshape(-1)
    scale = 1.0 - r - float(q @ xc)
    assert scale > 0  # nondegenerate bounding ellipse


# ---------------------------------------------------------------------------
# filterdemo


def _design_lowpass_ours(N, rp_db, wc, ws, Q=20):
    h = variable(N + 1)
    d1 = 10 ** (rp_db / 20.0)
    n1 = int(round(N * Q * wc / pi))
    w1 = np.linspace(0, wc, n1, endpoint=False)
    G1 = np.cos(np.outer(w1, np.arange(N + 1)))
    n2 = int(round(N * Q * (pi - ws) / pi))
    w2 = np.linspace(ws, pi, n2, endpoint=False)
    G2 = np.cos(np.outer(w2, np.arange(N + 1)))
    p = op(mmax(abs(G2 * h)), [G1 * h <= d1, G1 * h >= 1.0 / d1])
    p.solve()
    assert p.status == "optimal"
    hv = np.asarray(h.value).reshape(-1)
    return hv, float(np.max(np.abs(G2 @ hv))), G1, G2, d1


def _design_lowpass_ref(kv, N, rp_db, wc, ws, Q=20):
    from kvxopt.modeling import variable as rvar, op as rop
    from kvxopt.modeling import max as rmax
    h = rvar(N + 1)
    d1 = 10 ** (rp_db / 20.0)
    n1 = int(round(N * Q * wc / pi))
    w1 = np.linspace(0, wc, n1, endpoint=False)
    G1 = kv.matrix(np.cos(np.outer(w1, np.arange(N + 1))))
    n2 = int(round(N * Q * (pi - ws) / pi))
    w2 = np.linspace(ws, pi, n2, endpoint=False)
    G2np = np.cos(np.outer(w2, np.arange(N + 1)))
    G2 = kv.matrix(G2np)
    p = rop(rmax(abs(G2 * h)), [G1 * h <= d1, G1 * h >= 1.0 / d1])
    p.solve()
    assert p.status == "optimal"
    hv = np.asarray(h.value).reshape(-1)
    return hv, float(np.max(np.abs(G2np @ hv)))


def test_filterdemo_lowpass_design(ref):
    """filterdemo_cli design_lowpass: Chebyshev FIR lowpass via
    op(max(abs(G2*h)), [G1*h <= d1, G1*h >= 1/d1]) — stopband
    attenuation optimum matches the reference and the passband ripple
    constraints hold."""
    N, rp, wc, ws = 10, 1.0, 0.3 * pi, 0.5 * pi
    hv, att, G1, G2, d1 = _design_lowpass_ours(N, rp, wc, ws)
    rhv, ratt = _design_lowpass_ref(ref, N, rp, wc, ws)
    np.testing.assert_allclose(att, ratt, rtol=1e-6, atol=1e-7)
    y1 = G1 @ hv
    assert (y1 <= d1 + 1e-7).all() and (y1 >= 1.0 / d1 - 1e-7).all()
    # a real lowpass: stopband attenuation well below the passband level
    assert att < 1.0 / d1


# ---------------------------------------------------------------------------
# rls (reference examples/book/chap4/rls.py:1 — fig 4.11, regularized
# least-squares): optimal values of min/max ||Ax-b||^2 s.t. x'x = alpha
# via SDP duals.  The reference loads a pickle (rls.bin, not in the
# tree); data is synthesized here.  Independent oracle: the sphere-
# constrained LS optimum from the secular equation (bisection on the
# Lagrange multiplier), plus the reference's own sdp on the same data.


def _rls_data(m=6, n=4, seed=7):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    return A, b


def _rls_gh(A, b):
    """The example's G, h for the two-variable (t, u) SDP."""
    m, n = A.shape
    G = np.zeros(((n + 1) ** 2, 2))
    G[-1, 0] = -1.0                        # coefficient of t
    G[: (n + 1) ** 2 - 1: n + 2, 1] = -1.0  # coefficient of u
    Ab = np.hstack([A, b.reshape(-1, 1)])
    h = Ab.T @ Ab                          # [A b]'[A b], (n+1)x(n+1)
    return G, h


def _sphere_ls_value(A, b, alpha, minimize=True):
    """min/max ||Ax-b||^2 over ||x||^2 = alpha by bisection on the
    multiplier in (A'A + lam I) x = A'b (trust-region secular
    equation; no hard case for generic data)."""
    H = A.T @ A
    g = A.T @ b
    w = np.linalg.eigvalsh(H)
    lo, hi = (-w[0], -w[0] + 1e6) if minimize else (-w[-1] - 1e6, -w[-1])
    for _ in range(200):
        lam = 0.5 * (lo + hi)
        x = np.linalg.solve(H + lam * np.eye(H.shape[0]), g)
        nrm2 = float(x @ x)
        # ||x(lam)||^2 is decreasing in lam on the min branch
        # (lam > -w_min) and increasing on the max branch (lam < -w_max)
        if (nrm2 > alpha) == minimize:
            lo = lam
        else:
            hi = lam
    r = A @ x - b
    return float(r @ r)


def test_rls_bounds_vs_secular_oracle():
    """Lower/upper bound SDPs reproduce the exact sphere-constrained LS
    optima (the duality in the example is tight for this problem)."""
    A, b = _rls_data()
    G, h = _rls_gh(A, b)
    for alpha in (0.2, 1.0, 3.0):
        c = np.array([1.0, alpha])
        lb = sdp(c, Gs=[matrix(np.asfortranarray(G))],
                 hs=[matrix(np.asfortranarray(h))])
        assert lb["status"] == "optimal"
        lval = -float(c @ np.asarray(lb["x"]).ravel())
        exact = _sphere_ls_value(A, b, alpha, minimize=True)
        np.testing.assert_allclose(lval, exact, rtol=1e-5, atol=1e-6)
    for alpha in (0.2, 0.6):
        c = np.array([1.0, alpha])
        ub = sdp(c, Gs=[matrix(np.asfortranarray(G))],
                 hs=[matrix(np.asfortranarray(-h))])
        assert ub["status"] == "optimal"
        uval = float(c @ np.asarray(ub["x"]).ravel())
        exact = _sphere_ls_value(A, b, alpha, minimize=False)
        np.testing.assert_allclose(uval, exact, rtol=1e-5, atol=1e-6)


def test_rls_bounds_vs_reference(ref):
    """Same SDPs through the reference solver on identical data."""
    from kvxopt import solvers as rsolvers
    rmatrix = ref.matrix
    A, b = _rls_data()
    G, h = _rls_gh(A, b)
    for alpha, sign in ((1.0, 1), (0.6, -1)):
        c = np.array([1.0, alpha])
        ours = sdp(c, Gs=[matrix(np.asfortranarray(G))],
                   hs=[matrix(np.asfortranarray(sign * h))])
        rsol = rsolvers.sdp(rmatrix(c.reshape(-1, 1)),
                            Gs=[rmatrix(np.asfortranarray(G))],
                            hs=[rmatrix(np.asfortranarray(sign * h))])
        np.testing.assert_allclose(
            np.asarray(ours["x"]).ravel(),
            np.array(rsol["x"]).ravel(), rtol=1e-5, atol=1e-6)
