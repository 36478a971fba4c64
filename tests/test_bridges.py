"""External-solver bridges: glpk (HiGHS), osqp (native JAX ADMM), dsdp
(native dual-scaling), mosek/gurobi absence handling — mirroring the
reference's test_glpk.py / test_osqp.py / test_dsdp.py."""

import numpy as np
import pytest

from kvxopt_tpu import matrix, sparse, spdiag, glpk, osqp, dsdp, solvers


@pytest.fixture
def lp_data():
    c = matrix([-4.0, -5.0])
    G = matrix([[2.0, 1.0, -1.0, 0.0], [1.0, 2.0, 0.0, -1.0]])
    h = matrix([3.0, 3.0, 0.0, 0.0])
    A = matrix([1.0, 1.0], (1, 2))
    b = matrix(1.0)
    return c, G, h, A, b


OSQP_OPTS = {"verbose": 0, "eps_abs": 1e-9, "eps_rel": 1e-9,
             "max_iter": 10000, "rho": 0.1, "adaptive_rho": False,
             "polish": False, "check_termination": 1, "warm_start": True}


def test_glpk_lp(lp_data):
    c, G, h, A, b = lp_data
    sol1 = solvers.lp(c, G, h)
    assert sol1["status"] == "optimal"
    sol3 = solvers.lp(c, G, h, solver="glpk")
    assert sol3["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol3["x"]).reshape(-1),
                               np.asarray(sol1["x"]).reshape(-1), atol=1e-5)
    sol4 = solvers.lp(c, G, h, A, b, solver="glpk")
    assert sol4["status"] == "optimal"
    sol5 = glpk.lp(c, G, h)
    assert sol5[0] == "optimal"
    sol6 = glpk.lp(c, G, h, A, b)
    assert sol6[0] == "optimal"
    sol7 = glpk.lp(c, G, h, None, None)
    assert sol7[0] == "optimal"


def test_glpk_ilp(lp_data):
    c, G, h, A, b = lp_data
    sol1 = glpk.ilp(c, G, h, A, b, set([0]), set())
    assert sol1[0] == "optimal"
    sol3 = glpk.ilp(c, G, h, None, None, set([0, 1]), set())
    assert sol3[0] == "optimal"
    x = np.asarray(sol3[1]).reshape(-1)
    assert np.allclose(x, np.round(x))
    sol4 = glpk.ilp(c, G, h, None, None, set(), set([1]))
    assert sol4[0] == "optimal"
    assert 0.0 <= np.asarray(sol4[1]).reshape(-1)[1] <= 1.0
    sol5 = glpk.ilp(c, G, h, A, matrix(-1.0), set(), set([0, 1]))
    assert sol5[0] == "LP relaxation is primal infeasible"


def test_glpk_options(lp_data):
    c, G, h, A, b = lp_data
    glpk.options = {"msg_lev": "GLP_MSG_OFF"}
    assert glpk.lp(c, G, h)[0] == "optimal"
    assert glpk.lp(c, G, h, options={"msg_lev": "GLP_MSG_ON"})[0] == \
        "optimal"
    sol = solvers.lp(c, G, h, solver="glpk",
                     options={"glpk": {"msg_lev": "GLP_MSG_ON"}})
    assert sol["status"] == "optimal"


def test_osqp_lp(lp_data):
    c, G, h, A, b = lp_data
    sol1 = solvers.lp(c, G, h)
    sol2 = solvers.lp(c, G, h, solver="osqp",
                      options={"osqp": OSQP_OPTS})
    assert sol2["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol2["x"]).reshape(-1),
                               np.asarray(sol1["x"]).reshape(-1), atol=1e-2)
    np.testing.assert_allclose(np.asarray(sol2["z"]).reshape(-1),
                               np.asarray(sol1["z"]).reshape(-1), atol=1e-2)
    sol5 = osqp.qp(c, G, h, options=OSQP_OPTS)
    assert sol5[0] == "solved"
    sol6 = osqp.qp(c, G, h, A, b, options=OSQP_OPTS)
    assert sol6[0] == "solved"


def test_osqp_qp():
    # the OSQP documentation example (also reference test_osqp.py:test_qp)
    q = matrix([1.0, 1.0])
    P = sparse(matrix([[4.0, 1.0], [1.0, 2.0]]))
    G = sparse(matrix([[1.0, 1, 0, -1, -1, 0], [1.0, 0, 1, -1, 0, -1]]))
    h = matrix([1.0, 0.7, 0.7, -1, 0, 0])
    sol = solvers.qp(P, q, G, h, solver="osqp",
                     options={"osqp": OSQP_OPTS})
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]).reshape(-1),
                               [0.3, 0.7], atol=1e-2)
    np.testing.assert_allclose(sol["primal objective"], 1.88, atol=1e-4)


def test_osqp_qp_with_equalities():
    q = matrix([1.0, 1.0])
    P = 2 * sparse(matrix([[2.0, 0.5], [0.5, 1.0]]))
    G = sparse(matrix([[-1.0, 0.0], [0.0, -1.0]]))
    h = matrix([0.0, 0.0])
    A = sparse([1.0, 1.0]).T
    b = matrix(1.0)
    sol = solvers.qp(P, q, G, h, A, b, solver="osqp", options=OSQP_OPTS)
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]).reshape(-1),
                               [0.25, 0.75], atol=1e-2)
    np.testing.assert_allclose(np.asarray(sol["y"]).reshape(-1),
                               [-2.75], atol=1e-2)
    np.testing.assert_allclose(sol["primal objective"], 1.875, atol=1e-3)


def test_osqp_native_format():
    P = spdiag([11.0, 0.0])
    q = matrix([3.0, 4.0])
    A = sparse([[-1.0, 0], [0, -1.0], [-1.0, -3], [2.0, 5], [3.0, 4]]).T
    u = matrix([0.0, 0.0, -15.0, 100.0, 80.0])
    l = -1e6 * matrix(1.0, u.size)
    res, x1, y1 = osqp.solve(q, A, l, u, P, options=OSQP_OPTS)
    assert res == "solved"
    np.testing.assert_allclose(np.asarray(x1).reshape(-1), [0.0, 5.0],
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(y1).reshape(-1),
                               [1.66666667, 0.0, 1.33333333, 0.0, 0.0],
                               atol=1e-2)


@pytest.fixture
def sdp_data():
    c = matrix([1.0, -1.0, 1.0])
    G = [matrix([[-7.0, -11.0, -11.0, 3.0],
                 [7.0, -18.0, -18.0, 8.0],
                 [-2.0, -8.0, -8.0, 1.0]])]
    G += [matrix([[-21.0, -11.0, 0.0, -11.0, 10.0, 8.0, 0.0, 8.0, 5.0],
                  [0.0, 10.0, 16.0, 10.0, -10.0, -10.0, 16.0, -10.0,
                   3.0],
                  [-5.0, 2.0, -17.0, 2.0, -6.0, 8.0, -17.0, 8.0, 6.0]])]
    h = [matrix([[33.0, -9.0], [-9.0, 26.0]])]
    h += [matrix([[14.0, 9.0, 40.0], [9.0, 91.0, 10.0],
                  [40.0, 10.0, 15.0]])]
    return c, G, h


def test_dsdp_sdp(sdp_data):
    c, Gs, hs = sdp_data
    sol_ref = solvers.sdp(c, None, None, Gs, hs)
    assert sol_ref["status"] == "optimal"
    sol1 = solvers.sdp(c, None, None, Gs, hs, solver="dsdp")
    assert sol1["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol1["x"]).reshape(-1),
                               np.asarray(sol_ref["x"]).reshape(-1), atol=1e-4)
    sol3 = dsdp.sdp(c, None, None, Gs, hs)
    assert sol3[0] == "DSDP_PDFEASIBLE"
    sol4 = dsdp.sdp(c, Gs=Gs, hs=hs, options={"DSDP_MaxIts": 2})
    assert sol4[0] == "DSDP_UNKNOWN"


def test_mosek_gurobi_absent():
    with pytest.raises(ImportError):
        from kvxopt_tpu import msk  # noqa: F401
    with pytest.raises(ImportError):
        from kvxopt_tpu import gurobi  # noqa: F401


def test_glpk_options_honored():
    """GLPK-style options must have real effects (reference
    glpk.c:200-330): it_lim actually limits iterations, tm_lim limits
    time, badly typed values warn and fall back to defaults."""
    import warnings
    import numpy as np
    from kvxopt_tpu import glpk

    rng = np.random.default_rng(0)
    n, m = 40, 120
    G = np.vstack([rng.standard_normal((m - 2 * n, n)), np.eye(n),
                   -np.eye(n)])
    h = np.concatenate([rng.uniform(1, 2, m - 2 * n), np.full(2 * n, 5.0)])
    c = rng.standard_normal(n)

    status, x, z, y = glpk.lp(c, G, h)
    assert status == "optimal"

    # it_lim = 0 simplex iterations cannot reach optimality
    status_lim, *_ = glpk.lp(c, G, h, options={"it_lim": 0,
                                               "presolve": "GLP_OFF"})
    assert status_lim != "optimal"

    # tolerance keys are accepted with float values (no warning)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        status_tol, *_ = glpk.lp(c, G, h, options={
            "tol_bnd": 1e-9, "tol_dj": 1e-9, "msg_lev": "GLP_MSG_OFF",
            "meth": "GLP_DUAL", "pricing": "GLP_PT_PSE",
            "r_test": "GLP_RT_HAR"})
    assert status_tol == "optimal"

    # badly typed option warns and falls back (reference PyErr_WarnEx)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        status_bad, *_ = glpk.lp(c, G, h, options={"it_lim": "nope"})
    assert status_bad == "optimal"
    assert any("replacing" in str(w.message) for w in rec)


def test_sdp_dsdp_full_result_dict():
    """solvers.sdp(solver='dsdp') returns the reference's complete key
    set with values matching the native path (reference
    coneprog.py:3924-4113)."""
    import numpy as np
    from kvxopt_tpu.solvers import sdp

    # userguide SDP: minimize x1 + x2 s.t. diag block constraint
    c = np.array([1.0, -1.0, 1.0])
    Gs = [np.array([[-7., -11., -11., 3.],
                    [7., -18., -18., 8.],
                    [-2., -8., -8., 1.]]).T,
          np.array([[-21., -11., 0., -11., 10., 8., 0., 8., 5.],
                    [0., 10., 16., 10., -10., -10., 16., -10., 3.],
                    [-5., 2., -17., 2., -6., 8., -17., 8., 6.]]).T]
    hs = [np.array([[33., -9.], [-9., 26.]]),
          np.array([[14., 9., 40.], [9., 91., 10.], [40., 10., 15.]])]
    ref = sdp(c, Gs=Gs, hs=hs)
    assert ref["status"] == "optimal"
    sol = sdp(c, Gs=Gs, hs=hs, solver="dsdp")
    assert sol["status"] == "optimal"
    for key in ("x", "sl", "ss", "y", "zl", "zs", "primal objective",
                "dual objective", "gap", "relative gap",
                "primal infeasibility", "dual infeasibility",
                "residual as primal infeasibility certificate",
                "residual as dual infeasibility certificate",
                "primal slack", "dual slack"):
        assert key in sol, key
    # dsdp now runs a genuinely different algorithm (dual scaling), so
    # compare by objective/feasibility: near a degenerate optimum x can
    # differ along near-flat directions at equal objective value
    np.testing.assert_allclose(np.asarray(sol["x"]),
                               np.asarray(ref["x"]), atol=5e-4)
    assert abs(sol["primal objective"] - ref["primal objective"]) < 1e-5
    assert sol["gap"] < 1e-5
    assert sol["primal infeasibility"] < 1e-6
    assert sol["dual infeasibility"] < 1e-6
    # slacks: distances to the PSD boundary
    assert sol["primal slack"] >= -1e-8
    assert sol["dual slack"] >= -1e-8
    # DSDP option effect: a 2-iteration cap cannot converge (reference
    # tests/test_dsdp.py:38-48 DSDP_MaxIts -> 'DSDP_UNKNOWN')
    sol2 = sdp(c, Gs=Gs, hs=hs, solver="dsdp",
               options={"dsdp": {"DSDP_MaxIts": 2}})
    assert sol2["status"] == "unknown"


def test_dsdp_dual_scaling_with_linear_rows():
    """Dual-scaling with both LP rows and an LMI agrees with conelp."""
    rng = np.random.default_rng(3)
    n, ml, m = 3, 4, 3
    c = matrix(rng.standard_normal((n, 1)))
    Gl = matrix(rng.standard_normal((ml, n)))
    hl = matrix(np.abs(rng.standard_normal((ml, 1))) + 1.0)
    Gk = rng.standard_normal((m * m, n))
    for i in range(n):  # symmetric coefficient matrices
        M = Gk[:, i].reshape(m, m)
        Gk[:, i] = (0.5 * (M + M.T)).ravel()
    Q = rng.standard_normal((m, m))
    H = Q @ Q.T + m * np.eye(m)
    Gs = [matrix(Gk)]
    hs = [matrix(H)]
    ref = solvers.sdp(c, Gl, hl, Gs, hs)
    assert ref["status"] == "optimal"
    st, x, r, zl, zs = dsdp.sdp(c, Gl, hl, Gs, hs)
    assert st == "DSDP_PDFEASIBLE"
    np.testing.assert_allclose(np.asarray(x).ravel(),
                               np.asarray(ref["x"]).ravel(), atol=2e-3)
    assert abs(float(np.asarray(r).ravel()[0])) < 1e-6
    # multiplier sanity: the returned duals satisfy the stationarity
    # row of the DSDP dual (Gl'zl + Gs'vec(zs) + zb + c = 0) up to the
    # (tiny) box multipliers
    resid = (np.asarray(Gl).T @ np.asarray(zl).ravel()
             + Gk.T @ np.asarray(zs[0]).ravel()
             + np.asarray(c).ravel())
    assert np.linalg.norm(resid) < 1e-3


def test_dsdp_dual_scaling_infeasible():
    """An infeasible LMI keeps the penalty r active -> DSDP_INFEASIBLE
    (the reference's penalized-formulation semantics, dsdp.c:44-57)."""
    # 0*x1 <= -I is infeasible (no x can help); the penalty r -> 1
    c = matrix([0.0])
    Gs = [matrix(np.zeros((4, 1)))]
    hs = [matrix(-np.eye(2))]
    st, x, r, zl, zs = dsdp.sdp(c, Gs=Gs, hs=hs)
    assert st == "DSDP_INFEASIBLE"
    assert float(np.asarray(r).ravel()[0]) > 0.5  # r covers the -I deficit


def test_dsdp_dual_scaling_unbounded():
    """An unbounded objective drives x to the beta box ->
    DSDP_UNBOUNDED."""
    c = matrix([-1.0])
    Gs = [matrix(np.zeros((4, 1)))]   # no constraint on x
    hs = [matrix(np.eye(2))]
    st, x, r, zl, zs = dsdp.sdp(c, Gs=Gs, hs=hs, beta=100.0)
    assert st == "DSDP_UNBOUNDED"


def test_dsdp_dual_scaling_random_sweep():
    """Random feasible SDPs: dual-scaling objective matches conelp to
    the gap tolerance."""
    rng = np.random.default_rng(7)
    for trial in range(5):
        n, m = 2 + trial % 3, 2 + trial % 2
        Gk = rng.standard_normal((m * m, n))
        for i in range(n):
            M = Gk[:, i].reshape(m, m)
            Gk[:, i] = (0.5 * (M + M.T)).ravel()
        Q = rng.standard_normal((m, m))
        H = Q @ Q.T + m * np.eye(m)
        c = rng.standard_normal(n)
        ref = solvers.sdp(matrix(c.reshape(-1, 1)), None, None,
                          [matrix(Gk)], [matrix(H)])
        if ref["status"] != "optimal":
            continue
        st, x, r, zl, zs = dsdp.sdp(matrix(c.reshape(-1, 1)),
                                    Gs=[matrix(Gk)], hs=[matrix(H)])
        assert st == "DSDP_PDFEASIBLE", (trial, st)
        obj = float(c @ np.asarray(x).ravel())
        assert abs(obj - ref["primal objective"]) < \
            1e-4 * (1 + abs(ref["primal objective"])), trial


def test_dsdp_conelp_route_still_available():
    c = matrix([1.0, -1.0, 1.0])
    Gs = [matrix(np.zeros((4, 3)))]
    Gs[0][0, 0] = -1.0; Gs[0][3, 1] = -1.0
    hs = [matrix(np.eye(2))]
    st, x, r, zl, zs = dsdp.sdp(c, Gs=Gs, hs=hs,
                                options={"DSDP_UseConelp": 1})
    assert st in ("DSDP_PDFEASIBLE", "DSDP_UNBOUNDED", "DSDP_UNKNOWN")
