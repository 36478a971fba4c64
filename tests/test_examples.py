"""Examples as integration tests (the reference's docs-as-tests pattern,
tests/test_examples.py: executes the chap8 example scripts and asserts
status/solution values)."""

import os
import sys

import numpy as np
import pytest

EXDIR = os.path.join(os.path.dirname(__file__), "..", "examples")
sys.path.insert(0, EXDIR)


def test_lp_example():
    import lp as ex
    sol = ex.main()
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]), [1.0, 1.0],
                               atol=1e-6)
    np.testing.assert_allclose(sol["primal objective"], -9.0, atol=1e-6)


def test_l1_example():
    import l1 as ex
    sol = ex.main()
    assert sol["status"] == "optimal"


def test_portfolio_example():
    import portfolio as ex
    out = ex.main(n=6, nmu=4)
    assert (out["batch_status"] == 1).all()
    # returns should be decreasing in risk aversion (mu increasing)
    assert out["returns"][0] >= out["returns"][-1] - 1e-6


def test_mcsdp_example():
    import mcsdp as ex
    sol = ex.main(n=12)
    assert sol["status"] == "optimal"


def test_qcl1_example():
    import qcl1 as ex
    sol = ex.main()
    assert sol["status"] == "optimal"


def test_acent_example():
    import acent as ex
    sol = ex.main()
    assert sol["status"] == "optimal"


def test_chebyshev_example():
    import chebyshev as ex
    sol = ex.main()
    assert sol["status"] == "optimal"


def test_robls_example():
    import robls as ex
    sol = ex.main()
    assert sol["status"] == "optimal"


def test_conelp_example():
    """chap8/conelp.py: mixed l/q/s cone LP (reference
    tests/test_examples.py::test_ch8_conelp)."""
    import conelp as ex
    sol = ex.main()
    assert sol["status"] == "optimal"
    # userguide section 8.1 documented optimum
    np.testing.assert_allclose(np.asarray(sol["x"]),
                               [-1.2209, 0.0966, 3.5775], atol=1e-3)
    assert sol["primal infeasibility"] < 1e-6
    assert sol["dual infeasibility"] < 1e-6


def test_coneqp_example():
    """chap8/coneqp.py with the reference's expected solution
    (tests/test_examples.py::test_ch8_coneqp)."""
    import coneqp as ex
    sol = ex.main()
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(
        np.asarray(sol["x"]),
        [0.72558319, 0.61806264, 0.30253528], atol=1e-5)


def test_socp_example():
    """chap8/socp.py with the userguide's documented solution."""
    import socp as ex
    sol = ex.main()
    assert sol["status"] == "optimal"
    # userguide section 8.5 documented optimum
    np.testing.assert_allclose(np.asarray(sol["x"]),
                               [-5.0148, -5.7667, -8.5217], atol=1e-3)
    assert len(sol["zq"]) == 2


def test_sdp_example():
    """chap8/sdp.py with the userguide's documented solution."""
    import sdp as ex
    sol = ex.main()
    assert sol["status"] == "optimal"
    # userguide section 8.6 documented optimum
    np.testing.assert_allclose(np.asarray(sol["x"]),
                               [-0.3677, 1.8983, -0.8874], atol=1e-3)
    assert len(sol["zs"]) == 2
    for Z in sol["zs"]:
        w = np.linalg.eigvalsh(np.asarray(Z))
        assert w.min() > -1e-7


def test_l1regls_example():
    """chap8/l1regls.py: structure-exploiting custom kktsolver; verify
    optimality via the subgradient condition of the l1-regularized LS
    objective."""
    import l1regls as ex
    x, sol, A, y = ex.main()
    assert sol["status"] == "optimal"
    g = 2.0 * A.T @ (A @ x - y)  # gradient of the LS term
    on = np.abs(x) > 1e-6
    # |gradient| <= 1 everywhere, = -sign(x) on the support
    assert (np.abs(g) <= 1.0 + 1e-5).all()
    np.testing.assert_allclose(g[on], -np.sign(x[on]), atol=1e-4)


def test_roblp_example():
    """chap10/roblp.py: the PWL form A*x + sum(abs(x)) <= b agrees with
    the explicit-auxiliary form (reference doc section 10.5)."""
    import roblp as ex
    x, x2, p1, p2 = ex.main(m=120, n=30)
    assert p1.status == "optimal" and p2.status == "optimal"
    np.testing.assert_allclose(np.asarray(x.value), np.asarray(x2.value),
                               atol=1e-6)


def test_l1svc_example():
    """chap10/l1svc.py: hinge-loss PWL objective agrees with the slack
    formulation."""
    import l1svc as ex
    x, x2, p1, p2 = ex.main(m=120, n=30)
    assert p1.status == "optimal" and p2.status == "optimal"
    np.testing.assert_allclose(np.asarray(x.value), np.asarray(x2.value),
                               atol=1e-6)


def test_gp_example():
    """chap9/gp.py floor-planning GP with the documented optimal box."""
    import gp as ex
    sol = ex.main()
    assert sol["status"] == "optimal"
    h, w, d = np.exp(np.asarray(sol["x"]).reshape(-1))
    # documented optimum of the userguide problem
    np.testing.assert_allclose([h, w, d], [2.8873, 5.7746, 11.5431],
                               rtol=1e-3)


def test_lp_modeling_example():
    """chap10/lp.py: scalar and matrix DSL forms with multipliers."""
    import lp_modeling as ex
    lp1, lp2, (x, y, c1, c2, c3, c4), (x2, ineq) = ex.main()
    assert lp1.status == "optimal" and lp2.status == "optimal"
    np.testing.assert_allclose(float(lp1.objective.value()[0]), -9.0,
                               atol=1e-6)
    np.testing.assert_allclose([float(x.value[0]), float(y.value[0])],
                               [1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(x2.value).reshape(-1),
                               [1.0, 1.0], atol=1e-6)
    # multipliers of the first two constraints are (1, 2)
    np.testing.assert_allclose(
        [float(c1.multiplier.value[0]), float(c2.multiplier.value[0])],
        [1.0, 2.0], atol=1e-5)


def test_normappr_example():
    """chap10/normappr.py: inf-norm, 1-norm, and dead-zone penalty
    approximation through the DSL, checked against direct objective
    minimization oracles (scipy linprog on the epigraph forms)."""
    import normappr as ex
    (x1, p1), (x2, p2), (x3, p3), A, b = ex.main(m=80, n=20)
    assert p1.status == p2.status == p3.status == "optimal"
    Am = np.asarray(A)
    bv = np.asarray(b).reshape(-1)

    # optimality via objective comparison against scipy linprog epigraphs
    from scipy.optimize import linprog
    m, n = Am.shape
    # inf-norm: min t s.t. -t <= Ax+b <= t
    c = np.zeros(n + 1); c[-1] = 1.0
    G = np.block([[Am, -np.ones((m, 1))], [-Am, -np.ones((m, 1))]])
    h = np.concatenate([-bv, bv])
    r = linprog(c, A_ub=G, b_ub=h, bounds=(None, None), method="highs")
    obj1 = float(np.max(np.abs(Am @ np.asarray(x1.value).reshape(-1)
                               + bv)))
    assert abs(obj1 - r.fun) < 1e-6
    # 1-norm
    c = np.concatenate([np.zeros(n), np.ones(m)])
    G = np.block([[Am, -np.eye(m)], [-Am, -np.eye(m)]])
    h = np.concatenate([-bv, bv])
    r = linprog(c, A_ub=G, b_ub=h, bounds=(None, None), method="highs")
    obj2 = float(np.sum(np.abs(Am @ np.asarray(x2.value).reshape(-1)
                               + bv)))
    assert abs(obj2 - r.fun) < 1e-5
    # dead-zone objective value at the DSL solution equals the DSL's
    # reported objective
    r3 = Am @ np.asarray(x3.value).reshape(-1) + bv
    direct = float(np.sum(np.maximum.reduce(
        [np.zeros_like(r3), np.abs(r3) - 0.75, 2 * np.abs(r3) - 2.25])))
    dsl = float(np.asarray(p3.objective.value()).reshape(-1)[0])
    assert abs(direct - dsl) < 1e-6


def test_floorplan_example():
    """chap9/floorplan.py: 5-block floor planning (cpl with hyperbolic
    area constraints).  All minimum areas are active at the optimum."""
    import floorplan as ex
    sol, W, H, x, y, w, hh = ex.main()
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(w * hh, np.full(5, 100.0), rtol=1e-5)
    # documented objective for Amin = 100*ones: W + H ~ 47.94
    assert abs((W + H) - 47.94) < 0.2


def test_acent2_example():
    """chap9/acent2.py: analytic centering with q- and s-cone
    constraints; the userguide documents the optimum
    x* = (0.411, 0.559, -0.720) (doc/source/solvers.rst).  Solved by the
    round-3 cpl redesign: scaled-state iteration with the reference's
    incremental update_scaling (misc.py:422) plus lower-triangle s-block
    data semantics (sym_from_lower)."""
    import acent2 as ex
    sol = ex.main()
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]),
                               [0.4110, 0.5588, -0.7201], atol=1e-3)
