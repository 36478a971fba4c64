"""Gurobi bridge tests against a fake in-process `gurobipy` module.

The commercial gurobipy package is not installable here, so these tests
install a minimal fake (Model/MVar matrix-expression API) whose
optimize() delegates to this package's own coneqp, then drive the full
bridge (kvxopt_tpu/gurobi.py) through it: problem assembly in both the
cvxopt `qp` form (reference gurobi.c:547-560) and the two-sided-bounds
`solve` form (gurobi.c:359-373), the 4-tuple (status, x, z, y) return
contract, and the solvers.lp/qp dispatch mapping (reference
coneprog.py:2834-2845, :4410-4426).
"""

import sys
import types

import numpy as np
import pytest


def _make_fake_gurobipy():
    mod = types.ModuleType("gurobipy")

    class GRB:
        OPTIMAL = 2
        INFEASIBLE = 3
        INF_OR_UNBD = 4
        UNBOUNDED = 5
        INFINITY = 1e100

    class _LinMap:
        """Gm @ x."""
        __array_ufunc__ = None

        def __init__(self, G):
            self.G = np.atleast_2d(np.asarray(G, dtype=float))

        def __le__(self, rhs):
            return ("<=", self.G, np.asarray(rhs, dtype=float).reshape(-1))

        def __eq__(self, rhs):  # noqa: A003
            return ("==", self.G, np.asarray(rhs, dtype=float).reshape(-1))

    class _LinTerm:
        """qv @ x."""
        __array_ufunc__ = None

        def __init__(self, q):
            self.q = np.asarray(q, dtype=float).reshape(-1)

        def __radd__(self, other):
            return other.__add__(self)

    class _QuadForm:
        """alpha * (x @ P @ x)."""
        __array_ufunc__ = None

        def __init__(self, P, alpha=1.0):
            self.P = np.asarray(P, dtype=float)
            self.alpha = alpha

        def __rmul__(self, a):
            return _QuadForm(self.P, self.alpha * float(a))

        def __add__(self, lin):
            assert isinstance(lin, _LinTerm)
            return _Objective(2.0 * self.alpha * self.P, lin.q)

    class _RowExpr:
        """x @ P (intermediate)."""
        __array_ufunc__ = None

        def __init__(self, P):
            self.P = P

        def __matmul__(self, other):
            assert isinstance(other, MVar)
            return _QuadForm(self.P)

    class _Objective:
        def __init__(self, P, q):
            self.P = P  # such that obj = 0.5 x'Px + q'x
            self.q = q

    class MVar:
        __array_ufunc__ = None

        def __init__(self, n, lb, ub):
            self.n = n
            self.lb = lb
            self.ub = ub
            self.X = None

        def __rmatmul__(self, other):
            other = np.asarray(other, dtype=float)
            if other.ndim == 1:
                return _LinTerm(other)
            return _LinMap(other)

        def __matmul__(self, other):
            return _RowExpr(np.asarray(other, dtype=float))

    class _Constr:
        def __init__(self):
            self.Pi = None

    class _Params:
        def __setattr__(self, k, v):
            object.__setattr__(self, k, v)

    class Model:
        def __init__(self, *a, **k):
            self.Params = _Params()
            self._obj = None
            self._constrs = []
            self._x = None
            self.Status = None

        def setParam(self, k, v):
            setattr(self.Params, k, v)

        def addMVar(self, n, lb=0.0, ub=GRB.INFINITY):
            self._x = MVar(n, lb, ub)
            return self._x

        def setObjective(self, obj):
            if isinstance(obj, _LinTerm):
                obj = _Objective(None, obj.q)
            self._obj = obj

        def addConstr(self, spec):
            h = _Constr()
            self._constrs.append((spec, h))
            return h

        def optimize(self):
            from kvxopt_tpu.solvers import coneqp
            n = self._x.n
            q = self._obj.q
            P = (self._obj.P if self._obj.P is not None
                 else np.zeros((n, n)))
            Grows, hvals, rowmaps = [], [], []
            Arows, bvals, eqmaps = [], [], []
            for (op, G, rhs), handle in self._constrs:
                if op == "<=":
                    rowmaps.append((handle, len(hvals), G.shape[0]))
                    Grows.append(G)
                    hvals.append(rhs)
                else:
                    eqmaps.append((handle, len(bvals), G.shape[0]))
                    Arows.append(G)
                    bvals.append(rhs)
            nb = 0
            lb, ub = self._x.lb, self._x.ub
            lb = np.full(n, lb) if np.ndim(lb) == 0 else np.asarray(lb)
            ub = np.full(n, ub) if np.ndim(ub) == 0 else np.asarray(ub)
            for i in range(n):
                if ub[i] < GRB.INFINITY / 2:
                    Grows.append(np.eye(n)[i:i + 1])
                    hvals.append(np.asarray([ub[i]]))
                    nb += 1
                if lb[i] > -GRB.INFINITY / 2:
                    Grows.append(-np.eye(n)[i:i + 1])
                    hvals.append(np.asarray([-lb[i]]))
                    nb += 1
            G = np.vstack(Grows)
            h = np.concatenate(hvals)
            A = np.vstack(Arows) if Arows else None
            b = np.concatenate(bvals) if bvals else None
            # regularize a pure-LP objective so coneqp stays applicable
            sol = coneqp(P + 1e-12 * np.eye(n), q, G, h, A=A, b=b)
            if sol["status"] != "optimal":
                self.Status = GRB.INF_OR_UNBD
                return
            self.Status = GRB.OPTIMAL
            self._x.X = np.asarray(sol["x"])
            z = np.asarray(sol["z"])
            for handle, ofs, mrows in rowmaps:
                handle.Pi = -z[ofs:ofs + mrows]
            if eqmaps:
                y = np.asarray(sol["y"])
                for handle, ofs, mrows in eqmaps:
                    handle.Pi = -y[ofs:ofs + mrows]

    mod.GRB = GRB
    mod.Model = Model
    return mod


@pytest.fixture()
def gurobi_bridge(monkeypatch):
    fake = _make_fake_gurobipy()
    monkeypatch.setitem(sys.modules, "gurobipy", fake)
    sys.modules.pop("kvxopt_tpu.gurobi", None)
    import kvxopt_tpu.gurobi as gmod
    yield gmod
    sys.modules.pop("kvxopt_tpu.gurobi", None)


def _qp_data(seed=0):
    rng = np.random.default_rng(seed)
    n, m = 5, 8
    M = rng.standard_normal((n, n))
    P = M @ M.T + n * np.eye(n)
    q = rng.standard_normal(n)
    G = rng.standard_normal((m, n))
    h = G @ rng.standard_normal(n) + rng.uniform(0.5, 1.5, m)
    return P, q, G, h


def test_gurobi_qp_4tuple(gurobi_bridge):
    from kvxopt_tpu.solvers import qp
    P, q, G, h = _qp_data(0)
    status, x, z, y = gurobi_bridge.qp(q, G, h, P=P)
    assert status == "optimal"
    ref = qp(P, q, G, h)
    np.testing.assert_allclose(np.asarray(x).reshape(-1),
                               np.asarray(ref["x"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(z).reshape(-1),
                               np.asarray(ref["z"]), atol=1e-5)


def test_gurobi_solve_two_sided(gurobi_bridge):
    """The two-sided form (gurobi.c:359-373): G_l <= Gx <= G_u plus
    variable bounds; verify the KKT stationarity with the returned
    multipliers."""
    rng = np.random.default_rng(1)
    n, m = 4, 6
    M = rng.standard_normal((n, n))
    P = M @ M.T + n * np.eye(n)
    q = rng.standard_normal(n)
    G = rng.standard_normal((m, n))
    x_feas = rng.standard_normal(n) * 0.1
    Gu = G @ x_feas + rng.uniform(0.2, 0.6, m)
    Gl = G @ x_feas - rng.uniform(0.2, 0.6, m)
    xl = np.full(n, -2.0)
    xu = np.full(n, 2.0)
    status, x, z, y = gurobi_bridge.solve(q, Gl, G, Gu, P=P,
                                          x_l=xl, x_u=xu)
    assert status == "optimal"
    xv = np.asarray(x).reshape(-1)
    zv = np.asarray(z).reshape(-1)
    assert (G @ xv <= Gu + 1e-6).all() and (G @ xv >= Gl - 1e-6).all()
    assert (xv <= xu + 1e-8).all() and (xv >= xl - 1e-8).all()
    # stationarity: P x + q + G'z (+ bound multipliers, zero at interior
    # bounds) = 0; here the bounds are inactive so G'z closes the KKT
    if (np.abs(xv) < 1.9).all():
        np.testing.assert_allclose(P @ xv + q + G.T @ zv,
                                   np.zeros(n), atol=1e-4)


def test_solvers_qp_gurobi_dispatch(gurobi_bridge):
    from kvxopt_tpu.solvers import qp
    P, q, G, h = _qp_data(2)
    sol = qp(P, q, G, h, solver="gurobi")
    ref = qp(P, q, G, h)
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]).reshape(-1),
                               np.asarray(ref["x"]), atol=1e-5)
    for key in ("primal objective", "dual objective", "gap",
                "primal infeasibility", "dual infeasibility",
                "primal slack", "dual slack"):
        assert key in sol
    assert abs(sol["primal objective"] - ref["primal objective"]) < 1e-4


def test_solvers_lp_gurobi_dispatch(gurobi_bridge):
    from kvxopt_tpu.solvers import lp
    rng = np.random.default_rng(3)
    n, m = 4, 12
    G = np.vstack([rng.standard_normal((m - 2 * n, n)), np.eye(n),
                   -np.eye(n)])
    h = np.concatenate([rng.uniform(1, 2, m - 2 * n), np.full(2 * n, 5.0)])
    c = rng.standard_normal(n)
    sol = lp(c, G, h, solver="gurobi")
    ref = lp(c, G, h)
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]).reshape(-1),
                               np.asarray(ref["x"]), atol=1e-4)
