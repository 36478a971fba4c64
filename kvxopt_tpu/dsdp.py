"""SDP bridge in the DSDP5 interface style (reference src/C/dsdp.c:
sdp(c, Gl, hl, Gs, hs) with DSDP_* options).

The reference wraps the DSDP5 dual-scaling solver; this build routes the
same interface onto the native conelp-based SDP path (an interior-point
solve on TPU), honoring the DSDP option names (dsdp.c / test_dsdp.py):
DSDP_Monitor (print progress), DSDP_MaxIts, DSDP_GapTolerance.

Return format matches the reference: (status, x, r, zl, zs) with status
'DSDP_PDFEASIBLE' on success, 'DSDP_UNKNOWN' on non-convergence; zl the
linear multipliers, zs the PSD multipliers."""

import numpy as np

from .base import matrix

options = {}


def sdp(c, Gl=None, hl=None, Gs=None, hs=None, gamma=1e8, beta=1e7,
        options=None):
    """Solve the DSDP-form SDP min c'x s.t. Gl x <= hl,
    sum_i x_i (Gs_k)_i <= hs_k via the native conelp core, with the
    DSDP option dict (DSDP_Monitor, DSDP_MaxIts, DSDP_GapTolerance)
    and status strings ('DSDP_PDFEASIBLE', ...) mapped to the
    reference dsdp.c:40-60 contract.  Returns (status, x, r, zl, zs)."""
    from .solvers import sdp as _sdp
    merged = dict(globals()["options"])
    if options is not None:
        merged.update(options)
    solver_opts = {}
    if "DSDP_MaxIts" in merged:
        solver_opts["maxiters"] = int(merged["DSDP_MaxIts"])
    if "DSDP_GapTolerance" in merged:
        solver_opts["reltol"] = float(merged["DSDP_GapTolerance"])
    if merged.get("DSDP_Monitor", 0):
        solver_opts["show_progress"] = True
    sol = _sdp(c, Gl=Gl, hl=hl, Gs=Gs, hs=hs, options=solver_opts)
    if sol["status"] == "optimal":
        status = "DSDP_PDFEASIBLE"
    elif sol["status"] == "primal infeasible":
        status = "DSDP_INFEASIBLE"
    elif sol["status"] == "dual infeasible":
        status = "DSDP_UNBOUNDED"
    else:
        status = "DSDP_UNKNOWN"
    x = sol.get("x")
    if x is not None:
        x = matrix(np.asarray(x).reshape(-1, 1))
    zl = sol.get("zl")
    if zl is not None:
        zl = matrix(np.asarray(zl).reshape(-1, 1))
    zs = [matrix(np.asarray(zk)) for zk in sol.get("zs", [])] \
        if sol.get("zs") is not None else None
    r = matrix(0.0)
    return (status, x, r, zl, zs)
