"""Solver namespace (reference src/python/solvers.py): re-exports the cone
and nonlinear solvers and holds the shared mutable `options` dict."""

options = {}

from .coneprog import conelp, coneqp, lp, qp, socp, sdp  # noqa: E402,F401
from .cvxprog import cp, cpl, gp  # noqa: E402,F401

__all__ = ["conelp", "coneqp", "lp", "qp", "socp", "sdp", "cp", "cpl", "gp",
           "options"]
