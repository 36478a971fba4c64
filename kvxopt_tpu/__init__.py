"""kvxopt_tpu — a TPU-native convex optimization framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of kvxopt
(a CVXOPT fork): dense/sparse matrix algebra, cone programming
(conelp/coneqp/lp/qp/socp/sdp), nonlinear convex solvers (cp/cpl/gp),
Nesterov-Todd scaling, Mehrotra predictor-corrector, pluggable KKT
strategies, sparse factorizations with fast refactorization, and a
piecewise-linear modeling DSL with MPS I/O.
"""

from . import config  # noqa: F401  (enables x64 side effect)
from .cones import ConeDims  # noqa: F401

__version__ = "0.1.0"
