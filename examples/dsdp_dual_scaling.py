"""Dual-scaling SDP solve through the DSDP-style interface.

The same userguide SDP as examples/sdp.py, solved by the native
dual-scaling method (kvxopt_tpu.dsdp — the reference wraps DSDP5 here,
src/C/dsdp.c) and cross-checked against the conelp core.  The penalty
variable r returns ~0 for feasible problems; an infeasible LMI keeps
r > 0 and reports DSDP_INFEASIBLE instead of failing.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from kvxopt_tpu import matrix, dsdp, solvers

c = matrix([1.0, -1.0, 1.0])
G = [matrix([[-7.0, -11.0, -11.0, 3.0],
             [7.0, -18.0, -18.0, 8.0],
             [-2.0, -8.0, -8.0, 1.0]])]
G += [matrix([[-21.0, -11.0, 0.0, -11.0, 10.0, 8.0, 0.0, 8.0, 5.0],
              [0.0, 10.0, 16.0, 10.0, -10.0, -10.0, 16.0, -10.0, 3.0],
              [-5.0, 2.0, -17.0, 2.0, -6.0, 8.0, -17.0, 8.0, 6.0]])]
h = [matrix([[33.0, -9.0], [-9.0, 26.0]])]
h += [matrix([[14.0, 9.0, 40.0], [9.0, 91.0, 10.0],
              [40.0, 10.0, 15.0]])]

status, x, r, zl, zs = dsdp.sdp(c, None, None, G, h)
print("dual scaling:", status)
print("x =", np.asarray(x).ravel(), " r =", float(np.asarray(r)))

ref = solvers.sdp(c, None, None, G, h)
print("conelp      :", ref["status"])
print("x =", np.asarray(ref["x"]).ravel())
print("objective gap:",
      abs(float(np.asarray(c).ravel() @ np.asarray(x).ravel())
          - ref["primal objective"]))
