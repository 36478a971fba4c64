"""Shared sparse-LU machinery for the umfpack and klu API modules.

Wraps the native left-looking LU (kvxopt_tpu/native/host.cpp): symbolic
objects hold the fill-reducing column ordering; numeric objects own the
factor handle and support KLU-style value-only refactorization with
automatic fallback (reference klu.c:296-302)."""

import numpy as np

from . import canon_csc
from ..native import lib
from .. import amd as _amd

_TRANS = {"N": 0, "T": 1, "C": 2}


class SymbolicLU:
    """Column preordering + pattern signature (the reference's
    umfpack/klu `symbolic` capsule)."""

    def __init__(self, A):
        m, n, cp, ri, vx = canon_csc(A)
        if m != n:
            raise TypeError("matrix must be square")
        self.n = n
        self.is_complex = vx.dtype.kind == "c"
        self.q = _amd.order_array(A)
        self.pattern = (cp.tobytes(), ri.tobytes())


class NumericLU:
    """Owns the native LU handle (the reference's `numeric` capsule)."""

    def __init__(self, A, Fs: SymbolicLU, refactor_from=None):
        m, n, cp, ri, vx = canon_csc(A)
        if n != Fs.n:
            raise TypeError("A does not match the symbolic factorization")
        self.is_complex = vx.dtype.kind == "c"
        sfx = "z" if self.is_complex else "d"
        self._sfx = sfx
        self.n = n
        self.pattern = (cp.tobytes(), ri.tobytes())
        self._handle = None
        if refactor_from is not None and \
                refactor_from._sfx == sfx and refactor_from.n == n and \
                refactor_from._handle is not None and \
                refactor_from.pattern == self.pattern:
            # fast path: reuse pattern + pivot order, recompute values
            status = getattr(lib, f"lu_refactor_{sfx}")(
                refactor_from._handle, n, cp, ri, vx)
            if status == 0:
                # steal the handle
                self._handle = refactor_from._handle
                refactor_from._handle = None
                return
            # fallback to full factorization (the KLU contract)
        import ctypes
        st = ctypes.c_longlong(0)
        self._handle = getattr(lib, f"lu_factor_{sfx}")(
            n, cp, ri, vx, Fs.q, ctypes.byref(st), 0.001)
        if st.value != 0 or getattr(lib, f"lu_singular_{sfx}")(
                self._handle):
            self.free()
            raise ArithmeticError("singular matrix")

    def free(self):
        if self._handle is not None:
            getattr(lib, f"lu_free_{self._sfx}")(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.free()
        except Exception:
            pass

    def solve_inplace(self, barr, trans="N"):
        """barr: (n, nrhs) numpy array (any order); solved in place."""
        sfx = self._sfx
        dtype = np.complex128 if sfx == "z" else np.float64
        work = np.ascontiguousarray(barr.T, dtype=dtype)  # (nrhs, n)
        getattr(lib, f"lu_solve_{sfx}")(self._handle, work,
                                        work.shape[0], _TRANS[trans])
        return work.T

    def det(self):
        sfx = self._sfx
        out = np.zeros(1, dtype=np.complex128 if sfx == "z"
                       else np.float64)
        getattr(lib, f"lu_det_{sfx}")(self._handle, out)
        return out[0].item()

    def get_factors(self):
        """Returns (L, U, p, q) scipy CSC factors with P A Q = L U, where
        P selects rows p (row k of PAQ is row p[k] of A) and Q selects
        columns q."""
        import ctypes
        import scipy.sparse as sp
        sfx = self._sfx
        dtype = np.complex128 if sfx == "z" else np.float64
        ln, un = ctypes.c_longlong(0), ctypes.c_longlong(0)
        getattr(lib, f"lu_sizes_{sfx}")(self._handle, ctypes.byref(ln),
                                        ctypes.byref(un))
        n = self.n
        Lp = np.zeros(n + 1, np.int64); Li = np.zeros(ln.value, np.int64)
        Lx = np.zeros(ln.value, dtype)
        Up = np.zeros(n + 1, np.int64); Ui = np.zeros(un.value, np.int64)
        Ux = np.zeros(un.value, dtype)
        p = np.zeros(n, np.int64); q = np.zeros(n, np.int64)
        getattr(lib, f"lu_get_{sfx}")(self._handle, Lp, Li, Lx, Up, Ui,
                                      Ux, p, q)
        L = sp.csc_matrix((Lx, Li, Lp), shape=(n, n))
        U = sp.csc_matrix((Ux, Ui, Up), shape=(n, n))
        return L, U, p, q
