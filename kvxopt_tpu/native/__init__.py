"""ctypes loader for the native host library (built from host.cpp).

Compiles lazily with g++ on first import if the shared object is missing
or stale (the reference ships C extensions built by setup.py; this build
keeps the native layer self-bootstrapping)."""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "host.cpp")
_SO = os.path.join(_DIR, "libkvxhost.so")


def _ensure_built():
    if (not os.path.exists(_SO) or
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _SO,
             _SRC], check=True)


_ensure_built()
lib = ctypes.CDLL(_SO)

c_i64 = ctypes.c_longlong
c_i64_p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
c_f64_p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
c_c128_p = np.ctypeslib.ndpointer(np.complex128, flags="C_CONTIGUOUS")
c_void = ctypes.c_void_p

lib.mindeg_order.argtypes = [c_i64, c_i64_p, c_i64_p, c_i64_p]
lib.amd_order.argtypes = [c_i64, c_i64_p, c_i64_p, c_i64_p]

lib.ldl_factor.restype = c_void
lib.ldl_factor.argtypes = [c_i64, c_i64_p, c_i64_p, c_f64_p,
                           ctypes.POINTER(c_i64)]
lib.ldl_refactor.restype = c_i64
lib.ldl_refactor.argtypes = [c_void, c_i64, c_i64_p, c_i64_p, c_f64_p]
lib.ldl_free.argtypes = [c_void]
lib.ldl_lnnz.restype = c_i64
lib.ldl_lnnz.argtypes = [c_void]
lib.ldl_get.argtypes = [c_void, c_i64_p, c_i64_p, c_f64_p, c_f64_p]
lib.ldl_solve.argtypes = [c_void, c_f64_p, c_i64, c_i64]
lib.ldl_diag.argtypes = [c_void, c_f64_p]

lib.ldl_factor_z.restype = c_void
lib.ldl_factor_z.argtypes = [c_i64, c_i64_p, c_i64_p, c_c128_p,
                             ctypes.POINTER(c_i64)]
lib.ldl_refactor_z.restype = c_i64
lib.ldl_refactor_z.argtypes = [c_void, c_i64, c_i64_p, c_i64_p, c_c128_p]
lib.ldl_free_z.argtypes = [c_void]
lib.ldl_lnnz_z.restype = c_i64
lib.ldl_lnnz_z.argtypes = [c_void]
lib.ldl_get_z.argtypes = [c_void, c_i64_p, c_i64_p, c_c128_p, c_f64_p]
lib.ldl_solve_z.argtypes = [c_void, c_c128_p, c_i64, c_i64]
lib.ldl_diag_z.argtypes = [c_void, c_f64_p]

for sfx, vp in (("d", c_f64_p), ("z", c_c128_p)):
    f = getattr(lib, f"lu_factor_{sfx}")
    f.restype = c_void
    f.argtypes = [c_i64, c_i64_p, c_i64_p, vp, c_i64_p,
                  ctypes.POINTER(c_i64), ctypes.c_double]
    f = getattr(lib, f"lu_refactor_{sfx}")
    f.restype = c_i64
    f.argtypes = [c_void, c_i64, c_i64_p, c_i64_p, vp]
    getattr(lib, f"lu_solve_{sfx}").argtypes = [c_void, vp, c_i64, c_i64]
    getattr(lib, f"lu_det_{sfx}").argtypes = [c_void, vp]
    getattr(lib, f"lu_logdet_{sfx}").argtypes = [
        c_void, ctypes.POINTER(ctypes.c_double), vp]
    getattr(lib, f"lu_sizes_{sfx}").argtypes = [
        c_void, ctypes.POINTER(c_i64), ctypes.POINTER(c_i64)]
    getattr(lib, f"lu_get_{sfx}").argtypes = [
        c_void, c_i64_p, c_i64_p, vp, c_i64_p, c_i64_p, vp, c_i64_p,
        c_i64_p]
    f = getattr(lib, f"lu_singular_{sfx}")
    f.restype = c_i64
    f.argtypes = [c_void]
    getattr(lib, f"lu_free_{sfx}").argtypes = [c_void]
