"""Asserts the PARITY.md symbol inventory: every public symbol of the
reference's modules (SURVEY.md section 2 tables) exists here.

THIS FILE IS EXISTENCE-ONLY — it proves nothing about behavior.  The
behavioral tests that back each module's symbols:

    kvxopt_tpu (facade)      -> tests/test_base.py
    kvxopt_tpu.blas/lapack   -> tests/test_blas_lapack.py (value checks
                                against scipy/numpy oracles)
    kvxopt_tpu.misc_solvers,
    kvxopt_tpu.misc (cones)  -> tests/test_cones.py (NT identity
                                property tests), tests/test_kkt.py
    kvxopt_tpu.solvers       -> tests/test_conelp.py, test_coneqp.py,
                                test_cvxprog.py, test_custom_kkt.py,
                                test_examples.py (userguide optima)
    umfpack/klu/cholmod/amd  -> tests/test_sparse_solvers.py (factor
                                identities on real .mtx data),
                                tests/test_tile_chol.py (device path)
    fftw                     -> tests/test_fftw.py
    glpk/osqp/dsdp           -> tests/test_bridges.py
    msk / gurobi             -> tests/test_msk_bridge.py,
                                tests/test_gurobi_bridge.py (fake
                                in-process backends)
    modeling / mps           -> tests/test_modeling.py
    parallel (build-side)    -> tests/test_parallel.py
"""

import importlib

import pytest

CHECKS = {
    "kvxopt_tpu": [
        "matrix", "spmatrix", "sparse", "spdiag", "exp", "log", "sqrt",
        "sin", "cos", "tan", "normal", "uniform", "setseed", "getseed",
        "min", "max", "mul", "div", "norm", "gemv", "gemm", "syrk",
        "symv", "axpy", "fromfile"],
    "kvxopt_tpu.blas": [
        "swap", "scal", "copy", "axpy", "dot", "dotu", "nrm2", "asum",
        "iamax", "gemv", "gbmv", "symv", "hemv", "sbmv", "hbmv", "trmv",
        "tbmv", "trsv", "tbsv", "ger", "geru", "syr", "her", "syr2",
        "her2", "gemm", "symm", "hemm", "syrk", "herk", "syr2k", "her2k",
        "trmm", "trsm"],
    "kvxopt_tpu.lapack": [
        "getrf", "getrs", "getri", "gesv", "gbtrf", "gbtrs", "gbsv",
        "gttrf", "gttrs", "gtsv", "potrf", "potrs", "potri", "posv",
        "pbtrf", "pbtrs", "pbsv", "pttrf", "pttrs", "ptsv", "sytrf",
        "sytrs", "sytri", "sysv", "hetrf", "hetrs", "hetri", "hesv",
        "trtrs", "trtri", "tbtrs", "gels", "geqrf", "ormqr", "unmqr",
        "orgqr", "ungqr", "gelqf", "ormlq", "unmlq", "orglq", "unglq",
        "geqp3", "syev", "heev", "syevx", "syevd", "syevr", "sygv",
        "hegv", "gesvd", "gesdd", "gees", "gges", "lacpy", "larfg",
        "larfx"],
    "kvxopt_tpu.misc_solvers": [
        "scale", "scale2", "pack", "pack2", "unpack", "symm", "sdot",
        "snrm2", "sprod", "sinv", "max_step", "trisc", "triusc"],
    "kvxopt_tpu.misc": [
        "compute_scaling", "update_scaling", "sgemv", "jdot", "jnrm2",
        "ssqr", "kkt_ldl", "kkt_ldl2", "kkt_chol", "kkt_chol2",
        "kkt_qr"],
    "kvxopt_tpu.solvers": [
        "conelp", "coneqp", "lp", "qp", "socp", "sdp", "cp", "cpl",
        "gp", "options"],
    "kvxopt_tpu.umfpack": [
        "linsolve", "symbolic", "numeric", "solve", "get_numeric",
        "get_det"],
    "kvxopt_tpu.klu": [
        "linsolve", "symbolic", "numeric", "solve", "get_numeric",
        "get_det", "options"],
    "kvxopt_tpu.cholmod": [
        "symbolic", "numeric", "solve", "spsolve", "linsolve",
        "splinsolve", "diag", "getfactor", "options"],
    "kvxopt_tpu.amd": ["order", "options"],
    "kvxopt_tpu.fftw": [
        "dft", "idft", "dftn", "idftn", "dct", "dctn", "idct", "idctn",
        "dst", "dstn", "idst", "idstn"],
    "kvxopt_tpu.gsl": ["normal", "uniform", "weibull", "setseed",
                       "getseed"],
    "kvxopt_tpu.glpk": ["lp", "ilp", "options"],
    "kvxopt_tpu.osqp": ["qp", "solve", "options"],
    "kvxopt_tpu.dsdp": ["sdp", "options"],
    "kvxopt_tpu.modeling": ["variable", "constraint", "op", "dot",
                            "sum", "max", "min"],
    "kvxopt_tpu.printing": ["options", "matrix_str_default",
                            "spmatrix_str_default",
                            "spmatrix_str_triplet"],
}


@pytest.mark.parametrize("mod", sorted(CHECKS))
def test_module_symbols(mod):
    m = importlib.import_module(mod)
    missing = [s for s in CHECKS[mod] if not hasattr(m, s)]
    assert not missing, f"{mod} missing {missing}"


def test_type_attributes():
    from kvxopt_tpu import matrix, spmatrix
    A = matrix([1.0, 2.0])
    S = spmatrix([1.0], [0], [0])
    for a in ("size", "typecode", "T", "H", "real", "imag", "trans",
              "ctrans", "tofile"):
        assert hasattr(A, a)
    for a in ("size", "typecode", "V", "I", "J", "CCS", "T", "H",
              "ipset", "ipadd"):
        assert hasattr(S, a)


def test_pack2_matches_reference():
    """pack2 semantics vs the compiled reference misc_solvers.pack2
    (misc_solvers.c:468): same-shape buffer, 's' components repacked in
    place (lower triangle, off-diagonals * sqrt2), tail untouched."""
    import sys
    import numpy as np
    sys.path.insert(0, ".")
    from tools.build_reference import build
    prefix = build()
    if prefix is None:
        import pytest
        pytest.skip("reference oracle unavailable")
    if prefix not in sys.path:
        sys.path.insert(0, prefix)
    from kvxopt import misc_solvers as rms, matrix as rmatrix
    from kvxopt_tpu import misc as oms

    rng = np.random.default_rng(7)
    dims = {"l": 2, "q": [3], "s": [3, 2]}
    mnl = 1
    N = mnl + 2 + 3 + 9 + 4
    X = rng.standard_normal((N, 2))
    xm = rmatrix(X.copy())
    rms.pack2(xm, dims, mnl)
    ours = np.asarray(oms.pack2(X.copy(), dims, mnl=mnl))
    np.testing.assert_allclose(ours, np.asarray(xm).reshape(N, 2),
                               atol=1e-12)


def test_pack_unpack_match_reference():
    """misc.pack / misc.unpack element order and triangle semantics vs
    the compiled reference (misc_solvers.c:404,544): column-major 'L'
    packing, sqrt2 off-diagonal scaling, unpack fills the lower
    triangle only."""
    import sys
    import numpy as np
    sys.path.insert(0, ".")
    from tools.build_reference import build
    prefix = build()
    if prefix is None:
        import pytest
        pytest.skip("reference oracle unavailable")
    if prefix not in sys.path:
        sys.path.insert(0, prefix)
    from kvxopt import misc_solvers as rms, matrix as rmatrix
    from kvxopt_tpu import misc as oms

    rng = np.random.default_rng(11)
    dims = {"l": 2, "q": [3], "s": [3, 2]}
    mnl = 1
    N = mnl + 2 + 3 + 9 + 4
    npk = mnl + 2 + 3 + 6 + 3
    x = rng.standard_normal(N)
    for ofs, m in ((6, 3), (15, 2)):   # symmetrize s blocks
        S = x[ofs:ofs + m * m].reshape(m, m)
        x[ofs:ofs + m * m] = (0.5 * (S + S.T)).ravel()

    xm, ym = rmatrix(x.copy()), rmatrix(np.zeros(npk))
    rms.pack(xm, ym, dims, mnl)
    ours_p = np.asarray(oms.pack(x.copy(), dims, mnl=mnl))
    np.testing.assert_allclose(ours_p, np.asarray(ym).ravel(), atol=1e-12)

    um = rmatrix(np.zeros(N))
    rms.unpack(ym, um, dims, mnl)
    ours_u = np.asarray(oms.unpack(ours_p, dims, mnl=mnl))
    np.testing.assert_allclose(ours_u, np.asarray(um).ravel(), atol=1e-12)
