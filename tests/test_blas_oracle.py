"""Systematic BLAS/LAPACK oracle sweep against the actual reference.

Every routine in kvxopt_tpu.blas (34) and kvxopt_tpu.lapack gets at
least one value-checked case (VERDICT r2 item 10), prioritizing the
banded / complex / offset-ld-inc corners where a reimplementation of
the reference's C calling conventions (blas.c:3840-3873,
lapack.c:7341-7400) can silently diverge.

Oracle: the reference's own compiled blas/lapack extensions (built from
/root/reference by tools/build_reference.py), called with identical
buffers and keyword arguments; the mutated buffers must agree
elementwise.  Routines whose outputs are representation-dependent
(eigenvectors, Householder factors, Schur forms) are checked through
invariants instead of raw buffers."""

import numpy as np
import pytest

import sys

from kvxopt_tpu import blas as oblas, lapack as olapack
from kvxopt_tpu.base import matrix as omatrix


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, ".")
    from tools.build_reference import build
    prefix = build()
    if prefix is None:
        pytest.skip("reference oracle unavailable")
    if prefix not in sys.path:
        sys.path.insert(0, prefix)
    from kvxopt import blas as rblas, lapack as rlapack
    from kvxopt import matrix as rmatrix
    return rblas, rlapack, rmatrix


def _mk(arr, ctor):
    a = np.asarray(arr)
    if a.ndim == 1:
        a = a.reshape(-1, 1)
    if a.dtype.kind == "i":
        return ctor(a.astype(np.int32) * 0) if False else ctor(
            np.ascontiguousarray(a, dtype=np.intc))
    return ctor(np.asfortranarray(a))


class Buf(int):
    """Marker: positional argument taken from the buffer list."""


def _ref_call(fn, args, kwargs):
    """Call a reference routine; retry with bytes-encoded single-char
    string kwargs — the reference extensions mix the 'c' (bytes) and
    'C' (str) argument converters between and even within routines, so
    try each subset of encodings."""
    import itertools
    ckeys = [k for k, v in kwargs.items()
             if isinstance(v, str) and len(v) == 1]
    first_err = None
    for mask in itertools.product((False, True), repeat=len(ckeys)):
        kw = dict(kwargs)
        for k, enc in zip(ckeys, mask):
            if enc:
                kw[k] = kw[k].encode()
        try:
            return fn(*args, **kw)
        except TypeError as e:
            if first_err is None:
                first_err = e
    raise first_err


def _call_pair(omod, rmod, fname, ours, refs, spec, kwargs):
    oargs = [ours[int(a)] if isinstance(a, Buf) else a for a in spec]
    rargs = [refs[int(a)] if isinstance(a, Buf) else a for a in spec]
    r1 = getattr(omod, fname)(*oargs, **kwargs)
    r2 = _ref_call(getattr(rmod, fname), rargs, kwargs)
    return r1, r2


def _run_both(ref, module, fname, buffers, kwargs, spec=None):
    rblas, rlapack, rmatrix = ref
    omod = {"blas": oblas, "lapack": olapack}[module]
    rmod = {"blas": rblas, "lapack": rlapack}[module]
    ours = [_mk(b, omatrix) for b in buffers]
    refs = [_mk(b, rmatrix) for b in buffers]
    if spec is None:
        spec = [Buf(i) for i in range(len(buffers))]
    r1, r2 = _call_pair(omod, rmod, fname, ours, refs, spec, kwargs)
    for k, (o, r) in enumerate(zip(ours, refs)):
        oa = np.asarray(o)
        ra = np.array(r).reshape(oa.shape, order="F")
        # exact per-typecode semantics (reference blas.c:882 arg
        # handling): our buffer dtype must match the reference's —
        # real routines must not route through complex intermediates
        assert oa.dtype == ra.dtype, (
            f"{fname} buffer {k}: dtype {oa.dtype} != ref {ra.dtype}")
        np.testing.assert_allclose(
            oa, ra, atol=1e-10 * max(1.0, np.abs(ra).max()),
            err_msg=f"{fname} buffer {k}")
    if r1 is not None or r2 is not None:
        np.testing.assert_allclose(complex(r1), complex(r2), atol=1e-10)
    return ours


def _rngv(rng, n, tc):
    v = rng.standard_normal(n)
    if tc == "z":
        v = v + 1j * rng.standard_normal(n)
    return v


def _rngm(rng, m, n, tc):
    A = rng.standard_normal((m, n))
    if tc == "z":
        A = A + 1j * rng.standard_normal((m, n))
    return A


# --------------------------------------------------------------------------
# BLAS cases: (fname, builder(rng, tc) -> (buffers, kwargs))
# --------------------------------------------------------------------------

def _c_swap(rng, tc):
    return [_rngv(rng, 12, tc), _rngv(rng, 12, tc)], dict(
        n=4, incx=2, incy=3, offsetx=1, offsety=0)


def _c_scal(rng, tc):
    return ([_rngv(rng, 10, tc)], dict(n=3, inc=3, offset=1),
            [2.5, Buf(0)])


def _c_copy(rng, tc):
    return [_rngv(rng, 10, tc), _rngv(rng, 10, tc)], dict(
        n=4, incx=2, incy=1, offsetx=1, offsety=3)


def _c_axpy(rng, tc):
    return [_rngv(rng, 10, tc), _rngv(rng, 10, tc)], dict(
        alpha=-1.5, n=4, incx=1, incy=2, offsetx=2, offsety=1)


def _c_dot(rng, tc):
    return [_rngv(rng, 9, tc), _rngv(rng, 9, tc)], dict(
        n=3, incx=2, incy=2, offsetx=1, offsety=2)


def _c_dotu(rng, tc):
    return _c_dot(rng, tc)


def _c_nrm2(rng, tc):
    return [_rngv(rng, 9, tc)], dict(n=4, inc=2, offset=1)


def _c_asum(rng, tc):
    return [_rngv(rng, 9, tc)], dict(n=4, inc=2, offset=1)


def _c_iamax(rng, tc):
    return [_rngv(rng, 9, tc)], dict(n=4, inc=2, offset=0)


def _c_gemv(rng, tc):
    A = _rngm(rng, 6, 5, tc)
    x = _rngv(rng, 8, tc)
    y = _rngv(rng, 8, tc)
    return [A, x, y], dict(trans="T" if tc == "d" else "C", alpha=1.2,
                           beta=-0.5, m=4, n=3, ldA=6, offsetA=1,
                           incx=2, offsetx=1, incy=1, offsety=2)


def _c_gbmv(rng, tc):
    # band matrix with kl=1, ku=2, stored in (kl+ku+1) x n
    n, m, kl, ku = 5, 5, 1, 2
    A = _rngm(rng, kl + ku + 1, n, tc)
    x = _rngv(rng, n, tc)
    y = _rngv(rng, m, tc)
    return ([A, x, y], dict(ku=ku, trans="N", alpha=1.0, beta=0.3,
                            n=n), [Buf(0), m, kl, Buf(1), Buf(2)])


def _c_symv(rng, tc):
    A = _rngm(rng, 5, 5, "d")     # symv is 'd' only in the reference
    x = _rngv(rng, 5, "d")
    y = _rngv(rng, 5, "d")
    return [A, x, y], dict(uplo="U", alpha=0.7, beta=1.1)


def _c_hemv(rng, tc):
    A = _rngm(rng, 5, 5, tc)
    x = _rngv(rng, 5, tc)
    y = _rngv(rng, 5, tc)
    return [A, x, y], dict(uplo="L", alpha=0.7, beta=-0.2)


def _c_sbmv(rng, tc):
    n, k = 6, 2
    A = _rngm(rng, k + 1, n, "d")
    x = _rngv(rng, n, "d")
    y = _rngv(rng, n, "d")
    return [A, x, y], dict(uplo="L", n=n, k=k, alpha=1.3, beta=0.4)


def _c_hbmv(rng, tc):
    n, k = 5, 1
    A = _rngm(rng, k + 1, n, tc)
    if tc == "z":
        # Hermitian band, uplo='L': the diagonal is the first storage row
        A[0, :] = A[0, :].real
    x = _rngv(rng, n, tc)
    y = _rngv(rng, n, tc)
    return [A, x, y], dict(uplo="L", n=n, k=k, alpha=1.0, beta=0.0)


def _c_trmv(rng, tc):
    A = _rngm(rng, 5, 5, tc) + 5 * np.eye(5)
    x = _rngv(rng, 5, tc)
    return [A, x], dict(uplo="L", trans="N", diag="N")


def _c_tbmv(rng, tc):
    n, k = 6, 2
    A = _rngm(rng, k + 1, n, tc)
    x = _rngv(rng, n, tc)
    return [A, x], dict(uplo="L", trans="T", diag="N", n=n, k=k)


def _c_trsv(rng, tc):
    A = _rngm(rng, 5, 5, tc) + 5 * np.eye(5)
    x = _rngv(rng, 5, tc)
    return [A, x], dict(uplo="U", trans="N", diag="N")


def _c_tbsv(rng, tc):
    n, k = 6, 2
    A = _rngm(rng, k + 1, n, tc)
    A[0 if False else -1, :] += 4.0   # strengthen the diagonal row (L)
    x = _rngv(rng, n, tc)
    return [A, x], dict(uplo="L", trans="N", diag="N", n=n, k=k)


def _c_ger(rng, tc):
    x = _rngv(rng, 4, tc); y = _rngv(rng, 3, tc)
    A = _rngm(rng, 4, 3, tc)
    return [x, y, A], dict(alpha=0.9)


def _c_geru(rng, tc):
    return _c_ger(rng, tc)


def _c_syr(rng, tc):
    x = _rngv(rng, 5, "d")
    A = _rngm(rng, 5, 5, "d")
    return [x, A], dict(uplo="L", alpha=1.4)


def _c_her(rng, tc):
    x = _rngv(rng, 5, tc)
    A = _rngm(rng, 5, 5, tc)
    if tc == "z":
        A[np.arange(5), np.arange(5)] = A.diagonal().real
    return [x, A], dict(uplo="L", alpha=0.8)


def _c_syr2(rng, tc):
    x = _rngv(rng, 5, "d"); y = _rngv(rng, 5, "d")
    A = _rngm(rng, 5, 5, "d")
    return [x, y, A], dict(uplo="U", alpha=1.1)


def _c_her2(rng, tc):
    x = _rngv(rng, 5, tc); y = _rngv(rng, 5, tc)
    A = _rngm(rng, 5, 5, tc)
    if tc == "z":
        A[np.arange(5), np.arange(5)] = A.diagonal().real
    return [x, y, A], dict(uplo="L", alpha=0.6)


def _c_gemm(rng, tc):
    A = _rngm(rng, 6, 5, tc); B = _rngm(rng, 6, 4, tc)
    C = _rngm(rng, 5, 4, tc)
    return [A, B, C], dict(transA="T" if tc == "d" else "C", transB="N",
                           alpha=1.5, beta=-0.7)


def _c_symm(rng, tc):
    A = _rngm(rng, 4, 4, tc); B = _rngm(rng, 4, 3, tc)
    C = _rngm(rng, 4, 3, tc)
    return [A, B, C], dict(side="L", uplo="L", alpha=0.8, beta=0.2)


def _c_hemm(rng, tc):
    A = _rngm(rng, 4, 4, tc)
    if tc == "z":
        A[np.arange(4), np.arange(4)] = A.diagonal().real
    B = _rngm(rng, 4, 3, tc); C = _rngm(rng, 4, 3, tc)
    return [A, B, C], dict(side="L", uplo="U", alpha=1.0, beta=0.5)


def _c_syrk(rng, tc):
    A = _rngm(rng, 5, 3, tc); C = _rngm(rng, 5, 5, tc)
    return [A, C], dict(uplo="L", trans="N", alpha=1.0, beta=0.3)


def _c_herk(rng, tc):
    A = _rngm(rng, 5, 3, tc); C = _rngm(rng, 5, 5, tc)
    if tc == "z":
        C[np.arange(5), np.arange(5)] = C.diagonal().real
    return [A, C], dict(uplo="L", trans="N", alpha=1.0, beta=0.3)


def _c_syr2k(rng, tc):
    A = _rngm(rng, 4, 3, tc); B = _rngm(rng, 4, 3, tc)
    C = _rngm(rng, 4, 4, tc)
    return [A, B, C], dict(uplo="U", trans="N", alpha=0.9, beta=0.1)


def _c_her2k(rng, tc):
    A = _rngm(rng, 4, 3, tc); B = _rngm(rng, 4, 3, tc)
    C = _rngm(rng, 4, 4, tc)
    if tc == "z":
        C[np.arange(4), np.arange(4)] = C.diagonal().real
    return [A, B, C], dict(uplo="L", trans="N", alpha=1.0, beta=0.4)


def _c_trmm(rng, tc):
    A = _rngm(rng, 4, 4, tc) + 4 * np.eye(4)
    B = _rngm(rng, 4, 3, tc)
    return [A, B], dict(side="L", uplo="L", transA="N", diag="N",
                        alpha=1.2)


def _c_trsm(rng, tc):
    A = _rngm(rng, 4, 4, tc) + 4 * np.eye(4)
    B = _rngm(rng, 4, 3, tc)
    return [A, B], dict(side="L", uplo="L", transA="T", diag="N",
                        alpha=1.0)


BLAS_CASES = [
    (nm[3:], fn) for nm, fn in sorted(globals().items())
    if nm.startswith("_c_")]


@pytest.mark.parametrize("fname,builder", BLAS_CASES,
                         ids=[c[0] for c in BLAS_CASES])
@pytest.mark.parametrize("tc", ["d", "z"])
def test_blas_vs_reference(ref, fname, builder, tc):
    if fname in ("symv", "sbmv", "syr", "syr2") and tc == "z":
        pytest.skip("'d'-only routine")   # like the reference
    rng = np.random.default_rng(hash((fname, tc)) % 2 ** 31)
    out = builder(rng, tc)
    buffers, kwargs = out[0], out[1]
    spec = out[2] if len(out) > 2 else None
    _run_both(ref, "blas", fname, buffers, kwargs, spec=spec)


# --------------------------------------------------------------------------
# LAPACK: exact-comparable routines (deterministic LAPACK algorithms)
# --------------------------------------------------------------------------


def _ipiv(n):
    return np.zeros(n, dtype=np.intc)


def _spd(rng, n, tc):
    A = _rngm(rng, n, n, tc)
    return A @ A.conj().T + n * np.eye(n)


def _lap_case(fname, rng, tc):
    n = 5
    if fname == "gesv":
        return [_rngm(rng, n, n, tc) + n * np.eye(n),
                _rngm(rng, n, 2, tc), _ipiv(n)], {}
    if fname == "getrf":
        return [_rngm(rng, n, n, tc), _ipiv(n)], {}
    if fname == "potrf":
        return [_spd(rng, n, tc)], dict(uplo="L")
    if fname == "potri":
        A = _spd(rng, n, tc)
        olapack.potrf(omatrix(np.asfortranarray(A)))
        # run potrf in both then potri — handled by composite below
        return None, None
    raise KeyError(fname)


def _both_seq(ref, module, steps, buffers):
    """Run a sequence of (fname, argspec, kwargs) on both systems and
    compare every buffer at the end.  argspec entries are Buf(i) buffer
    references or plain ints treated as Buf for brevity."""
    rblas, rlapack, rmatrix = ref
    omod = {"blas": oblas, "lapack": olapack}[module]
    rmod = {"blas": rblas, "lapack": rlapack}[module]
    ours = [_mk(b, omatrix) for b in buffers]
    refs = [_mk(b, rmatrix) for b in buffers]
    for fname, idxs, kwargs in steps:
        if any(isinstance(a, Buf) for a in idxs):
            spec = list(idxs)          # explicit: ints are literals
        else:
            spec = [Buf(a) for a in idxs]
        _call_pair(omod, rmod, fname, ours, refs, spec, kwargs)
    outs = []
    for k, (o, r) in enumerate(zip(ours, refs)):
        oa = np.asarray(o)
        ra = np.array(r).reshape(oa.shape, order="F")
        outs.append((oa, ra))
    return outs


def _assert_outs(outs, which=None, label=""):
    for k, (oa, ra) in enumerate(outs):
        if which is not None and k not in which:
            continue
        np.testing.assert_allclose(
            oa, ra, atol=1e-9 * max(1.0, np.abs(ra).max()),
            err_msg=f"{label} buffer {k}")


@pytest.mark.parametrize("tc", ["d", "z"])
def test_lapack_lu_family(ref, tc):
    rng = np.random.default_rng(1)
    n = 5
    A = _rngm(rng, n, n, tc) + n * np.eye(n)
    B = _rngm(rng, n, 2, tc)
    # getrf + getrs(T) + getri, and gesv
    outs = _both_seq(ref, "lapack", [
        ("getrf", [0, 1], {}),
        ("getrs", [0, 1, 2], dict(trans="T")),
        ("getri", [0, 1], {}),
    ], [A.copy(), _ipiv(n), B.copy()])
    _assert_outs(outs, label="lu")
    outs = _both_seq(ref, "lapack", [
        ("gesv", [0, 1], {}),
    ], [A.copy(), B.copy()])
    _assert_outs(outs, label="gesv")


@pytest.mark.parametrize("tc", ["d", "z"])
def test_lapack_banded_lu(ref, tc):
    rng = np.random.default_rng(2)
    n, kl, ku = 6, 1, 2
    # general band in the gbtrf storage: 2*kl+ku+1 rows
    Ab = _rngm(rng, 2 * kl + ku + 1, n, tc)
    Ab[kl + ku, :] += 5.0          # diagonal row
    B = _rngm(rng, n, 2, tc)
    outs = _both_seq(ref, "lapack", [
        ("gbtrf", [Buf(0), n, kl, Buf(1)], {}),
        ("gbtrs", [Buf(0), kl, Buf(1), Buf(2)], {}),
    ], [Ab.copy(), _ipiv(n), B.copy()])
    _assert_outs(outs, label="gb")
    Ab2 = _rngm(rng, kl + ku + 1, n, tc)
    Ab2[kl + ku, :] += 5.0
    outs = _both_seq(ref, "lapack", [
        ("gbsv", [Buf(0), kl, Buf(2)], {}),
    ], [Ab2.copy(), _ipiv(n), B.copy()])
    _assert_outs(outs, which={2}, label="gbsv")


@pytest.mark.parametrize("tc", ["d", "z"])
def test_lapack_tridiag(ref, tc):
    rng = np.random.default_rng(3)
    n = 6
    dl = _rngv(rng, n - 1, tc); du = _rngv(rng, n - 1, tc)
    d = _rngv(rng, n, tc) + 5.0
    du2 = np.zeros(n - 2, dtype=complex if tc == "z" else float)
    B = _rngm(rng, n, 2, tc)
    outs = _both_seq(ref, "lapack", [
        ("gttrf", [0, 1, 2, 3, 4], {}),
        ("gttrs", [0, 1, 2, 3, 4, 5], dict(trans="N")),
    ], [dl.copy(), d.copy(), du.copy(), du2, _ipiv(n), B.copy()])
    _assert_outs(outs, label="gt")
    outs = _both_seq(ref, "lapack", [
        ("gtsv", [0, 1, 2, 3], {}),
    ], [dl.copy(), d.copy(), du.copy(), B.copy()])
    _assert_outs(outs, which={3}, label="gtsv")
    # SPD tridiagonal: pttrf/pttrs/ptsv (d real, e tc)
    dp = np.abs(rng.standard_normal(n)) + 5.0
    e = _rngv(rng, n - 1, tc) * 0.1
    outs = _both_seq(ref, "lapack", [
        ("pttrf", [0, 1], {}),
        ("pttrs", [0, 1, 2], {}),
    ], [dp.copy(), e.copy(), B.copy()])
    _assert_outs(outs, label="pt")
    outs = _both_seq(ref, "lapack", [
        ("ptsv", [0, 1, 2], {}),
    ], [dp.copy(), e.copy(), B.copy()])
    _assert_outs(outs, which={2}, label="ptsv")


@pytest.mark.parametrize("tc", ["d", "z"])
@pytest.mark.parametrize("uplo", ["L", "U"])
def test_lapack_cholesky_family(ref, tc, uplo):
    rng = np.random.default_rng(4)
    n = 5
    A = _spd(rng, n, tc)
    B = _rngm(rng, n, 2, tc)
    steps = [("potrf", [0], dict(uplo=uplo)),
             ("potrs", [0, 1], dict(uplo=uplo))]
    if uplo == "L":
        steps.append(("potri", [0], {}))   # compiled oracle rejects
    outs = _both_seq(ref, "lapack", steps, [A.copy(), B.copy()])
    _assert_outs(outs, label="po")
    if uplo == "U":
        Ao = _mk(A, omatrix)
        olapack.potrf(Ao, uplo="U")
        olapack.potri(Ao, uplo="U")
        got = np.triu(np.asarray(Ao))
        want = np.triu(np.linalg.inv(A))
        np.testing.assert_allclose(got, want, atol=1e-9)
    outs = _both_seq(ref, "lapack", [
        ("posv", [0, 1], dict(uplo=uplo)),
    ], [A.copy(), B.copy()])
    _assert_outs(outs, label="posv")


@pytest.mark.parametrize("tc", ["d", "z"])
def test_lapack_banded_cholesky(ref, tc):
    rng = np.random.default_rng(5)
    n, kd = 6, 2
    Ab = _rngm(rng, kd + 1, n, tc) * 0.2
    Ab[0, :] = np.abs(Ab[0, :].real) + 4.0     # 'L': diagonal first row
    B = _rngm(rng, n, 2, tc)
    outs = _both_seq(ref, "lapack", [
        ("pbtrf", [0], dict(uplo="L")),
        ("pbtrs", [0, 1], dict(uplo="L")),
    ], [Ab.copy(), B.copy()])
    _assert_outs(outs, label="pb")
    outs = _both_seq(ref, "lapack", [
        ("pbsv", [0, 1], dict(uplo="L")),
    ], [Ab.copy(), B.copy()])
    _assert_outs(outs, which={1}, label="pbsv")


@pytest.mark.parametrize("tc", ["d", "z"])
def test_lapack_symmetric_indefinite(ref, tc):
    rng = np.random.default_rng(6)
    n = 5
    A = _rngm(rng, n, n, tc)
    A = A + A.T                      # complex-symmetric for 'z' sytrf
    B = _rngm(rng, n, 2, tc)
    # solutions must agree even if internal pivots differ: solve + check B
    outs = _both_seq(ref, "lapack", [
        ("sytrf", [0, 1], dict(uplo="L")),
        ("sytrs", [0, 1, 2], dict(uplo="L")),
    ], [A.copy(), _ipiv(n), B.copy()])
    _assert_outs(outs, which={2}, label="sytrs")
    outs = _both_seq(ref, "lapack", [
        ("sysv", [Buf(0), Buf(2)], dict(uplo="L")),
    ], [A.copy(), _ipiv(n), B.copy()])
    _assert_outs(outs, which={0, 2}, label="sysv")   # A unchanged too
    # sytri: inverse agrees
    Ao = A.copy(); outs = _both_seq(ref, "lapack", [
        ("sytrf", [0, 1], dict(uplo="L")),
        ("sytri", [0, 1], dict(uplo="L")),
    ], [Ao, _ipiv(n)])
    oa, ra = outs[0]
    np.testing.assert_allclose(np.tril(oa), np.tril(ra), atol=1e-9)
    if tc == "z":
        H = _rngm(rng, n, n, tc)
        H = H + H.conj().T
        outs = _both_seq(ref, "lapack", [
            ("hetrf", [0, 1], dict(uplo="L")),
            ("hetrs", [0, 1, 2], dict(uplo="L")),
        ], [H.copy(), _ipiv(n), B.copy()])
        _assert_outs(outs, which={2}, label="hetrs")
        outs = _both_seq(ref, "lapack", [
            ("hesv", [Buf(0), Buf(2)], dict(uplo="L"))],
            [H.copy(), _ipiv(n), B.copy()])
        _assert_outs(outs, which={0, 2}, label="hesv")
        Ho = H.copy()
        outs = _both_seq(ref, "lapack", [
            ("hetrf", [0, 1], dict(uplo="L")),
            ("hetri", [0, 1], dict(uplo="L")),
        ], [Ho, _ipiv(n)])
        oa, ra = outs[0]
        np.testing.assert_allclose(np.tril(oa), np.tril(ra), atol=1e-9)


@pytest.mark.parametrize("tc", ["d", "z"])
def test_lapack_triangular(ref, tc):
    rng = np.random.default_rng(7)
    n = 5
    A = _rngm(rng, n, n, tc) + 4 * np.eye(n)
    B = _rngm(rng, n, 2, tc)
    outs = _both_seq(ref, "lapack", [
        ("trtrs", [0, 1], dict(uplo="L", trans="T")),
        ("trtri", [0], dict(uplo="L")),
    ], [A.copy(), B.copy()])
    _assert_outs(outs, label="tr")
    # banded triangular solve
    kd = 2
    Ab = _rngm(rng, kd + 1, n, tc)
    Ab[0, :] += 4.0
    outs = _both_seq(ref, "lapack", [
        ("tbtrs", [0, 1], dict(uplo="L", trans="N", kd=kd)),
    ], [Ab.copy(), B.copy()])
    _assert_outs(outs, which={1}, label="tbtrs")
    outs = _both_seq(ref, "lapack", [
        ("lacpy", [0, 1], dict(uplo="L")),
    ], [A.copy(), np.zeros_like(A)])
    _assert_outs(outs, label="lacpy")


@pytest.mark.parametrize("tc", ["d", "z"])
def test_lapack_leastsquares_qr(ref, tc):
    rng = np.random.default_rng(8)
    m, n = 7, 4
    A = _rngm(rng, m, n, tc)
    B = _rngm(rng, m, 2, tc)
    outs = _both_seq(ref, "lapack", [("gels", [0, 1], {})],
                     [A.copy(), B.copy()])
    oa, ra = outs[1]
    np.testing.assert_allclose(oa[:n], ra[:n], atol=1e-9)
    # QR family: internal representations must be self-consistent —
    # apply ormqr/orgqr within each system and compare the results
    # QR family: Householder representations are deterministic LAPACK,
    # so cross-system comparison is exact
    mul = "unmqr" if tc == "z" else "ormqr"
    org = "ungqr" if tc == "z" else "orgqr"
    A2 = _rngm(rng, m, n, tc)
    C = _rngm(rng, m, 2, tc)
    tau = np.zeros(min(m, n), dtype=complex if tc == "z" else float)
    outs = _both_seq(ref, "lapack", [
        ("geqrf", [0, 1], {}),
        (mul, [0, 1, 2], dict(side="L", trans="N")),
    ], [A2.copy(), tau.copy(), C.copy()])
    _assert_outs(outs, which={2}, label=mul)
    outs = _both_seq(ref, "lapack", [
        ("geqrf", [0, 1], {}),
        (org, [0, 1], {}),
    ], [A2.copy(), tau.copy()])
    oa, ra = outs[0]
    np.testing.assert_allclose(oa, ra, atol=1e-9)
    # LQ family: our gelqf is not Householder-based, so Q has a
    # different sign convention — verify each system by its own
    # invariants (L Q = A, Q Q^H = I, ormlq applies that same Q)
    mull = "unmlq" if tc == "z" else "ormlq"
    orgl = "unglq" if tc == "z" else "orglq"
    A3 = _rngm(rng, n, m, tc)      # wide: L (n,n), Q (n,m)
    k = n
    tau3 = np.zeros(k, dtype=complex if tc == "z" else float)
    Ao, tauo = _mk(A3, omatrix), _mk(tau3, omatrix)
    olapack.gelqf(Ao, tauo)
    L = np.tril(np.asarray(Ao))[:, :k]
    Qo, tq = _mk(np.asarray(Ao), omatrix), _mk(np.asarray(tauo), omatrix)
    Qo._lq = Ao._lq                 # factor identity travels with A
    getattr(olapack, orgl)(Qo, tq)
    Q = np.asarray(Qo)[:k, :]
    np.testing.assert_allclose(Q @ Q.conj().T, np.eye(k), atol=1e-9)
    np.testing.assert_allclose(L @ Q, A3, atol=1e-9)
    # ormlq applies the full implicit Q (order = C.rows = m)
    Cl = _rngm(rng, m, 2, tc)
    Co = _mk(Cl, omatrix)
    getattr(olapack, mull)(Ao, tauo, Co, side="L", trans="N")
    got = np.asarray(Co)[:k, :]
    np.testing.assert_allclose(got, Q @ Cl, atol=1e-9)
    # reference side: same invariants with its own outputs
    rblas, rlapack, rmatrix = ref
    Ar, taur = _mk(A3, rmatrix), _mk(tau3, rmatrix)
    rlapack.gelqf(Ar, taur)
    Lr = np.tril(np.array(Ar).reshape(n, m, order="F"))[:, :k]
    Qr = rmatrix(np.array(Ar).reshape(n, m, order="F"))
    getattr(rlapack, orgl)(Qr, taur)
    Qrm = np.array(Qr).reshape(n, m, order="F")[:k, :]
    np.testing.assert_allclose(Qrm @ Qrm.conj().T, np.eye(k),
                               atol=1e-9)
    np.testing.assert_allclose(Lr @ Qrm, A3, atol=1e-9)
    # pivoted QR: compare pivots and |R|
    A3 = _rngm(rng, m, n, tc)
    jp = np.zeros(n, dtype=np.intc)
    tau = np.zeros(min(m, n), dtype=complex if tc == "z" else float)
    outs = _both_seq(ref, "lapack", [("geqp3", [0, 1, 2], {})],
                     [A3.copy(), jp, tau.copy()])
    _assert_outs(outs, which={1}, label="geqp3 pivots")
    oa, ra = outs[0]
    np.testing.assert_allclose(np.abs(np.triu(oa[:n])),
                               np.abs(np.triu(ra[:n])), atol=1e-9)


@pytest.mark.parametrize("tc", ["d", "z"])
def test_lapack_eig_svd(ref, tc):
    rng = np.random.default_rng(9)
    n = 5
    A = _rngm(rng, n, n, tc)
    A = A + A.conj().T
    for name in (("heev",) if tc == "z" else ("syev",)):
        W = np.zeros(n)
        outs = _both_seq(ref, "lapack", [(name, [0, 1],
                                          dict(jobz="N", uplo="L"))],
                         [A.copy(), W.copy()])
        _assert_outs(outs, which={1}, label=name)
    for name in ("syevd", "syevx", "syevr"):
        if tc == "z":
            continue    # 'd' drivers; heev covers complex above
        W = np.zeros(n)
        kwargs = dict(jobz="N", uplo="L")
        outs = _both_seq(ref, "lapack", [(name, [0, 1], kwargs)],
                         [A.copy(), W.copy()])
        _assert_outs(outs, which={1}, label=name)
    # generalized: sygv / hegv eigenvalues
    Bspd = _spd(rng, n, tc)
    W = np.zeros(n)
    name = "hegv" if tc == "z" else "sygv"
    outs = _both_seq(ref, "lapack", [(name, [0, 1, 2],
                                      dict(itype=1, jobz="N", uplo="L"))],
                     [A.copy(), Bspd.copy(), W.copy()])
    _assert_outs(outs, which={2}, label=name)
    # SVD: singular values
    M = _rngm(rng, 6, 4, tc)
    S = np.zeros(4)
    outs = _both_seq(ref, "lapack", [("gesvd", [0, 1],
                                      dict(jobu="N", jobvt="N"))],
                     [M.copy(), S.copy()])
    _assert_outs(outs, which={1}, label="gesvd")
    if hasattr(olapack, "gesdd"):
        S2 = np.zeros(4)
        ours = _mk(M, omatrix); sv = _mk(S2, omatrix)
        olapack.gesdd(ours, sv)
        np.testing.assert_allclose(
            np.asarray(sv).ravel(),
            np.linalg.svd(M, compute_uv=False), atol=1e-9)


@pytest.mark.parametrize("tc", ["d", "z"])
def test_lapack_schur(ref, tc):
    rng = np.random.default_rng(10)
    n = 4
    A = _rngm(rng, n, n, tc)
    w = np.zeros(n, dtype=complex)
    # eigenvalues from the Schur form agree (as sets)
    ours = _mk(A, omatrix); wo = _mk(w, omatrix)
    olapack.gees(ours, wo)
    ow = np.sort_complex(np.asarray(wo).ravel())
    ew = np.sort_complex(np.linalg.eigvals(A))
    np.testing.assert_allclose(ow, ew, atol=1e-8)
    # generalized Schur eigenvalues vs scipy
    B = _rngm(rng, n, n, tc) + n * np.eye(n)
    a = np.zeros(n, dtype=complex)
    bb = np.zeros(n, dtype=complex)
    oA, oB, oa, ob = (_mk(A, omatrix), _mk(B, omatrix),
                      _mk(a, omatrix), _mk(bb, omatrix))
    olapack.gges(oA, oB, oa, ob)
    lam = np.sort_complex(np.asarray(oa).ravel() /
                          np.asarray(ob).ravel())
    import scipy.linalg as sla
    ref_lam = np.sort_complex(sla.eigvals(A, B))
    np.testing.assert_allclose(lam, ref_lam, atol=1e-8)


@pytest.mark.parametrize("tc", ["d", "z"])
def test_lapack_householder(ref, tc):
    rng = np.random.default_rng(11)
    n = 6
    alpha = _rngv(rng, 1, tc)
    x = _rngv(rng, n - 1, tc)
    outs = _both_seq(ref, "lapack", [("larfg", [0, 1], {})],
                     [alpha.copy(), x.copy()])
    _assert_outs(outs, label="larfg")
    # larfx: apply H = I - tau v v' to C, via both systems
    v = _rngv(rng, n, tc)
    v[0] = 1.0
    tauv = 1.3 + (0.2j if tc == "z" else 0.0)
    C = _rngm(rng, n, 3, tc)
    outs = _both_seq(ref, "lapack", [("larfx", [Buf(0), tauv, Buf(1)],
                                      dict(side="L"))],
                     [v, C.copy()])
    _assert_outs(outs, which={1}, label="larfx")
