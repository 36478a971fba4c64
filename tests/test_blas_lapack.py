"""blas/lapack facade: in-place semantics, offsets/strides, oracle checks
vs numpy.  (The reference's test_blas.py covers iamax with inc/offset —
blas.c is otherwise exercised indirectly; here the coverage is broader.)"""

import numpy as np
import pytest

from kvxopt_tpu import matrix, blas, lapack


def randm(m, n, seed=0, complex_=False):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((m, n))
    if complex_:
        a = a + 1j * rng.standard_normal((m, n))
    return matrix(a)


def test_level1():
    x = matrix([1.0, -3.0, 2.0])
    y = matrix([1.0, 1.0, 1.0])
    assert blas.nrm2(x) == pytest.approx(np.sqrt(14))
    assert blas.asum(x) == pytest.approx(6.0)
    assert blas.iamax(x) == 1
    assert blas.dot(x, y) == pytest.approx(0.0)
    blas.axpy(x, y, alpha=2.0)
    np.testing.assert_allclose(np.asarray(y).reshape(-1), [3.0, -5.0, 5.0])
    blas.scal(0.5, y)
    np.testing.assert_allclose(np.asarray(y).reshape(-1), [1.5, -2.5, 2.5])
    z = matrix([0.0, 0.0, 0.0])
    blas.copy(x, z)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x))
    blas.swap(x, z)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x))


def test_iamax_inc_offset():
    # the reference's test_blas.py case: inc and offset addressing
    x = matrix([1.0, 9.0, 2.0, -10.0, 3.0, 4.0])
    assert blas.iamax(x) == 3
    # elements at 0,2,4: 1,2,3 -> max abs at idx 2
    assert blas.iamax(x, n=3, inc=2, offset=0) == 2
    # elements at 1,3,5: 9,-10,4 -> max abs at idx 1
    assert blas.iamax(x, n=3, inc=2, offset=1) == 1
    assert blas.iamax(x, n=2, inc=1, offset=1) == 0  # 9,2 -> 9


def test_dot_complex_conjugation():
    x = matrix([1 + 1j, 2.0 + 0j])
    y = matrix([1 + 0j, 1 + 1j])
    assert blas.dot(x, y) == pytest.approx((1 - 1j) * 1 + 2 * (1 + 1j))
    assert blas.dotu(x, y) == pytest.approx((1 + 1j) + 2 * (1 + 1j))


def test_gemv_gemm():
    A = randm(3, 4, 1)
    x = randm(4, 1, 2)
    y = matrix(0.0, (3, 1))
    blas.gemv(A, x, y, alpha=2.0)
    np.testing.assert_allclose(
        np.asarray(y).reshape(-1),
        2.0 * np.asarray(A) @ np.asarray(x).reshape(-1))
    yt = matrix(0.0, (4, 1))
    blas.gemv(A, matrix(np.asarray(y)), yt, trans="T")
    np.testing.assert_allclose(
        np.asarray(yt).reshape(-1),
        np.asarray(A).T @ np.asarray(y).reshape(-1))
    B = randm(4, 2, 3)
    C = matrix(0.0, (3, 2))
    blas.gemm(A, B, C)
    np.testing.assert_allclose(np.asarray(C),
                               np.asarray(A) @ np.asarray(B))


def test_gemm_offsets():
    # multiply a submatrix via offset/ld addressing
    A = randm(4, 4, 4)
    B = randm(4, 4, 5)
    C = matrix(0.0, (2, 2))
    # top-left 2x2 of A times top-left 2x2 of B
    blas.gemm(A, B, C, m=2, n=2, k=2, ldA=4, ldB=4, ldC=2)
    np.testing.assert_allclose(
        np.asarray(C), np.asarray(A)[:2, :2] @ np.asarray(B)[:2, :2])
    # offset: bottom-right 2x2 blocks (offset = 2*4 + 2)
    blas.gemm(A, B, C, m=2, n=2, k=2, ldA=4, ldB=4, ldC=2, offsetA=10,
              offsetB=10)
    np.testing.assert_allclose(
        np.asarray(C), np.asarray(A)[2:, 2:] @ np.asarray(B)[2:, 2:])


def test_syrk_trsm():
    A = randm(3, 5, 6)
    C = matrix(0.0, (3, 3))
    blas.syrk(A, C)
    ref = np.asarray(A) @ np.asarray(A).T
    np.testing.assert_allclose(np.tril(np.asarray(C)), np.tril(ref))
    # trsm
    L = matrix(np.tril(np.asarray(randm(3, 3, 7))) + 3 * np.eye(3))
    B = randm(3, 2, 8)
    Bc = np.asarray(B).copy()
    blas.trsm(L, B)
    np.testing.assert_allclose(np.asarray(L) @ np.asarray(B), Bc,
                               atol=1e-12)


def test_symv_her():
    A = randm(4, 4, 9)
    An = np.asarray(A)
    x = randm(4, 1, 10)
    y = matrix(0.0, (4, 1))
    blas.symv(A, x, y)
    F = np.tril(An) + np.tril(An, -1).T
    np.testing.assert_allclose(np.asarray(y).reshape(-1),
                               F @ np.asarray(x).reshape(-1))
    # her: rank-1 hermitian update
    Z = matrix(np.zeros((3, 3), dtype=complex))
    v = matrix(np.array([1 + 1j, 2.0, 1j]))
    blas.her(v, Z, alpha=2.0)
    ref = 2.0 * np.outer(np.asarray(v).reshape(-1),
                         np.asarray(v).reshape(-1).conj())
    np.testing.assert_allclose(np.tril(np.asarray(Z)), np.tril(ref))


def test_gesv_getrf_getrs():
    A = randm(5, 5, 11)
    A0 = np.asarray(A).copy()
    B = randm(5, 2, 12)
    B0 = np.asarray(B).copy()
    ipiv = matrix(0, (5, 1), tc="i")
    lapack.gesv(A, B, ipiv)
    np.testing.assert_allclose(A0 @ np.asarray(B), B0, atol=1e-10)
    # factor/solve split
    A2 = matrix(A0)
    ipiv2 = matrix(0, (5, 1), tc="i")
    lapack.getrf(A2, ipiv2)
    B2 = matrix(B0)
    lapack.getrs(A2, ipiv2, B2)
    np.testing.assert_allclose(np.asarray(B2), np.asarray(B), atol=1e-10)
    # inverse
    lapack.getri(A2, ipiv2)
    np.testing.assert_allclose(np.asarray(A2) @ A0, np.eye(5), atol=1e-10)


def test_potrf_posv():
    A = randm(5, 5, 13)
    S = matrix(np.asarray(A) @ np.asarray(A).T + 5 * np.eye(5))
    S0 = np.asarray(S).copy()
    B = randm(5, 1, 14)
    B0 = np.asarray(B).copy()
    lapack.posv(S, B)
    np.testing.assert_allclose(S0 @ np.asarray(B), B0, atol=1e-10)
    # non-PD raises
    bad = matrix(np.array([[1.0, 0.0], [0.0, -1.0]]))
    with pytest.raises(ArithmeticError):
        lapack.potrf(bad)


def test_sytrf_sysv():
    rng = np.random.default_rng(15)
    A = rng.standard_normal((6, 6))
    S = matrix(A + A.T)
    S0 = np.asarray(S).copy()
    B = matrix(rng.standard_normal((6, 1)))
    B0 = np.asarray(B).copy()
    ipiv = matrix(0, (6, 1), tc="i")
    lapack.sysv(S, B, ipiv)   # reference argument order (lapack.c:2947)
    np.testing.assert_allclose(S0 @ np.asarray(B), B0, atol=1e-9)


def test_syev_family():
    rng = np.random.default_rng(16)
    A = rng.standard_normal((5, 5))
    S = A + A.T
    for driver in (lapack.syev, lapack.syevd):
        M = matrix(S.copy())
        W = matrix(0.0, (5, 1))
        driver(M, W, jobz="V")
        w_ref = np.linalg.eigvalsh(S)
        np.testing.assert_allclose(np.asarray(W).reshape(-1), w_ref,
                                   atol=1e-10)
        V = np.asarray(M)
        np.testing.assert_allclose(S @ V, V * w_ref[None, :], atol=1e-9)
    # syevx with index range
    M = matrix(S.copy())
    W = matrix(0.0, (5, 1))
    Z = matrix(0.0, (5, 2))
    m = lapack.syevx(M, W, jobz="V", range="I", il=1, iu=2, Z=Z)
    assert m == 2
    np.testing.assert_allclose(np.asarray(W).reshape(-1)[:2],
                               np.linalg.eigvalsh(S)[:2], atol=1e-10)


def test_sygv():
    rng = np.random.default_rng(17)
    A = rng.standard_normal((4, 4)); S = A + A.T
    B = rng.standard_normal((4, 4)); P = B @ B.T + 4 * np.eye(4)
    Ma, Mb = matrix(S.copy()), matrix(P.copy())
    W = matrix(0.0, (4, 1))
    lapack.sygv(Ma, Mb, W, jobz="V")
    import scipy.linalg as sla
    w_ref = sla.eigh(S, P, eigvals_only=True)
    np.testing.assert_allclose(np.asarray(W).reshape(-1), w_ref,
                               atol=1e-9)


def test_gesvd():
    A = randm(4, 3, 18)
    A0 = np.asarray(A).copy()
    S = matrix(0.0, (3, 1))
    U = matrix(0.0, (4, 4))
    Vt = matrix(0.0, (3, 3))
    lapack.gesvd(A, S, jobu="A", jobvt="A", U=U, Vt=Vt)
    s_ref = np.linalg.svd(A0, compute_uv=False)
    np.testing.assert_allclose(np.asarray(S).reshape(-1), s_ref,
                               atol=1e-10)
    rec = np.asarray(U)[:, :3] * np.asarray(S).reshape(-1)[None, :] @ \
        np.asarray(Vt)
    np.testing.assert_allclose(rec, A0, atol=1e-9)


def test_geqrf_orgqr_ormqr():
    A = randm(5, 3, 19)
    A0 = np.asarray(A).copy()
    tau = matrix(0.0, (3, 1))
    lapack.geqrf(A, tau)
    R = np.triu(np.asarray(A))[:3, :]
    Q = matrix(np.asarray(A).copy())
    lapack.orgqr(Q, tau)
    Qm = np.asarray(Q)[:, :3]
    np.testing.assert_allclose(Qm @ R, A0, atol=1e-10)
    # ormqr applies Q to a matrix
    C = matrix(np.eye(5))
    lapack.ormqr(matrix(np.asarray(A)), tau, C)
    np.testing.assert_allclose(np.asarray(C)[:, :3], Qm, atol=1e-10)


def test_gels():
    A = randm(6, 3, 20)
    b = randm(6, 1, 21)
    B = matrix(np.asarray(b).copy())
    lapack.gels(matrix(np.asarray(A)), B)
    x_ref = np.linalg.lstsq(np.asarray(A),
                            np.asarray(b).reshape(-1), rcond=None)[0]
    np.testing.assert_allclose(np.asarray(B).reshape(-1)[:3], x_ref,
                               atol=1e-10)


def test_trtrs_trtri():
    L = matrix(np.tril(np.asarray(randm(4, 4, 22))) + 4 * np.eye(4))
    L0 = np.asarray(L).copy()
    B = randm(4, 1, 23)
    B0 = np.asarray(B).copy()
    lapack.trtrs(L, B)
    np.testing.assert_allclose(L0 @ np.asarray(B), B0, atol=1e-10)
    lapack.trtri(L)
    np.testing.assert_allclose(np.asarray(L) @ L0, np.eye(4), atol=1e-10)


def test_gtsv_tridiag():
    n = 6
    rng = np.random.default_rng(24)
    dl = rng.standard_normal(n - 1)
    d = rng.standard_normal(n) + 5.0
    du = rng.standard_normal(n - 1)
    T = np.diag(d) + np.diag(dl, -1) + np.diag(du, 1)
    b = rng.standard_normal(n)
    B = matrix(b.copy())
    lapack.gtsv(matrix(dl.copy()), matrix(d.copy()), matrix(du.copy()), B)
    np.testing.assert_allclose(T @ np.asarray(B).reshape(-1), b,
                               atol=1e-10)


def test_gees_schur():
    A = randm(4, 4, 25)
    A0 = np.asarray(A).copy()
    w = matrix(0.0 + 0j, (4, 1))
    V = matrix(0.0, (4, 4))
    lapack.gees(A, w, V)
    T = np.asarray(A)
    Z = np.asarray(V)
    np.testing.assert_allclose(Z @ T @ Z.T, A0, atol=1e-9)
    ev = np.sort_complex(np.asarray(w).reshape(-1))
    ev_ref = np.sort_complex(np.linalg.eigvals(A0))
    np.testing.assert_allclose(ev, ev_ref, atol=1e-8)


def test_lacpy():
    A = randm(3, 3, 26)
    B = matrix(0.0, (3, 3))
    lapack.lacpy(A, B, uplo="L")
    np.testing.assert_allclose(np.tril(np.asarray(B)),
                               np.tril(np.asarray(A)))
