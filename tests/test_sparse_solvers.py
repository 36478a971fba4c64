"""umfpack / klu / cholmod / amd: factor identities, solve roundtrips,
determinants, refactorization — mirroring the reference's
tests/test_sparse_solvers.py strategy (factor-identity + data-driven
Matrix-Market cases, loaded from the read-only reference checkout when
available)."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

from kvxopt_tpu import matrix, spmatrix, norm, umfpack, klu, cholmod, amd

MTX_DIR = "/root/reference/tests"


def rand_sparse(n, density, seed, complex_=False, diag_boost=2.0):
    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=density, random_state=np.random.RandomState(
        seed), format="csc")
    A = A + diag_boost * sp.eye(n)
    if complex_:
        A = A + 1j * A
    return spmatrix._from_csc(A.tocsc())


def load_mtx(name):
    path = os.path.join(MTX_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not available")
    import scipy.io
    M = scipy.io.mmread(path).tocsc()
    return spmatrix._from_csc(M)


@pytest.mark.parametrize("complex_", [False, True])
def test_umfpack_factor_identity(complex_):
    A = rand_sparse(60, 0.08, 0, complex_)
    Fs = umfpack.symbolic(A)
    Fn = umfpack.numeric(A, Fs)
    L, U, P, Q, R = umfpack.get_numeric(A, Fn)
    rho = norm(P * R * A * Q - L * U, "1")
    assert rho < 1e-10


@pytest.mark.parametrize("complex_", [False, True])
def test_umfpack_linsolve_roundtrip(complex_):
    from kvxopt_tpu import normal
    A = rand_sparse(50, 0.1, 1, complex_)
    trans_list = ["N", "T", "C"] if complex_ else ["N", "T"]
    b = normal(50, 3)
    if complex_:
        b = matrix(np.asarray(b) * (1 + 1j))
    for tr in trans_list:
        x = matrix(np.asarray(b))
        umfpack.linsolve(A, x, trans=tr)
        Am = np.asarray(A)
        if tr == "T":
            b1 = Am.T @ np.asarray(x)
        elif tr == "C":
            b1 = Am.conj().T @ np.asarray(x)
        else:
            b1 = Am @ np.asarray(x)
        np.testing.assert_allclose(b1, np.asarray(b), atol=1e-8)


def test_umfpack_solve_with_factors():
    from kvxopt_tpu import normal
    A = rand_sparse(40, 0.12, 2)
    Fs = umfpack.symbolic(A)
    Fn = umfpack.numeric(A, Fs)
    b = normal(40, 2)
    x = matrix(np.asarray(b))
    umfpack.solve(A, Fn, x)
    np.testing.assert_allclose(np.asarray(A) @ np.asarray(x),
                               np.asarray(b), atol=1e-8)


@pytest.mark.parametrize("complex_", [False, True])
def test_umfpack_get_det(complex_):
    A = rand_sparse(12, 0.3, 3, complex_)
    Fs = umfpack.symbolic(A)
    Fn = umfpack.numeric(A, Fs)
    det1 = umfpack.get_det(A, Fs, Fn)
    det2 = np.linalg.det(np.asarray(A))
    np.testing.assert_allclose(det1, det2, rtol=1e-8)


def test_umfpack_singular_raises():
    A = spmatrix([1.0, 2.0], [0, 1], [0, 0], size=(2, 2))  # col 1 empty
    Fs = umfpack.symbolic(A)
    with pytest.raises(ArithmeticError):
        umfpack.numeric(A, Fs)


@pytest.mark.parametrize("complex_", [False, True])
def test_klu_factor_identity(complex_):
    A = rand_sparse(60, 0.08, 4, complex_)
    Fs = klu.symbolic(A)
    Fn = klu.numeric(A, Fs)
    L, U, P, Q, R, F, r = klu.get_numeric(A, Fs, Fn)
    rho = norm(R * P * A * Q - (L * U + F), "1")
    assert rho < 1e-10
    rv = np.asarray(r).reshape(-1)
    assert rv[0] == 0 and rv[-1] == 60 and (np.diff(rv) > 0).all()


def test_klu_refactorization():
    from kvxopt_tpu import normal
    A = rand_sparse(50, 0.1, 5)
    Fs = klu.symbolic(A)
    Fn = klu.numeric(A, Fs)
    # same pattern, new values
    A2 = spmatrix._from_csc(A.to_scipy())
    A2.V = matrix(np.asarray(A2.V) * 1.7 + 0.1)
    Fn2 = klu.numeric(A2, Fs, Fn)   # fast refactor path
    b = normal(50, 2)
    x = matrix(np.asarray(b))
    klu.solve(A2, Fs, Fn2, x)
    np.testing.assert_allclose(np.asarray(A2) @ np.asarray(x),
                               np.asarray(b), atol=1e-7)


def test_klu_refactor_fallback():
    # refactor with a *different* pattern must fall back to full factor
    from kvxopt_tpu import normal
    A = rand_sparse(30, 0.15, 6)
    Fs = klu.symbolic(A)
    Fn = klu.numeric(A, Fs)
    B = rand_sparse(30, 0.2, 7)
    FsB = klu.symbolic(B)
    FnB = klu.numeric(B, FsB, Fn)  # wrong prior factor: full refactor
    b = normal(30, 1)
    x = matrix(np.asarray(b))
    klu.solve(B, FsB, FnB, x)
    np.testing.assert_allclose(np.asarray(B) @ np.asarray(x),
                               np.asarray(b), atol=1e-7)


@pytest.mark.parametrize("complex_", [False, True])
def test_klu_get_det(complex_):
    A = rand_sparse(12, 0.3, 8, complex_)
    Fs = klu.symbolic(A)
    Fn = klu.numeric(A, Fs)
    np.testing.assert_allclose(klu.get_det(A, Fs, Fn),
                               np.linalg.det(np.asarray(A)), rtol=1e-8)


def _spd(n, seed, density=0.05):
    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=density,
                  random_state=np.random.RandomState(seed), format="csc")
    S = (A @ A.T + n * 0.1 * sp.eye(n)).tocsc()
    return spmatrix._from_csc(S)


def test_cholmod_solve_and_factor():
    from kvxopt_tpu import normal
    S = _spd(40, 0)
    F = cholmod.symbolic(S)
    cholmod.numeric(S, F)
    b = normal(40, 2)
    x = matrix(np.asarray(b))
    cholmod.solve(F, x)
    np.testing.assert_allclose(np.asarray(S) @ np.asarray(x),
                               np.asarray(b), atol=1e-8)
    # factor identity: P S P' = L L'
    L = np.asarray(cholmod.getfactor(F))
    perm = F.perm
    Sp = np.asarray(S)[perm][:, perm]
    np.testing.assert_allclose(L @ L.T, Sp, atol=1e-8)
    # diag
    d = np.asarray(cholmod.diag(F)).reshape(-1)
    np.testing.assert_allclose(d, np.diag(L), atol=1e-10)


def test_cholmod_refactor_same_symbolic():
    from kvxopt_tpu import normal
    S = _spd(30, 1)
    F = cholmod.symbolic(S)
    cholmod.numeric(S, F)
    S2 = spmatrix._from_csc(S.to_scipy() * 2.0)
    cholmod.numeric(S2, F)   # value-only refactorization
    b = normal(30, 1)
    x = matrix(np.asarray(b))
    cholmod.solve(F, x)
    np.testing.assert_allclose(np.asarray(S2) @ np.asarray(x),
                               np.asarray(b), atol=1e-8)


def test_cholmod_sys_codes():
    from kvxopt_tpu import normal
    S = _spd(20, 2)
    F = cholmod.symbolic(S)
    cholmod.numeric(S, F)
    b = normal(20, 1)
    # sys=4 (L), then 6 (D), then 5 (L') == sys=1 (LDL')
    x1 = matrix(np.asarray(b))
    cholmod.solve(F, x1, sys=1)
    x2 = matrix(np.asarray(b))
    for s in (4, 6, 5):
        cholmod.solve(F, x2, sys=s)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-9)
    # sys=7 then 8 is identity
    x3 = matrix(np.asarray(b))
    cholmod.solve(F, x3, sys=7)
    cholmod.solve(F, x3, sys=8)
    np.testing.assert_allclose(np.asarray(x3), np.asarray(b), atol=1e-12)


def test_cholmod_not_pd_raises():
    S = spmatrix([-1.0, 1.0], [0, 1], [0, 1], size=(2, 2))
    F = cholmod.symbolic(S)
    with pytest.raises(ArithmeticError):
        cholmod.numeric(S, F)
    # indefinite allowed with supernodal=0 (simplicial LDL')
    old = cholmod.options.get("supernodal", 2)
    try:
        cholmod.options["supernodal"] = 0
        cholmod.numeric(S, F)
        x = matrix([2.0, 3.0])
        cholmod.solve(F, x)
        np.testing.assert_allclose(np.asarray(x).reshape(-1),
                                   [-2.0, 3.0], atol=1e-12)
    finally:
        cholmod.options["supernodal"] = old


def test_cholmod_splinsolve():
    S = _spd(25, 3)
    B = spmatrix([1.0, 2.0], [0, 5], [0, 0], size=(25, 1))
    X = cholmod.splinsolve(S, B)
    np.testing.assert_allclose(np.asarray(S) @ np.asarray(X),
                               np.asarray(B), atol=1e-8)


def test_amd_order_valid_permutation():
    S = _spd(30, 4)
    p = np.asarray(amd.order(S)).reshape(-1)
    assert sorted(p.tolist()) == list(range(30))


def test_amd_reduces_fill():
    # arrow matrix: natural order causes full fill; mindeg should put the
    # hub last
    n = 20
    rows = list(range(n)) + list(range(1, n)) + [0] * (n - 1)
    cols = list(range(n)) + [0] * (n - 1) + list(range(1, n))
    vals = [10.0] * n + [1.0] * (2 * (n - 1))
    S = spmatrix(vals, rows, cols)
    p = np.asarray(amd.order(S)).reshape(-1)
    # hub eliminated last (or tied with the final leaf)
    assert 0 in p[-2:].tolist()


# -- data-driven cases on the reference's Matrix-Market files --------------

@pytest.mark.parametrize("name", ["bp_800.mtx"])
@pytest.mark.parametrize("complex_", [False, True])
def test_mtx_klu_roundtrip(name, complex_):
    from kvxopt_tpu import normal
    A = load_mtx(name)
    if complex_:
        A = spmatrix._from_csc(A.to_scipy() * (1 + 1j))
    n = A.size[0]
    Fs = klu.symbolic(A)
    Fn = klu.numeric(A, Fs)
    b = normal(n, 3)
    if complex_:
        b = matrix(np.asarray(b) * 1j)
    for tr in (["N", "T", "C"] if complex_ else ["N", "T"]):
        x = matrix(np.asarray(b))
        klu.solve(A, Fs, Fn, x, trans=tr)
        Am = A.to_scipy()
        if tr == "T":
            r = Am.T @ np.asarray(x) - np.asarray(b)
        elif tr == "C":
            r = Am.conj().T @ np.asarray(x) - np.asarray(b)
        else:
            r = Am @ np.asarray(x) - np.asarray(b)
        assert np.abs(r).max() < 1e-6


@pytest.mark.parametrize("name", ["ACTIVSg2000.mtx"])
def test_mtx_umfpack_identity(name):
    A = load_mtx(name)
    Fs = umfpack.symbolic(A)
    Fn = umfpack.numeric(A, Fs)
    L, U, P, Q, R = umfpack.get_numeric(A, Fn)
    rho = norm(P * R * A * Q - L * U, "1")
    assert rho < 1e-7 * norm(A, "1")


def test_cholmod_complex_hermitian():
    from kvxopt_tpu import normal
    n = 30
    A = sp.random(n, n, density=0.1,
                  random_state=np.random.RandomState(11), format="csc")
    A = A + 1j * sp.random(n, n, density=0.1,
                           random_state=np.random.RandomState(12),
                           format="csc")
    H = (A @ A.conj().T + n * sp.eye(n)).tocsc()  # Hermitian PD
    S = spmatrix._from_csc(H)
    F = cholmod.symbolic(S)
    cholmod.numeric(S, F)
    b = np.asarray(normal(n, 2)) + 1j * np.asarray(normal(n, 2))
    x = matrix(b.copy())
    cholmod.solve(F, x)
    np.testing.assert_allclose(H.toarray() @ np.asarray(x), b, atol=1e-8)
    # factor identity: P H P' = L L^H
    L = np.asarray(cholmod.getfactor(F))
    perm = F.perm
    Hp = H.toarray()[perm][:, perm]
    np.testing.assert_allclose(L @ L.conj().T, Hp, atol=1e-8)
    # refactor with scaled values
    S2 = spmatrix._from_csc(H * 2.0)
    cholmod.numeric(S2, F)
    x2 = matrix(b.copy())
    cholmod.solve(F, x2)
    np.testing.assert_allclose(2.0 * (H.toarray() @ np.asarray(x2)), b,
                               atol=1e-8)


def test_klu_btf_block_structure():
    """A reducible matrix must produce a nontrivial BTF with the factor
    identity and solves exact (the full KLU pipeline)."""
    from kvxopt_tpu import normal
    rng = np.random.default_rng(20)
    # block upper triangular by construction, then scrambled
    n1, n2, n3 = 8, 5, 7
    n = n1 + n2 + n3
    B = np.zeros((n, n))
    def dense_blk(k, seed):
        M = np.random.default_rng(seed).standard_normal((k, k))
        return M + k * np.eye(k)
    B[:n1, :n1] = dense_blk(n1, 1)
    B[n1:n1+n2, n1:n1+n2] = dense_blk(n2, 2)
    B[n1+n2:, n1+n2:] = dense_blk(n3, 3)
    B[:n1, n1:] = rng.standard_normal((n1, n2 + n3)) * 0.3
    B[n1:n1+n2, n1+n2:] = rng.standard_normal((n2, n3)) * 0.3
    pr = rng.permutation(n); pc = rng.permutation(n)
    A0 = B[pr][:, pc]
    A = spmatrix._from_csc(sp.csc_matrix(A0))
    Fs = klu.symbolic(A)
    Fn = klu.numeric(A, Fs)
    L, U, P, Q, R, F, r = klu.get_numeric(A, Fs, Fn)
    rho = norm(R * P * A * Q - (L * U + F), "1")
    assert rho < 1e-10
    rv = np.asarray(r).reshape(-1)
    assert len(rv) >= 4  # at least the three constructed blocks
    assert len(F) > 0    # genuine off-diagonal coupling
    b = np.asarray(normal(n, 2))
    for tr in ("N", "T"):
        x = matrix(b.copy())
        klu.solve(A, Fs, Fn, x, trans=tr)
        Am = A0 if tr == "N" else A0.T
        np.testing.assert_allclose(Am @ np.asarray(x), b, atol=1e-8)
    # determinant across blocks and permutations
    np.testing.assert_allclose(klu.get_det(A, Fs, Fn),
                               np.linalg.det(A0), rtol=1e-8)


# ---------------------------------------------------------------------------
# Row scaling (R != I): badly scaled matrices factor and solve accurately,
# and the exported R carries the actual scale factors.

def _badly_scaled(n, seed, complex_=False):
    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=0.15, random_state=np.random.RandomState(
        seed), format="csc") + 3.0 * sp.eye(n)
    D = sp.diags(10.0 ** rng.uniform(-8, 8, n))
    M = (D @ A).tocsc()
    if complex_:
        M = M + 1j * M
    return spmatrix._from_csc(M.tocsc())


@pytest.mark.parametrize("complex_", [False, True])
def test_umfpack_row_scaling(complex_):
    A = _badly_scaled(40, 7, complex_)
    Fs = umfpack.symbolic(A)
    Fn = umfpack.numeric(A, Fs)
    L, U, P, Q, R = umfpack.get_numeric(A, Fn)
    rdiag = np.asarray(matrix(R))[np.arange(40), np.arange(40)]
    assert not np.allclose(rdiag, 1.0)       # scaling really happened
    assert norm(P * R * A * Q - L * U, "1") < 1e-8
    # N-solve recovers x despite the 1e16 row-scale spread (row scaling
    # makes the scaled system well conditioned); T/C solves are checked
    # by residual (forward error there is limited by cond(A) itself)
    Ad = np.asarray(A)
    for trans in ("N", "T", "C"):
        x_true = np.arange(1.0, 41.0).reshape(-1, 1)
        if complex_:
            x_true = x_true + 0.5j * x_true
        Aop = {"N": Ad, "T": Ad.T, "C": Ad.conj().T}[trans]
        b = Aop @ x_true
        B = matrix(b)
        umfpack.solve(A, Fn, B, trans=trans)
        x = np.asarray(B)
        if trans == "N":
            np.testing.assert_allclose(x, x_true, rtol=1e-6)
        resid = np.abs(Aop @ x - b).max() / np.abs(b).max()
        assert resid < 1e-12
    # determinant folds the scaling back in
    det = umfpack.get_det(A, Fs, Fn)
    np.testing.assert_allclose(det, np.linalg.det(Ad), rtol=1e-6)


@pytest.mark.parametrize("complex_", [False, True])
def test_klu_row_scaling(complex_):
    A = _badly_scaled(40, 8, complex_)
    Fs = klu.symbolic(A)
    Fn = klu.numeric(A, Fs)
    L, U, P, Q, R, F, r = klu.get_numeric(A, Fs, Fn)
    rdiag = np.asarray(matrix(R))[np.arange(40), np.arange(40)]
    assert not np.allclose(rdiag, 1.0)
    assert norm(R * P * A * Q - (L * U + F), "1") < 1e-8
    Ad = np.asarray(A)
    for trans in ("N", "T", "C"):
        x_true = np.arange(1.0, 41.0).reshape(-1, 1)
        if complex_:
            x_true = x_true - 0.25j * x_true
        Aop = {"N": Ad, "T": Ad.T, "C": Ad.conj().T}[trans]
        b = Aop @ x_true
        B = matrix(b)
        klu.solve(A, Fs, Fn, B, trans=trans)
        x = np.asarray(B)
        if trans == "N":
            np.testing.assert_allclose(x, x_true, rtol=1e-6)
        resid = np.abs(Aop @ x - b).max() / np.abs(b).max()
        assert resid < 1e-12
    np.testing.assert_allclose(klu.get_det(A, Fs, Fn),
                               np.linalg.det(Ad), rtol=1e-6)
    # refactorization keeps the (new) scaling
    A2 = _badly_scaled(40, 9, complex_)
    Fn2 = klu.numeric(A2, Fs, Fn)
    B = matrix(np.asarray(A2) @ x_true)
    klu.solve(A2, Fs, Fn2, B)
    np.testing.assert_allclose(np.asarray(B), x_true, rtol=1e-5)


def test_amd_quality_and_speed_bcsstk13():
    """AMD (quotient graph) orders bcsstk13 fast and with fill no worse
    than exact minimum degree (within 15%), validating the approximate
    degree machinery on a real structural matrix."""
    import time
    A = load_mtx("bcsstk13.mtx")
    n = A.size[0]
    t0 = time.time()
    p = amd.order_array(A)
    t_amd = time.time() - t0
    assert sorted(p.tolist()) == list(range(n))
    assert t_amd < 2.0            # exact mindeg takes ~3.5 s here
    # fill proxy: symbolic Cholesky column counts on the permuted pattern
    S = A.to_scipy()
    S = (abs(S) + abs(S.T)).tocsc()[p][:, p]
    import scipy.sparse.linalg as spl
    import scipy.sparse as ssp
    M = (S + ssp.eye(n) * (abs(S).sum() + 1)).tocsc()
    lu = spl.splu(M, permc_spec="NATURAL", diag_pivot_thresh=0.0,
                  options=dict(SymmetricMode=True))
    assert lu.L.nnz + lu.U.nnz < 700_000   # mindeg: ~583k, amd: ~536k


def test_amd_mindeg_option():
    amd.options["method"] = "mindeg"
    try:
        S = _spd(30, 4)
        p = np.asarray(amd.order(S)).reshape(-1)
        assert sorted(p.tolist()) == list(range(30))
    finally:
        amd.options.pop("method", None)
