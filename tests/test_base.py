"""Dense/sparse matrix facade: construction, indexing, arithmetic,
printing — mirrors the coverage of the reference's tests/test_basic.py."""

import pickle

import numpy as np
import pytest

import kvxopt_tpu as kvx
from kvxopt_tpu import matrix, spmatrix, sparse, spdiag


def test_matrix_construction():
    A = matrix([1, 2, 3])
    assert A.size == (3, 1) and A.typecode == "i"
    B = matrix([1.0, 2.0], (1, 2))
    assert B.size == (1, 2) and B.typecode == "d"
    C = matrix(2.0, (2, 3))
    assert C.size == (2, 3) and C[1, 2] == 2.0
    # nested lists are columns
    D = matrix([[1.0, 2.0], [3.0, 4.0]])
    assert D.size == (2, 2)
    assert D[0, 1] == 3.0 and D[1, 0] == 2.0
    # from numpy
    E = matrix(np.arange(6.0).reshape(2, 3))
    assert E.size == (2, 3) and E[1, 2] == 5.0
    # typecode promotion
    F = matrix([1, 2.5])
    assert F.typecode == "d"
    Z = matrix([1, 2 + 1j])
    assert Z.typecode == "z"
    # explicit cast up, refuse cast down
    G = matrix([1, 2], tc="d")
    assert G.typecode == "d"
    with pytest.raises(TypeError):
        matrix([1.5], tc="i")


def test_matrix_block_construction():
    A = matrix([[1.0, 2.0], [3.0, 4.0]])
    B = matrix([A, A])          # vertical concat
    assert B.size == (4, 2)
    C = matrix([[A], [A]])      # horizontal concat
    assert C.size == (2, 4)


def test_matrix_indexing():
    A = matrix(np.arange(12.0).reshape(3, 4, order="F").copy())
    # single index is column-major
    assert A[0] == 0.0 and A[3] == 3.0 and A[-1] == 11.0
    assert np.asarray(A[1, :]).reshape(-1).tolist() == [1.0, 4.0, 7.0, 10.0]
    sub = A[0:2, [1, 3]]
    assert sub.size == (2, 2)
    assert sub[0, 1] == A[0, 3]
    # integer-matrix index
    idx = matrix([0, 2])
    got = A[idx]
    assert got.size == (2, 1) and got[1] == A[2]
    # assignment
    A[0, 0] = -1.0
    assert A[0, 0] == -1.0
    A[:, 1] = matrix([9.0, 9.0, 9.0])
    assert A[0, 1] == 9.0
    A[[0, 1]] = 5.0
    assert A[0] == 5.0 and A[1] == 5.0


def test_matrix_arithmetic():
    A = matrix([[1.0, 2.0], [3.0, 4.0]])
    B = matrix([[1.0, 1.0], [1.0, 1.0]])
    assert np.allclose(np.asarray(A + B), np.asarray(A) + 1.0)
    assert np.allclose(np.asarray(A - B), np.asarray(A) - 1.0)
    assert np.allclose(np.asarray(2 * A), 2 * np.asarray(A))
    assert np.allclose(np.asarray(A / 2), np.asarray(A) / 2)
    C = A * B  # matrix product
    assert np.allclose(np.asarray(C), np.asarray(A) @ np.asarray(B))
    v = matrix([1.0, 1.0])
    assert np.allclose(np.asarray(A * v).reshape(-1),
                       np.asarray(A) @ [1, 1])
    assert np.allclose(np.asarray(-A), -np.asarray(A))
    assert np.allclose(np.asarray(abs(matrix([-1.0, 2.0]))).reshape(-1),
                       [1.0, 2.0])
    P = A ** 2
    assert np.allclose(np.asarray(P), np.asarray(A) ** 2)


def test_matrix_complex():
    Z = matrix([1 + 2j, 3 - 1j])
    assert Z.typecode == "z"
    assert np.allclose(np.asarray(Z.H), np.asarray(Z).conj().T)
    assert np.allclose(np.asarray(Z.real).reshape(-1), [1.0, 3.0])
    assert np.allclose(np.asarray(Z.imag).reshape(-1), [2.0, -1.0])


def test_matrix_transpose():
    A = matrix([[1.0, 2.0], [3.0, 4.0]])
    assert np.allclose(np.asarray(A.T), np.asarray(A).T)
    assert np.allclose(np.asarray(A.trans()), np.asarray(A).T)


def test_matrix_pickle_roundtrip():
    A = matrix(np.arange(6.0).reshape(2, 3))
    B = pickle.loads(pickle.dumps(A))
    assert B.size == A.size and np.allclose(np.asarray(A), np.asarray(B))


def test_elementwise_functions():
    A = matrix([1.0, 4.0, 9.0])
    assert np.allclose(np.asarray(kvx.sqrt(A)).reshape(-1), [1, 2, 3])
    assert np.allclose(np.asarray(kvx.exp(matrix([0.0]))).reshape(-1), [1])
    # log of negative switches to complex (reference base.c behavior)
    L = kvx.log(matrix([-1.0]))
    assert L.typecode == "z"
    assert np.allclose(np.asarray(kvx.mul(A, A)).reshape(-1),
                       np.asarray(A).reshape(-1) ** 2)
    assert np.allclose(np.asarray(kvx.div(A, A)).reshape(-1), [1, 1, 1])
    assert kvx.max(A) == 9.0 and kvx.min(A) == 1.0
    M = kvx.max(A, 5.0)
    assert np.allclose(np.asarray(M).reshape(-1), [5.0, 5.0, 9.0])


def test_norm():
    A = matrix([[1.0, -2.0], [3.0, 4.0]])
    a = np.asarray(A)
    assert np.isclose(kvx.norm(A, "F"), np.linalg.norm(a))
    assert np.isclose(kvx.norm(A, "M"), np.abs(a).max())
    assert np.isclose(kvx.norm(A, "1"), np.abs(a).sum(axis=0).max())
    assert np.isclose(kvx.norm(A, "I"), np.abs(a).sum(axis=1).max())


def test_spmatrix_construction():
    S = spmatrix([1.0, 2.0, 3.0], [0, 1, 2], [0, 1, 2])
    assert S.size == (3, 3) and len(S) == 3
    assert S[1, 1] == 2.0 and S[0, 1] == 0.0
    # duplicates are summed (reference sparse.c:2639-2700)
    D = spmatrix([1.0, 1.0], [0, 0], [0, 0], size=(1, 1))
    assert D[0, 0] == 2.0
    # V assignable
    S.V = matrix([4.0, 5.0, 6.0])
    assert S[2, 2] == 6.0
    with pytest.raises(TypeError):
        S.V = matrix([1.0, 2.0])
    # I/J/CCS getters
    assert np.asarray(S.I).reshape(-1).tolist() == [0, 1, 2]
    cp, ri, vals = S.CCS
    assert np.asarray(cp).reshape(-1).tolist() == [0, 1, 2, 3]


def test_spmatrix_arithmetic():
    S = spmatrix([1.0, 2.0], [0, 1], [0, 1])
    T = S + S
    assert T[0, 0] == 2.0
    d = matrix([1.0, 1.0])
    y = S * d
    assert np.asarray(y).reshape(-1).tolist() == [1.0, 2.0]
    A = matrix([[1.0, 0.0], [0.0, 1.0]])
    P = S * A
    assert isinstance(P, matrix)
    Q = S * S
    assert isinstance(Q, spmatrix) and Q[1, 1] == 4.0
    assert np.allclose(np.asarray(S.T), np.asarray(S).T)


def test_spmatrix_ipset_ipadd():
    S = spmatrix([1.0, 2.0, 3.0], [0, 1, 2], [0, 1, 2])
    S.ipset([10.0], [1], [1])
    assert S[1, 1] == 10.0
    S.ipadd([5.0], [1], [1])
    assert S[1, 1] == 15.0
    with pytest.raises(ValueError):
        S.ipset([1.0], [0], [1])  # not in pattern


def test_sparse_concat_spdiag():
    A = matrix([[1.0, 2.0], [3.0, 4.0]])
    S = sparse([[A], [A]])
    assert S.size == (2, 4)
    V = sparse(A)
    assert V.size == (2, 2) and V[1, 0] == 2.0
    D = spdiag([1.0, 2.0, 3.0])
    assert D.size == (3, 3) and D[2, 2] == 3.0
    B = spdiag([A, matrix(5.0)])
    assert B.size == (3, 3) and B[2, 2] == 5.0 and B[0, 2] == 0.0


def test_sparse_indexing_set():
    S = spmatrix([1.0, 2.0], [0, 1], [0, 1], size=(3, 3))
    S[2, 2] = 9.0
    assert S[2, 2] == 9.0
    sub = S[0:2, 0:2]
    assert isinstance(sub, spmatrix) and sub[1, 1] == 2.0


def test_printing():
    A = matrix([[1.0, 2.0], [3.0, 4.0]])
    s = str(A)
    assert "1.00e" in s.replace(" ", "")
    S = spmatrix([1.0], [0], [0], size=(2, 2))
    assert str(S)
    from kvxopt_tpu.printing import spmatrix_str_triplet
    t = spmatrix_str_triplet(S)
    assert t.startswith("(0,0)")


def test_random_generators():
    kvx.setseed(42)
    A = kvx.normal(4, 3)
    assert A.size == (4, 3)
    assert kvx.getseed() == 42
    kvx.setseed(42)
    B = kvx.normal(4, 3)
    assert np.allclose(np.asarray(A), np.asarray(B))
    U = kvx.uniform(5, 2, 1.0, 2.0)
    u = np.asarray(U)
    assert ((u >= 1.0) & (u < 2.0)).all()


def test_tofile_fromfile(tmp_path):
    A = matrix(np.arange(6.0).reshape(3, 2))
    p = tmp_path / "m.bin"
    with open(p, "wb") as f:
        A.tofile(f)
    with open(p, "rb") as f:
        B = kvx.fromfile(f, (3, 2), "d")
    assert np.allclose(np.asarray(A), np.asarray(B))


def test_jax_interop():
    import jax.numpy as jnp
    A = matrix([[1.0, 2.0], [3.0, 4.0]])
    j = A.to_jax()
    assert j.shape == (2, 2)
    assert np.allclose(np.asarray(jnp.linalg.cholesky(
        j @ j.T + 10 * jnp.eye(2))), np.linalg.cholesky(
        np.asarray(A) @ np.asarray(A).T + 10 * np.eye(2)))


def test_solver_accepts_matrix_types():
    from kvxopt_tpu.solvers import lp
    c = matrix([-4.0, -5.0])
    G = matrix([[2.0, 1.0, -1.0, 0.0], [1.0, 2.0, 0.0, -1.0]])
    h = matrix([3.0, 3.0, 0.0, 0.0])
    sol = lp(c, G, h)
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]), [1.0, 1.0], atol=1e-6)


def test_spmatrix_pickle():
    S = spmatrix([1.0, 2.0, 3.0], [0, 1, 2], [0, 1, 2], size=(4, 4))
    T = pickle.loads(pickle.dumps(S))
    assert T.size == S.size and len(T) == len(S)
    np.testing.assert_allclose(np.asarray(T), np.asarray(S))


def test_printing_width_height_options():
    from kvxopt_tpu import printing
    old = dict(printing.options)
    try:
        printing.options["width"] = 2
        printing.options["height"] = 2
        A = matrix(np.arange(25.0).reshape(5, 5))
        s = str(A)
        assert "..." in s and "[...]" in s
    finally:
        printing.options.clear()
        printing.options.update(old)
