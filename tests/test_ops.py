"""Pallas kernels: correctness in interpreter mode on CPU (compiled-path
coverage runs on the real chip via bench.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kvxopt_tpu.ops.chol import batched_cholesky


@pytest.mark.parametrize("B,n", [(2, 128), (1, 200), (3, 64)])
def test_batched_cholesky_interpret(B, n):
    rng = np.random.default_rng(0)
    G = rng.standard_normal((B, 2 * n, n)).astype(np.float32)
    K = np.einsum("bij,bik->bjk", G, G) + n * np.eye(
        n, dtype=np.float32)
    L = batched_cholesky(jnp.asarray(K), interpret=True)
    Lref = np.linalg.cholesky(K)
    scale = np.abs(Lref).max()
    assert np.abs(np.asarray(L) - Lref).max() / scale < 1e-5


from kvxopt_tpu.ops.chol_ls import batched_cholesky_ls, chol_solve_ls


@pytest.mark.parametrize("B,n", [(2, 128), (1, 200), (3, 256), (8, 64)])
def test_lockstep_cholesky_interpret(B, n):
    rng = np.random.default_rng(1)
    G = rng.standard_normal((B, 2 * n, n)).astype(np.float32)
    K = np.einsum("bij,bik->bjk", G, G) + n * np.eye(n, dtype=np.float32)
    L, Dinv = batched_cholesky_ls(jnp.asarray(K), interpret=True)
    Lref = np.linalg.cholesky(K)
    scale = np.abs(Lref).max()
    assert np.abs(np.asarray(L) - Lref).max() / scale < 1e-5
    # the emitted diagonal-block inverses invert the factor's blocks
    nb = Dinv.shape[0]
    for kb in range(nb):
        lo = kb * 128
        hi = min(lo + 128, n)
        blk = np.asarray(L)[0, lo:hi, lo:hi]
        I = np.asarray(Dinv)[kb, 0][:hi - lo, :hi - lo] @ blk
        assert np.abs(I - np.eye(hi - lo)).max() < 1e-4


@pytest.mark.parametrize("B,n,k", [(2, 128, 0), (3, 256, 1), (2, 200, 4)])
def test_lockstep_chol_solve_interpret(B, n, k):
    rng = np.random.default_rng(2)
    G = rng.standard_normal((B, 2 * n, n)).astype(np.float32)
    K = np.einsum("bij,bik->bjk", G, G) + n * np.eye(n, dtype=np.float32)
    Kd = jnp.asarray(K)
    L, Dinv = batched_cholesky_ls(Kd, interpret=True)
    shape = (B, n) if k == 0 else (B, n, k)
    b = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    x = chol_solve_ls(L, Dinv, b, interpret=True)
    assert x.shape == b.shape
    r = jnp.einsum("bij,bj...->bi...", Kd, x) - b
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    assert rel < 1e-5


def test_custom_vmap_chol_collapses():
    # ipm_chol.chol_factor/chol_solve: identical results vmapped and
    # per-instance (on CPU the batch rule falls back to vmapped XLA,
    # exercising the same structure the TPU pallas path uses)
    import jax
    from kvxopt_tpu.ops.ipm_chol import chol_factor, chol_solve
    rng = np.random.default_rng(3)
    B, n = 3, 96
    G = rng.standard_normal((B, 2 * n, n)).astype(np.float32)
    K = np.einsum("bij,bik->bjk", G, G) + n * np.eye(n, dtype=np.float32)
    rhs = rng.standard_normal((B, n)).astype(np.float32)
    Kd, rd = jnp.asarray(K), jnp.asarray(rhs)

    def solve_one(Ki, ri):
        L, Di = chol_factor(Ki)
        return chol_solve(L, Di, ri)

    xv = jax.vmap(solve_one)(Kd, rd)
    for b in range(B):
        xs = solve_one(Kd[b], rd[b])
        assert np.allclose(np.asarray(xs), np.asarray(xv[b]), atol=1e-4)
        r = K[b] @ np.asarray(xs) - rhs[b]
        assert np.linalg.norm(r) / np.linalg.norm(rhs[b]) < 1e-4


@pytest.mark.parametrize("B,n,k,trans", [
    (2, 128, 128, False), (2, 128, 128, True),
    (2, 200, 200, False), (2, 200, 200, True),   # padded n, k=n (facref)
    (3, 256, 64, False), (2, 256, 1, True),
])
def test_tri_solve_ls_interpret(B, n, k, trans):
    """Single-sweep n-RHS triangular solve vs scipy-style reference."""
    from kvxopt_tpu.ops.chol_ls import tri_solve_ls
    import scipy.linalg as sla
    rng = np.random.default_rng(4)
    G = rng.standard_normal((B, 2 * n, n)).astype(np.float32)
    K = np.einsum("bij,bik->bjk", G, G) + n * np.eye(n, dtype=np.float32)
    L, Dinv = batched_cholesky_ls(jnp.asarray(K), interpret=True)
    shape = (B, n) if k == 1 else (B, n, k)
    b = rng.standard_normal(shape).astype(np.float32)
    x = tri_solve_ls(L, Dinv, jnp.asarray(b), trans=trans,
                     interpret=True)
    assert x.shape == b.shape
    Lh = np.asarray(L)
    for i in range(B):
        ref = sla.solve_triangular(Lh[i].T if trans else Lh[i], b[i],
                                   lower=not trans)
        err = np.abs(np.asarray(x[i]) - ref).max()
        assert err / (np.abs(ref).max() + 1) < 1e-4, (i, err)


def test_tri_solve_ls_kchunking():
    """k > the VMEM chunk limit exercises the chunked path."""
    from kvxopt_tpu.ops import chol_ls
    from kvxopt_tpu.ops.chol_ls import tri_solve_ls
    import scipy.linalg as sla
    rng = np.random.default_rng(5)
    B, n, k = 2, 128, 300
    G = rng.standard_normal((B, 2 * n, n)).astype(np.float32)
    K = np.einsum("bij,bik->bjk", G, G) + n * np.eye(n, dtype=np.float32)
    L, Dinv = batched_cholesky_ls(jnp.asarray(K), interpret=True)
    b = rng.standard_normal((B, n, k)).astype(np.float32)
    # shrink the chunk budget so chunking triggers at this size
    import unittest.mock as mock
    with mock.patch.object(chol_ls, "_tri_chunk",
                           side_effect=chol_ls._tri_chunk) as spy:
        x = tri_solve_ls.__wrapped__(L, Dinv, jnp.asarray(b),
                                     trans=False, interpret=True)
    Lh = np.asarray(L)
    for i in range(B):
        ref = sla.solve_triangular(Lh[i], b[i], lower=True)
        assert np.abs(np.asarray(x[i]) - ref).max() / \
            (np.abs(ref).max() + 1) < 1e-4


def test_tri_custom_vmap_matches_scalar():
    """ipm_chol.tri_lower_solve/_t_solve: vmapped == per-instance."""
    import jax
    from kvxopt_tpu.ops.ipm_chol import (chol_factor, tri_lower_solve,
                                         tri_lower_t_solve)
    rng = np.random.default_rng(6)
    B, n = 3, 96
    G = rng.standard_normal((B, 2 * n, n)).astype(np.float32)
    K = np.einsum("bij,bik->bjk", G, G) + n * np.eye(n, dtype=np.float32)
    E = rng.standard_normal((B, n, n)).astype(np.float32)
    Kd, Ed = jnp.asarray(K), jnp.asarray(E)

    for tri in (tri_lower_solve, tri_lower_t_solve):
        def one(Ki, Ei):
            L, Di = chol_factor(Ki)
            return tri(L, Di, Ei)
        xv = jax.vmap(one)(Kd, Ed)
        for b in range(B):
            xs = one(Kd[b], Ed[b])
            assert np.allclose(np.asarray(xs), np.asarray(xv[b]),
                               atol=1e-3)
