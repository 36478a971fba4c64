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
