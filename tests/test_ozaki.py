"""Accuracy tests for the Ozaki-style exact-split matvec (ops/ozaki.py).

The splitting must reproduce f64 matvecs to far better than f32
accuracy using only f32 matmuls — including on badly row-scaled
matrices, under vmap, and for the Gram product the mixed-precision KKT
refinement loop uses."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kvxopt_tpu.ops import ozaki


def _relerr(y, ref):
    return float(np.max(np.abs(np.asarray(y) - ref))
                 / (np.max(np.abs(ref)) + 1e-300))


@pytest.mark.parametrize("m,n", [(64, 64), (512, 256), (256, 512)])
def test_matvec_accuracy(m, n):
    rng = np.random.default_rng(m + n)
    A = rng.standard_normal((m, n))
    x = rng.standard_normal(n)
    op = ozaki.OzakiOperator(jnp.asarray(A))
    ref = A @ x
    assert _relerr(op.mv(jnp.asarray(x)), ref) < 1e-12
    reft = A.T @ (A @ x)
    assert _relerr(op.normal_mv(jnp.asarray(x)), reft) < 1e-12


def test_badly_scaled_rows():
    """Rows spanning 12 orders of magnitude: the per-fiber power-of-two
    scaling must keep every output component accurate."""
    rng = np.random.default_rng(3)
    m, n = 128, 128
    A = rng.standard_normal((m, n)) * (10.0 ** rng.uniform(-6, 6, (m, 1)))
    x = rng.standard_normal(n) * (10.0 ** rng.uniform(-3, 3, n))
    op = ozaki.OzakiOperator(jnp.asarray(A))
    y = np.asarray(op.mv(jnp.asarray(x)))
    ref = A @ x
    # per-component relative error against the row scale
    scale = np.abs(A).max(axis=1) * np.abs(x).max() * n
    assert np.max(np.abs(y - ref) / scale) < 1e-12


def test_f32_would_fail_here():
    """Sanity: the test tolerance is genuinely beyond plain f32."""
    rng = np.random.default_rng(5)
    A = rng.standard_normal((256, 256))
    x = rng.standard_normal(256)
    y32 = (A.astype(np.float32) @ x.astype(np.float32)).astype(np.float64)
    assert _relerr(y32, A @ x) > 1e-8


def test_vmap_and_jit():
    rng = np.random.default_rng(7)
    B, m, n = 4, 96, 64
    A = rng.standard_normal((B, m, n))
    x = rng.standard_normal((B, n))

    def f(Ab, xb):
        return ozaki.OzakiOperator(Ab).mv(xb)

    y = jax.vmap(f)(jnp.asarray(A), jnp.asarray(x))
    ref = np.einsum("bmn,bn->bm", A, x)
    assert _relerr(y, ref) < 1e-12

    op = ozaki.OzakiOperator(jnp.asarray(A[0]))
    y2 = jax.jit(op.normal_mv)(jnp.asarray(x[0]))
    assert _relerr(y2, A[0].T @ (A[0] @ x[0])) < 1e-12


def test_split_reconstruction_exact():
    """The split itself is error-free to nbits*nslices bits."""
    rng = np.random.default_rng(9)
    A = rng.standard_normal((32, 48))
    S, scale = ozaki.split_fp(jnp.asarray(A), nslices=7, nbits=8)
    rec = np.asarray(jnp.sum(S.astype(jnp.float64), axis=0) * scale)
    assert np.max(np.abs(rec - A)) < np.max(np.abs(A)) * 2.0 ** -53


def test_mixed_spd_solver_with_ozaki_flag():
    """mixed_spd_solver reaches f64 quality with the exact-split
    refinement matvec enabled (config.ozaki_refine)."""
    from kvxopt_tpu import config
    from kvxopt_tpu.kkt import mixed_spd_solver

    rng = np.random.default_rng(11)
    n = 128
    M = rng.standard_normal((n, n))
    K = M @ M.T + n * np.eye(n)
    b = rng.standard_normal(n)
    old = config.ozaki_refine
    try:
        config.ozaki_refine = True
        solve = mixed_spd_solver(jnp.asarray(K))
        x = np.asarray(solve(jnp.asarray(b)))
    finally:
        config.ozaki_refine = old
    res = np.linalg.norm(K @ x - b) / np.linalg.norm(b)
    assert res < 1e-10
