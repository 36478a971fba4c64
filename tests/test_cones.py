"""Property tests for the cone algebra core.

Mirrors the dual-implementation verification idea of the reference
(misc.py use_C Python/C agreement): here each operation is checked against
closed-form algebraic identities instead of a second implementation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from kvxopt_tpu import cones
from kvxopt_tpu.cones import ConeDims


DIMS = [
    ConeDims(l=5),
    ConeDims(l=0, q=(4,)),
    ConeDims(l=0, s=(3,)),
    ConeDims(l=3, q=(3, 5), s=(2, 4)),
]


def random_interior(dims, rng, scale=1.0):
    """A strictly interior cone point."""
    u = np.zeros(dims.size)
    u[: dims.l] = rng.uniform(0.5, 2.0, dims.l) * scale
    for ofs, m in zip(dims.qofs, dims.q):
        tail = rng.standard_normal(m - 1)
        u[ofs] = (np.linalg.norm(tail) + rng.uniform(0.5, 2.0)) * scale
        u[ofs + 1:ofs + m] = tail * scale
    for ofs, m in zip(dims.sofs, dims.s):
        A = rng.standard_normal((m, m))
        X = A @ A.T + m * np.eye(m)
        u[ofs:ofs + m * m] = (X * scale).ravel()
    return jnp.asarray(u)


def random_sym(dims, rng):
    """A symmetric (not necessarily PSD) cone-space vector."""
    u = rng.standard_normal(dims.size)
    for ofs, m in zip(dims.sofs, dims.s):
        A = u[ofs:ofs + m * m].reshape(m, m)
        u[ofs:ofs + m * m] = (0.5 * (A + A.T)).ravel()
    return jnp.asarray(u)


@pytest.mark.parametrize("dims", DIMS)
def test_identity_element(dims):
    rng = np.random.default_rng(0)
    x = random_sym(dims, rng)
    e = cones.cone_e(dims)
    np.testing.assert_allclose(cones.sprod(dims, e, x), x, atol=1e-12)
    # degree = sdot(e, e)
    assert abs(cones.sdot(dims, e, e) - dims.degree) < 1e-12


@pytest.mark.parametrize("dims", DIMS)
def test_sdot_trace_inner_product(dims):
    rng = np.random.default_rng(1)
    x, y = random_sym(dims, rng), random_sym(dims, rng)
    expected = np.dot(np.asarray(x[: dims.l + sum(dims.q)]),
                      np.asarray(y[: dims.l + sum(dims.q)]))
    for ofs, m in zip(dims.sofs, dims.s):
        X = np.asarray(x[ofs:ofs + m * m]).reshape(m, m)
        Y = np.asarray(y[ofs:ofs + m * m]).reshape(m, m)
        expected += np.trace(X @ Y)
    np.testing.assert_allclose(cones.sdot(dims, x, y), expected, rtol=1e-10)


@pytest.mark.parametrize("dims", DIMS)
def test_ssqr_matches_sprod(dims):
    rng = np.random.default_rng(2)
    x = random_sym(dims, rng)
    np.testing.assert_allclose(cones.ssqr(dims, x),
                               cones.sprod(dims, x, x), atol=1e-10)


@pytest.mark.parametrize("dims", DIMS)
def test_sinv_roundtrip(dims):
    rng = np.random.default_rng(3)
    x = random_interior(dims, rng)
    # make s blocks of x diagonal (sinv contract: misc.py sinv)
    xn = np.asarray(x).copy()
    for ofs, m in zip(dims.sofs, dims.s):
        X = xn[ofs:ofs + m * m].reshape(m, m)
        xn[ofs:ofs + m * m] = np.diag(np.diagonal(X)).ravel()
    x = jnp.asarray(xn)
    y = random_sym(dims, rng)
    z = cones.sinv(dims, x, y)
    np.testing.assert_allclose(cones.sprod(dims, x, z, diag=True), y,
                               atol=1e-8)


@pytest.mark.parametrize("dims", DIMS)
def test_max_step(dims):
    rng = np.random.default_rng(4)
    x = random_interior(dims, rng)
    t = float(cones.max_step(dims, x))
    assert t < 0  # strictly interior
    e = cones.cone_e(dims)
    # x + t*e is exactly on the boundary: max_step of it is ~0
    t2 = float(cones.max_step(dims, x + t * e))
    assert abs(t2) < 1e-8


@pytest.mark.parametrize("dims", DIMS)
def test_nt_scaling_identities(dims):
    rng = np.random.default_rng(5)
    s = random_interior(dims, rng, scale=1.3)
    z = random_interior(dims, rng, scale=0.7)
    W, lmbda = cones.compute_scaling(dims, s, z)

    wz = cones.scale(dims, W, z)
    wis = cones.scale(dims, W, s, trans=True, inverse=True)
    np.testing.assert_allclose(wz, lmbda, atol=1e-8)
    np.testing.assert_allclose(wis, lmbda, atol=1e-8)
    # lambda'lambda = s'z
    np.testing.assert_allclose(cones.sdot(dims, lmbda, lmbda),
                               cones.sdot(dims, s, z), rtol=1e-10)
    # lambda is in the interior
    assert float(cones.max_step(dims, lmbda)) < 0

    # W^{-1} W u = u, W^{-T} W^{T} u = u
    u = random_sym(dims, rng)
    np.testing.assert_allclose(
        cones.scale(dims, W, cones.scale(dims, W, u), inverse=True),
        u, atol=1e-8)
    np.testing.assert_allclose(
        cones.scale(dims, W, cones.scale(dims, W, u, trans=True),
                    trans=True, inverse=True),
        u, atol=1e-8)


@pytest.mark.parametrize("dims", DIMS)
def test_scale_selfadjoint(dims):
    # <W u, v> = <u, W' v>
    rng = np.random.default_rng(6)
    s = random_interior(dims, rng)
    z = random_interior(dims, rng)
    W, _ = cones.compute_scaling(dims, s, z)
    u, v = random_sym(dims, rng), random_sym(dims, rng)
    lhs = cones.sdot(dims, cones.scale(dims, W, u), v)
    rhs = cones.sdot(dims, u, cones.scale(dims, W, v, trans=True))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-9)


@pytest.mark.parametrize("dims", DIMS)
def test_scale2_automorphism(dims):
    rng = np.random.default_rng(11)
    s = random_interior(dims, rng)
    z = random_interior(dims, rng)
    _, lmbda = cones.compute_scaling(dims, s, z)
    e = cones.cone_e(dims)
    # maps lambda -> e
    np.testing.assert_allclose(cones.scale2(dims, lmbda, lmbda), e, atol=1e-8)
    # roundtrip
    u = random_sym(dims, rng)
    np.testing.assert_allclose(
        cones.scale2(dims, lmbda, cones.scale2(dims, lmbda, u), inverse=True),
        u, atol=1e-8)
    # automorphism: preserves cone membership
    x = random_interior(dims, rng)
    assert float(cones.max_step(dims, cones.scale2(dims, lmbda, x))) < 0


def test_identity_scaling():
    dims = ConeDims(l=2, q=(3,), s=(2,))
    rng = np.random.default_rng(12)
    u = random_sym(dims, rng)
    W = cones.identity_scaling(dims)
    for kw in [{}, {"trans": True}, {"inverse": True},
               {"trans": True, "inverse": True}]:
        np.testing.assert_allclose(cones.scale(dims, W, u, **kw), u,
                                   atol=1e-12)


@pytest.mark.parametrize("dims", DIMS)
def test_pack_unpack(dims):
    rng = np.random.default_rng(7)
    u = random_sym(dims, rng)
    p = cones.pack(dims, u)
    assert p.shape[0] == cones.pack_size(dims)
    np.testing.assert_allclose(cones.unpack(dims, p), u, atol=1e-12)
    # packed dot equals cone dot
    v = random_sym(dims, rng)
    np.testing.assert_allclose(
        jnp.dot(p, cones.pack(dims, v)), cones.sdot(dims, u, v), rtol=1e-10)


@pytest.mark.parametrize("dims", DIMS)
def test_wtw_scale_cols(dims):
    rng = np.random.default_rng(8)
    s = random_interior(dims, rng)
    z = random_interior(dims, rng)
    W, _ = cones.compute_scaling(dims, s, z)
    G = jnp.asarray(rng.standard_normal((dims.size, 3)))
    # symmetrize s blocks column-wise to match scale() semantics
    Gn = np.asarray(G).copy()
    for ofs, m in zip(dims.sofs, dims.s):
        for c in range(3):
            X = Gn[ofs:ofs + m * m, c].reshape(m, m)
            Gn[ofs:ofs + m * m, c] = (0.5 * (X + X.T)).ravel()
    G = jnp.asarray(Gn)
    got = cones.wtw_scale_cols(dims, W, G)
    for c in range(3):
        expect = cones.scale(dims, W, G[:, c], trans=True, inverse=True)
        np.testing.assert_allclose(got[:, c], expect, atol=1e-8)
