"""Tile-sparse Cholesky: numeric factorization + solve vs numpy, fill
analysis, jitted refactorization, and a bcsstk13 structure case."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from kvxopt_tpu.ops.tile_chol import TileCholesky, tile_pattern_from_sparse


def block_banded_spd(n, bw, seed=0):
    rng = np.random.default_rng(seed)
    A = np.zeros((n, n))
    for k in range(-bw, bw + 1):
        v = rng.standard_normal(n - abs(k))
        A += np.diag(v, k)
    A = 0.5 * (A + A.T) + (2.0 * bw + 2.0) * np.eye(n)
    return A


@pytest.mark.parametrize("n,ts,bw", [(96, 32, 20), (200, 64, 40)])
def test_tile_chol_banded(n, ts, bw):
    A = block_banded_spd(n, bw, seed=1)
    pat = tile_pattern_from_sparse(sp.csc_matrix(np.tril(A)), ts)
    tc = TileCholesky(pat, n, ts)
    X = tc.tiles_from_dense(jnp.asarray(A))
    L = tc.dense_from_tiles(tc.factor(X))
    Lref = np.linalg.cholesky(A)
    np.testing.assert_allclose(np.tril(np.asarray(L)), Lref, atol=1e-8)


def test_tile_chol_solve_and_refactor():
    n, ts = 160, 32
    A = block_banded_spd(n, 24, seed=2)
    pat = tile_pattern_from_sparse(sp.csc_matrix(np.tril(A)), ts)
    tc = TileCholesky(pat, n, ts)
    factor = jax.jit(tc.factor)
    solve = jax.jit(tc.solve)
    X = factor(tc.tiles_from_dense(jnp.asarray(A)))
    rng = np.random.default_rng(3)
    b = rng.standard_normal(n)
    x = solve(X, jnp.asarray(b))
    np.testing.assert_allclose(A @ np.asarray(x), b, atol=1e-8)
    # refactorization: same pattern, new values — same jitted program
    A2 = A * 1.7 + 0.3 * np.eye(n)
    X2 = factor(tc.tiles_from_dense(jnp.asarray(A2)))
    x2 = solve(X2, jnp.asarray(b))
    np.testing.assert_allclose(A2 @ np.asarray(x2), b, atol=1e-8)


def test_tile_chol_arrow_fill():
    """Arrow pattern: fill analysis must add the tiles the factorization
    needs (last block row fills)."""
    n, ts = 128, 32
    T = n // ts
    rng = np.random.default_rng(4)
    A = np.zeros((n, n))
    for d in range(T):
        M = rng.standard_normal((ts, ts))
        A[d*ts:(d+1)*ts, d*ts:(d+1)*ts] = M @ M.T + n * np.eye(ts)
    A[-ts:, :] = rng.standard_normal((ts, n)) * 0.3
    A[:, -ts:] = A[-ts:, :].T
    A[-ts:, -ts:] += n * np.eye(ts)
    A = 0.5 * (A + A.T) + n * np.eye(n)
    pat = tile_pattern_from_sparse(sp.csc_matrix(np.tril(A)), ts)
    tc = TileCholesky(pat, n, ts)
    X = tc.tiles_from_dense(jnp.asarray(A))
    L = np.tril(np.asarray(tc.dense_from_tiles(tc.factor(X))))
    np.testing.assert_allclose(L @ L.T, A, atol=1e-7)


def test_tile_chol_bcsstk13_structure():
    path = "/root/reference/tests/bcsstk13.mtx"
    if not os.path.exists(path):
        pytest.skip("bcsstk13 not available")
    import scipy.io
    M = scipy.io.mmread(path).tocsc()
    n = M.shape[0]
    A = (0.5 * (M + M.T)).tocsc()
    ts = 128
    pat = tile_pattern_from_sparse(A, ts)
    tc = TileCholesky(pat, n, ts)
    frac = tc.NT / (tc.T * (tc.T + 1) // 2)
    # factor + solve correctness on the real structure
    Ad = jnp.asarray(A.toarray())
    X = tc.factor(tc.tiles_from_dense(Ad))
    rng = np.random.default_rng(5)
    b = rng.standard_normal(n)
    x = tc.solve(X, jnp.asarray(b))
    res = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    assert res < 1e-8


def test_tile_chol_vmap_scenarios():
    """Scenario-batched sparse refactorization: vmap the numeric phase
    over a batch of same-pattern matrices."""
    n, ts = 128, 32
    A0 = block_banded_spd(n, 20, seed=6)
    pat = tile_pattern_from_sparse(sp.csc_matrix(np.tril(A0)), ts)
    tc = TileCholesky(pat, n, ts)
    B = 4
    scales = 1.0 + 0.2 * np.arange(B)
    Xs = jnp.stack([tc.tiles_from_dense(jnp.asarray(A0 * s))
                    for s in scales])
    Ls = jax.jit(jax.vmap(tc.factor))(Xs)
    for i, s in enumerate(scales):
        L = np.tril(np.asarray(tc.dense_from_tiles(Ls[i])))
        np.testing.assert_allclose(L @ L.T, A0 * s, atol=1e-7)


def test_ipm_with_tile_sparse_kkt_on_device():
    """The whole sparse-KKT IPM as ONE jitted program: the custom
    kktsolver runs the tile-sparse numeric factorization *inside* the
    lax.while_loop — symbolic on host once, numeric refactorization on
    device every iteration, no host callbacks (SURVEY.md section 7 step
    5, realized end-to-end)."""
    from kvxopt_tpu.cones import ConeDims
    from kvxopt_tpu.solvers import conelp

    n, ts = 96, 32
    rng = np.random.default_rng(7)
    # banded sparse G (m = n) plus box rows
    Gband = np.zeros((n, n))
    for k in range(-6, 7):
        Gband += np.diag(rng.standard_normal(n - abs(k)) * 0.3, k)
    Gband += (8.0) * np.eye(n)
    G = np.vstack([Gband, np.eye(n), -np.eye(n)])
    N = G.shape[0]
    x0 = rng.standard_normal(n) * 0.1
    h = np.concatenate([Gband @ x0 + rng.uniform(0.5, 1.5, n),
                        np.full(n, 4.0), np.full(n, 4.0)])
    c = -G.T @ rng.uniform(0.1, 1.0, N)

    # K = G' D^-2 G has (banded + diagonal) structure = banded
    Kpat_mat = sp.csc_matrix(
        (np.abs(Gband.T) @ np.abs(Gband) + np.eye(n)) > 1e-12)
    pat = tile_pattern_from_sparse(sp.tril(Kpat_mat), ts)
    tc = TileCholesky(pat, n, ts)
    Gd = jnp.asarray(G)
    calls = []

    def kktsolver(W, H=None, Df=None):
        d = W.d
        Gs = Gd / d[:, None]
        K = Gs.T @ Gs
        X = tc.factor(tc.tiles_from_dense(K))
        calls.append(1)

        def solve(bx, by, bz):
            bzs = bz / d
            ux = tc.solve(X, bx + Gs.T @ bzs)
            uz = (Gs @ ux - bzs) / d
            return ux, jnp.zeros((0,), bx.dtype), uz

        return solve

    sol = conelp(c, Gd, h, ConeDims(l=N), kktsolver=kktsolver)
    assert sol["status"] == "optimal"
    # traced once (the factorization lives inside the jitted loop)
    assert len(calls) <= 2
    ref = conelp(c, Gd, h, ConeDims(l=N))
    np.testing.assert_allclose(np.asarray(sol["x"]),
                               np.asarray(ref["x"]), atol=1e-5)


# ---------------------------------------------------------------------------
# cholmod supernodal device path (options['supernodal'] + options['device'])
# ---------------------------------------------------------------------------


def test_cholmod_supernodal_device_bcsstk13():
    """cholmod.numeric with options['device']=True runs the tile-MXU
    kernel on the real bcsstk13 pattern: factor identity PAP' = LL',
    solve round-trip, and device value-only refactorization (reference
    cholmod.c:50-108,218-294)."""
    import os
    path = "/root/reference/tests/bcsstk13.mtx"
    if not os.path.exists(path):
        import pytest
        pytest.skip("bcsstk13.mtx not available")
    import scipy.io
    import scipy.sparse as sp
    from kvxopt_tpu import cholmod, matrix, spmatrix

    M = scipy.io.mmread(path).tocsc()
    n = M.shape[0]
    # make it definitely PD for the supernodal (LL') semantics
    A = (M + M.T) * 0.5 + sp.eye(n) * (1.0 + abs(M).sum(axis=1).max())
    Asp = spmatrix._from_csc(sp.csc_matrix(sp.tril(A)))

    old = dict(cholmod.options)
    cholmod.options.update({"supernodal": 2, "device": True,
                            "tilesize": 128})
    try:
        F = cholmod.symbolic(Asp)
        cholmod.numeric(Asp, F)
        assert getattr(F, "_device", False)

        rng = np.random.default_rng(0)
        b = rng.standard_normal(n)
        B = matrix(b.reshape(-1, 1))
        cholmod.solve(F, B, sys=0)
        x = np.asarray(B).reshape(-1)
        r = A @ x - b
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8

        # factor identity: P A P' = L L'
        L = np.asarray(cholmod.getfactor(F))
        perm = F.perm
        PAPt = A.toarray()[perm][:, perm]
        err = np.abs(L @ L.T - PAPt).max() / np.abs(PAPt).max()
        assert err < 1e-10

        # device refactorization with scaled values
        A2 = A * 2.0
        Asp2 = spmatrix._from_csc(sp.csc_matrix(sp.tril(A2)))
        cholmod.numeric(Asp2, F)
        B2 = matrix(b.reshape(-1, 1))
        cholmod.solve(F, B2, sys=0)
        x2 = np.asarray(B2).reshape(-1)
        np.testing.assert_allclose(x2, x / 2.0, atol=1e-9 * max(
            1, np.abs(x).max()))
    finally:
        cholmod.options.clear()
        cholmod.options.update(old)


def test_conelp_through_tile_kkt():
    """conelp with a tile-supernodal KKT backend: a block-banded LP whose
    condensed normal equations K = G' W^{-2} G keep a sparse tile pattern;
    the custom kktsolver factors K with the lax.scan MXU kernel and
    matches the dense default path to 1e-6."""
    import jax.numpy as jnp
    from kvxopt_tpu.cones import ConeDims
    from kvxopt_tpu.ops.tile_chol import TileCholesky
    from kvxopt_tpu.solvers import conelp

    rng = np.random.default_rng(3)
    ts = 8
    nb = 6                      # 6 tile-columns of width 8 -> n = 48
    n = ts * nb
    # block-tridiagonal G structure: rows couple adjacent blocks
    blocks = []
    for j in range(nb - 1):
        R = np.zeros((ts, n))
        R[:, j * ts:(j + 2) * ts] = rng.standard_normal((ts, 2 * ts))
        blocks.append(R)
    G = np.vstack(blocks + [np.eye(n), -np.eye(n)])
    m = G.shape[0]
    x0 = rng.standard_normal(n) * 0.1
    h = G @ x0 + rng.uniform(0.5, 1.5, m)
    zc = rng.uniform(0.5, 1.5, m)
    c = -G.T @ zc
    dims = ConeDims(l=m)

    # K's tile pattern: block tridiagonal
    pattern = {(i, j) for j in range(nb) for i in (j, j + 1) if i < nb}
    tile = TileCholesky(pattern, n, ts)
    Gj = jnp.asarray(G)

    def kktsolver(W, H=None, Df=None):
        d = W.d
        Gs = Gj / d[:, None]
        K = Gs.T @ Gs
        X = tile.factor(tile.tiles_from_dense(K))

        def solve(bx, by, bz):
            bzs = bz / d
            ux = tile.solve(X, bx + Gs.T @ bzs)
            uz = (Gs @ ux - bzs) / d
            return ux, by, uz

        return solve

    sol_tile = conelp(c, G, h, dims, kktsolver=kktsolver)
    sol_ref = conelp(c, G, h, dims)
    assert sol_tile["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol_tile["x"]),
                               np.asarray(sol_ref["x"]), atol=1e-6)


def test_cholmod_device_split_solves_all_sys():
    """Device path serves every sys code 0..8 (reference cholmod.c:401):
    each split solve must agree with the host simplicial factor on the
    same matrix (VERDICT r2 item 7)."""
    import scipy.sparse as sp
    from kvxopt_tpu import cholmod, matrix, spmatrix

    rng = np.random.default_rng(3)
    n = 40
    M = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.15)
    A = M @ M.T + n * np.eye(n)
    A = sp.csc_matrix(np.where(np.abs(A) > 1e-12, A, 0.0))
    Asp = spmatrix._from_csc(sp.csc_matrix(sp.tril(A)))
    b = rng.standard_normal((n, 2))

    def run(device):
        old = dict(cholmod.options)
        cholmod.options.update({"supernodal": 2, "device": device,
                                "tilesize": 8})
        try:
            F = cholmod.symbolic(Asp)
            cholmod.numeric(Asp, F)
            assert getattr(F, "_device", False) == device
            outs = {}
            for sys in range(9):
                B = matrix(b.copy())
                cholmod.solve(F, B, sys=sys)
                outs[sys] = np.asarray(B).copy()
            return outs, F.perm
        finally:
            cholmod.options.clear()
            cholmod.options.update(old)

    dev, perm_d = run(True)
    host, perm_h = run(False)
    np.testing.assert_array_equal(perm_d, perm_h)
    for sys in range(9):
        np.testing.assert_allclose(
            dev[sys], host[sys], atol=1e-8 * np.abs(host[sys]).max(),
            err_msg=f"sys={sys}")
    # (split-solve composition sys4/6/5 == sys1 is covered against the
    # host factor above and on complex data in the next test)


def test_cholmod_device_complex_hermitian():
    """Device tile path on a Hermitian complex ('z') matrix: factor
    identity and solve round trip (reference cholmod.c complex support;
    VERDICT r2 item 7)."""
    import scipy.sparse as sp
    from kvxopt_tpu import cholmod, matrix, spmatrix

    rng = np.random.default_rng(4)
    n = 24
    M = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    M = M * (rng.random((n, n)) < 0.2)
    A = M @ M.conj().T + n * np.eye(n)
    A = sp.csc_matrix(A)
    Asp = spmatrix._from_csc(sp.csc_matrix(sp.tril(A)))

    old = dict(cholmod.options)
    cholmod.options.update({"supernodal": 2, "device": True,
                            "tilesize": 8})
    try:
        F = cholmod.symbolic(Asp)
        cholmod.numeric(Asp, F)
        assert getattr(F, "_device", False)
        b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        B = matrix(b.reshape(-1, 1))
        cholmod.solve(F, B, sys=0)
        x = np.asarray(B).reshape(-1)
        r = A @ x - b
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8
        # factor identity P A P^H = L L^H
        L = np.asarray(cholmod.getfactor(F))
        perm = F.perm
        PAPh = A.toarray()[perm][:, perm]
        err = np.abs(L @ L.conj().T - PAPh).max() / np.abs(PAPh).max()
        assert err < 1e-10
        # a split solve on complex data: sys=4 then 6 then 5 == sys=1
        B1 = matrix(b.reshape(-1, 1)); cholmod.solve(F, B1, sys=1)
        B2 = matrix(b.reshape(-1, 1))
        cholmod.solve(F, B2, sys=4)
        cholmod.solve(F, B2, sys=6)
        cholmod.solve(F, B2, sys=5)
        np.testing.assert_allclose(np.asarray(B2), np.asarray(B1),
                                   atol=1e-8)
    finally:
        cholmod.options.clear()
        cholmod.options.update(old)
