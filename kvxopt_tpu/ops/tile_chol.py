"""Tile-sparse (supernodal-style) Cholesky with device-side numeric
factorization.

The TPU-native replacement for CHOLMOD's supernodal numeric phase
(reference cholmod.c symbolic/numeric split): symbolic analysis happens
once on the host over a fixed tile pattern; the numeric factorization is
a single jitted XLA program of dense-tile MXU operations whose schedule
(gather/scatter index tables per block column) is baked in at trace time.
Re-running `factor` with new values is TPU-side numeric refactorization
— the KLU/CHOLMOD fast-refactor contract on device.

Storage: the lower-triangular nonzero TILES of L (after fill analysis)
live in one (NT, ts, ts) array.  Per block column j the program does

  1. scatter-add updates  X[ij] -= X[ik] @ X[jk]'  for all k < j pairs
     (one batched dot_general + segment scatter-add),
  2. one dense Cholesky of the diagonal tile,
  3. a batched triangular solve of the column's subdiagonal tiles.

Intended for block-banded / power-grid-like patterns where the tile
pattern stays sparse; for small n (<= a few thousand) the dense batched
path (ops.chol / jnp.linalg.cholesky) is usually faster.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.lax.linalg import triangular_solve


class TileCholesky:
    """Host symbolic analysis over a fixed tile pattern."""

    def __init__(self, pattern, n, ts=128):
        """pattern: iterable of (i, j) tile coordinates (i >= j) with a
        nonzero tile in the LOWER triangle of A (diagonal tiles required);
        n: matrix order; ts: tile size."""
        self.n = n
        self.ts = ts
        self.T = -(-n // ts)
        T = self.T
        S = set()
        for i, j in pattern:
            if i < j:
                i, j = j, i
            S.add((int(i), int(j)))
        for d in range(T):
            S.add((d, d))
        # block fill: L[i,j] exists if A[i,j] or exists k<j with L[i,k]
        # and L[j,k] (block right-looking fill rule)
        changed = True
        while changed:
            changed = False
            by_col = {}
            for (i, j) in S:
                by_col.setdefault(j, []).append(i)
            for k in sorted(by_col):
                rows = sorted(r for r in by_col[k] if r > k)
                for a in range(len(rows)):
                    for b in range(a, len(rows)):
                        ii, jj = rows[b], rows[a]
                        if (ii, jj) not in S:
                            S.add((ii, jj))
                            changed = True
        self.tiles = sorted(S, key=lambda t: (t[1], t[0]))  # col-major
        self.slot = {t: k for k, t in enumerate(self.tiles)}
        self.NT = len(self.tiles)

        # per-column schedules
        self.col_rows = []       # subdiagonal row tiles of column j
        self.col_slots = []      # their slots
        self.upd = []            # per column: (dst, a, b) update triples
        for j in range(T):
            rows = sorted(i for (i, jj) in S if jj == j and i > j)
            self.col_rows.append(rows)
            self.col_slots.append([self.slot[(i, j)] for i in rows])
            triples = []
            for k in range(j):
                if (j, k) not in S:
                    continue
                rows_k = [i for (i, kk) in S if kk == k and i >= j]
                for i in rows_k:
                    if (i, j) in S:
                        triples.append((self.slot[(i, j)],
                                        self.slot[(i, k)],
                                        self.slot[(j, k)]))
            self.upd.append(triples)

    # -- host <-> tile conversion ---------------------------------------

    def tiles_from_dense(self, A):
        ts, T, n = self.ts, self.T, self.n
        npad = T * ts
        Ap = jnp.zeros((npad, npad), A.dtype)
        Ap = Ap.at[:n, :n].set(jnp.asarray(A))
        idx = jnp.arange(n, npad)
        Ap = Ap.at[idx, idx].set(1.0)
        out = jnp.stack([
            Ap[i * ts:(i + 1) * ts, j * ts:(j + 1) * ts]
            for (i, j) in self.tiles])
        return out

    def dense_from_tiles(self, X):
        ts, T, n = self.ts, self.T, self.n
        npad = T * ts
        out = jnp.zeros((npad, npad), X.dtype)
        for k, (i, j) in enumerate(self.tiles):
            out = out.at[i * ts:(i + 1) * ts, j * ts:(j + 1) * ts].set(
                X[k])
        return out[:n, :n]

    # -- device numeric factorization ------------------------------------

    def factor(self, X):
        """Numeric tile Cholesky: X (NT, ts, ts) tiles of the lower
        triangle of A -> tiles of L (diagonal tiles lower-triangular).
        Pure jax; jit/refactor freely."""
        for j in range(self.T):
            if self.upd[j]:
                dst, a, b = (np.array([t[k] for t in self.upd[j]],
                                      dtype=np.int32)
                             for k in range(3))
                upd = jax.lax.dot_general(
                    X[a], X[b],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=X.dtype)
                X = X.at[dst].add(-upd)
            djj = self.slot[(j, j)]
            Ljj = jnp.linalg.cholesky(X[djj])
            X = X.at[djj].set(Ljj)
            slots = np.asarray(self.col_slots[j], dtype=np.int32)
            if len(slots):
                # X[ij] := X[ij] L_jj^{-T}: solve X L' = B
                col = X[slots]
                sol = triangular_solve(
                    jnp.broadcast_to(Ljj, (len(slots),) + Ljj.shape),
                    col, left_side=False, lower=True,
                    transpose_a=True)
                X = X.at[slots].set(sol)
        return X

    def solve(self, X, bvec):
        """Solve A x = b given factored tiles X."""
        ts, T, n = self.ts, self.T, self.n
        npad = T * ts
        b = jnp.zeros((npad,), bvec.dtype).at[:n].set(bvec)
        y = b.reshape(T, ts)
        # forward: L y = b (block forward substitution)
        for j in range(T):
            djj = self.slot[(j, j)]
            yj = triangular_solve(X[djj], y[j][:, None], left_side=True,
                                  lower=True)[:, 0]
            y = y.at[j].set(yj)
            for i, s in zip(self.col_rows[j], self.col_slots[j]):
                y = y.at[i].add(-X[s] @ yj)
        # backward: L' x = y
        for j in range(T - 1, -1, -1):
            acc = y[j]
            for i, s in zip(self.col_rows[j], self.col_slots[j]):
                acc = acc - X[s].T @ y[i]
            djj = self.slot[(j, j)]
            xj = triangular_solve(X[djj], acc[:, None], left_side=True,
                                  lower=True, transpose_a=True)[:, 0]
            y = y.at[j].set(xj)
        return y.reshape(-1)[:n]


def tile_pattern_from_sparse(A, ts=128):
    """Tile coordinates of the lower triangle of a scipy sparse matrix."""
    import scipy.sparse as sp
    coo = sp.tril(A.tocsc()).tocoo()
    tiles = set(zip((coo.row // ts).tolist(), (coo.col // ts).tolist()))
    return tiles
