"""Tensor-parallel KKT: row-sharded constraint matrices over a mesh axis.

The condensed KKT system K = P + G' W^{-1} W^{-T} G is a sum over
constraint rows, so with G row-sharded over a 'kkt' mesh axis each device
forms its local normal-equations contribution and a single psum over ICI
reduces K; the (small, replicated) Cholesky factorization follows locally.
This mirrors how the reference's structure-exploiting custom kktsolvers
(tests/test_custom_kkt.py) reduce the KKT solve, but distributed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def sharded_kkt_factor(mesh: Mesh, axis: str, G, d, Pmat=None):
    """Factor K = Pmat + G' diag(d)^{-2} G with G and d row-sharded over
    `axis` (l-cone scaling W = diag(d)).  Returns solve(bx, bz) -> (ux, uz)
    for the 2x2 system [P+G'D^{-2}G] ux = bx + G'D^{-2}bz; uz =
    D^{-2}(G ux - bz), computed with one psum per product.
    """
    n = G.shape[1]

    gspec = P(axis, None)
    dspec = P(axis)
    rep = P(None, None)

    @partial(shard_map, mesh=mesh,
             in_specs=(gspec, dspec, rep if Pmat is not None else P()),
             out_specs=rep)
    def form_K(Gl, dl, Pl):
        Gs = Gl / dl[:, None]
        Kl = Gs.T @ Gs
        K = jax.lax.psum(Kl, axis)
        if Pmat is not None:
            K = K + Pl
        return K

    Pm = Pmat if Pmat is not None else jnp.zeros((1, 1), G.dtype)
    K = form_K(G, d, Pm)
    L = jnp.linalg.cholesky(K)

    def solve(bx, bz):
        # rhs = bx + G' D^{-2} bz  (bz sharded like d)
        @partial(shard_map, mesh=mesh, in_specs=(gspec, dspec, dspec),
                 out_specs=P(None))
        def rhs_fn(Gl, dl, bzl):
            return jax.lax.psum(Gl.T @ (bzl / dl ** 2), axis)

        rhs = bx + rhs_fn(G, d, bz)
        y = solve_triangular(L, rhs, lower=True)
        ux = solve_triangular(L.T, y, lower=False)

        @partial(shard_map, mesh=mesh, in_specs=(gspec, dspec, dspec,
                                                 P(None)),
                 out_specs=dspec)
        def uz_fn(Gl, dl, bzl, uxr):
            return (Gl @ uxr - bzl) / dl ** 2

        uz = uz_fn(G, d, bz, ux)
        return ux, uz

    return solve, K
