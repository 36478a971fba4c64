"""Batched blocked Cholesky as a Pallas TPU kernel.

The per-iteration hot operation of every IPM in this framework is the
factorization of the condensed KKT matrix K = P + Gs'Gs (reference
kkt_chol2 / lapack.potrf, misc.py:1352).  The scenario-batched workloads
(BASELINE.json: ACTIVSg2000 scenario batch) factor MANY such matrices per
step.

Kernel design notes (constraints of the axon remote-compile Mosaic build
discovered empirically):
- grid/vmap'd pallas_call does not legalize -> single-program kernel that
  streams batch elements HBM->VMEM with manual async DMAs (input
  prefetched into a second slot while the current matrix factors; TPU
  grid iterations are sequential on one TensorCore anyway);
- per matrix: for each 128-column panel, an unblocked panel factorization
  (fori_loop of full-height masked rank-1 updates on the VPU — masked
  reductions only, no gather/scatter) followed by one MXU matmul trailing
  update with a row-masked panel (fixed shapes only);
- all scalars kept 2-d and all constants explicitly typed (weak 0-d
  converts and int64 loop indices hit Mosaic lowering bugs).

float32; n padded to a multiple of 128 by the wrapper.
"""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic lowers some fori_loop bodies by recursive unrolling; raise the
# frame limit so 128-step panels fit.
if sys.getrecursionlimit() < 20000:
    sys.setrecursionlimit(20000)

BS = 128


def _factor_inplace(buf, slot, nb):
    """Blocked Cholesky of buf[slot] (npad x npad) in place.

    Per 128-column panel: (1) unblocked Cholesky of the 128x128 diagonal
    block D (masked rank-1 loop on a VMEM-resident tile — cheap VPU
    work), (2) L11^{-1} by forward substitution on the same tile, (3)
    the sub-diagonal panel A21 <- A21 @ L11^{-T} as ONE (n,128)@(128,128)
    MXU matmul, (4) MXU trailing updates.  Compared to full-height
    rank-1 panel updates this moves ~6x VPU work onto the MXU."""
    n = nb * BS
    rows_B1 = jax.lax.broadcasted_iota(jnp.int32, (BS, 1), 0)
    rows_BB = jax.lax.broadcasted_iota(jnp.int32, (BS, BS), 0)
    cols_BB = jax.lax.broadcasted_iota(jnp.int32, (BS, BS), 1)
    cols_1B = jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)

    for kb in range(nb):
        base = kb * BS

        # (1) unblocked Cholesky of the diagonal block (junk above the
        # diagonal is never read; the wrapper tril-masks the output)
        def dstep(j, D):
            colv = jnp.sum(jnp.where(cols_BB == j, D, zero), axis=1,
                           keepdims=True)                      # (BS,1)
            pivot = jnp.sum(jnp.where(rows_B1 == j, colv, zero),
                            keepdims=True)                     # (1,1)
            col = jnp.where(rows_B1 >= j, colv * jax.lax.rsqrt(pivot),
                            zero)                              # (BS,1)
            wrow = jnp.where(cols_1B > j, col.reshape(1, BS), zero)
            return jnp.where(cols_BB == j, col, D - col * wrow)

        D = jax.lax.fori_loop(jnp.int32(0), jnp.int32(BS), dstep,
                              buf[slot, base:base + BS, base:base + BS])

        # (2) X = L11^{-1} by forward substitution (row i of X at step i)
        def istep(i, X):
            lrow = jnp.sum(jnp.where(rows_BB == i, D, zero), axis=0,
                           keepdims=True)                      # (1,BS)
            lii = jnp.sum(jnp.where(cols_1B == i, lrow, zero),
                          keepdims=True)                       # (1,1)
            lrow_l = jnp.where(cols_1B < i, lrow, zero)
            acc = jnp.sum(lrow_l.reshape(BS, 1) * X, axis=0,
                          keepdims=True)                       # (1,BS)
            ei = jnp.where(cols_1B == i, one, zero)
            xrow = (ei - acc) / lii
            return jnp.where(rows_BB == i, xrow, X)

        X = jax.lax.fori_loop(jnp.int32(0), jnp.int32(BS), istep,
                              jnp.zeros((BS, BS), jnp.float32))

        # (3) whole panel @ L11^{-T} on the MXU; rows above the diagonal
        # block land in the junk upper triangle (masked by the wrapper)
        panel = buf[slot, :, base:base + BS]                   # (n,BS)
        Y = jax.lax.dot_general(
            panel, X, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # (n,BS)
        buf[slot, base:base + BS, base:base + BS] = D
        if base + BS < n:
            buf[slot, base + BS:, base:base + BS] = Y[base + BS:, :]
        Lpanel = buf[slot, :, base:base + BS]

        # (4) trailing update, one fixed-shape (n,BS)@(BS,BS) matmul per
        # remaining column block (variable-extent slices do not legalize
        # in Mosaic, so blocks are the granularity)
        for jb in range(kb + 1, nb):
            cb = jb * BS
            Pj = Lpanel[cb:cb + BS, :]                   # (BS, BS)
            upd = jax.lax.dot_general(
                Lpanel, Pj, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (n, BS)
            buf[slot, :, cb:cb + BS] = buf[slot, :, cb:cb + BS] - upd


def _chol_stream_kernel(nb, B, a_hbm, o_hbm, buf, sems):
    def dma_in(b, slot):
        return pltpu.make_async_copy(a_hbm.at[jnp.int32(b)],
                                     buf.at[jnp.int32(slot)],
                                     sems.at[jnp.int32(slot)])

    dma_in(0, 0).start()
    for b in range(B):
        slot = b % 2
        dma_in(b, slot).wait()
        if b + 1 < B:
            dma_in(b + 1, (b + 1) % 2).start()
        _factor_inplace(buf, slot, nb)
        out = pltpu.make_async_copy(buf.at[jnp.int32(slot)],
                                    o_hbm.at[jnp.int32(b)],
                                    sems.at[jnp.int32(slot)])
        out.start()
        out.wait()


def cholesky_kernel_available():
    return jax.default_backend() != "cpu"


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_cholesky(A, interpret=False):
    """Cholesky factors (lower triangular) of a batch of SPD matrices,
    shape (B, n, n) float32; n padded to a multiple of 128 internally."""
    B, n, _ = A.shape
    nb = -(-n // BS)
    npad = nb * BS
    if npad != n:
        Ap = jnp.zeros((B, npad, npad), A.dtype)
        Ap = Ap.at[:, :n, :n].set(A)
        idx = jnp.arange(n, npad)
        Ap = Ap.at[:, idx, idx].set(1.0)
    else:
        Ap = A

    kernel = functools.partial(_chol_stream_kernel, nb, B)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, npad, npad), A.dtype),
        scratch_shapes=[pltpu.VMEM((2, npad, npad), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=B * npad ** 3 // 3,
            bytes_accessed=2 * B * npad * npad * 4,
            transcendentals=B * npad),
    )(Ap)
    out = out[:, :n, :n] if npad != n else out
    return jnp.tril(out)
