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
    """Blocked Cholesky of buf[slot] (npad x npad) in place."""
    n = nb * BS
    rows_n1 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols_nB = jax.lax.broadcasted_iota(jnp.int32, (n, BS), 1)
    cols_1B = jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)
    zero = jnp.float32(0.0)

    for kb in range(nb):
        base = kb * BS
        panel = buf[slot, :, base:base + BS]

        def body(j, P):
            kj = jnp.int32(base) + j
            colv = jnp.sum(jnp.where(cols_nB == j, P, zero), axis=1,
                           keepdims=True)                        # (n,1)
            pivot = jnp.sum(jnp.where(rows_n1 == kj, colv, zero),
                            keepdims=True)                       # (1,1)
            col = jnp.where(rows_n1 >= kj, colv * jax.lax.rsqrt(pivot),
                            zero)                                 # (n,1)
            wrow = col[base:base + BS, :].reshape(1, BS)
            wrow = jnp.where(cols_1B > j, wrow, zero)             # (1,BS)
            return jnp.where(cols_nB == j, col, P - col * wrow)

        panel = jax.lax.fori_loop(jnp.int32(0), jnp.int32(BS), body,
                                  panel)
        buf[slot, :, base:base + BS] = panel
        # trailing update, one fixed-shape (n,BS)@(BS,BS) matmul per
        # remaining column block (variable-extent slices do not legalize
        # in Mosaic, so blocks are the granularity)
        for jb in range(kb + 1, nb):
            cb = jb * BS
            Pj = panel[cb:cb + BS, :]                    # (BS, BS)
            upd = jax.lax.dot_general(
                panel, Pj, dimension_numbers=(((1,), (1,)), ((), ())),
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
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
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
