"""Lockstep-batched blocked Cholesky (+ block-inverse byproduct) as a
Pallas TPU kernel.

Motivation (measured on chip with the slope method, B=16 n=1024 f32):
XLA's cholesky expander runs at ~1.5 TFLOP/s and its triangular-solve
expander re-inverts diagonal blocks on every solve.  The per-iteration
KKT cost of every IPM here is factor + 2 solves (reference kkt_chol2,
misc.py:1352), so both matter.

Design — all B matrices advance through panel kb together ("lockstep"):

  for each 128-wide panel kb (Python-unrolled, static shapes):
    1. one strided DMA pulls the B diagonal blocks (B,128,128) to VMEM;
    2. ONE fused 128-step fori_loop factors all B blocks simultaneously
       and simultaneously accumulates Y = L11^{-1}: at step j the new
       row u_j of U (D = U'U, L11 = U') and the new row of Y only need
       rows < j of Y and column j of the still-symmetric D, so factor
       and inverse share the loop.  This is the whole point: the serial
       rsqrt chain is paid once per panel, not once per matrix per
       panel — a 2B-fold cut in serial VPU steps vs. the streaming
       kernel in ops/chol.py (16-row segments, rank-16 MXU propagation);
    3. per matrix: the full-height panel transform L[:, kb] =
       A[:, kb] @ Y' and the rank-128 trailing updates are single
       fixed-shape (n,128)@(128,128) MXU matmuls with double-buffered
       column DMAs.

The kernel also emits Dinv[kb] = Y (the per-panel diagonal-block
inverses) so that triangular solves against L become pure matmul
streams — no per-solve re-inversion.

Mosaic constraints honored (same empirically-validated op set as
ops/chol.py): no gather/scatter (masked reductions + where only), no
variable-extent slices (everything static per unrolled kb), manual
HBM<->VMEM async copies, f32, n padded to a multiple of 128.
"""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if sys.getrecursionlimit() < 20000:
    sys.setrecursionlimit(20000)

BS = 128


import os as _os
SEG = int(_os.environ.get("KVX_CHOL_SEG", "16"))
PR = int(_os.environ.get("KVX_CHOL_PR", "2"))
           # pivots factored per serial panel step (rank-PR updates).
           # Measured on chip (B=16 n=1024, factor + 2 solves, slope
           # method): PR=1 1.90 ms (3.04 TFLOP/s), PR=2 1.39 ms
           # (4.17 TFLOP/s), PR=4 1.73 ms (3.36 TFLOP/s) — the rank-4
           # in-step corrections and k=4 dot_generals cost more than the
           # extra step-count halving saves.

import os
STATIC_STEPS = os.environ.get("KVX_CHOL_STATIC", "0") == "1"
                      # Python-unroll the per-segment pivot steps with
                      # STATIC indices: row slices become static sublane
                      # slices and pivot/coefficient extraction becomes
                      # static lane selects instead of masked 128-lane
                      # reductions — the serial VPU chain is the
                      # kernel's wall (BENCHNOTES r2/r3), and its
                      # per-step fixed cost is mostly these dynamic ops.


def _panel_factor_inverse_static(dref, uref, yref, aref, B):
    """Static-index variant of `_panel_factor_inverse`: every pivot row
    index is a Python constant (segments AND steps unrolled), so Mosaic
    lowers row reads to static sublane slices and pivot extraction to
    static lane selects.  Semantics identical: on exit uref holds U
    (D = U'U), yref holds Y = L11^{-1}."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (B, 1, BS), 2)
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)

    aref[...] = jnp.zeros((B, BS, BS), jnp.float32)

    for seg in range(BS // SEG):
        lo, hi = seg * SEG, (seg + 1) * SEG

        for j in range(lo, hi, PR):
            rows = dref[:, j:j + PR, :]                  # (B,PR,BS)
            acc = aref[:, j:j + PR, :]
            us, ys = [], []
            for k in range(PR):
                rk = rows[:, k:k + 1, :]                 # (B,1,BS)
                yk = jnp.where(lanes == j + k, one, zero) - \
                    acc[:, k:k + 1, :]
                for m_ in range(k):
                    # L[j+k, j+m] = lane (j+k) of u_m: a STATIC lane
                    # select (vs the dynamic variant's masked reduce)
                    coef = us[m_][:, :, j + k:j + k + 1]  # (B,1,1)
                    rk = rk - coef * us[m_]
                    yk = yk - coef * ys[m_]
                piv = rk[:, :, j + k:j + k + 1]          # (B,1,1)
                rs = jax.lax.rsqrt(piv)
                us.append(jnp.where(lanes >= j + k, rk * rs, zero))
                ys.append(yk * rs)
            U = jnp.concatenate(us, axis=1)              # (B,PR,BS)
            Y = jnp.concatenate(ys, axis=1)
            uref[:, j:j + PR, :] = U
            yref[:, j:j + PR, :] = Y
            # rank-PR strip updates confined to the current segment
            Uc = jnp.swapaxes(U, 1, 2)[:, lo:hi, :]      # (B,SEG,PR)
            dims2 = (((2,), (1,)), ((0,), (0,)))
            aref[:, lo:hi, :] = aref[:, lo:hi, :] + jax.lax.dot_general(
                Uc, Y, dimension_numbers=dims2,
                preferred_element_type=jnp.float32)
            dref[:, lo:hi, :] = dref[:, lo:hi, :] - jax.lax.dot_general(
                Uc, U, dimension_numbers=dims2,
                preferred_element_type=jnp.float32)

        if hi < BS:
            # rank-SEG propagation to rows [hi, BS): one batched MXU
            # matmul each for the factorization and the inverse
            Useg = uref[:, lo:hi, :]                     # (B,SEG,BS)
            Yseg = yref[:, lo:hi, :]                     # (B,SEG,BS)
            Utail = Useg[:, :, hi:]                      # (B,SEG,BS-hi)
            dims = (((1,), (1,)), ((0,), (0,)))
            upd = jax.lax.dot_general(
                Utail, Useg, dimension_numbers=dims,
                preferred_element_type=jnp.float32)      # (B,BS-hi,BS)
            dref[:, hi:, :] = dref[:, hi:, :] - upd
            aupd = jax.lax.dot_general(
                Utail, Yseg, dimension_numbers=dims,
                preferred_element_type=jnp.float32)
            aref[:, hi:, :] = aref[:, hi:, :] + aupd


def _panel_factor_inverse(dref, uref, yref, aref, B):
    """Fused lockstep factorization + inverse of B symmetric 128x128
    blocks, ref-based and 32-segmented.

    dref: (B,BS,BS) symmetric input (destroyed).  On exit uref holds U
    with D = U'U (row j = u_j, upper triangular) and yref holds
    Y = (U')^{-1} = L11^{-1} (row j = j-th row of the inverse).  aref
    is a (B,BS,BS) accumulator workspace: aref[r,:] accumulates
    sum_k L[r,k]·Y[k,:] so each inverse row costs one strip FMA.

    Cost shape: the per-step serial work is confined to the 32-row
    strip of the current segment (two (B,32,128) FMAs + (B,1,128) row
    slices) — ~1MB of VPU traffic per step instead of ~10MB for the
    masked full-block variant; cross-segment propagation of both the
    factorization and the inverse happens as rank-32 batched MXU
    matmuls once per segment."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (B, 1, BS), 2)
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)

    aref[...] = jnp.zeros((B, BS, BS), jnp.float32)

    for seg in range(BS // SEG):
        lo, hi = seg * SEG, (seg + 1) * SEG

        def stepR(i, _):
            # rank-R pivot step: factor the R x R pivot block by an
            # unrolled micro-Cholesky on (B,1,BS) row vectors and emit R
            # rows of U and Y per serial iteration — the per-step fixed
            # cost (row slices, masks, rsqrt dispatch, loop carry)
            # dominates the serial chain, so cutting the step count
            # R-fold is the main lever (ROADMAP r3 #1; strip update
            # volume unchanged, now a rank-R dot_general).
            j = lo + PR * i
            rows = dref[:, pl.ds(j, PR), :]              # (B,PR,BS)
            acc = aref[:, pl.ds(j, PR), :]
            us, ys = [], []
            for k in range(PR):
                rk = rows[:, k:k + 1, :]                 # (B,1,BS)
                yk = jnp.where(lanes == j + k, one, zero) - \
                    acc[:, k:k + 1, :]
                for m_ in range(k):
                    # L[j+k, j+m] = lane (j+k) of u_m — corrects for the
                    # in-step pivots not yet reflected in dref/aref
                    coef = jnp.sum(jnp.where(lanes == j + k, us[m_],
                                             zero), axis=2,
                                   keepdims=True)        # (B,1,1)
                    rk = rk - coef * us[m_]
                    yk = yk - coef * ys[m_]
                piv = jnp.sum(jnp.where(lanes == j + k, rk, zero),
                              axis=2, keepdims=True)
                rs = jax.lax.rsqrt(piv)
                us.append(jnp.where(lanes >= j + k, rk * rs, zero))
                ys.append(yk * rs)
            U = jnp.concatenate(us, axis=1)              # (B,PR,BS)
            Y = jnp.concatenate(ys, axis=1)
            uref[:, pl.ds(j, PR), :] = U
            yref[:, pl.ds(j, PR), :] = Y
            # rank-PR strip updates; rows < j of U are exactly zero
            # (masked), so already-processed strip rows are untouched
            Uc = jnp.swapaxes(U, 1, 2)[:, lo:hi, :]      # (B,SEG,PR)
            dims2 = (((2,), (1,)), ((0,), (0,)))
            aref[:, lo:hi, :] = aref[:, lo:hi, :] + jax.lax.dot_general(
                Uc, Y, dimension_numbers=dims2,
                preferred_element_type=jnp.float32)
            dref[:, lo:hi, :] = dref[:, lo:hi, :] - jax.lax.dot_general(
                Uc, U, dimension_numbers=dims2,
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(SEG // PR), stepR, 0)

        if hi < BS:
            # rank-32 propagation to rows [hi, BS): one batched MXU
            # matmul each for the factorization and the inverse
            Useg = uref[:, lo:hi, :]                     # (B,SEG,BS)
            Yseg = yref[:, lo:hi, :]                     # (B,SEG,BS)
            Utail = Useg[:, :, hi:]                      # (B,SEG,BS-hi)
            dims = (((1,), (1,)), ((0,), (0,)))
            upd = jax.lax.dot_general(
                Utail, Useg, dimension_numbers=dims,
                preferred_element_type=jnp.float32)      # (B,BS-hi,BS)
            dref[:, hi:, :] = dref[:, hi:, :] - upd
            aupd = jax.lax.dot_general(
                Utail, Yseg, dimension_numbers=dims,
                preferred_element_type=jnp.float32)
            aref[:, hi:, :] = aref[:, hi:, :] + aupd


def _chol_ls_kernel(nb, B, G, a_hbm, o_hbm, dinv_hbm, pbuf, cbuf, dbuf,
                    ubuf, ybuf, abuf, psems, csems, dsem):
    """Single-program lockstep kernel.  a_hbm: (B,n,n) input; o_hbm:
    (B,n,n) factor workspace/output; dinv_hbm: (nb,B,BS,BS) block
    inverses.  The workspace holds partially-updated trailing columns
    of every matrix from panel 1 on (panel 0 reads the input).

    Phase 3 processes matrices in groups of G: one strided DMA gathers
    a whole group's panel/column blocks and one batched dot_general
    updates them, cutting DMA/matmul dispatch count G-fold vs.
    per-matrix streaming."""
    n = nb * BS

    def gpanel_cp(src, gs, cb, slot):
        # live rows only: [cb, n) of column block cb, whole group
        return pltpu.make_async_copy(
            src.at[gs:gs + G, cb:, cb:cb + BS],
            pbuf.at[jnp.int32(slot), :, :n - cb, :],
            psems.at[jnp.int32(slot)])

    def gcol_cp(src, gs, cb, slot):
        return pltpu.make_async_copy(
            src.at[gs:gs + G, cb:, cb:cb + BS],
            cbuf.at[jnp.int32(slot), :, :n - cb, :],
            csems.at[jnp.int32(slot)])

    dims_bt = (((2,), (2,)), ((0,), (0,)))   # batched X @ Y^T
    dims_std = (((2,), (1,)), ((0,), (0,)))  # batched X @ Y (MXU-native)
    # contract against an explicitly pre-transposed SMALL operand in the
    # canonical (m,k)@(k,n) form instead of X @ Y^T: lane-lane
    # contractions can make Mosaic transpose the large operand
    TT = _os.environ.get("KVX_CHOL_TT", "0") == "1"

    for kb in range(nb):
        base = kb * BS
        src = a_hbm if kb == 0 else o_hbm

        # ---- 1. gather the B diagonal blocks (one strided DMA) ------
        dcp = pltpu.make_async_copy(
            src.at[:, base:base + BS, base:base + BS], dbuf, dsem)
        dcp.start()
        dcp.wait()

        # ---- 2. fused lockstep factor + inverse ---------------------
        if STATIC_STEPS:
            _panel_factor_inverse_static(dbuf, ubuf, ybuf, abuf, B)
        else:
            _panel_factor_inverse(dbuf, ubuf, ybuf, abuf, B)
        ycp = pltpu.make_async_copy(ybuf, dinv_hbm.at[jnp.int32(kb)], dsem)
        ycp.start()
        L11 = jnp.swapaxes(ubuf[...], 1, 2)  # (B,BS,BS) lower
        ycp.wait()

        # ---- 3. group-batched panel + trailing ----------------------
        # Only rows >= the column block are ever read downstream (the
        # diagonal-block DMA, the panel transform, and the final tril
        # all ignore the strictly-upper region), so every DMA and
        # matmul is restricted to them.
        nr = n - base                       # live rows of this panel
        ngroups = B // G
        gpanel_cp(src, 0, base, 0).start()
        for g in range(ngroups):
            gs = g * G
            ps = g % 2
            gpanel_cp(src, gs, base, ps).wait()
            if g + 1 < ngroups:
                gpanel_cp(src, gs + G, base, (g + 1) % 2).start()

            # panel transform: L[kb:, kb] = P @ L11^{-T} = P @ Y'
            P = pbuf[ps, :, :nr, :]                        # (G,nr,BS)
            if TT:
                Yt = jnp.swapaxes(ybuf[gs:gs + G], 1, 2)   # (G,BS,BS)
                L = jax.lax.dot_general(
                    P, Yt, dimension_numbers=dims_std,
                    preferred_element_type=jnp.float32)
            else:
                L = jax.lax.dot_general(
                    P, ybuf[gs:gs + G], dimension_numbers=dims_bt,
                    preferred_element_type=jnp.float32)    # (G,nr,BS)
            pbuf[ps, :, :nr, :] = L
            pbuf[ps, :, :BS, :] = L11[gs:gs + G]  # diagonal band
            L = pbuf[ps, :, :nr, :]
            wb = pltpu.make_async_copy(
                pbuf.at[jnp.int32(ps), :, :nr, :],
                o_hbm.at[gs:gs + G, base:, base:base + BS],
                psems.at[jnp.int32(ps)])
            wb.start()

            # trailing updates: C_jb[cb:, :] -= L[cb:, :] @ L[jb-band]'
            # Write-backs stay in flight; a slot's write is only waited
            # when the slot is about to be refilled (or at loop exit).
            if kb + 1 < nb:
                gcol_cp(src, gs, (kb + 1) * BS, 0).start()
            pending = [None, None]          # per-slot in-flight write
            for jb in range(kb + 1, nb):
                cs = (jb - kb - 1) % 2
                cb = jb * BS
                lo = cb - base              # local row of block jb
                gcol_cp(src, gs, cb, cs).wait()
                if jb + 1 < nb:
                    ns = (jb - kb) % 2
                    if pending[ns] is not None:
                        pending[ns].wait()
                        pending[ns] = None
                    gcol_cp(src, gs, (jb + 1) * BS, ns).start()
                Lsub = L[:, lo:, :]                        # (G,n-cb,BS)
                Ljb = L[:, lo:lo + BS, :]                  # (G,BS,BS)
                if TT:
                    Ljt = jnp.swapaxes(Ljb, 1, 2)
                    upd = jax.lax.dot_general(
                        Lsub, Ljt, dimension_numbers=dims_std,
                        preferred_element_type=jnp.float32)
                else:
                    upd = jax.lax.dot_general(
                        Lsub, Ljb, dimension_numbers=dims_bt,
                        preferred_element_type=jnp.float32)  # (G,n-cb,BS)
                cbuf[cs, :, :n - cb, :] = cbuf[cs, :, :n - cb, :] - upd
                wcp = pltpu.make_async_copy(
                    cbuf.at[jnp.int32(cs), :, :n - cb, :],
                    o_hbm.at[gs:gs + G, cb:, cb:cb + BS],
                    csems.at[jnp.int32(cs)])
                wcp.start()
                pending[cs] = wcp
            for p in pending:
                if p is not None:
                    p.wait()
            wb.wait()


def cholesky_ls_available():
    return jax.default_backend() != "cpu"


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_cholesky_ls(A, interpret=False):
    """Lower Cholesky factors of a batch of SPD matrices (B,n,n) f32,
    plus the per-panel diagonal-block inverses (nb,B,128,128) consumed
    by the fused triangular-solve kernel.  Returns (L, Dinv)."""
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

    # widest group that fits the double-buffered panel+column strips in
    # VMEM (2 slots x 2 buffers x G x npad x BS x 4B <= 64MB).  G=16 at
    # n=1024 measured neutral vs G=8 (the strips are DMA-overlapped
    # either way — BENCHNOTES r4), so 8 stays the cap; the VMEM budget
    # matters for large npad where the old fixed choice could overflow.
    G = next((g for g in (8, 4, 2, 1)
              if B % g == 0 and 16 * g * npad * BS <= 64 * 1024 * 1024),
             None)
    if G is None:
        raise ValueError(
            f"batched_cholesky_ls: padded size n={npad} too large for "
            f"the VMEM strip budget even ungrouped (needs 16*{npad}*{BS}"
            f" <= 64MB, i.e. n <= {64 * 1024 * 1024 // (16 * BS)})")
    kernel = functools.partial(_chol_ls_kernel, nb, B, G)
    L, Dinv = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[jax.ShapeDtypeStruct((B, npad, npad), A.dtype),
                   jax.ShapeDtypeStruct((nb, B, BS, BS), A.dtype)],
        scratch_shapes=[pltpu.VMEM((2, G, npad, BS), jnp.float32),
                        pltpu.VMEM((2, G, npad, BS), jnp.float32),
                        pltpu.VMEM((B, BS, BS), jnp.float32),
                        pltpu.VMEM((B, BS, BS), jnp.float32),
                        pltpu.VMEM((B, BS, BS), jnp.float32),
                        pltpu.VMEM((B, BS, BS), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=B * npad ** 3 // 3,
            bytes_accessed=3 * B * npad * npad * 4,
            transcendentals=B * npad),
    )(Ap)
    if npad != n:
        L = L[:, :n, :n]
    return jnp.tril(L), Dinv


def _fwd_sweep(nb, l_hbm, dinv_hbm, fbuf, dbuf, zbuf, bsem, dsem):
    """Forward substitution z <- L^{-1} z in place on the (B,k,n)
    lane-oriented zbuf: z_i = Yii (b_i - sum_{j<i} L_ij z_j)."""
    n = nb * BS
    for i in range(nb):
        bi = i * BS
        dcp = pltpu.make_async_copy(dinv_hbm.at[jnp.int32(i)], dbuf,
                                    dsem)
        dcp.start()
        if bi > 0:
            fcp = pltpu.make_async_copy(
                l_hbm.at[:, bi:bi + BS, :bi], fbuf.at[:, :, :bi], bsem)
            fcp.start()
        acc = zbuf[:, :, bi:bi + BS]                     # (B,k,BS)
        if bi > 0:
            fcp.wait()
            band = fbuf[:, :, :bi]                       # (B,BS,bi)
            acc = acc - jax.lax.dot_general(
                zbuf[:, :, :bi], band,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # (B,k,BS)
        dcp.wait()
        # z_i = Yii @ acc'  (lane-oriented result)
        zbuf[:, :, bi:bi + BS] = jax.lax.dot_general(
            acc, dbuf[...],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)


def _bwd_sweep(nb, l_hbm, dinv_hbm, bbuf, dbuf, zbuf, bsem, dsem):
    """Backward substitution z <- L^{-T} z in place on the (B,k,n)
    zbuf: x_i = Yii' (z_i - sum_{j>i} L_ji' x_j)."""
    n = nb * BS
    for i in range(nb - 1, -1, -1):
        bi = i * BS
        hi = bi + BS
        dcp = pltpu.make_async_copy(dinv_hbm.at[jnp.int32(i)], dbuf,
                                    dsem)
        dcp.start()
        if hi < n:
            bcp = pltpu.make_async_copy(
                l_hbm.at[:, hi:, bi:bi + BS], bbuf.at[:, :n - hi, :],
                bsem)
            bcp.start()
        acc = zbuf[:, :, bi:bi + BS]
        if hi < n:
            bcp.wait()
            band = bbuf[:, :n - hi, :]                   # (B,n-hi,BS)
            acc = acc - jax.lax.dot_general(
                zbuf[:, :, hi:], band,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        dcp.wait()
        # x_i = Yii' @ acc'
        zbuf[:, :, bi:bi + BS] = jax.lax.dot_general(
            acc, dbuf[...],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)


def _solve_kernel(nb, B, k, l_hbm, dinv_hbm, b_hbm, x_hbm, fbuf, bbuf,
                  dbuf, zbuf, bsem, dsem):
    """Fused forward+backward substitution for L L' X = B using the
    factor kernel's per-panel diagonal-block inverses: every block step
    is one band DMA + one batched MXU matmul + one (B,k,128) @ inverse
    matmul — no per-solve re-inversion (XLA's triangular_solve expander
    re-inverts diagonal blocks on every call).

    RHS layout is (B,k,n) so each 128-block of the solution vector is a
    lane-oriented (B,k,128) tile; contraction against row/column bands
    of L happens via dot_general without any transposes."""
    zin = pltpu.make_async_copy(b_hbm, zbuf, bsem)
    zin.start()
    zin.wait()
    _fwd_sweep(nb, l_hbm, dinv_hbm, fbuf, dbuf, zbuf, bsem, dsem)
    _bwd_sweep(nb, l_hbm, dinv_hbm, bbuf, dbuf, zbuf, bsem, dsem)
    zout = pltpu.make_async_copy(zbuf, x_hbm, bsem)
    zout.start()
    zout.wait()


def _tri_kernel(nb, B, k, trans, l_hbm, dinv_hbm, b_hbm, x_hbm, tbuf,
                dbuf, zbuf, bsem, dsem):
    """Single-sweep triangular solve: L X = B (trans=False) or
    L' X = B (trans=True), same band-DMA + MXU-matmul structure as
    `_solve_kernel` but only one sweep — the n-RHS building block for
    factor refinement (kkt._mixed_core) where XLA's per-lane
    triangular-solve expander was the vmap regression (VERDICT r4 #4)."""
    zin = pltpu.make_async_copy(b_hbm, zbuf, bsem)
    zin.start()
    zin.wait()
    if trans:
        _bwd_sweep(nb, l_hbm, dinv_hbm, tbuf, dbuf, zbuf, bsem, dsem)
    else:
        _fwd_sweep(nb, l_hbm, dinv_hbm, tbuf, dbuf, zbuf, bsem, dsem)
    zout = pltpu.make_async_copy(zbuf, x_hbm, bsem)
    zout.start()
    zout.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_solve_ls(L, Dinv, rhs, interpret=False):
    """Solve L L' X = rhs given batched_cholesky_ls output.  rhs:
    (B,n) or (B,n,k); returns the same shape."""
    B, n, _ = L.shape
    nb = Dinv.shape[0]
    npad = nb * BS
    vec = rhs.ndim == 2
    r3 = rhs[:, :, None] if vec else rhs
    k = r3.shape[2]
    rT = jnp.swapaxes(r3, 1, 2)                          # (B,k,n)
    if npad != n:
        rT = jnp.concatenate(
            [rT, jnp.zeros((B, k, npad - n), rT.dtype)], axis=2)
        Lp = jnp.zeros((B, npad, npad), L.dtype)
        Lp = Lp.at[:, :n, :n].set(L)
        idx = jnp.arange(n, npad)
        Lp = Lp.at[:, idx, idx].set(1.0)
    else:
        Lp = L

    kernel = functools.partial(_solve_kernel, nb, B, k)
    xT = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, k, npad), rT.dtype),
        scratch_shapes=[pltpu.VMEM((B, BS, npad), jnp.float32),
                        pltpu.VMEM((B, npad, BS), jnp.float32),
                        pltpu.VMEM((B, BS, BS), jnp.float32),
                        pltpu.VMEM((B, k, npad), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * npad * npad * k,
            bytes_accessed=B * npad * npad * 4,
            transcendentals=0),
    )(Lp, Dinv, rT)
    x = jnp.swapaxes(xT[:, :, :n], 1, 2)
    return x[:, :, 0] if vec else x


def _tri_chunk(Lp, Dinv, rT, trans, nb, interpret):
    """One pallas_call of the single-sweep kernel on a (B,kc,npad)
    lane-oriented RHS chunk."""
    B, kc, npad = rT.shape
    kernel = functools.partial(_tri_kernel, nb, B, kc, trans)
    tshape = (B, npad, BS) if trans else (B, BS, npad)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, kc, npad), rT.dtype),
        scratch_shapes=[pltpu.VMEM(tshape, jnp.float32),
                        pltpu.VMEM((B, BS, BS), jnp.float32),
                        pltpu.VMEM((B, kc, npad), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=B * npad * npad * kc,
            bytes_accessed=B * npad * npad * 2,
            transcendentals=0),
    )(Lp, Dinv, rT)


@functools.partial(jax.jit, static_argnames=("trans", "interpret"))
def tri_solve_ls(L, Dinv, rhs, trans=False, interpret=False):
    """Batched n-RHS triangular solve against the Pallas factor:
    solves L X = rhs (trans=False) or L' X = rhs (trans=True) for
    rhs (B,n) or (B,n,k) given batched_cholesky_ls output.

    Wide RHS blocks (k up to n, the factor-refinement shape) are
    chunked along k so the (B,kc,npad) working tile fits VMEM; every
    chunk re-streams the relevant half of L (band DMAs), which at
    ~900 GB/s is cheap next to XLA's per-lane expander."""
    B, n, _ = L.shape
    nb = Dinv.shape[0]
    npad = nb * BS
    vec = rhs.ndim == 2
    r3 = rhs[:, :, None] if vec else rhs
    k = r3.shape[2]
    rT = jnp.swapaxes(r3, 1, 2)                          # (B,k,n)
    if npad != n:
        rT = jnp.concatenate(
            [rT, jnp.zeros((B, k, npad - n), rT.dtype)], axis=2)
        Lp = jnp.zeros((B, npad, npad), L.dtype)
        Lp = Lp.at[:, :n, :n].set(L)
        idx = jnp.arange(n, npad)
        Lp = Lp.at[:, idx, idx].set(1.0)
    else:
        Lp = L

    # chunk k so zbuf (B,kc,npad) stays within ~24MB of VMEM
    kc_max = max(BS, (24 * 1024 * 1024) // (B * npad * 4) // BS * BS)
    if k <= kc_max:
        xT = _tri_chunk(Lp, Dinv, rT, trans, nb, interpret)
    else:
        nchunk = -(-k // kc_max)
        kpad = nchunk * kc_max
        if kpad != k:
            rT = jnp.concatenate(
                [rT, jnp.zeros((B, kpad - k, npad), rT.dtype)], axis=1)
        outs = [_tri_chunk(Lp, Dinv,
                           rT[:, c * kc_max:(c + 1) * kc_max, :],
                           trans, nb, interpret)
                for c in range(nchunk)]
        xT = jnp.concatenate(outs, axis=1)[:, :k, :]
    x = jnp.swapaxes(xT[:, :, :n], 1, 2)
    return x[:, :, 0] if vec else x
