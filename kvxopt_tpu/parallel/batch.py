"""Scenario batching: solve many cone QPs at once.

The TPU analogue of the reference's 'run many CPU solves' workload
(BASELINE.json config 'ACTIVSg2000 scenario batch').  A batch of problem
instances with identical shapes is solved by one jitted program: vmap over
the pure coneqp core, optionally pjit-sharded over a 'batch' mesh axis so
scenarios spread across chips with zero communication.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import kkt
from ..cones import ConeDims
from ..solvers.coneprog import Options, _coneqp_core


def make_mesh(n_devices=None, axis_names=("batch",), shape=None):
    """A 1D (or reshaped) mesh over the available devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    arr = np.array(devs)
    if shape is not None:
        arr = arr.reshape(shape)
    return Mesh(arr, axis_names)


def make_qp_solver(dims, kktsolver=None, options=None, with_eq=False):
    """Returns a pure function solve(P, q, G, h[, A, b]) -> state tuple
    (x, y, s, z, iterations, status, metrics) suitable for jit / vmap.

    dims and options are static; the KKT factorization strategy defaults to
    'chol' with q/s cones, 'chol2' otherwise (the reference coneqp default,
    coneprog.py:1805-1809).
    """
    dims = ConeDims.from_dict(dims)
    o = options if isinstance(options, Options) else Options(
        **(options or {}))
    if kktsolver is None:
        kktsolver = "chol" if (dims.q or dims.s) else "chol2"
    o = o.resolve_refinement(dims, kktsolver)

    def solve(P, q, G, h, A=None, b=None):
        dtype = q.dtype
        # cast everything to q's dtype: a single float64 operand (easy
        # to produce via numpy promotion, e.g. f32_array / np.sqrt(n))
        # would otherwise leak f64 into the jitted iteration and fail
        # deep inside a lax.cond with mismatched branch dtypes
        P, G, h = (jnp.asarray(a, dtype) for a in (P, G, h))
        if A is None:
            A = jnp.zeros((0, q.shape[0]), dtype)
            b = jnp.zeros((0,), dtype)
        else:
            A = jnp.asarray(A, dtype)
            b = jnp.asarray(b, dtype)
        factor = kkt.make_kkt_solver(kktsolver, dims, G, A, P,
                                     reg=o.kktreg, ozaki=o.ozaki,
                                     facref=o.facref)
        gmv = lambda v, trans=False: (G.T @ v if trans else G @ v)
        amv = lambda v, trans=False: (A.T @ v if trans else A @ v)
        pmv = lambda v: P @ v
        return _coneqp_core(P, q, G, h, A, b, None, dims, o, factor,
                            gmv, amv, pmv, dtype)

    return solve


def make_lp_solver(dims, kktsolver=None, options=None):
    """Pure function solve(c, G, h[, A, b]) -> conelp state tuple
    (x, y, s, z, tau, kappa, iterations, status, metrics) for jit/vmap —
    the conelp analogue of make_qp_solver."""
    from ..solvers._conelp import _conelp_core
    dims = ConeDims.from_dict(dims)
    o = options if isinstance(options, Options) else Options(
        **(options or {}))
    if kktsolver is None:
        kktsolver = "qr" if (dims.q or dims.s) else "chol2"
    o = o.resolve_refinement(dims, kktsolver)

    def solve(c, G, h, A=None, b=None):
        dtype = c.dtype
        if A is None:
            A = jnp.zeros((0, c.shape[0]), dtype)
            b = jnp.zeros((0,), dtype)
        factor = kkt.make_kkt_solver(kktsolver, dims, G, A, None,
                                     reg=o.kktreg, ozaki=o.ozaki,
                                     facref=o.facref)
        gmv = lambda v, trans=False: (G.T @ v if trans else G @ v)
        amv = lambda v, trans=False: (A.T @ v if trans else A @ v)
        return _conelp_core(c, G, h, A, b, dims, o, factor, gmv, amv,
                            dtype, None, None)

    return solve


def _dispatched_batch(jitted, nargs_for_n, kktsolver=None):
    """Wrap a jitted batched solver with call-time executor dispatch:
    when the per-instance KKT size is below config.host_dispatch_threshold
    the whole batch runs on the host XLA backend (one compiled vmapped
    program there beats both the emulated-f64 TPU path and the
    reference's sequential CPU solves — BENCHNOTES round 4); at
    accelerator scale the call runs wherever its inputs live.

    Mixed-precision strategies never host-dispatch: their f32
    factorizations exist to ride the MXU, and the host executor would
    run the f32 factor + refinement loop slower than its own f64
    Cholesky."""
    from .. import config
    mixed = isinstance(kktsolver, str) and "mixed" in kktsolver

    def solve(*args):
        n = args[nargs_for_n].shape[-1]
        dev = None if mixed else config.dispatch_device_batched(int(n))
        if dev is None:
            return jitted(*args)
        # only already-committed device arrays need an explicit move;
        # host (numpy) inputs are placed by default_device for free —
        # the unconditional device_put cost ~9% of a B=64 n=16 batch
        args = tuple(jax.device_put(a, dev)
                     if isinstance(a, jax.Array) and a.committed
                     else a for a in args)
        with jax.default_device(dev):
            return jitted(*args)

    return solve


def _vmap_facref(options):
    """Size-aware factor refinement for VMAPPED drivers: the 'vmap'
    sentinel makes _kkt_chol2_mixed enable it exactly when the Pallas
    n-RHS substitution kernel will collapse the setup's two triangular
    solves (n >= 256 f32 on an accelerator, ops/ipm_chol.py).  With the
    kernel the B=16 n=256 two-pass workload measures FASTER with
    refinement on (5.7 vs 5.3 solves/s, r5 chip session); below the
    kernel threshold XLA's per-lane expander regression (BENCHNOTES r4:
    2-5x) still applies, so those sizes stay off.  Explicit True/False
    still wins."""
    o = options if isinstance(options, Options) else Options(
        **(options or {}))
    return o._replace(facref="vmap") if o.facref is None else o


def batched_lp_solver(dims, kktsolver=None, options=None, mesh=None):
    """vmap (optionally pjit over mesh axis 'batch') of make_lp_solver."""
    solve_one = make_lp_solver(dims, kktsolver, _vmap_facref(options))
    vsolve = jax.vmap(solve_one)
    if mesh is None:
        return _dispatched_batch(jax.jit(vsolve), 0, kktsolver)
    shard = NamedSharding(mesh, P("batch"))
    return jax.jit(vsolve, in_shardings=(shard,) * 3)


def batched_qp_solver_mixed(dims, options=None, mesh=None, with_eq=False):
    """Two-pass batched mixed-precision QP driver (host-orchestrated).

    Pass 1 solves every lane in one vmapped program with the
    'chol2_mixed_nofb' KKT strategy: float32 MXU factorizations plus
    float64 operator-form iterative refinement, with NO per-lane f64
    fallback — under vmap `lax.cond` lowers to a select, so the fallback
    branch of plain 'chol2_mixed' executes (and pays the emulated-f64
    factorization) for every lane, which is why the round-2 vmapped
    mixed path lost to the all-f64 one (BENCHNOTES round 2).

    Lanes whose pass-1 status is not 'optimal' (rare: the refinement
    stalls only when cond(K) approaches 1/eps_f32) are re-solved on the
    host side with the all-f64 batched path, padded to power-of-two
    sub-batch sizes so repeat calls reuse at most log2(B) compiled
    programs.

    Returns solve(P, q, G, h) -> (x, y, s, z, iterations, status,
    metrics) with numpy-backed leaves (host orchestration fetches them
    anyway)."""
    from ..solvers.coneprog import OPTIMAL
    # force the exact-split refinement matvec for the vmapped fast pass:
    # the batch lanes amortize the slice matmuls on the MXU (measured
    # ~2x over emulated-f64 matvecs at B=16 n=256 — BENCHNOTES r4);
    # explicit options still win
    o = options if isinstance(options, Options) else Options(
        **(options or {}))
    if o.ozaki is None:
        o = o._replace(ozaki=True)
    fast = batched_qp_solver(dims, "chol2_mixed_nofb", o, mesh,
                             with_eq)
    slow_cache = {}

    def _slow(k):
        if k not in slow_cache:
            slow_cache[k] = batched_qp_solver(dims, "chol2", options,
                                              None, with_eq)
        return slow_cache[k]

    def solve(P, q, G, h, *ab):
        out_t = fast(P, q, G, h, *ab)
        flat, treedef = jax.tree_util.tree_flatten(out_t)
        out = jax.tree_util.tree_unflatten(
            treedef, [np.asarray(o) for o in flat])
        status = np.asarray(out[5])
        bad = np.nonzero(status != OPTIMAL)[0]
        if bad.size == 0:
            return out
        k = 1 << (int(bad.size) - 1).bit_length()   # next power of two
        idx = np.concatenate([bad, np.repeat(bad[:1], k - bad.size)])
        sub = [np.asarray(a)[idx] for a in (P, q, G, h, *ab)]
        sout = _slow(k)(*[jnp.asarray(a) for a in sub])
        sflat, streedef = jax.tree_util.tree_flatten(sout)
        sflat = [np.asarray(o) for o in sflat]
        oflat, otreedef = jax.tree_util.tree_flatten(out)
        for i, (o, s) in enumerate(zip(oflat, sflat)):
            o = np.array(o)
            o[bad] = s[: bad.size]
            oflat[i] = o
        return jax.tree_util.tree_unflatten(otreedef, oflat)

    return solve


def batched_qp_solver_seq(dims, kktsolver="chol2_mixed", options=None,
                          with_eq=False, group=1):
    """Sequentially-mapped batch driver: `lax.map` of the
    single-instance solve instead of `vmap`.

    Under vmap every lane pays the batch's WORST-CASE iteration and
    refinement counts (while_loops run until all lanes' conds are
    false, and `lax.cond` lowers to a select so both branches execute)
    — measured on chip, the vmapped mixed path loses ~4x of its
    single-instance throughput at n>=512 (BENCHNOTES r4 crossover
    table).  `lax.map` keeps each instance's own trip counts AND a
    real cond, so the per-instance f64-factor fallback of plain
    'chol2_mixed' works — no two-pass host orchestration needed.  Use
    this for accelerator batches of LARGE instances; use
    `batched_qp_solver`/`_mixed` for small-instance batches (which the
    executor dispatch sends to the host anyway).

    `group` > 1 pipelines that many instances per map step (vmap inside
    lax.map); the f64-factor fallback stays a REAL cond at group
    granularity (`kkt.cond_any` guards it on any(lane bad)).  Measured
    on chip at B=8-16 n=512 (BENCHNOTES r5): g=2 is throughput-neutral
    vs g=1 (~2.4-2.6 solves/s either way — the per-iteration wall at
    this size is f64 refinement work, not MXU occupancy; the exact-split
    ozaki matvec buys ~8% at g=2 and is defaulted on for groups), and
    g>=4 inherits the vmapped-mixed lockstep fragility on hard
    late-stage iterates (lanes can hit the non-finite-step exit).  Keep
    the default group=1 for production; the knob exists for
    experiments."""
    if group > 1:
        # grouped lanes amortize the ozaki slice matmuls (measured
        # 2.56-2.61 vs 2.35-2.39 solves/s at g=2 n=512, BENCHNOTES r5)
        o = options if isinstance(options, Options) else Options(
            **(options or {}))
        if o.ozaki is None:
            options = o._replace(ozaki=True)
    solve_one = make_qp_solver(dims, kktsolver, options, with_eq)

    if group == 1:
        @jax.jit
        def solve(P, q, G, h, *ab):
            args = (P, q, G, h) + ab
            return jax.lax.map(lambda a: solve_one(*a), args)

        return solve

    gsolve = jax.vmap(solve_one)

    @jax.jit
    def solve(P, q, G, h, *ab):
        args = (P, q, G, h) + ab
        B = q.shape[0]
        if B % group:
            raise ValueError(f"batch {B} not divisible by group {group}")
        gargs = tuple(a.reshape((B // group, group) + a.shape[1:])
                      for a in args)
        out = jax.lax.map(lambda a: gsolve(*a), gargs)
        return jax.tree_util.tree_map(
            lambda a: a.reshape((B,) + a.shape[2:]), out)

    return solve


def batched_qp_solver(dims, kktsolver=None, options=None, mesh=None,
                      with_eq=False):
    """vmap (and optionally pjit over mesh axis 'batch') of
    make_qp_solver: solve(P[B], q[B], G[B], h[B]) -> batched state."""
    solve_one = make_qp_solver(dims, kktsolver, _vmap_facref(options),
                               with_eq)
    vsolve = jax.vmap(solve_one)
    if mesh is None:
        return _dispatched_batch(jax.jit(vsolve), 1, kktsolver)
    spec = P("batch")
    shard = NamedSharding(mesh, spec)
    return jax.jit(vsolve, in_shardings=(shard,) * 4,
                   out_shardings=None)
