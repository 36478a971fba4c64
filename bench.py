"""Benchmark: batched KKT factorize+solve throughput on TPU vs CPU.

The north-star metric (BASELINE.json): KKT factorize+solve ms/iter and
per-chip KKT-factorization throughput vs CHOLMOD/LAPACK-on-CPU.  Each IPM
iteration's dominant cost is one Cholesky factorization of the condensed
KKT matrix plus two triangular solves (reference misc.py:1352 kkt_chol2 /
lapack.potrf); the TPU-native design batches many such factorizations
(scenario batching) onto the MXU with vmap.

Measurement notes: data is freshly drawn each run and every call gets a
unique scale factor (the axon relay dedupes repeated identical
executions); throughput is steady-state over a pipelined loop, which
amortizes the ~30 ms relay round-trip latency.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = batched KKT factorize+solve throughput (factorizations/s/chip)
vs_baseline = value / scipy-LAPACK-on-CPU throughput on identical problems.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import cho_factor, cho_solve

    B, n = 16, 1024  # batch of condensed-KKT-sized SPD systems
    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    # diagonally dominant symmetric matrices: SPD with O(n^2) setup cost
    A = rng.standard_normal((B, n, n)).astype(np.float32)
    Ks = 0.5 * (A + A.transpose(0, 2, 1)) + (2.0 * n) * np.eye(
        n, dtype=np.float32)[None]
    bs = rng.standard_normal((B, n)).astype(np.float32)

    Kd = jnp.asarray(Ks)
    bd = jnp.asarray(bs)

    @jax.jit
    def step(K, b, scale):
        def one(Ki, bi):
            c = cho_factor(Ki * scale, lower=True)
            x1 = cho_solve(c, bi)
            x2 = cho_solve(c, x1)
            return x2
        return jax.vmap(one)(K, b)

    # warmup/compile
    step(Kd, bd, jnp.float32(1.0)).block_until_ready()
    # several measurement rounds; report the median (the relay's load
    # makes individual rounds fluctuate)
    iters, rounds = 20, 3
    times = []
    k = 0
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            k += 1
            out = step(Kd, bd, jnp.float32(1.0 + 1e-6 * k))
        out.block_until_ready()
        times.append((time.perf_counter() - t0) / iters)
    tpu_time = sorted(times)[rounds // 2]
    tpu_thr = B / tpu_time  # factorize+solve per second

    # correctness spot check
    x = np.asarray(out[0], dtype=np.float64)
    r = Ks[0].astype(np.float64) @ (Ks[0].astype(np.float64) @ x) - bs[0]
    assert np.linalg.norm(r) / np.linalg.norm(bs[0]) < 1e-2, "bad solve"

    # CPU baseline: LAPACK (scipy) on the same problems, float64 as the
    # reference uses (kvxopt is a float64 library)
    import scipy.linalg as sla
    K64 = Ks.astype(np.float64)
    b64 = bs.astype(np.float64)
    c = sla.cho_factor(K64[0], lower=True)
    sla.cho_solve(c, b64[0])
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        for i in range(B):
            c = sla.cho_factor(K64[i], lower=True)
            x1 = sla.cho_solve(c, b64[i])
            sla.cho_solve(c, x1)
    t1 = time.perf_counter()
    cpu_time = (t1 - t0) / reps
    cpu_thr = B / cpu_time

    print(json.dumps({
        "metric": "batched KKT factorize+solve throughput (n=1024, B=16)",
        "value": round(tpu_thr, 2),
        "unit": "factorizations/s",
        "vs_baseline": round(tpu_thr / cpu_thr, 2),
    }))


if __name__ == "__main__":
    main()
