"""Benchmark: batched KKT factorize+solve throughput on TPU vs CPU.

The north-star metric (BASELINE.json): KKT factorize+solve ms/iter and
per-chip KKT-factorization throughput vs CHOLMOD/LAPACK-on-CPU.  Each IPM
iteration's dominant cost is one Cholesky factorization of the condensed
KKT matrix plus two triangular solves (reference misc.py:1352 kkt_chol2 /
lapack.potrf); the TPU-native design batches many such factorizations
(scenario batching) onto the MXU with vmap.

Measurement methodology (important on the axon relay): host-side timing
of individual dispatches is unreliable — unfetched executions are not
guaranteed to have run, and every fetched call pays a ~30-40 ms relay
round trip.  The only trustworthy measurement is the SLOPE method: run
the whole repetition loop on device as one executable (lax.scan with a
data dependency between iterations so nothing can be elided), fetch one
scalar, and difference two loop lengths to cancel the fixed relay +
dispatch cost.  Each scan iteration perturbs the matrix so iterations
are genuinely distinct work.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = batched KKT factorize+solve throughput (factorizations/s/chip)
vs_baseline = value / scipy-LAPACK-on-CPU throughput on identical problems.
"""

import functools
import json
import os
import time

import numpy as np

B, N = 16, 1024  # batch of condensed-KKT-sized SPD systems


def tpu_seconds_per_batch():
    import jax
    import jax.numpy as jnp

    from kvxopt_tpu.ops import best_chol_factor_solve

    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    A = rng.standard_normal((B, N, N)).astype(np.float32)
    Ks = 0.5 * (A + A.transpose(0, 2, 1)) + (2.0 * N) * np.eye(
        N, dtype=np.float32)[None]
    bs = rng.standard_normal((B, N)).astype(np.float32)
    Kd, bd = jnp.asarray(Ks), jnp.asarray(bs)
    eye = jnp.eye(N, dtype=jnp.float32)

    @functools.partial(jax.jit, static_argnames=("m",))
    def many(K, b, m):
        def body(carry, _):
            s, x = carry
            Kp = K + (s * 1e-9)[None, None, None] * eye
            f, solve = best_chol_factor_solve(Kp)
            x2 = solve(f, solve(f, x))
            return (jnp.sum(x2) * 1e-9, x2), None
        (s, x), _ = jax.lax.scan(body, (jnp.float32(0.0), b), None,
                                 length=m)
        return s, x

    # correctness spot check on the m=1 result
    s, x = many(Kd, bd, 1)
    xh = np.asarray(x[0], dtype=np.float64)
    r = Ks[0].astype(np.float64) @ (Ks[0].astype(np.float64) @ xh) - bs[0]
    assert np.linalg.norm(r) / np.linalg.norm(bs[0]) < 1e-2, "bad solve"

    def run(m):
        t0 = time.perf_counter()
        float(many(Kd, bd, m)[0])
        return time.perf_counter() - t0

    m_lo, m_hi = 2, 18
    run(m_lo); run(m_hi)  # compile both lengths
    per = []
    for _ in range(3):
        per.append((run(m_hi) - run(m_lo)) / (m_hi - m_lo))
    return sorted(per)[1]  # median of 3 slope estimates


def cpu_seconds_per_batch():
    import scipy.linalg as sla
    rng = np.random.default_rng(0)
    A = rng.standard_normal((B, N, N))
    K64 = 0.5 * (A + A.transpose(0, 2, 1)) + (2.0 * N) * np.eye(N)
    b64 = rng.standard_normal((B, N))
    c = sla.cho_factor(K64[0], lower=True)
    sla.cho_solve(c, b64[0])
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        for i in range(B):
            c = sla.cho_factor(K64[i], lower=True)
            x1 = sla.cho_solve(c, b64[i])
            sla.cho_solve(c, x1)
    return (time.perf_counter() - t0) / reps


def main():
    tpu_time = tpu_seconds_per_batch()
    cpu_time = cpu_seconds_per_batch()
    tpu_thr = B / tpu_time
    cpu_thr = B / cpu_time
    print(json.dumps({
        "metric": f"batched KKT factorize+solve throughput (n={N}, B={B})",
        "value": round(tpu_thr, 2),
        "unit": "factorizations/s",
        "vs_baseline": round(tpu_thr / cpu_thr, 2),
    }))


if __name__ == "__main__":
    main()
