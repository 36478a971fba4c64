"""Global configuration for kvxopt_tpu.

The reference library (kvxopt, a CVXOPT fork) is a double-precision CPU
library; its solver tolerances (abstol 1e-7, reltol 1e-6, feastol 1e-7 —
reference src/python/coneprog.py:440-454) require float64 accumulation
somewhere in the pipeline.  TPUs natively compute in f32/bf16 on the MXU and
emulate f64 in software, so this build uses a *mixed* strategy:

- ``default_dtype`` — dtype used for solver state and factorizations.
  float64 by default (exact parity with the reference on CPU, emulated-f64 on
  TPU).
- ``compute_dtype`` — dtype used by the performance kernels (batched block
  Cholesky, Pallas kernels).  float32 by default; results are corrected by
  iterative refinement carried out in ``default_dtype``.

x64 is enabled at import time (opt out with KVXOPT_TPU_NO_X64=1).
"""

import os

import jax

if not os.environ.get("KVXOPT_TPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)

# On TPU, f32 matmuls default to bfloat16 passes — far too coarse for
# interior-point iterations.  Force true-f32 matmul precision (the f64
# path is unaffected; opt out with KVXOPT_TPU_FAST_MATMUL=1).
if not os.environ.get("KVXOPT_TPU_FAST_MATMUL"):
    jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: IPM programs are large and the first
# compile per shape is expensive (especially through remote-compile
# toolchains); cache them across processes.
try:
    _cache_dir = os.environ.get(
        "KVXOPT_TPU_CACHE", os.path.expanduser("~/.cache/kvxopt_tpu_jax"))
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache is an optimization, never a requirement
    pass

import jax.numpy as jnp  # noqa: E402  (after x64 flag)

default_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
compute_dtype = jnp.float32

# Mixed-precision refinement matvec strategy: when True, the f64
# operator products inside the chol2_mixed refinement loop run as
# Ozaki-style exact-split f32 matmuls on the MXU (ops/ozaki.py) instead
# of emulated-f64 matmuls.  Off by default until validated per backend;
# set KVXOPT_TPU_OZAKI=1 (or config.ozaki_refine = True) to enable.
ozaki_refine = os.environ.get("KVXOPT_TPU_OZAKI", "0") == "1"


def set_default_dtype(dtype):
    global default_dtype
    default_dtype = jnp.dtype(dtype)


def set_compute_dtype(dtype):
    global compute_dtype
    compute_dtype = jnp.dtype(dtype)
