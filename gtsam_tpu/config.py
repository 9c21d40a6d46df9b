"""Global configuration for gtsam_tpu.

The reference (borglab/gtsam) is a double-precision C++ library; chi2/ATE parity
therefore requires float64 in the solver core.  JAX disables x64 by default, so we
enable it at import time (set GTSAM_TPU_NO_X64=1 to opt out, e.g. for pure-f32
TPU speed runs).  The compute dtype used by solvers is configurable: float64 for
parity, float32 (+ iterative refinement, see linear/) for TPU speed-of-light.

Reference analog: gtsam/config.h.in compile-time options (SURVEY.md §5.6).
"""

import os

import jax

if not os.environ.get("GTSAM_TPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)

# TPU matmuls default to bf16 multiplies; solver algebra needs true f32
# (without this, large BA Schur systems lose enough precision that LM steps
# are rejected outright on TPU while identical f32 code converges on CPU).
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: TPU compiles (esp. emulated f64) are expensive;
# cache them across processes.  Resolution order: explicit env var, a
# repo-shipped .xla_cache (pre-populated executables distributed with the
# source so a fresh checkout's first run loads instead of compiling), then
# the per-user cache dir.
_repo_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache")
_cache_dir = os.environ.get(
    "GTSAM_TPU_COMPILATION_CACHE",
    _repo_cache if os.path.isdir(_repo_cache)
    else os.path.expanduser("~/.cache/gtsam_tpu_xla"))
if _cache_dir:
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # threshold 0: on a tunneled TPU backend even trivial eager ops
        # (convert_element_type, concatenate, scatter dispatched outside jit)
        # cost ~0.4 s EACH to compile remotely — under the default 0.5 s gate
        # none of them persisted, so every process paid the full storm again
        # (measured: 132 sub-gate compiles = ~50 s of a 10-update ISAM2 run;
        # a persistent-cache hit is ~80 ms)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # older jax without these flags
        pass

import jax.numpy as jnp  # noqa: E402  (after x64 config)

# Default dtype for solver-core arithmetic.
_DEFAULT_DTYPE = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def default_dtype():
    return _DEFAULT_DTYPE


def set_default_dtype(dtype) -> None:
    global _DEFAULT_DTYPE
    _DEFAULT_DTYPE = jnp.dtype(dtype)
