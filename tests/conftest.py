"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-chip sharding paths are tested without TPUs via
xla_force_host_platform_device_count (SURVEY.md §4 item 8).  Note: this
environment pre-registers a TPU backend in sitecustomize and overrides
JAX_PLATFORMS, so we must re-force CPU via jax.config here (before any
backend is initialized).  The TPU path is exercised by bench.py instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: repeated test runs skip recompiles.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
