"""JAX runtime setup helpers (compilation cache, platform selection)."""

from __future__ import annotations

import os

import jax

_CACHE_DIR = os.environ.get(
    "NDR_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/ndr_tpu_xla")
)


def setup(cache_dir: str = None, matmul_precision: str = "highest"):
    """Standard runtime setup for solver workloads.

    * persistent compilation cache (TPU compiles are expensive);
    * full-fp32 matmul precision: TPU fp32 dots default to one-pass bf16
      multiplication, which stalls CG below ~1e-3 relative residual and
      makes the coarse-level Cholesky produce NaNs — the solver needs
      true fp32 (bf16x3) contraction accuracy;
    * x64 mode: the solvers keep their hot path in explicit float32 but
      accumulate equilibrium displacements in float64 (mixed-precision
      iterative refinement, see fem.multigrid.MGSolverSettings).
    """
    # honor an explicit JAX_PLATFORMS request: the ambient environment
    # (axon TPU plugin) presets jax_platforms at import time, silently
    # overriding the env var — so `JAX_PLATFORMS=cpu <cli>` would land on
    # the TPU (and block behind any running TPU job) without this
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        jax.config.update("jax_platforms", env_platforms)
    jax.config.update("jax_default_matmul_precision", matmul_precision)
    jax.config.update("jax_enable_x64", True)
    return enable_compilation_cache(cache_dir)


def enable_compilation_cache(cache_dir: str = None):
    """Persist compiled XLA executables across processes.

    TPU compiles of the fused solver step are expensive; the cache makes
    every run after the first start instantly for a given grid shape.
    """
    cache_dir = cache_dir or _CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return cache_dir
