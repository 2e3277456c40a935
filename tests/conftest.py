"""Test configuration.

Tests run on CPU with float64 enabled so numerical parity against the
reference's float64 CPU implementation can be asserted tightly; a virtual
8-device CPU platform is configured for sharding tests (the driver
separately dry-runs the multi-chip path).
"""

import os

import jax

# Force CPU: the ambient environment presets JAX_PLATFORMS to the TPU
# plugin, but unit tests need float64. jax is already imported by a pytest
# plugin before this conftest runs, so env vars are too late — use
# config.update, which takes effect as long as no backend has initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NOTE: sharding tests that need a virtual multi-device mesh run in a
# subprocess with --xla_force_host_platform_device_count=8 (that flag makes
# *all* XLA CPU compiles pathologically slow, so it must not leak into the
# main test process).
