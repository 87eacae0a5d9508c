"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Mirrors the SURVEY §4 plan — multi-chip behavior is validated with
``--xla_force_host_platform_device_count=8`` instead of real hardware; DSP
parity tests get deterministic float32 CPU math.

Note: this image imports jax at interpreter startup (site hook), so env vars
alone are too late — we must use jax.config.update before any backend use.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeated test runs skip XLA recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/mmst_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
