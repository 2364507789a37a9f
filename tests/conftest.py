"""Test config: run on CPU with 8 virtual devices (no TPUs needed).

Multi-chip sharding tests fake an 8-device mesh via
``--xla_force_host_platform_device_count`` (SURVEY.md §4); Pallas kernels
run in interpreter mode on CPU (selected automatically by the op layer).
"""

import os

# Must be set before jax is imported anywhere.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

# This backend mimics TPU MXU defaults: f32 matmuls run at ~bf16 precision
# by default, which would make dense einsum oracles drift from the exact
# segment-op paths. Tests compare at full precision.
jax.config.update("jax_default_matmul_precision", "highest")

# This environment has high fixed per-compile latency; the persistent cache
# makes repeat test runs cheap.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
