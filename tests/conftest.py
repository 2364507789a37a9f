"""Test config: run on CPU with 8 virtual devices (no TPUs needed).

Multi-chip sharding tests fake an 8-device mesh (SURVEY.md §4); Pallas
kernels run in interpreter mode on CPU (selected automatically by the op
layer).

Note: this machine's interpreter boots through an `axon` sitecustomize that
pre-registers a TPU-tunnel PJRT plugin and force-sets ``jax_platforms``
before pytest starts, so plain env vars are not enough — we override the
jax config directly and reset the (not-yet-used) backend cache.
"""

import os

# Belt and braces for subprocesses.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._clear_backends()

jax.config.update("jax_enable_x64", False)

# This backend mimics TPU MXU defaults: f32 matmuls run at ~bf16 precision
# by default, which would make dense einsum oracles drift from the exact
# segment-op paths. Tests compare at full precision.
jax.config.update("jax_default_matmul_precision", "highest")

# This environment has high fixed per-compile latency; the persistent cache
# makes repeat test runs cheap.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
