"""Respect JAX_PLATFORMS / fake-device env in environments whose
interpreter boot forces a platform.

Some deployments (including this machine) install a ``sitecustomize``
that pre-registers a tunneled TPU PJRT plugin and force-sets
``jax_platforms`` before user code runs, which silently overrides the
standard ``JAX_PLATFORMS=cpu`` workflow for CPU mesh dry-runs. Call
:func:`honor_platform_env` before first backend use (CLI entry points do)
to restore env-var semantics.
"""

from __future__ import annotations

import os
import re


def honor_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
        if plat == "cpu":
            m = re.search(
                r"host_platform_device_count=(\d+)",
                os.environ.get("XLA_FLAGS", ""),
            )
            if m:
                jax.config.update("jax_num_cpu_devices", int(m.group(1)))
        from jax._src import xla_bridge as _xb

        _xb._clear_backends()
    except Exception:
        pass  # backends already initialized — leave them be
    # The private-API call above may silently stop working across jax
    # upgrades; verify the request actually took effect so "CPU dry-run"
    # scripts never run on the tunneled TPU backend unnoticed.
    try:
        got = jax.default_backend()
    except Exception:
        return
    # Only the CPU-dry-run failure mode matters (silently running on the
    # tunneled TPU); the axon plugin legitimately reports platform "tpu",
    # so comparing other names would false-positive.
    if plat.split(",")[0] == "cpu" and got != "cpu":
        import warnings

        warnings.warn(
            f"JAX_PLATFORMS={plat!r} requested but backend is {got!r} — "
            "platform override failed (backends already initialized or "
            "private jax API changed)",
            RuntimeWarning,
            stacklevel=2,
        )
