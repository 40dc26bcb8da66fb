"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Parity tests run against float64 NumPy oracles (the reference is C++ double);
the virtual 8-device mesh exercises the multi-chip sharding paths without TPU
hardware (SURVEY.md section 4, final paragraph).

Note: this environment's sitecustomize pre-imports JAX with the axon TPU
platform, so ``JAX_PLATFORMS`` env tweaks are too late -- we must override via
``jax.config.update`` (which is honored at backend-init time).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
