"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the standard fake-backend trick;
SURVEY.md section 4).

This image pre-imports jax at interpreter startup with the axon (TPU)
platform configured, so setting env vars alone is too late — we also update
jax.config here, before any backend is materialized (clients are created
lazily on first jax.devices()/dispatch)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
