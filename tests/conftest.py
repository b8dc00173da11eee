"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is exercised on the CPU backend via
``xla_force_host_platform_device_count`` (real multi-chip hardware is not
available in CI); bench.py runs on the real TPU chip outside pytest.

This environment pins every Python process to a single-tenant TPU tunnel
(sitecustomize registers an 'axon' PJRT plugin and overrides JAX_PLATFORMS),
so we must both scrub the env vars AND force the platform through jax.config —
the config update wins as long as no backend has been initialised yet, which
holds at conftest-import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", "tests must not run on the TPU tunnel"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for shard tests"
