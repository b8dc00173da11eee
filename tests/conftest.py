"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is exercised on the CPU backend via
``xla_force_host_platform_device_count`` (real multi-chip hardware is not
available in CI); bench.py runs on the real TPU chip outside pytest.
"""

import os

# Force CPU: the environment pins JAX_PLATFORMS=axon (TPU tunnel), which is
# single-tenant and slow for unit tests; setdefault would not override it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
