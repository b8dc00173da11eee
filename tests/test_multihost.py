"""Two-process jax.distributed smoke test: initialize_multihost /
make_pod_mesh / local_batch_slice exercised end-to-end over the CPU
collectives backend (2 processes x 2 virtual devices), including a real
cross-process reduction. Verifies the multi-host wiring the pod path uses
(SURVEY.md §2.7; the reference has no multi-host story)."""

import os
import socket
import subprocess
import sys

import pytest

CHILD = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

coordinator, pid = sys.argv[1], int(sys.argv[2])

from satnerf_tpu.parallel.multihost import (
    initialize_multihost, local_batch_slice, make_pod_mesh,
)

idx, count = initialize_multihost(
    coordinator_address=coordinator, num_processes=2, process_id=pid
)
assert (idx, count) == (pid, 2), (idx, count)
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

mesh = make_pod_mesh()
assert mesh.devices.size == 4

# cross-process reduction: each process contributes its local shard of a
# global [4] array; the replicated sum must see every host's values
from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec as P

local = np.array(
    [10.0 * jax.process_index() + i for i in range(jax.local_device_count())],
    np.float32,
)
garr = multihost_utils.host_local_array_to_global_array(local, mesh, P("data"))
total = jax.jit(
    jnp.sum,
    in_shardings=NamedSharding(mesh, P("data")),
    out_shardings=NamedSharding(mesh, P()),
)(garr)
total = float(total)
assert total == 22.0, total  # (0+1) + (10+11)

assert local_batch_slice(64) == 32  # 16/device x 2 local devices
print(f"MULTIHOST_OK pid={pid} sum={total}")
"""


def test_two_process_distributed_smoke(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    script = tmp_path / "child.py"
    script.write_text(CHILD)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coordinator, str(pid)],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed smoke test timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIHOST_OK pid={pid} sum=22.0" in out, out
