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


TRAIN_CHILD = r"""
import os
import sys

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

scene_base, workspace, mode = sys.argv[1], sys.argv[2], sys.argv[3]
if mode == "dist":
    coordinator, pid = sys.argv[4], int(sys.argv[5])
    from satnerf_tpu.parallel.multihost import initialize_multihost

    initialize_multihost(
        coordinator_address=coordinator, num_processes=2, process_id=pid
    )
    assert jax.device_count() == 4 and jax.local_device_count() == 2
else:
    pid = 0
    assert jax.device_count() == 4

from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
from satnerf_tpu.pipelines import load_pipeline
from satnerf_tpu.train.loop import Trainer

run_dp = os.path.join(workspace, "pod_run")
os.makedirs(run_dp, exist_ok=True)
run = RunConfig(
    dataset_name="SYN_MH",
    datasets_dp=os.path.join(scene_base, "datasets"),
    cache_dp=os.path.join(workspace, f"cache{pid}"),
    workspace_dp=workspace,
    run_dp=run_dp,  # shared across processes: pod-style single run dir
    max_train_steps=20,
    check_val_every_n_epoch=100,
    num_sanity_val_steps=0,
    seed=0,
    data_parallel=4,
)
pipe = RSSemanticConfig(
    n_samples=8, fc_layers=2, fc_units=64, fc_skips=[1],
    batch_size=256, render_chunk_size=4096, first_beta_epoch=1,
)
cfg = MainConfig(run, pipe)
pipeline = load_pipeline(cfg)
pipeline.prepare_run()
pipeline.load_datasets()
trainer = Trainer(pipeline, log_every=100)
# validation on: the end-of-run validate exercises the pod render path
# (sharded chunks with replicated outputs) + lead-only artifact writes
state = trainer.fit(validate_every_epoch=True)

from jax.flatten_util import ravel_pytree

flat, _ = ravel_pytree(jax.device_get(state.params))
checksum = float(np.abs(np.asarray(flat, np.float64)).sum())
print(
    "TRAINSMOKE pid=%d step=%d checksum=%.10e loss=%.8f"
    % (pid, int(jax.device_get(state.step)), checksum,
       trainer.history[-1]["loss"]),
    flush=True,
)
"""


@pytest.mark.slow
def test_two_process_trainer_smoke(tmp_path):
    """20 real Trainer steps on a 2-process x 2-device pod mesh, pod-style
    shared run dir, vs the identical single-process 4-device run: the final
    parameter vector must match to float tolerance. Closes the pod path's
    last untested seam (process-spanning Trainer feed + checkpoint)."""
    from satnerf_tpu.datasets.synthetic import generate_scene

    scene_base = tmp_path / "shared"
    generate_scene(
        str(scene_base / "datasets" / "SYN_MH"),
        n_train=2, n_test=1, img_size=40, n_tie_points=80,
    )

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    def make_env(n_local):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = " ".join(
            f
            for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        )
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_local}"
        ).strip()
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        return env

    script = tmp_path / "train_child.py"
    script.write_text(TRAIN_CHILD)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # single-process 4-device baseline
    base_ws = tmp_path / "ws_single"
    base_ws.mkdir()
    single = subprocess.run(
        [sys.executable, str(script), str(scene_base), str(base_ws), "single"],
        cwd=repo, env=make_env(4), capture_output=True, text=True, timeout=900,
    )
    assert single.returncode == 0, single.stdout + single.stderr

    # 2-process x 2-device pod run, shared run dir
    pod_ws = tmp_path / "ws_pod"
    pod_ws.mkdir()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(scene_base), str(pod_ws),
             "dist", coordinator, str(pid)],
            cwd=repo, env=make_env(2),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("trainer pod smoke timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"

    def parse(out):
        line = [l for l in out.splitlines() if l.startswith("TRAINSMOKE")][-1]
        parts = dict(kv.split("=") for kv in line.split()[1:])
        return int(parts["step"]), float(parts["checksum"]), float(parts["loss"])

    s_step, s_sum, s_loss = parse(single.stdout)
    assert s_step == 20
    for pid, out in enumerate(outs):
        p_step, p_sum, p_loss = parse(out)
        assert p_step == 20
        # same global mesh, same seeds, same dispatch order -> the pod run
        # must reproduce the single-process trajectory to float tolerance
        assert abs(p_sum - s_sum) / s_sum < 1e-6, (pid, p_sum, s_sum)
        assert abs(p_loss - s_loss) < 1e-5, (pid, p_loss, s_loss)
    # pod-style shared run dir got exactly one set of artifacts: process 0
    # owns TB events / checkpoints / validation outputs (lead-writer
    # convention); a second writer would race tensorboardX's dir creation
    # and corrupt concurrent orbax saves
    pod_run = os.path.join(pod_ws, "pod_run")
    assert os.path.isdir(os.path.join(pod_run, "ckpoints", "last"))
    events = [f for f in os.listdir(os.path.join(pod_run, "tb"))
              if f.startswith("events")]
    assert len(events) == 1, events
    assert os.path.isdir(os.path.join(pod_run, "visualization"))


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
