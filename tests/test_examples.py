"""The examples/ scripts stay runnable: execute them end-to-end at tiny
sizes (env-shrunk scene/steps) in subprocesses, exactly as a user would."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")


@pytest.fixture(scope="module")
def example_env(tmp_path_factory):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        SATNERF_EXAMPLES_OUT=str(tmp_path_factory.mktemp("examples_ws")),
        SATNERF_EXAMPLES_STEPS="6",
        SATNERF_EXAMPLES_IMG="24",
    )
    env.pop("XLA_FLAGS", None)
    return env


def _run(script: str, env) -> str:
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script)],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"{script} failed:\n{proc.stdout}\n{proc.stderr}"
    return proc.stdout


def test_01_train(example_env):
    out = _run("01_train_synthetic.py", example_env)
    assert "trained run:" in out


def test_02_eval_battery(example_env):
    out = _run("02_eval_battery.py", example_env)
    assert "results under:" in out
    assert "PSNR" in out  # gathered table printed


def test_03_relight(example_env):
    out = _run("03_relight_views.py", example_env)
    assert out.count("wrote") == 3


def test_04_interop(example_env):
    out = _run("04_reference_interop.py", example_env)
    assert "round trip exact" in out
