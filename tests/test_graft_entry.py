"""Driver-artifact robustness: ``__graft_entry__.dryrun_multichip`` must be
green when invoked exactly as the driver invokes it, and must leave useful
partial output behind even when the run hangs or the parent is killed
(MULTICHIP_r02 post-mortem: a tunnel outage + buffered child output produced
an artifact with zero builder lines)."""

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_CALL = "import __graft_entry__ as g; g.dryrun_multichip({n})"


def _driver_env(**extra):
    """The env the driver would use: axon pinned, no cpu forcing."""
    env = dict(os.environ)
    env.pop("SATNERF_DRYRUN_TEST_HANG", None)
    env["JAX_PLATFORMS"] = "axon"  # pinned shell-wide on this machine
    env.update(extra)
    return env


def test_dryrun_green_driver_shaped():
    """The exact driver invocation completes green on a virtual CPU mesh,
    streams the loss line, and never initialises the axon backend."""
    proc = subprocess.run(
        [sys.executable, "-c", DRIVER_CALL.format(n=4)],
        cwd=REPO,
        env=_driver_env(),
        capture_output=True,
        text=True,
        timeout=600,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out
    assert "dryrun_multichip(4): start" in out  # heartbeat before any jax
    assert "spawning -S cpu child" in out
    # the artifact must carry the 1-dev-vs-n-dev parity evidence (round-4
    # verdict item 3), not just an executes-check
    assert "dryrun_multichip(4): loss=" in out and "parity ok" in out
    assert "1dev=" in out and "dloss=" in out and "max_dparam=" in out
    # ... and the sharded-eval-path evidence (round-5: verdict item 7): the
    # chunked full-image render must agree unsharded vs ray-sharded
    assert "sharded render parity ok" in out, out
    # -S child: the sitecustomize PJRT plugin must never have loaded
    assert "Platform 'axon' is experimental" not in out


def test_simulated_outage_internal_deadline():
    """A hanging child is killed by the internal deadline with a diagnostic
    line — the artifact is non-silent even on a genuine hang."""
    proc = subprocess.run(
        [sys.executable, "-c", DRIVER_CALL.format(n=2)],
        cwd=REPO,
        env=_driver_env(
            # deadline must exceed worst-case -S child STARTUP under heavy
            # CPU contention (observed >6 s with concurrent torch training
            # on this 1-core host) while staying far below the hang length
            SATNERF_DRYRUN_TEST_HANG="90", SATNERF_DRYRUN_DEADLINE="25"
        ),
        capture_output=True,
        text=True,
        timeout=180,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode != 0
    assert "dryrun_multichip(2): start" in out
    assert "test-hang engaged" in out  # child's partial output was streamed
    assert "internal deadline" in out
    assert "timed out after 25s" in out


def test_simulated_outage_parent_killed():
    """If the PARENT is hard-killed mid-run (driver timeout), everything
    printed so far is already on its stdout — nothing is lost to buffering."""
    import tempfile

    with tempfile.NamedTemporaryFile("w+", suffix=".log", delete=False) as f:
        log = f.name
    with open(log, "w") as sink:
        proc = subprocess.Popen(
            [sys.executable, "-u", "-c", DRIVER_CALL.format(n=2)],
            cwd=REPO,
            env=_driver_env(
                SATNERF_DRYRUN_TEST_HANG="45", SATNERF_DRYRUN_DEADLINE="300"
            ),
            stdout=sink,
            stderr=subprocess.STDOUT,
            text=True,
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                with open(log) as fh:
                    if "test-hang engaged" in fh.read():
                        break
                time.sleep(0.5)
            else:
                raise AssertionError(open(log).read())
        finally:
            proc.send_signal(signal.SIGKILL)  # simulate the driver timeout
            proc.wait(timeout=30)
    with open(log) as fh:
        out = fh.read()
    os.unlink(log)
    # the heartbeat AND the child's streamed line survived the hard kill
    assert "dryrun_multichip(2): start" in out
    assert "spawning -S cpu child" in out
    assert "test-hang engaged" in out
