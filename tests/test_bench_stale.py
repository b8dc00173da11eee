"""The bench capture contract: when the live measurement child cannot
complete (single-tenant tunnel held / device unavailable), ``bench.py`` must
(1) RETRY once within its budget — transient grant contention clears on the
minutes scale — and (2) if no attempt completes, still print one
driver-parseable JSON line carrying the newest verified live number with
``"stale": true`` plus per-attempt diagnostics (child exit code, elapsed,
last phase marker) so a failed driver capture is self-diagnosing
(round-3 verdict item 1; the 2026-08-17 outage exercised the stale path for
real, the r03 10:03 capture failure motivated the diagnostics).

Runs entirely without jax/TPU: the measurement child is patched to fail, so
only the guarded-parent path executes (fork start method inherits the patch).
"""

import functools
import json
import os

import bench


def _failing_main(deadline, phase_path=None):
    if phase_path:
        with open(phase_path, "a") as f:
            f.write("compile t=1.0s\n")
    raise SystemExit(1)


def _run_guarded(capfd, timeout_s=600.0, backoff=0.2):
    # capfd (file-descriptor capture) rather than redirect_stdout: the
    # measurement runs in a FORKED child whose successful JSON line goes to
    # fd 1, invisible to a sys.stdout-level swap in the parent.
    bench._guarded_main(timeout_s=timeout_s, retry_backoff_s=backoff)
    out = capfd.readouterr().out
    return [ln for ln in out.splitlines() if ln.strip()]


def test_guarded_main_reports_stale_with_diagnostics(monkeypatch, capfd):
    monkeypatch.setattr(bench, "main", _failing_main)
    lines = _run_guarded(capfd)
    assert len(lines) == 1, lines
    d = json.loads(lines[0])
    assert d["metric"] == "train_rays_per_sec_per_chip"
    assert d["stale"] is True
    expect_value, expect_cfg, _ = bench._read_last_live()
    assert d["value"] == expect_value
    assert d["unit"] == "rays/s"
    assert d["vs_baseline"] == round(
        expect_value / bench.REFERENCE_RAYS_PER_SEC, 3
    )
    # the fallback must label the config the number belongs to, and say why
    assert expect_cfg in d["config"] and "last-known live" in d["config"]
    assert "verified live measurement" in d["error"]
    # both attempts ran (fast failure + budget => retry), each self-diagnosed
    assert len(d["attempts"]) == 2
    for att in d["attempts"]:
        assert att["exit"] == 1
        assert "compile t=" in att["phase"]
        assert att["elapsed_s"] >= 0
        assert att["killed_by_parent_deadline"] is False


def test_guarded_main_no_retry_when_budget_spent(monkeypatch, capfd):
    """A short remaining budget (as after a full-window hang) must go
    straight to the stale report — a second live attempt cannot fit."""
    monkeypatch.setattr(bench, "main", _failing_main)
    lines = _run_guarded(capfd, timeout_s=30.0)
    d = json.loads(lines[0])
    assert d["stale"] is True
    assert len(d["attempts"]) == 1


def _flaky_main(sentinel, deadline, phase_path=None):
    """Fails on the first invocation, succeeds on the retry (file-based
    state: the forked children share no memory)."""
    if not os.path.exists(sentinel):
        open(sentinel, "w").close()
        raise SystemExit(1)
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": 12345.0,
        "unit": "rays/s",
        "vs_baseline": 1.206,
        "config": "test",
    }))


def test_guarded_main_retry_recovers_live_number(monkeypatch, tmp_path, capfd):
    """Transient first-attempt failure + successful retry => the LIVE JSON
    line is the only output; no stale report."""
    sentinel = str(tmp_path / "first_attempt_done")
    monkeypatch.setattr(bench, "main",
                        functools.partial(_flaky_main, sentinel))
    lines = _run_guarded(capfd)
    assert len(lines) == 1, lines
    d = json.loads(lines[0])
    assert "stale" not in d
    assert d["value"] == 12345.0


def test_read_last_live_prefers_artifact(monkeypatch, tmp_path):
    art = tmp_path / "last_live.json"
    art.write_text(json.dumps({
        "rays_per_sec": 55700.0,
        "config": "batch8192/xla/chunks0/bf16/sc2",
        "recorded_at": "2026-08-20T12:00:00Z",
    }))
    monkeypatch.setattr(bench, "LAST_LIVE_PATH", str(art))
    value, cfg, at = bench._read_last_live()
    assert value == 55700.0
    assert cfg == "batch8192/xla/chunks0/bf16/sc2"
    assert at == "2026-08-20T12:00:00Z"
    # corrupt/missing artifact -> in-code backstop
    art.write_text("{not json")
    value, cfg, _ = bench._read_last_live()
    assert value == bench.LAST_KNOWN_RAYS_PER_SEC
    assert "backstop" in cfg
