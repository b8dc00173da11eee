"""The bench stale-fallback contract: when the live measurement child cannot
complete (single-tenant tunnel held / device unavailable), ``bench.py`` must
still print one driver-parseable JSON line carrying the last verified number
with ``"stale": true`` (exercised for real during the 2026-08-17 outage).

Runs entirely without jax/TPU: the measurement child is patched to fail, so
only the guarded-parent path executes (fork start method inherits the patch).
"""

import contextlib
import io
import json

import bench


def _failing_main(deadline):
    raise SystemExit(1)


def test_guarded_main_reports_stale_last_known(monkeypatch):
    monkeypatch.setattr(bench, "main", _failing_main)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._guarded_main(timeout_s=30.0)
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1, lines
    d = json.loads(lines[0])
    assert d["metric"] == "train_rays_per_sec_per_chip"
    assert d["stale"] is True
    assert d["value"] == bench.LAST_KNOWN_RAYS_PER_SEC
    assert d["unit"] == "rays/s"
    assert d["vs_baseline"] == round(
        bench.LAST_KNOWN_RAYS_PER_SEC / bench.REFERENCE_RAYS_PER_SEC, 3
    )
    # the fallback must label itself as the default config, and say why
    assert "last-known default" in d["config"]
    assert "last verified" in d["error"]
