"""Serving layer: persistent RenderService over a trained run + the stdlib
HTTP endpoint (healthz/metadata/render PNG/arrays/error paths)."""

import base64
import json
import urllib.request

import numpy as np
import pytest

from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
from satnerf_tpu.datasets.synthetic import generate_scene
from satnerf_tpu.pipelines import load_pipeline
from satnerf_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def run_dp(tmp_path_factory):
    base = tmp_path_factory.mktemp("serve")
    generate_scene(
        str(base / "datasets" / "SYN_SRV"), n_train=2, n_test=1, img_size=32,
        n_tie_points=60,
    )
    run = RunConfig(
        dataset_name="SYN_SRV", datasets_dp=str(base / "datasets"),
        cache_dp=str(base / "cache"), workspace_dp=str(base / "training"),
        max_train_steps=8, num_sanity_val_steps=0,
    )
    pipe = RSSemanticConfig(
        n_samples=8, fc_layers=2, fc_units=64, fc_skips=[1], batch_size=256,
        render_chunk_size=2048, depth_enabled=False,
    )
    cfg = MainConfig(run, pipe)
    pipeline = load_pipeline(cfg)
    pipeline.prepare_run()
    pipeline.load_datasets()
    state = Trainer(pipeline, log_every=50).fit(validate_every_epoch=False)
    from satnerf_tpu.train.checkpoint import CheckpointManager

    CheckpointManager(cfg.run.run_dp).save_last(state)
    return cfg.run.run_dp


@pytest.fixture(scope="module")
def service(run_dp):
    from satnerf_tpu.serve import RenderService

    return RenderService(run_dp, chunk=1024)


def test_render_by_view_name(service):
    name = service.view_names()[0]
    out = service.render(name)
    assert out["rgb"].shape == (32, 32, 3)
    assert out["rgb"].min() >= 0.0 and out["rgb"].max() <= 1.0
    assert out["depth"].shape == (32, 32)
    assert out["semantic_label"].shape == (32, 32)
    assert out["semantic_rgb"].dtype == np.uint8
    assert out["semantic_shaded_rgb"].shape == (32, 32, 3)
    s = service.stats()
    assert s["requests"] >= 1 and s["rays"] >= 32 * 32
    assert s["rays_per_second"] > 0


def test_relight_changes_rendering(service):
    name = service.view_names()[0]
    noon = service.render(name, sun_elevation=90.0)
    dusk = service.render(name, sun_elevation=5.0, sun_azimuth=80.0)
    assert noon["sun_elevation"] == 90.0 and dusk["sun_elevation"] == 5.0
    # the irradiance model must respond to the sun override
    assert np.abs(noon["rgb"] - dusk["rgb"]).mean() > 1e-4


def test_unknown_view_raises(service):
    with pytest.raises(KeyError):
        service.render("NO_SUCH_VIEW")


@pytest.fixture(scope="module")
def endpoint(service):
    from satnerf_tpu.serve.http_server import serve_in_thread

    server, port = serve_in_thread(service, port=0)
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.headers.get("Content-Type"), resp.read()
    except urllib.error.HTTPError as err:
        return err.code, err.headers.get("Content-Type"), err.read()


def test_http_endpoints(endpoint, service):
    with urllib.request.urlopen(endpoint + "/healthz") as resp:
        health = json.loads(resp.read())
    assert health["status"] == "ok"

    with urllib.request.urlopen(endpoint + "/metadata") as resp:
        meta = json.loads(resp.read())
    assert meta["variant"] == "rs_semantic"
    assert len(meta["views"]) == len(service.view_names())

    view = meta["views"][0]
    status, ctype, body = _post(endpoint + "/render", {"view": view})
    assert status == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"

    status, ctype, body = _post(
        endpoint + "/render",
        {"view": view, "output": "arrays", "sun_elevation": 45.0},
    )
    assert status == 200 and ctype == "application/json"
    payload = json.loads(body)
    rgb = np.frombuffer(
        base64.b64decode(payload["rgb_f16_b64"]), np.float16
    ).reshape(payload["shape"])
    assert rgb.shape == (32, 32, 3)
    assert payload["sun_elevation"] == 45.0

    status, _, body = _post(endpoint + "/render", {"view": "NO_SUCH_VIEW"})
    assert status == 400
    err = json.loads(body)["error"]
    assert "NO_SUCH_VIEW" in err
    # the 400 body must not leak the server's on-disk dataset layout
    assert "/" not in err.replace("NO_SUCH_VIEW", "")

    # inline meta dicts are a Python-API-only form: over HTTP they would
    # let a remote client request an unbounded-size render (width/height
    # are meshgridded host-side before chunking) — 400, never a render
    status, _, body = _post(
        endpoint + "/render",
        {"view": {"width": 50000, "height": 50000, "min_alt": 0.0,
                  "max_alt": 1.0}},
    )
    assert status == 400
    assert "view name" in json.loads(body)["error"]

    # remote clients must not be able to probe the filesystem via view
    # names (absolute paths or ../ traversal) — 400, never a file read
    for evil in ("/etc/passwd", "../../../../etc/passwd", "../root"):
        status, _, body = _post(endpoint + "/render", {"view": evil})
        assert status == 400, (evil, body)

    # malformed-but-JSON bodies get a structured 400/500, never a dropped
    # connection ("ts": null used to raise TypeError past the handler)
    status, _, body = _post(
        endpoint + "/render", {"view": view, "ts": None}
    )
    assert status == 200  # null ts coerces to 0
    status, _, body = _post(
        endpoint + "/render", {"view": view, "sun_elevation": "noon"}
    )
    assert status in (400, 500)
    assert "error" in json.loads(body)

    with urllib.request.urlopen(endpoint + "/stats") as resp:
        stats = json.loads(resp.read())
    assert stats["requests"] >= 2


def test_fast_sine_service(run_dp):
    """fast_sine=True swaps the sine kernel for serving (PSNR-bound path)
    and renders nearly identical images."""
    from satnerf_tpu.serve import RenderService

    base = RenderService(run_dp, chunk=1024)
    fast = RenderService(run_dp, chunk=1024, fast_sine=True)
    assert fast.rcfg.field.sin_impl == "poly5"
    assert base.rcfg.field.sin_impl != "poly5"
    name = base.view_names()[0]
    a = base.render(name)["rgb"]
    b = fast.render(name)["rgb"]
    assert np.max(np.abs(a - b)) < 5e-2
    assert np.mean(np.abs(a - b)) < 2e-3


def test_cli_flag_parsing(monkeypatch):
    """--fast-sine 1 reaches serve() as a boolean."""
    import satnerf_tpu.serve.__main__ as cli

    seen = {}

    def fake_serve(run_dp, **kw):
        seen.update(kw, run_dp=run_dp)

    monkeypatch.setattr("satnerf_tpu.serve.http_server.serve", fake_serve)
    cli.main(["/tmp/run", "--port", "0", "--fast-sine", "1"])
    assert seen["run_dp"] == "/tmp/run"
    assert seen["port"] == 0
    assert seen["fast_sine"] is True
