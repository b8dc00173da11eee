"""Eval orchestrator: run the full evaluation battery for a trained run.

ref: eval/eval.py:8-61 + eval/tmux_baseline.sh / tmux_semantic.sh — the
reference fans eval scripts out to tmux windows pinned to different GPUs.
On a single-tenant TPU chip the right schedule is sequential but SHARED:
the checkpoint is restored once per worker and every image is rendered
exactly once, with the rendered results fed to all three consumers
(PSNR/SSIM/MAE, point clouds, semantic metrics) — a ~3x cut in rendering
and load work compared to invoking the standalone CLIs back-to-back.

Isolation (round-5): long-lived eval clients have stalled inside device
calls on the remote tunnel (a ~45-min-old 16.6 GB client at the round-4
dress rehearsal, docs/validation_run.md), so large scenes default to
FRESH SHORT-LIVED WORKERS: one subprocess per split (optionally per
--batch-images N images), per-image partial results on disk (resumable:
a respawned worker skips finished images), a progress heartbeat, and a
parent that SIGTERMs a stalled worker and respawns it. The reference's
process-per-window battery (eval/eval.py:8-61) has the same shape; here
the respawn is also the recovery path.

CLI: python -m satnerf_tpu.eval.eval <run_or_experiment_dp> [output_dp]
     [--splits test,train] [--epoch N] [--isolate auto|inline|subprocess]
     [--batch-images N] [--stall-timeout-s S]
     output_dp defaults to $SATNERF_TPU_EVAL_DP, else
     <run_or_experiment_dp>/eval_battery.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

from satnerf_tpu.configs import read_toml
from satnerf_tpu.eval.eval_nerf import _with_running_means, evaluate_image
from satnerf_tpu.eval.eval_semantic import (
    evaluate_semantic_image,
    write_semantic_results,
)
from satnerf_tpu.eval.extract_pointcloud import export_image_clouds
from satnerf_tpu.eval.gather_eval import gather
from satnerf_tpu.eval.loader import load_run
from satnerf_tpu.eval.util import (
    EVAL_DP_ENV,
    EVAL_DP_ENV_COMPAT,
    expand_input_files_for_experiments,
)
from satnerf_tpu.logger import logger
from satnerf_tpu.render.renderer import render_image_chunked

# a worker that made progress but has images left exits with this code so
# the parent respawns a fresh client (bounded process age)
EXIT_MORE_REMAIN = 3


def _is_semantic(run_dp: str) -> bool:
    fp = os.path.join(run_dp, "configs", "pipeline.toml")
    return "rs_semantic" in read_toml(fp).get("pipeline", "")


def _scene_is_large(run_dp: str) -> bool:
    """Decide the isolate=auto default WITHOUT building ray stores: read the
    run's dataset root.json and the first train meta for image dims."""
    try:
        run_cfg = read_toml(os.path.join(run_dp, "configs", "run.toml"))
        ds_dp = os.path.join(
            run_cfg["datasets_dp"], run_cfg["dataset_name"]
        )
        root = json.load(open(os.path.join(ds_dp, "root.json")))
        n_images = len(root.get("train_split", [])) + len(
            root.get("test_split", [])
        )
        meta_fp = os.path.join(
            ds_dp, root["meta_dp"], root["train_split"][0]
        )
        meta = json.load(open(meta_fp))
        return meta["width"] * meta["height"] >= 512 * 512 or n_images >= 16
    except Exception:
        return False


def _partial_dp(output_dp: str, run_name: str, split: str) -> str:
    return os.path.join(output_dp, run_name, "partial", split)


def _eval_split(
    pipeline, params, rcfg, step, run_dp, output_dp, split,
    chunk: int = 16384, max_images: int = 0,
) -> bool:
    """Evaluate one split with per-image resumable partials.

    Renders every image not yet covered by a partial file, feeding each
    render to all consumers, then (when the split is complete) merges the
    partials into the split's results.json. Returns True when the split is
    complete, False when ``max_images`` stopped it early (more remain).
    """
    run_dp = run_dp.rstrip("/")
    run_name = os.path.basename(run_dp)
    semantic = _is_semantic(run_dp)
    corrupted = "corrupted" in getattr(
        pipeline.cfg.pipeline, "semantic_dataset_type", ""
    )
    dataset = pipeline.datasets["rgb" if split == "train" else "rgb_test"]
    nerf_dp = os.path.join(output_dp, run_name, "eval", split)
    pc_dp = os.path.join(output_dp, run_name, "pointclouds", split)
    sem_dp = os.path.join(output_dp, run_name, "eval_semantic", split)
    partial_dp = _partial_dp(output_dp, run_name, split)
    for dp in (nerf_dp, pc_dp, partial_dp) + ((sem_dp,) if semantic else ()):
        os.makedirs(dp, exist_ok=True)
    heartbeat_fp = os.path.join(partial_dp, ".heartbeat")

    # metrics skip the prepended train view on the test split (ref
    # behavior); its partial still exists so resumes skip its render
    start = 1 if split == "test" else 0
    processed = 0
    for img_idx in range(len(dataset.data)):
        img = dataset.image_item(img_idx)
        partial_fp = os.path.join(partial_dp, f"{img['name']}.json")
        if os.path.isfile(partial_fp):
            # a partial from a DIFFERENT checkpoint (re-eval after more
            # training, or --epoch selecting another snapshot) is stale —
            # only same-step partials count as done
            try:
                with open(partial_fp) as f:
                    if json.load(f).get("step") == int(step):
                        continue
            except (json.JSONDecodeError, OSError):
                pass
        if max_images and processed >= max_images:
            return False
        res = render_image_chunked(
            params, rcfg, img["rays"], img["extras"], chunk=chunk
        )
        # point clouds cover every item (incl. the prepended train view)
        export_image_clouds(dataset, img, res, pc_dp, step)
        entry = {"order": img_idx, "step": int(step),
                 "nerf": None, "sem": None, "cm": None}
        if img_idx >= start:
            entry["nerf"] = evaluate_image(dataset, img, res, nerf_dp, step)
            if semantic:
                sem_entry, cm_raw = evaluate_semantic_image(
                    dataset, img, res, sem_dp, corrupted
                )
                entry["sem"] = sem_entry
                entry["cm"] = np.asarray(cm_raw).tolist()
        tmp = partial_fp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f)
        os.replace(tmp, partial_fp)  # atomic: a killed worker never leaves
        # a truncated partial behind
        with open(heartbeat_fp, "w") as f:
            f.write(f"{img['name']} t={time.time():.0f}\n")
        processed += 1
        logger.info("EvalAll", f"{run_name} [{split}] {img['name']} done")

    # split complete -> merge partials into the published results
    nerf_results: dict = {}
    sem_results: dict = {}
    n_cls = dataset.semantic_n_classes if semantic else 0
    cm_split = np.zeros((n_cls, n_cls)) if semantic else None
    entries = []
    for fn in os.listdir(partial_dp):
        if not fn.endswith(".json"):
            continue
        with open(os.path.join(partial_dp, fn)) as f:
            entry = json.load(f)
        if entry.get("step") != int(step):
            continue  # leftover from another checkpoint
        entries.append((fn[: -len(".json")], entry))
    for name, entry in sorted(entries, key=lambda kv: kv[1].get("order", 0)):
        if entry["nerf"] is not None:
            nerf_results[name] = entry["nerf"]
        if semantic and entry["sem"] is not None:
            sem_results[name] = entry["sem"]
            cm_split += np.asarray(entry["cm"])
    with open(os.path.join(nerf_dp, "results.json"), "w") as f:
        json.dump(_with_running_means(nerf_results), f, indent=4)
    if semantic:
        write_semantic_results(
            sem_results, cm_split,
            list(dataset.semantic_cls_labels.values()), sem_dp,
        )
    return True


def _worker(run_dp, output_dp, split, epoch=-1, chunk=16384, max_images=0):
    """Fresh-process worker: evaluate up to max_images not-yet-done images
    of one split, then exit (0 = split complete, EXIT_MORE_REMAIN = call
    again). Resume comes from the on-disk partials."""
    pipeline, params, rcfg, step = load_run(run_dp, epoch)
    done = _eval_split(
        pipeline, params, rcfg, step, run_dp, output_dp, split,
        chunk=chunk, max_images=max_images,
    )
    return 0 if done else EXIT_MORE_REMAIN


def _run_split_isolated(
    run_dp, output_dp, split, epoch, chunk, batch_images, stall_timeout_s,
    max_respawns: int = 25, max_failures: int = 3,
):
    """Parent side: spawn fresh worker subprocesses for one split until it
    reports complete; SIGTERM a worker whose heartbeat goes stale (stalled
    inside a device call) and respawn it — finished images are never
    re-rendered (per-image partials)."""
    run_name = os.path.basename(run_dp.rstrip("/"))
    hb_fp = os.path.join(_partial_dp(output_dp, run_name, split), ".heartbeat")
    cmd = [
        sys.executable, "-m", "satnerf_tpu.eval.eval", run_dp, output_dp,
        "--worker", "true", "--split", split, "--epoch", str(epoch),
        "--chunk", str(chunk), "--batch-images", str(batch_images),
    ]
    failures = 0
    for spawn in range(max_respawns):
        t_start = time.time()
        proc = subprocess.Popen(cmd)
        stalled = False
        while proc.poll() is None:
            time.sleep(5.0)
            hb = os.path.getmtime(hb_fp) if os.path.isfile(hb_fp) else 0.0
            last_progress = max(hb, t_start)
            if time.time() - last_progress > stall_timeout_s:
                stalled = True
                logger.warning(
                    "EvalAll",
                    f"{run_name} [{split}] worker stalled "
                    f"({stall_timeout_s:.0f}s without progress); SIGTERM",
                )
                # SIGTERM first and wait long: the round-4 stalled client
                # unwound cleanly on SIGTERM; SIGKILL mid-device-call can
                # wedge the single-tenant chip grant (CLAUDE.md)
                proc.send_signal(signal.SIGTERM)
                try:
                    proc.wait(180.0)
                except subprocess.TimeoutExpired:
                    proc.kill()
                    proc.wait()
                break
        rc = proc.returncode
        if rc == 0:
            return
        if rc == EXIT_MORE_REMAIN:
            continue  # healthy batch boundary: fresh client, keep going
        failures += 1
        logger.warning(
            "EvalAll",
            f"{run_name} [{split}] worker "
            + ("stalled" if stalled else f"failed (rc={rc})")
            + f"; respawning ({failures}/{max_failures})",
        )
        if failures >= max_failures:
            raise RuntimeError(
                f"eval worker for {run_name} [{split}] failed "
                f"{failures} times; see logs"
            )
    raise RuntimeError(
        f"eval worker for {run_name} [{split}] did not finish within "
        f"{max_respawns} spawns"
    )


def eval_all(
    input_dp: str,
    output_dp: str | None = None,
    splits=("train", "test"),
    epoch: int = -1,
    chunk: int = 16384,
    isolate: str = "auto",
    batch_images: int = 0,
    stall_timeout_s: float = 900.0,
):
    # orbax rejects relative checkpoint paths; anchor everything up front.
    # Validate the input BEFORE creating any output tree so a typo'd run
    # path fails fast instead of scattering empty directories.
    input_dp = os.path.abspath(input_dp)
    if not os.path.isdir(input_dp):
        raise FileNotFoundError(f"run/experiment dir not found: {input_dp}")
    env_output = os.getenv(EVAL_DP_ENV) or os.getenv(EVAL_DP_ENV_COMPAT)
    if output_dp is None and env_output:
        # env-provided target: points at a pre-created shared eval area by
        # convention — fail fast on a typo rather than creating a new tree
        output_dp = env_output
        assert os.path.isdir(output_dp), (
            f"${EVAL_DP_ENV}={output_dp} is not a directory"
        )
    if output_dp is None:
        # bare `eval <run_dp>`: keep the battery self-contained in the run
        output_dp = os.path.join(input_dp, "eval_battery")
    output_dp = os.path.abspath(output_dp)
    os.makedirs(output_dp, exist_ok=True)
    if isinstance(splits, str):
        splits = tuple(s for s in splits.split(",") if s)
    assert isolate in ("auto", "inline", "subprocess"), isolate

    runs, output_dp = expand_input_files_for_experiments(input_dp, output_dp)
    for run_dp in runs:
        run_dp = run_dp.rstrip("/")
        run_name = os.path.basename(run_dp)
        mode = isolate
        if mode == "auto":
            mode = "subprocess" if _scene_is_large(run_dp) else "inline"
        if mode == "subprocess":
            logger.info(
                "EvalAll",
                f"{run_name}: fresh-worker mode "
                f"(batch_images={batch_images or 'whole split'}, "
                f"stall timeout {stall_timeout_s:.0f}s)",
            )
            for split in splits:
                _run_split_isolated(
                    run_dp, output_dp, split, epoch, chunk, batch_images,
                    stall_timeout_s,
                )
            continue
        pipeline, params, rcfg, step = load_run(run_dp, epoch)
        for split in splits:
            logger.info("EvalAll", f"{run_name} [{split}]")
            _eval_split(
                pipeline, params, rcfg, step, run_dp, output_dp, split,
                chunk=chunk,
            )
    gather(output_dp, os.path.join(output_dp, "gathered.txt"))


def main(argv=None):
    from satnerf_tpu.eval.eval_nerf import _parse

    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    args, kwargs = _parse(argv)
    if kwargs.pop("worker", False):
        # Worker platform hook: this machine's sitecustomize force-registers
        # the TPU tunnel plugin and overrides JAX_PLATFORMS in every child
        # process, so CPU-hosted parents (tests) set this env var and the
        # worker wins it back through jax.config before backend init (same
        # move as tests/conftest.py).
        plat = os.environ.get("SATNERF_EVAL_FORCE_PLATFORM")
        if plat:
            import jax

            jax.config.update("jax_platforms", plat)
        return _worker(
            os.path.abspath(args[0]),
            os.path.abspath(args[1]),
            kwargs["split"],
            epoch=kwargs.get("epoch", -1),
            chunk=kwargs.get("chunk", 16384),
            max_images=kwargs.get("batch_images", 0),
        )
    eval_all(*args, **kwargs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
