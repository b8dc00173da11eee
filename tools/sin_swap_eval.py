"""Eval-time sine-engine swap study: where does the poly5 DSM-MAE bias enter?

Round-2 paired-seed runs measured a consistent ~+0.9 m DSM-MAE cost for
training with ``sin_impl="poly5"`` (docs/performance.md "degree-5 sine").
Two mechanisms are possible, with opposite remedies:

  (a) FORWARD bias: the polynomial's spatially-smooth error perturbs the
      rendered density/depth at inference; then even a poly-trained model
      evaluated with poly5 degrades, and a poly5-trained model evaluated
      with poly/exact recovers -> train fast + eval accurate = full poly5
      speed with no quality cost.
  (b) TRAINING bias: the weights adapt around the biased activations and
      bake the altitude error into the field; then the eval-time engine
      barely matters and poly5 is genuinely unsafe for DSM workloads.

This tool renders the SAME checkpoint under several eval-time sine engines
and prints PSNR + registered DSM MAE per engine, for each run dir given —
running it over {poly-trained, poly5-trained} x seeds fills the 2x2 matrix
that separates (a) from (b).

Usage:
  python tools/sin_swap_eval.py <run_dp> [...run_dps]
      [--sins poly,poly5,poly7f,exact] [--split test] [--out /tmp/sinswap]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from dataclasses import replace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def eval_run_with_sin(run_dp: str, sin: str, split: str, out_dp: str) -> dict:
    from satnerf_tpu.eval.eval_nerf import evaluate_image
    from satnerf_tpu.eval.loader import load_run
    from satnerf_tpu.render.renderer import render_image_chunked

    pipeline, params, rcfg, step = load_run(run_dp, -1)
    rcfg = replace(rcfg, field=replace(rcfg.field, sin_impl=sin))

    dataset = pipeline.datasets["rgb" if split == "train" else "rgb_test"]
    start = 1 if split == "test" else 0
    os.makedirs(out_dp, exist_ok=True)

    import numpy as np

    agg: dict = {}
    for img_idx in range(start, len(dataset.data)):
        img = dataset.image_item(img_idx)
        res = render_image_chunked(
            params, rcfg, img["rays"], img["extras"], chunk=16384
        )
        entry = evaluate_image(dataset, img, res, out_dp, step)
        for k in ("psnr", "ssim"):
            agg.setdefault(k, []).append(float(entry[k]))
        mae = entry.get("mae", {})
        if isinstance(mae, dict) and mae.get("mean") not in (None, "nan"):
            agg.setdefault("mae", []).append(float(mae["mean"]))
    return {k: float(np.mean(v)) for k, v in agg.items()}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dps", nargs="+")
    ap.add_argument("--sins", default="poly,poly5")
    ap.add_argument("--split", default="test")
    ap.add_argument("--out", default="/tmp/sinswap")
    args = ap.parse_args(argv)

    rows = []
    for run_dp in args.run_dps:
        name = os.path.basename(run_dp.rstrip("/"))
        # run dirs are nested under <harness-out>/training/<stamp>_...; walk
        # up past the generic "training" level so the label carries the
        # harness out-dir name (which encodes the trained engine + seed)
        parent_dp = os.path.dirname(run_dp.rstrip("/"))
        parent = os.path.basename(parent_dp)
        if parent == "training":
            label = os.path.basename(os.path.dirname(parent_dp))
        elif parent.startswith("training_"):
            label = parent
        else:
            label = name
        for sin in args.sins.split(","):
            out_dp = os.path.join(args.out, f"{label}__{sin}")
            r = eval_run_with_sin(run_dp, sin, args.split, out_dp)
            row = {"run": label, "eval_sin": sin, **r}
            rows.append(row)
            print("SINSWAP " + json.dumps(row), flush=True)

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(rows, f, indent=2)
    print(f"summary -> {args.out}/summary.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
