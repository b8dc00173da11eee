"""Our half of the trained-vs-trained anchor: train satnerf_tpu on the shared
synthetic scene at the matched configuration (production settings: bf16 GEMMs
+ fast_sin), evaluate the test split with the same metric code as
tools/ref_torch_train.py, and emit a comparable results JSON.

Runs on whatever platform JAX resolves (the TPU tunnel in this environment);
the reference side runs torch on CPU. Quality metrics are platform-neutral.

Usage:
  python tools/ours_train_eval.py <scene_dp> <out_dp> [--steps N] [--batch B]
      [--n-samples S] [--units U] [--seed K] [--dtype bfloat16|float32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("scene_dp")
    ap.add_argument("out_dp")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--n-samples", type=int, default=32)
    ap.add_argument("--units", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument(
        "--sin-impl", default="poly",
        help="SIREN sine kernel for training AND eval (poly|poly5|poly7f|"
             "exact); drives the paired-seed sine quality-gate runs "
             "(docs/performance.md 'degree-5 sine')",
    )
    ap.add_argument(
        "--sc-stride", type=int, default=1,
        help="solar-correction quadrature stride (1 = reference-exact full "
             "ladder); drives the paired-seed sc_stride quality-gate runs",
    )
    ap.add_argument(
        "--beta-ramp-epochs", type=float, default=0.0,
        help="opt-in beta warm-up ramp (epochs); 0 = reference-exact step "
             "gate — drives the paired-seed beta-transient gate runs",
    )
    ap.add_argument("--steps-per-dispatch", type=int, default=4)
    ap.add_argument(
        "--eval-at", default="",
        help="comma-separated global steps at which to run the full eval "
             "mid-training (learning-curve horizons); each writes "
             "results_step{N}.json",
    )
    ap.add_argument(
        "--platform", default="default",
        help="'cpu' forces the CPU backend (this machine's sitecustomize "
             "pins a TPU plugin that overrides JAX_PLATFORMS; forcing needs "
             "jax.config too); 'default' uses whatever JAX resolves",
    )
    args = ap.parse_args(argv)
    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
    from satnerf_tpu.pipelines import load_pipeline
    from satnerf_tpu.train.loop import Trainer

    os.makedirs(args.out_dp, exist_ok=True)
    run = RunConfig(
        dataset_name=os.path.basename(args.scene_dp.rstrip("/")),
        datasets_dp=os.path.dirname(args.scene_dp.rstrip("/")),
        cache_dp=os.path.join(args.out_dp, "cache"),
        workspace_dp=os.path.join(args.out_dp, "training"),
        max_train_steps=args.steps,
        # sparse validation: on the 256^2 quality scenes each validation
        # renders the full test split (~3 min on a contended host), and the
        # harness runs its own full eval at the end anyway
        check_val_every_n_epoch=int(os.environ.get("SATNERF_VAL_EVERY", 40)),
        num_sanity_val_steps=0,
        seed=args.seed,
        steps_per_dispatch=args.steps_per_dispatch,
    )
    # matched with tools/ref_torch_train.py make_cfgs (reference defaults)
    pipe = RSSemanticConfig(
        n_samples=args.n_samples,
        fc_units=args.units,
        batch_size=args.batch,
        ignore_car_index=False,
        use_car_reg_loss=True,
        car_reg_loss_start=3,
        lambda_c=1.0,
        compute_dtype=args.dtype,
        sin_impl=args.sin_impl,
        sc_stride=args.sc_stride,
        beta_ramp_epochs=args.beta_ramp_epochs,
    )
    cfg = MainConfig(run, pipe)
    pipeline = load_pipeline(cfg)
    pipeline.prepare_run()
    pipeline.load_datasets()

    trainer = Trainer(pipeline, log_every=100)

    # time-to-parity accounting (tools/time_to_parity.py): at each curve
    # horizon record wall-clock SINCE TRAINING STARTED with prior curve-eval
    # time subtracted — the honest "minutes of training to reach this
    # quality" (the first remote compile stays included: a user pays it too)
    eval_overhead = {"s": 0.0}

    def _curve_eval(state, step):
        t_ev = time.time()
        r = evaluate_ours(args, pipeline, state)
        r["train_seconds_to_here"] = t_ev - t0 - eval_overhead["s"]
        eval_overhead["s"] += time.time() - t_ev
        fp = os.path.join(args.out_dp, f"results_step{step}.json")
        with open(fp, "w") as f:
            json.dump(r, f, indent=2)
        print(
            f"[curve] step {step}: psnr={r['psnr']:.2f} mae={r['mae']:.2f} "
            f"acc={r['acc']:.3f} miou={r['miou']:.3f} "
            f"t_train={r['train_seconds_to_here']:.0f}s",
            flush=True,
        )

    callbacks = {
        int(s): _curve_eval
        for s in args.eval_at.split(",")
        if s.strip() and int(s) < args.steps
    }
    t0 = time.time()
    state = trainer.fit(step_callbacks=callbacks or None)
    train_seconds = time.time() - t0

    results = evaluate_ours(args, pipeline, state)
    # wall-clock including the remote first compile (~1-2 min on this
    # tunnel); NOT a throughput measurement — bench.py owns those
    results["train_wall_seconds_incl_compile"] = train_seconds
    results["train_seconds_excl_curve_evals"] = (
        train_seconds - eval_overhead["s"]
    )
    results["steps"] = args.steps
    results["it_per_s_wall"] = args.steps / train_seconds
    with open(os.path.join(args.out_dp, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "history"},
                     indent=2))
    return 0


def evaluate_ours(args, pipeline, state) -> dict:
    """Identical metric flow to ref_torch_train.evaluate_reference."""
    import jax.numpy as jnp

    from satnerf_tpu.eval import metrics
    from satnerf_tpu.eval.dsm import compute_dsm_and_mae
    from satnerf_tpu.eval.semantic_metrics import (
        confusion_matrix,
        semantic_accuracy,
        semantic_miou,
    )
    from satnerf_tpu.render.renderer import render_image_chunked

    test = pipeline.datasets["rgb_test"]
    rcfg = pipeline.step_config(1).render
    out: dict = {"per_image": {}}
    psnrs, ssims, maes, accs = [], [], [], []
    conf_total = None
    for i in range(1, len(test.data)):  # skip the prepended train view
        img = test.image_item(i)
        res = render_image_chunked(
            state.params, rcfg, img["rays"], img["extras"], chunk=8192
        )
        h, w = img["h"], img["w"]
        gt = img["rgbs"].reshape(h, w, 3)
        pred = np.asarray(res["rgb"]).reshape(h, w, 3)
        psnr_ = float(metrics.psnr(jnp.asarray(pred), jnp.asarray(gt)))
        ssim_ = float(metrics.ssim(jnp.asarray(pred), jnp.asarray(gt)))
        mae = compute_dsm_and_mae(
            test, img["rays"], np.asarray(res["depth"]), args.out_dp,
            img["name"], 0,
        )
        sem_pred = np.asarray(res["semantic_logits"]).argmax(-1)
        sem_gt = np.asarray(img["semantic"]).reshape(-1)
        acc = semantic_accuracy(sem_pred, sem_gt)
        conf = confusion_matrix(
            sem_pred, sem_gt, test.semantic_n_classes, normalize=None
        )
        conf_total = conf if conf_total is None else conf_total + conf
        out["per_image"][img["name"]] = {
            "psnr": psnr_, "ssim": ssim_, "mae": float(mae["mean"]),
            "acc": acc,
        }
        psnrs.append(psnr_)
        ssims.append(ssim_)
        maes.append(float(mae["mean"]))
        accs.append(acc)
    out["psnr"] = float(np.mean(psnrs))
    out["ssim"] = float(np.mean(ssims))
    out["mae"] = float(np.mean(maes))
    out["acc"] = float(np.mean(accs))
    out["miou"] = float(semantic_miou(conf_total))
    return out


if __name__ == "__main__":
    raise SystemExit(main())
