"""Launch the SYN_LONG production-stability run (docs/validation_run.md).

Regenerates the full-size synthetic scene (8x256^2 train + 3 test views,
16k bundle-adjustment tie points) and trains the flagship ``rs_semantic``
configuration for 30k steps at production settings (8x512 SIREN, 64
samples/ray, batch 8192, bf16 + poly-sin, steps_per_dispatch=8, depth
supervision for the first quarter of training, car-reg from epoch 3).

Used for the round-2 preemption/determinism study (seed 7) and round-3
seed-robustness points. Scene + workspace live under ``.scratch`` (git-
ignored); results are summarised into docs/validation_run.md by hand.

Usage:
  python tools/syn_long_run.py <out_root> [--seed K] [--steps N]
      [--resume] [--val-every E]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out_root", help="run root (scene + workspace live here)")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--val-every", type=int, default=50)
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint in the workspace")
    # hierarchical (coarse-to-fine) variant: the feature the reference only
    # scaffolds (framework/components/rendering.py:8-55, use_fine_network
    # never enabled in its configs) run at production scale. The fine pass
    # triples field points/ray (64 coarse + 128 fine, sc-doubled), so the
    # stored-activation backward exceeds HBM at batch 8192 — the launcher
    # drops to batch 4096 + remat_chunks=2 when enabled.
    ap.add_argument("--n-importance", type=int, default=0)
    ap.add_argument("--use-fine-network", action="store_true")
    # solar-correction quadrature stride (docs/performance.md "sc_stride"):
    # 1 = reference-exact full ladder (flagship default); 2 = the gate-passed
    # recommended throughput config. The main pass is bit-invariant to the
    # knob, so same-seed runs consume identical ray streams (paired).
    ap.add_argument("--sc-stride", type=int, default=1)
    # smoke-test overrides (default None = production sizes: batch 8192,
    # 8x512 trunk, 8+3-view 256^2 scene with 16k tie points; hier mode
    # drops batch to 4096). Lets the launcher be driven end-to-end on CPU
    # with tiny shapes (tests/test_tools.py).
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--units", type=int, default=None)
    # params-only warm start from an existing checkpoint dir (fresh optimizer
    # + step 0; in hier mode the fine field is seeded from the source's
    # trained coarse field — see train/checkpoint.py:load_warm_start_params)
    ap.add_argument("--warm-start", default=None, metavar="CKPT_DIR")
    ap.add_argument("--learnrate", type=float, default=None)
    # positional-encoding frequency bump (rs_semantic maps xyz; the default
    # 10 freqs give a finest wavelength ~extent/2^10 ≈ 0.25 m at the 768²
    # dress scene — marginal at 0.33 m GSD, docs/validation_run.md)
    ap.add_argument("--posenc-freq", type=int, default=None)
    ap.add_argument("--run-postfix", default=None,
                    help="override the derived run_name_postfix")
    # beta-gate override: the round-5 warm-hier run measured the beta
    # uncertainty losses re-breaking trained-sigma altitude sharpness at
    # fine GSD (test MAE 1.688 -> 5.516 across the gate, validation_run.md);
    # a large value keeps beta OFF for pure fine-pass refinement phases.
    ap.add_argument("--first-beta-epoch", type=int, default=None)
    # explicit validation chunk (rays); 0 = auto (8192 floor). The hier
    # fine pass evaluates 4x the field points per ray of the flagship
    # config, so its validation renders use a smaller chunk to keep the
    # same on-chip footprint (train/loop.py:val_chunk_rays).
    ap.add_argument("--val-chunk-rays", type=int, default=None)
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--n-train", type=int, default=8)
    ap.add_argument("--n-test", type=int, default=3)
    ap.add_argument("--tie-points", type=int, default=16000)
    args = ap.parse_args(argv)

    os.makedirs(args.out_root, exist_ok=True)
    scene_dp = os.path.join(args.out_root, "scene")
    if not os.path.isfile(os.path.join(scene_dp, "root.json")):
        from satnerf_tpu.datasets.synthetic import generate_scene

        print(
            f"[syn_long] generating {args.n_train}+{args.n_test}-view "
            f"{args.img_size}^2 scene ...", flush=True,
        )
        generate_scene(
            scene_dp, n_train=args.n_train, n_test=args.n_test,
            img_size=args.img_size, n_tie_points=args.tie_points,
            aoi_name="SYN_LONG", seed=0,
        )

    from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
    from satnerf_tpu.pipelines import load_pipeline
    from satnerf_tpu.run.training import _apply_matmul_precision
    from satnerf_tpu.train.loop import Trainer

    run = RunConfig(
        dataset_name="scene",
        datasets_dp=args.out_root,
        cache_dp=os.path.join(args.out_root, "cache"),
        workspace_dp=os.path.join(args.out_root, "training"),
        max_train_steps=args.steps,
        check_val_every_n_epoch=args.val_every,
        num_sanity_val_steps=0,
        deterministic=True,
        seed=args.seed,
        steps_per_dispatch=8,
        run_name_postfix=(
            args.run_postfix if args.run_postfix is not None
            else "hier" if args.n_importance > 0
            else f"sc{args.sc_stride}" if args.sc_stride != 1
            else ""
        ),
        warm_start_fp=args.warm_start,
    )
    pipe_kwargs = dict(
        batch_size=8192,
        compute_dtype="bfloat16",
        ignore_car_index=False,
        use_car_reg_loss=True,
        car_reg_loss_start=3,
        lambda_c=1.0,
        sc_stride=args.sc_stride,
    )
    if args.n_importance > 0:
        pipe_kwargs.update(
            n_importance=args.n_importance,
            use_fine_network=args.use_fine_network,
            batch_size=4096,
            remat_chunks=2,
        )
    if args.val_chunk_rays is not None:
        pipe_kwargs["val_chunk_rays"] = args.val_chunk_rays
    if args.first_beta_epoch is not None:
        pipe_kwargs["first_beta_epoch"] = args.first_beta_epoch
    if args.batch is not None:
        pipe_kwargs["batch_size"] = args.batch
    if args.units is not None:
        pipe_kwargs["fc_units"] = args.units
    if args.learnrate is not None:
        pipe_kwargs["learnrate"] = args.learnrate
    if args.posenc_freq is not None:
        pipe_kwargs["mapping_pos_n_freq"] = args.posenc_freq
    pipe = RSSemanticConfig(**pipe_kwargs)
    cfgs = MainConfig(run, pipe)
    _apply_matmul_precision(run.matmul_precision)

    if args.resume:
        from satnerf_tpu.run.resume_training import resume

        ws = os.path.join(args.out_root, "training")
        runs = sorted(
            d for d in os.listdir(ws)
            if os.path.isdir(os.path.join(ws, d))
        )
        if not runs:
            print("[syn_long] --resume given but no run dir found", flush=True)
            return 1
        resume(os.path.join(ws, runs[-1]))
        return 0

    cfgs.create_run_dp()
    pipeline = load_pipeline(cfgs)
    pipeline.prepare_run()
    pipeline.load_datasets()
    trainer = Trainer(pipeline)
    trainer.fit()
    print(f"[syn_long] done: {cfgs.run.run_dp}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
