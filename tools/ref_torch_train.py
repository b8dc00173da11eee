"""Trained-vs-trained quality anchor: train the ACTUAL torch reference
(imported read-only from /root/reference) on one of our synthetic scenes with
matched hyperparameters, evaluate it with OUR eval metrics, and emit a
results JSON comparable 1:1 with a satnerf_tpu run on the same scene.

Why: no DFC2019 data is obtainable in this environment, so quality parity is
established reference-training vs our-training on a shared scene instead
(VERDICT round 1, "establish a real quality anchor"). The data flows through
OUR dataset pipeline for both sides, so both train on byte-identical rays;
the model/renderer/losses/optimizer on the reference side are the
reference's own modules (semantic/models/rs_semantic.py,
semantic/components/{rendering,loss}.py, baseline/components/loss.py,
framework/util/train_util.py schedules).

Also provides --paper-timing: measures the reference training step's
wall-clock on this host's CPU at the paper config (8x512, 64 samples,
batch 1024) to put bench.py's vs_baseline on a measured footing.

Usage:
  python tools/ref_torch_train.py <scene_dp> <out_dp> [--steps N] [--batch B]
      [--n-samples S] [--units U] [--seed K]
  python tools/ref_torch_train.py --paper-timing [--timing-steps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from types import SimpleNamespace

import numpy as np

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REF, REPO):
    if p not in sys.path:
        sys.path.insert(0, p)

# This harness is strictly CPU (torch reference + metric code); it must
# never touch the single-tenant TPU tunnel. The sitecustomize PJRT plugin
# overrides the env var, so force the platform through jax.config too.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def make_cfgs(args) -> SimpleNamespace:
    """The reference pipeline-config namespace its modules consume, at the
    reference defaults (baseline/pipelines/nerf.py:63-85, satnerf.py:115-124,
    snerf.py:67-68, semantic/pipelines/rs_semantic.py:125-141) except the
    explicitly matched size knobs."""
    return SimpleNamespace(
        pipeline=SimpleNamespace(
            n_samples=args.n_samples,
            render_chunk_size=5120,
            batch_size=args.batch,
            learnrate=5e-4,
            noise_std=0.0,
            activation_function="siren",
            mapping_pos_n_freq=10,
            mapping_dir_n_freq=4,
            fc_units=args.units,
            fc_layers=8,
            fc_skips=[4],
            fc_use_full_features=False,
            depth_enabled=True,
            depth_supervision_drop=0.25,
            ds_lambda=1000,
            ds_noweights=False,
            first_beta_epoch=2,
            t_embedding_vocab=50,
            t_embedding_tau=4,
            sc_lambda=0.05,
            lambda_s=0.04,
            semantic_activation_function="sigmoid",
            use_tj_for_s=False,
            use_beta_for_s=False,
            use_tj_instead_of_beta=False,
            use_separate_beta_for_s=False,
            use_separate_tj_for_semantic=False,
            detach_beta_for_s=False,
            ignore_car_index=False,
            use_car_reg_loss=True,
            lambda_c=1.0,
            car_reg_loss_start=3,
        )
    )


def load_scene(scene_dp: str, cache_dp: str):
    """Load rays through OUR dataset pipeline (both sides see these bytes)."""
    from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
    from satnerf_tpu.datasets import DepthDataset, SemanticDataset

    run = RunConfig(
        dataset_name=os.path.basename(scene_dp.rstrip("/")),
        datasets_dp=os.path.dirname(scene_dp.rstrip("/")),
        cache_dp=cache_dp,
        workspace_dp=os.path.join(cache_dp, "ws"),
    )
    cfg = MainConfig(run, RSSemanticConfig())
    train = SemanticDataset(cfg, "rgb", "train")
    test = SemanticDataset(cfg, "rgb", "test")
    train.load()
    test.load()
    combined = np.concatenate(
        [train.combined["rays"], test.combined["rays"]], axis=0
    )
    for ds in (train, test):
        ds.initialize_normalization(combined)
        ds.save_to_cache()
        ds.normalize()
    depth = DepthDataset(cfg, "depth", "train")
    depth.initialize_normalization()
    depth.load()
    return train, test, depth


def build_reference(cfgs, n_classes: int, seed: int):
    import torch

    from semantic.components.rendering import RSSemanticRendering
    from semantic.models.rs_semantic import RSSemanticNeRF, inference

    torch.manual_seed(seed)
    ds_stub = SimpleNamespace(semantic_n_classes=n_classes)
    models = {
        "coarse": RSSemanticNeRF(cfgs, ds_stub),
        "t": torch.nn.Embedding(
            cfgs.pipeline.t_embedding_vocab, cfgs.pipeline.t_embedding_tau
        ),
    }
    renderer = RSSemanticRendering(cfgs, inference=inference)
    return models, renderer


def reference_losses(cfgs, car_index: int):
    from baseline.components.loss import DepthLoss, SatNerfLoss, SNerfLoss
    from semantic.components.loss import (
        SemanticCarRegLoss,
        SemanticLoss,
        SemanticUncertaintyLoss,
    )

    p = cfgs.pipeline
    return SimpleNamespace(
        satnerf=SatNerfLoss(lambda_sc=p.sc_lambda),
        snerf=SNerfLoss(lambda_sc=p.sc_lambda),
        depth=DepthLoss(lambda_ds=p.ds_lambda),
        semantic=SemanticLoss(p.lambda_s, car_index, p.ignore_car_index),
        unc_semantic=SemanticUncertaintyLoss(
            p.lambda_s, car_index,
            detach_beta_for_s=p.detach_beta_for_s,
            ignore_car_index=p.ignore_car_index,
        ),
        car_reg=SemanticCarRegLoss(p.lambda_c, car_index),
    )


def reference_training_step(
    cfgs, models, renderer, losses, batch, epoch: int, step: int, ds_drop: int
):
    """The reference's RSSemanticTrainingStep.training_step semantics
    (semantic/components/training_step.py:12-130), minus the Lightning host."""
    import torch

    p = cfgs.pipeline
    results = renderer.render_rays(models, batch["rays"], batch["extras"])

    if epoch < p.first_beta_epoch:
        loss, _ = losses.snerf(results, batch["rgbs"])
    else:
        loss, _ = losses.satnerf(results, batch["rgbs"])

    if p.depth_enabled and step < ds_drop:
        tmp = renderer.render_rays(
            models, batch["depth_rays"], batch["depth_extras"]
        )
        kp_depths = torch.flatten(batch["depth_depths"][:, 0])
        kp_weights = torch.flatten(batch["depth_weights"])
        loss_depth, _ = losses.depth(tmp, kp_depths, kp_weights)
        loss = loss + loss_depth

    if epoch < p.first_beta_epoch or not p.use_beta_for_s:
        semantic_loss, _ = losses.semantic(
            results, batch["semantic"], batch["semantic_sparsity_mask"]
        )
    else:
        semantic_loss, _ = losses.unc_semantic(
            results, batch["semantic"], batch["semantic_sparsity_mask"]
        )
    loss = loss + semantic_loss

    if p.use_car_reg_loss and epoch >= p.car_reg_loss_start:
        car_reg_loss, _ = losses.car_reg(
            results, batch["semantic"], batch["semantic_sparsity_mask"]
        )
        loss = loss + car_reg_loss
    return loss


def train_reference(args):
    import torch

    os.makedirs(args.out_dp, exist_ok=True)
    cache_dp = os.path.join(args.out_dp, "cache")
    train, test, depth = load_scene(args.scene_dp, cache_dp)
    cfgs = make_cfgs(args)
    p = cfgs.pipeline

    models, renderer = build_reference(cfgs, train.semantic_n_classes, args.seed)
    losses = reference_losses(cfgs, train.car_cls_idx)
    params = [q for m in models.values() for q in m.parameters()]
    opt = torch.optim.Adam(params, lr=p.learnrate, weight_decay=0)
    # the reference's "step" schedule (framework/util/train_util.py:54-56;
    # that module itself imports lightning, unavailable here)
    scheduler = torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=0.9)

    c = train.combined
    n_rays = c["rays"].shape[0]
    steps_per_epoch = max(n_rays // p.batch_size, 1)
    ds_drop = int(p.depth_supervision_drop * args.steps)
    d = depth.combined
    n_depth = d["rays"].shape[0]
    depth_batch = min(p.batch_size, n_depth)

    def t(x, dtype=torch.float32):
        return torch.from_numpy(np.asarray(x)).to(dtype)

    rays = t(c["rays"])
    rgbs = t(c["rgbs"])
    extras = t(c["extras"])
    semantic = t(c["semantic"], torch.int64)
    sparsity = t(c["semantic_sparsity_mask"], torch.bool)
    drays = t(d["rays"])
    dextras = t(d["extras"])
    ddepths = t(d["depths"])
    dweights = t(d["weights"])

    eval_at = {
        int(s)
        for s in getattr(args, "eval_at", "").split(",")
        if s.strip() and int(s) < args.steps
    }
    rng = np.random.default_rng(args.seed)
    perm = rng.permutation(n_rays)
    cursor = 0
    history = []
    eval_seconds = 0.0
    t0 = time.time()
    for step in range(args.steps):
        epoch = step // steps_per_epoch
        if cursor + p.batch_size > n_rays:
            perm = rng.permutation(n_rays)
            cursor = 0
        idx = perm[cursor : cursor + p.batch_size]
        cursor += p.batch_size
        didx = rng.integers(0, n_depth, depth_batch)
        batch = {
            "rays": rays[idx], "rgbs": rgbs[idx], "extras": extras[idx],
            "semantic": semantic[idx],
            "semantic_sparsity_mask": sparsity[idx],
            "depth_rays": drays[didx], "depth_extras": dextras[didx],
            "depth_depths": ddepths[didx], "depth_weights": dweights[didx],
        }
        opt.zero_grad()
        loss = reference_training_step(
            cfgs, models, renderer, losses, batch, epoch, step, ds_drop
        )
        loss.backward()
        opt.step()
        if step > 0 and step % steps_per_epoch == 0:
            scheduler.step()  # per-epoch StepLR(gamma=0.9), ref interval="epoch"
        if step % 50 == 0 or step == args.steps - 1:
            el = time.time() - t0
            print(
                f"step {step}: loss={loss.item():.4f} "
                f"({el:.0f}s, {(step + 1) / el:.2f} it/s)",
                flush=True,
            )
            history.append({"step": step, "loss": loss.item()})
        if (step + 1) in eval_at:
            te = time.time()
            r = evaluate_reference(args, cfgs, models, renderer, test)
            for m in models.values():
                m.train()  # evaluate_reference flips them to eval mode
            fp = os.path.join(args.out_dp, f"results_step{step + 1}.json")
            with open(fp, "w") as f:
                json.dump(r, f, indent=2)
            print(
                f"[curve] step {step + 1}: psnr={r['psnr']:.2f} "
                f"mae={r['mae']:.2f} acc={r['acc']:.3f} miou={r['miou']:.3f}",
                flush=True,
            )
            eval_seconds += time.time() - te

    train_seconds = time.time() - t0 - eval_seconds
    torch.save(
        {k: m.state_dict() for k, m in models.items()},
        os.path.join(args.out_dp, "reference_trained.pt"),
    )
    results = evaluate_reference(args, cfgs, models, renderer, test)
    results["train_seconds"] = train_seconds
    results["steps"] = args.steps
    results["it_per_s_cpu"] = args.steps / train_seconds
    results["history"] = history
    with open(os.path.join(args.out_dp, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "history"},
                     indent=2))


def evaluate_reference(args, cfgs, models, renderer, test) -> dict:
    """Render the test split with the trained torch model and score it with
    OUR eval stack (metrics/dsm/semantic_metrics) — identical metric code to
    a satnerf_tpu run's eval."""
    import torch

    import jax.numpy as jnp

    from satnerf_tpu.eval import metrics
    from satnerf_tpu.eval.dsm import compute_dsm_and_mae
    from satnerf_tpu.eval.semantic_metrics import (
        confusion_matrix,
        semantic_accuracy,
        semantic_miou,
    )

    for m in models.values():
        m.eval()
    out: dict = {"per_image": {}}
    psnrs, ssims, maes, accs = [], [], [], []
    conf_total = None
    for i in range(1, len(test.data)):  # skip the prepended train view
        img = test.image_item(i)
        h, w = img["h"], img["w"]
        chunks = []
        with torch.no_grad():
            for s in range(0, img["rays"].shape[0], 4096):
                res = renderer.render_rays(
                    models,
                    torch.from_numpy(np.asarray(img["rays"][s : s + 4096])),
                    torch.from_numpy(np.asarray(img["extras"][s : s + 4096])),
                )
                chunks.append(
                    {
                        "rgb": res["rgb_coarse"].numpy(),
                        "depth": res["depth_coarse"].numpy(),
                        "logits": res["semantic_logits_coarse"].numpy(),
                    }
                )
        rgb = np.concatenate([c["rgb"] for c in chunks])
        dep = np.concatenate([c["depth"] for c in chunks])
        logits = np.concatenate([c["logits"] for c in chunks])

        gt = img["rgbs"].reshape(h, w, 3)
        pred = rgb.reshape(h, w, 3)
        psnr_ = float(metrics.psnr(jnp.asarray(pred), jnp.asarray(gt)))
        ssim_ = float(metrics.ssim(jnp.asarray(pred), jnp.asarray(gt)))
        mae = compute_dsm_and_mae(
            test, img["rays"], dep, args.out_dp, img["name"], 0
        )
        sem_pred = logits.argmax(-1)
        sem_gt = np.asarray(img["semantic"]).reshape(-1)
        acc = semantic_accuracy(sem_pred, sem_gt)
        conf = confusion_matrix(sem_pred, sem_gt, test.semantic_n_classes, normalize=None)
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


def paper_timing(args):
    """Measured reference training-step wall time at the PAPER config
    (8x512 SIREN, 64 samples, batch 1024 + depth batch 1024) on this CPU."""
    import torch

    cfgs = make_cfgs(
        SimpleNamespace(n_samples=64, batch=1024, units=512)
    )
    models, renderer = build_reference(cfgs, n_classes=5, seed=0)
    losses = reference_losses(cfgs, car_index=4)
    params = [q for m in models.values() for q in m.parameters()]
    opt = torch.optim.Adam(params, lr=cfgs.pipeline.learnrate, weight_decay=0)

    rng = np.random.default_rng(0)
    b = cfgs.pipeline.batch_size

    def mk(nb):
        o = rng.uniform(-0.5, 0.5, (nb, 3))
        d = np.tile([[0.05, 0.05, -1.0]], (nb, 1))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        rays = np.concatenate(
            [o, d, np.zeros((nb, 1)), np.ones((nb, 1))], 1
        ).astype(np.float32)
        sun = np.tile([[0.3, 0.3, 0.9]], (nb, 1))
        sun /= np.linalg.norm(sun, axis=1, keepdims=True)
        extras = np.concatenate(
            [sun, rng.integers(0, 8, (nb, 1))], 1
        ).astype(np.float32)
        return torch.from_numpy(rays), torch.from_numpy(extras)

    rays, extras = mk(b)
    drays, dextras = mk(b)
    batch = {
        "rays": rays, "extras": extras,
        "rgbs": torch.rand(b, 3),
        "semantic": torch.randint(0, 5, (b, 1)),
        "semantic_sparsity_mask": torch.ones(b, dtype=torch.bool),
        "depth_rays": drays, "depth_extras": dextras,
        "depth_depths": torch.full((b, 1), 0.5),
        "depth_weights": torch.ones(b, 1),
    }
    # warmup
    opt.zero_grad()
    loss = reference_training_step(
        cfgs, models, renderer, losses, batch, epoch=5, step=0,
        ds_drop=10**9,
    )
    loss.backward()
    opt.step()

    times = []
    for _ in range(args.timing_steps):
        t0 = time.perf_counter()
        opt.zero_grad()
        loss = reference_training_step(
            cfgs, models, renderer, losses, batch, epoch=5, step=0,
            ds_drop=10**9,
        )
        loss.backward()
        opt.step()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        json.dumps(
            {
                "config": "paper (8x512 siren, 64 samples, batch 1024 "
                          "+ depth 1024, sc on, all losses)",
                "host": "cpu",
                "torch_threads": torch.get_num_threads(),
                "best_step_seconds": round(best, 3),
                "mean_step_seconds": round(float(np.mean(times)), 3),
                "rays_per_sec_cpu": round(1024 / best, 1),
            }
        )
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("scene_dp", nargs="?")
    ap.add_argument("out_dp", nargs="?")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--n-samples", type=int, default=32)
    ap.add_argument("--units", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--eval-at", default="",
        help="comma-separated steps for mid-training learning-curve evals "
             "(each writes results_step{N}.json)",
    )
    ap.add_argument("--paper-timing", action="store_true")
    ap.add_argument("--timing-steps", type=int, default=5)
    args = ap.parse_args(argv)
    if args.paper_timing:
        paper_timing(args)
        return 0
    assert args.scene_dp and args.out_dp, "scene_dp and out_dp required"
    train_reference(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
