"""The fused training step: render + all loss terms + Adam update in one jit.

Replaces the Lightning training_step call tree (ref:
semantic/components/training_step.py:10-99, baseline/components/
training_step.py:7-59, base_ray_pipeline.py:56-99) with a single compiled
program. Design decisions for TPU:

* epoch-dependent gates (beta at ``first_beta_epoch``, car-reg at
  ``car_reg_loss_start``) are runtime multiplier masks derived from the step
  counter carried in TrainState — no retraces across epochs;
* the depth-supervision phase boundary (``depth_supervision_drop``) is a
  STATIC flag: the host loop switches from the with-depth step function to
  the without-depth one at the boundary, so the post-drop program does not
  pay the depth forward at all (the reference keeps evaluating the depth
  renderer inputs until the gate turns false);
* the depth forward skips the solar-correction pass — the reference renders
  it but never reads its outputs in the depth loss
  (ref: training_step.py:32-35 feeds the full renderer; only depth is used);
* gradients flow through one ``jax.value_and_grad``; under a sharded batch
  the mean-reductions make XLA insert the cross-chip psum automatically.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import optax

from satnerf_tpu.render.renderer import RenderConfig, render_rays
from satnerf_tpu.train import losses
from satnerf_tpu.train.state import TrainState


@dataclass(frozen=True)
class StepConfig:
    """Static step configuration (hashable; derived from MainConfig)."""

    render: RenderConfig
    steps_per_epoch: int
    # rgb loss
    sc_lambda: float = 0.05
    first_beta_epoch: int = 2
    # beta warm-up ramp (opt-in mitigation for the small-batch beta
    # transient, docs/validation_run.md "8x512 anchor"): 0 = the
    # reference-exact step gate at first_beta_epoch
    # (ref: baseline/components/training_step.py:22-27); > 0 = mix the
    # uncertainty losses in LINEARLY over this many epochs starting at
    # first_beta_epoch instead of switching in one step.
    beta_ramp_epochs: float = 0.0
    # depth
    depth: bool = False  # include the depth forward in this step program
    ds_lambda: float = 1000.0
    ds_noweights: bool = False
    # semantic
    semantic: bool = False
    lambda_s: float = 0.04
    car_index: int = -1
    ignore_car_index: bool = True
    use_beta_for_s: bool = False
    detach_beta_for_s: bool = False
    use_car_reg_loss: bool = False
    car_reg_loss_start: int = 3
    lambda_c: float = 0.1
    # micro-batching: split each batch into K sequential micro-steps whose
    # gradients are averaged before ONE optimizer update (lax.scan, so
    # activation memory is O(batch/K)) — unlocks effective batches beyond
    # single-chip HBM (e.g. 65536 rays with K=8)
    grad_accum: int = 1

    @property
    def variant(self) -> str:
        return self.render.field.variant


def compute_losses(scfg: StepConfig, params, batch, step, key):
    """Render + every loss term for one batch. Shared by train and eval."""
    fcfg = scfg.render.field
    k_main, k_depth = (
        jax.random.split(key) if key is not None else (None, None)
    )

    results = render_rays(params, scfg.render, batch["rays"], batch["extras"], key=k_main)

    epoch = step // scfg.steps_per_epoch
    loss_dict: dict = {}

    # -- RGB loss (beta-gated, ref: training_step.py:22-27) ---------------
    # when hierarchical sampling is enabled, the fine pass is the primary
    # result and the coarse pass is supervised too (ref loss modules add
    # fine terms when present, loss.py:62-67)
    sc_on = scfg.sc_lambda > 0 and scfg.render.solar_correction
    rgb_passes = [("", results)]
    if "coarse" in results:
        rgb_passes.append(("c_", results["coarse"]))

    beta_active = jnp.asarray(0.0)
    if scfg.variant not in ("nerf", "snerf"):
        if scfg.beta_ramp_epochs > 0:
            # linear warm-up: 0 before first_beta_epoch, 1 after
            # first_beta_epoch + beta_ramp_epochs, mixing in between —
            # the uncertainty re-weighting arrives gradually instead of
            # starving supervision in one step at small batch sizes
            ramp_steps = float(scfg.beta_ramp_epochs * scfg.steps_per_epoch)
            # float math: first_beta_epoch can be 1e7 (tj mode), which
            # overflows int32 when multiplied by steps_per_epoch
            start = float(scfg.first_beta_epoch) * float(scfg.steps_per_epoch)
            beta_active = jnp.clip(
                (jnp.asarray(step, jnp.float32) - start) / ramp_steps,
                0.0,
                1.0,
            )
        else:
            beta_active = (epoch >= scfg.first_beta_epoch).astype(jnp.float32)
        loss_dict["beta_loss_activated"] = beta_active

    loss = jnp.asarray(0.0)
    for prefix, res in rgb_passes:
        if scfg.variant == "nerf":
            rgb_loss, rgb_dict = losses.nerf_loss(res, batch["rgbs"])
        elif scfg.variant == "snerf":
            rgb_loss, rgb_dict = losses.snerf_loss(
                res, batch["rgbs"], scfg.sc_lambda, sc_on
            )
        else:
            l_beta, d_beta = losses.satnerf_loss(
                res, batch["rgbs"], scfg.sc_lambda, sc_on
            )
            l_plain, d_plain = losses.snerf_loss(
                res, batch["rgbs"], scfg.sc_lambda, sc_on
            )
            rgb_loss = beta_active * l_beta + (1.0 - beta_active) * l_plain
            rgb_dict = {
                "coarse_color": beta_active * d_beta["coarse_color"]
                + (1.0 - beta_active) * d_plain["coarse_color"],
                "coarse_logbeta": beta_active * d_beta["coarse_logbeta"],
            }
            if sc_on:
                rgb_dict["coarse_sc_term2"] = d_beta["coarse_sc_term2"]
                rgb_dict["coarse_sc_term3"] = d_beta["coarse_sc_term3"]
        loss = loss + rgb_loss
        loss_dict.update({prefix + k: v for k, v in rgb_dict.items()})

    # -- depth supervision (ref: training_step.py:29-54) ------------------
    if scfg.depth:
        depth_rcfg = replace(scfg.render, solar_correction=False)
        d_results = render_rays(
            params, depth_rcfg, batch["depth_rays"], batch["depth_extras"], key=k_depth
        )
        kp_w = 1.0 if scfg.ds_noweights else batch["depth_weights"].reshape(-1)
        depth_passes = [("", d_results)]
        if "coarse" in d_results:
            depth_passes.append(("c_", d_results["coarse"]))
        for prefix, dres in depth_passes:
            d_loss, d_dict = losses.depth_loss(
                dres, batch["depth_depths"].reshape(-1), kp_w, scfg.ds_lambda
            )
            loss = loss + d_loss
            loss_dict.update({prefix + k: v for k, v in d_dict.items()})
        loss_dict["depth_loss_activated"] = jnp.asarray(1.0)

    # -- semantic losses (ref: semantic/components/training_step.py:56-92) -
    # applied to every rendered pass (fine + coarse when hierarchical
    # sampling is on; the reference loss modules add fine_semantic terms)
    if scfg.semantic:
        sem = batch["semantic"]
        sem_mask = batch.get("semantic_sparsity_mask")
        for prefix, res in rgb_passes:
            l_plain_s, d_plain_s = losses.semantic_loss(
                res, sem, sem_mask, scfg.lambda_s, scfg.car_index,
                scfg.ignore_car_index,
            )
            if scfg.use_beta_for_s:
                l_unc_s, d_unc_s = losses.semantic_uncertainty_loss(
                    res, sem, sem_mask, scfg.lambda_s, scfg.car_index,
                    scfg.ignore_car_index, scfg.detach_beta_for_s,
                )
                sem_loss = (
                    beta_active * l_unc_s + (1.0 - beta_active) * l_plain_s
                )
                sem_ce = (
                    beta_active * d_unc_s["coarse_semantic"]
                    + (1.0 - beta_active) * d_plain_s["coarse_semantic"]
                )
                loss_dict[prefix + "coarse_semantic"] = sem_ce
                if "coarse_semantic_logbeta" in d_unc_s:
                    loss_dict[prefix + "coarse_semantic_logbeta"] = (
                        beta_active * d_unc_s["coarse_semantic_logbeta"]
                    )
                loss_dict["semantic_beta_loss_activated"] = beta_active
            else:
                sem_loss = l_plain_s
                loss_dict.update(
                    {prefix + k: v for k, v in d_plain_s.items()}
                )
                loss_dict["semantic_beta_loss_activated"] = jnp.asarray(0.0)
            loss = loss + sem_loss

        if scfg.use_car_reg_loss:
            car_active = (epoch >= scfg.car_reg_loss_start).astype(jnp.float32)
            l_car, d_car = losses.semantic_car_reg_loss(
                results, sem, sem_mask, scfg.lambda_c, scfg.car_index
            )
            loss = loss + car_active * l_car
            loss_dict["coarse_car_reg_loss"] = car_active * d_car["coarse_car_reg_loss"]
            loss_dict["car_reg_loss_activated"] = car_active

        # step-level semantic accuracy (ref: training_step.py:94-97)
        pred = results["semantic_label"]
        loss_dict["semantic_accuracy"] = jnp.mean(
            (pred == sem.reshape(-1).astype(pred.dtype)).astype(jnp.float32)
        )

    loss_dict["psnr"] = losses.psnr(results["rgb"], batch["rgbs"])
    return loss, loss_dict, results


def build_train_step(scfg: StepConfig, optimizer: optax.GradientTransformation):
    """Returns jittable ``train_step(state, batch, key) -> (state, metrics)``."""

    def grad_fn(params, batch, step, key):
        def loss_fn(p):
            loss, loss_dict, _ = compute_losses(scfg, p, batch, step, key)
            return loss, loss_dict

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def train_step(state: TrainState, batch: dict, key: jax.Array):
        k = scfg.grad_accum
        if k <= 1:
            (loss, loss_dict), grads = grad_fn(
                state.params, batch, state.step, key
            )
        else:
            # reshape every batch leaf to (K, n/K, ...) and scan micro-steps.
            # Leaves not divisible by K (the auto-sized depth tie-point
            # batch) are trimmed by up to K-1 rows; leaves SMALLER than K
            # are broadcast whole into every micro-step (the averaged
            # result then equals the full-batch loss/grad for that term).
            def to_micro(x):
                if x.shape[0] < k:
                    return jnp.broadcast_to(x[None], (k,) + x.shape)
                return x[: (x.shape[0] // k) * k].reshape(
                    (k, x.shape[0] // k) + x.shape[1:]
                )

            micro = jax.tree.map(to_micro, batch)
            keys = jax.random.split(key, k)

            def body(carry, inp):
                grads_acc, loss_acc, dict_acc = carry
                mb, mk = inp
                (loss, ld), grads = grad_fn(state.params, mb, state.step, mk)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                loss_acc = loss_acc + loss
                dict_acc = jax.tree.map(jnp.add, dict_acc, ld)
                return (grads_acc, loss_acc, dict_acc), None

            # first micro-step initialises the accumulators (gives the
            # loss-dict structure without a separate eval_shape pass)
            first_mb = jax.tree.map(lambda x: x[0], micro)
            (loss0, dict0), grads0 = grad_fn(
                state.params, first_mb, state.step, keys[0]
            )
            rest = (
                jax.tree.map(lambda x: x[1:], micro),
                keys[1:],
            )
            (grads, loss, loss_dict), _ = jax.lax.scan(
                body, (grads0, loss0, dict0), rest
            )
            inv = 1.0 / k
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss = loss * inv
            loss_dict = jax.tree.map(lambda v: v * inv, loss_dict)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **loss_dict}
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return train_step


def resolve_trunk_impl(p) -> str:
    """Resolve ``trunk_impl="auto"`` to the measured-best field engine.

    The two engines sit on opposite ends of a memory/compute trade
    (docs/performance.md "Round 2" section, measured on a v5e at the
    flagship config): XLA's stored-activation backward wins at bf16 while
    one dispatch's activations fit in HBM (~8192 rays x 64 samples); the
    fused Pallas kernel's recompute backward (one (N, feat) residual
    instead of every layer's activations) wins at f32 and at any larger
    per-dispatch point count. Ineligible configs (non-SIREN trunk,
    feat % 128 != 0, ...) fall back to the XLA path inside the model
    regardless of what this returns.
    """
    impl = getattr(p, "trunk_impl", "xla")
    if impl != "auto":
        return impl
    if getattr(p, "compute_dtype", "float32") != "bfloat16":
        return "pallas"
    rays = p.batch_size // max(getattr(p, "grad_accum", 1), 1)
    if rays * p.n_samples > 8192 * 64:
        return "pallas"
    return "xla"


def resolve_trunk_bwd(p) -> str:
    """Resolve ``trunk_bwd="auto"`` for the pallas engine.

    "stored" (forward writes trunk pre-activations to HBM, the VJP
    consumes them — skips the backward's L recompute GEMMs) is only
    viable while one dispatch's activations fit in HBM, the same
    boundary as resolve_trunk_impl; beyond it the recompute backward is
    the whole point of the kernel. Chip-measured 2026-08-18 at the
    flagship 8192 bf16 config (docs/performance.md "hybrid backward"):
    stored 191.7 ms/step vs recompute 204.2 — a 12.5 ms win, closing the
    engine race with XLA's own stored-activation backward to ~1 ms. f32
    doubles the residual bytes (would exceed HBM at the same boundary)
    and is unmeasured, so "auto" keeps recompute there.
    """
    bwd = getattr(p, "trunk_bwd", "recompute")
    if bwd != "auto":
        return bwd
    if getattr(p, "compute_dtype", "float32") != "bfloat16":
        return "recompute"
    rays = p.batch_size // max(getattr(p, "grad_accum", 1), 1)
    if rays * p.n_samples > 8192 * 64:
        return "recompute"  # activations exceed HBM; stored can't apply
    return "stored"


def resolve_sin_impl(p) -> str:
    """Resolve ``sin_impl="auto"`` to the quality-safe sine kernel.

    "auto" resolves to the degree-7 kernel for every dtype. The degree-5
    kernel is 8% faster end-to-end at the flagship bf16 config and
    PSNR-neutral, but paired-seed 8000-step runs measured a consistent
    ~0.9 m DSM-MAE cost (docs/performance.md "degree-5 sine" section):
    its error is 30x below bf16 rounding PER ACTIVATION yet spatially
    correlated (a smooth function of the pre-activation), and the
    altitude/σ geometry integrates that bias where it shrugs off bf16's
    noise. Use ``sin_impl="poly5"`` explicitly for PSNR-bound workloads
    (e.g. pure novel-view serving) where the throughput matters more.
    """
    impl = getattr(p, "sin_impl", "poly")
    if impl == "auto":
        return "poly"
    return impl


def step_config_from_main(
    cfg,
    steps_per_epoch: int,
    with_depth: bool | None = None,
    n_classes: int = 5,
    car_index: int = -1,
):
    """Derive (render cfg, step cfg) from a MainConfig.

    ``with_depth=None`` auto-selects from pipeline.depth_enabled; the training
    loop builds both variants and switches at the drop boundary.
    ``n_classes``/``car_index`` come from the semantic dataset's label map
    (ref: semantic/dataset/semantic_dataset.py:36-44).
    """
    from satnerf_tpu.models.field import FieldConfig

    p = cfg.pipeline
    fcfg = FieldConfig(
        variant=p.variant,
        layers=p.fc_layers,
        feat=p.fc_units,
        skips=tuple(p.fc_skips),
        siren=p.activation_function == "siren",
        sin_impl=resolve_sin_impl(p),
        trunk_impl=resolve_trunk_impl(p),
        trunk_bwd=resolve_trunk_bwd(p),
        mapping=p.use_mapping,
        mapping_pos_n_freq=p.mapping_pos_n_freq,
        mapping_dir_n_freq=p.mapping_dir_n_freq,
        fc_use_full_features=p.fc_use_full_features,
        t_embedding_tau=getattr(p, "t_embedding_tau", 4),
        n_classes=n_classes,
        semantic_sigmoid=getattr(p, "semantic_activation_function", "sigmoid")
        == "sigmoid",
        use_tj_for_s=getattr(p, "use_tj_for_s", False),
        use_tj_instead_of_beta=getattr(p, "use_tj_instead_of_beta", False),
        use_separate_beta_for_s=getattr(p, "use_separate_beta_for_s", False),
        use_separate_tj_for_semantic=getattr(
            p, "use_separate_tj_for_semantic", False
        ),
    )
    rcfg = RenderConfig(
        field=fcfg,
        n_samples=p.n_samples,
        solar_correction=getattr(p, "sc_lambda", 0.0) > 0,
        sc_stride=getattr(p, "sc_stride", 1),
        compute_dtype=getattr(p, "compute_dtype", "float32"),
        n_importance=getattr(p, "n_importance", 0),
        use_fine_network=getattr(p, "use_fine_network", False),
        remat_chunks=getattr(p, "remat_chunks", 0),
    )
    depth = getattr(p, "depth_enabled", False) if with_depth is None else with_depth
    return StepConfig(
        render=rcfg,
        steps_per_epoch=steps_per_epoch,
        sc_lambda=getattr(p, "sc_lambda", 0.0),
        # tj-instead-of-beta mode permanently disables the uncertainty
        # losses: the reference forces first_beta_epoch = 1e7 there
        # (semantic/pipelines/rs_semantic.py:30-32); without this the beta
        # RGB loss (and the beta-gated semantic uncertainty CE) would
        # activate at epoch 2 in a mode that must never train beta.
        first_beta_epoch=(
            10_000_000
            if getattr(p, "use_tj_instead_of_beta", False)
            else getattr(p, "first_beta_epoch", 2)
        ),
        beta_ramp_epochs=getattr(p, "beta_ramp_epochs", 0.0),
        depth=depth,
        ds_lambda=getattr(p, "ds_lambda", 1000.0),
        ds_noweights=getattr(p, "ds_noweights", False),
        semantic=p.variant == "rs_semantic",
        lambda_s=getattr(p, "lambda_s", 0.04),
        car_index=car_index,
        ignore_car_index=getattr(p, "ignore_car_index", True),
        use_beta_for_s=getattr(p, "use_beta_for_s", False),
        detach_beta_for_s=getattr(p, "detach_beta_for_s", False),
        use_car_reg_loss=getattr(p, "use_car_reg_loss", False),
        car_reg_loss_start=getattr(p, "car_reg_loss_start", 3),
        lambda_c=getattr(p, "lambda_c", 0.1),
        grad_accum=getattr(p, "grad_accum", 1),
    )
