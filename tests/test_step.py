"""Train-step tests: optimization makes progress, gates flip with epochs,
depth/no-depth step variants share state."""

import jax
import jax.numpy as jnp
import numpy as np

from satnerf_tpu.models.field import FieldConfig
from satnerf_tpu.render.renderer import RenderConfig
from satnerf_tpu.train.state import TrainState, create_train_state, make_optimizer
from satnerf_tpu.train.step import StepConfig, build_train_step


def _batch(b=64, s=8, n_classes=5, depth=False, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.5, 0.5, (b, 3)).astype(np.float32)
    d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (b, 1))
    rays = np.concatenate(
        [o, d, np.zeros((b, 1), np.float32), np.ones((b, 1), np.float32)], 1
    )
    sun = np.tile(np.array([[0.3, 0.3, 0.9]], np.float32), (b, 1))
    sun /= np.linalg.norm(sun, axis=1, keepdims=True)
    extras = np.concatenate(
        [sun, (rng.integers(0, 4, b)).astype(np.float32)[:, None]], 1
    )
    batch = {
        "rays": jnp.asarray(rays),
        "extras": jnp.asarray(extras),
        "rgbs": jnp.asarray(rng.uniform(0.2, 0.8, (b, 3)).astype(np.float32)),
        "semantic": jnp.asarray(rng.integers(0, n_classes, (b, 1))),
        "semantic_sparsity_mask": jnp.ones(b, dtype=bool),
    }
    if depth:
        batch.update(
            {
                "depth_rays": batch["rays"][: b // 2],
                "depth_extras": batch["extras"][: b // 2],
                "depth_depths": jnp.full((b // 2,), 0.5, jnp.float32),
                "depth_weights": jnp.ones((b // 2,), jnp.float32),
            }
        )
    return batch


def _scfg(variant="rs_semantic", depth=False, steps_per_epoch=4, **over):
    fcfg = FieldConfig(
        variant=variant, layers=2, feat=64, skips=(1,),
        mapping=(variant in ("nerf", "rs_semantic")),
        siren=(variant != "nerf"),
    )
    rcfg = RenderConfig(field=fcfg, n_samples=8, solar_correction=variant != "nerf")
    kw = dict(
        render=rcfg, steps_per_epoch=steps_per_epoch, depth=depth,
        semantic=variant == "rs_semantic", car_index=4,
        use_car_reg_loss=variant == "rs_semantic", car_reg_loss_start=2,
        use_beta_for_s=True, sc_lambda=0.05 if variant != "nerf" else 0.0,
        first_beta_epoch=1,
    )
    kw.update(over)
    return StepConfig(**kw)


def test_loss_decreases_satnerf():
    scfg = _scfg("satnerf", depth=True)
    opt = make_optimizer(5e-3, steps_per_epoch=scfg.steps_per_epoch)
    state = create_train_state(jax.random.PRNGKey(0), scfg.render.field, opt)
    step = jax.jit(build_train_step(scfg, opt))
    batch = _batch(depth=True)

    first = None
    for i in range(30):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        if i == 0:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)
    assert int(state.step) == 30


def test_gates_flip_with_epoch():
    scfg = _scfg("rs_semantic", steps_per_epoch=5)
    opt = make_optimizer(1e-3, steps_per_epoch=5)
    state = create_train_state(jax.random.PRNGKey(1), scfg.render.field, opt)
    step = jax.jit(build_train_step(scfg, opt))
    batch = _batch()

    seen = {}
    for i in range(12):
        epoch = int(state.step) // 5
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        seen[epoch] = {
            "beta": float(metrics["beta_loss_activated"]),
            "car": float(metrics["car_reg_loss_activated"]),
            "sem_beta": float(metrics["semantic_beta_loss_activated"]),
        }
    # first_beta_epoch=1, car_reg_loss_start=2
    assert seen[0] == {"beta": 0.0, "car": 0.0, "sem_beta": 0.0}
    assert seen[1]["beta"] == 1.0 and seen[1]["car"] == 0.0
    assert seen[2]["car"] == 1.0 and seen[2]["sem_beta"] == 1.0


def test_depth_switch_shares_state():
    """The no-depth step continues from state produced by the depth step."""
    opt = make_optimizer(1e-3, steps_per_epoch=4)
    scfg_d = _scfg("satnerf", depth=True)
    scfg_nd = _scfg("satnerf", depth=False)
    state = create_train_state(jax.random.PRNGKey(2), scfg_d.render.field, opt)
    step_d = jax.jit(build_train_step(scfg_d, opt))
    step_nd = jax.jit(build_train_step(scfg_nd, opt))
    batch = _batch(depth=True)

    state, m1 = step_d(state, batch, jax.random.PRNGKey(0))
    assert "coarse_ds" in m1
    nd_batch = {k: v for k, v in batch.items() if not k.startswith("depth")}
    state, m2 = step_nd(state, nd_batch, jax.random.PRNGKey(1))
    assert "coarse_ds" not in m2
    assert int(state.step) == 2


def test_all_variants_one_step():
    for variant in ("nerf", "snerf", "satnerf", "rs_semantic"):
        scfg = _scfg(variant)
        opt = make_optimizer(1e-3, steps_per_epoch=4)
        state = create_train_state(jax.random.PRNGKey(3), scfg.render.field, opt)
        step = jax.jit(build_train_step(scfg, opt))
        state, metrics = step(state, _batch(), jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"])), variant
        assert np.isfinite(float(metrics["psnr"])), variant


def test_grad_accum_matches_full_batch():
    """K micro-steps with averaged grads == one full-batch step (same math;
    sampling keys differ per micro-batch so compare with deterministic
    rendering: perturb=0 via key=None is not possible in train_step, so use
    identical per-micro keys by fixing the batch to identical halves)."""
    import dataclasses

    fcfg = FieldConfig(variant="satnerf", layers=2, feat=64, skips=(1,))
    rcfg = RenderConfig(field=fcfg, n_samples=8, solar_correction=True,
                        perturb=0.0)  # deterministic sampling
    base = dict(render=rcfg, steps_per_epoch=4, sc_lambda=0.05,
                first_beta_epoch=0)
    scfg1 = StepConfig(**base, grad_accum=1)
    scfg4 = StepConfig(**base, grad_accum=4)
    opt = make_optimizer(1e-3, steps_per_epoch=4)
    state0 = create_train_state(jax.random.PRNGKey(0), fcfg, opt)

    batch = _batch(64)
    s1, m1 = jax.jit(build_train_step(scfg1, opt))(
        state0, batch, jax.random.PRNGKey(5)
    )
    s4, m4 = jax.jit(build_train_step(scfg4, opt))(
        state0, batch, jax.random.PRNGKey(5)
    )
    # with perturb=0 the render is key-independent -> identical losses/grads
    np.testing.assert_allclose(float(m4["loss"]), float(m1["loss"]), rtol=1e-5)
    w1 = np.asarray(s1.params["field"]["trunk"][0]["w"])
    w4 = np.asarray(s4.params["field"]["trunk"][0]["w"])
    np.testing.assert_allclose(w4, w1, atol=1e-6)


def test_grad_accum_with_depth_and_semantic():
    scfg = _scfg("rs_semantic", depth=True, grad_accum=2)
    opt = make_optimizer(1e-3, steps_per_epoch=4)
    state = create_train_state(jax.random.PRNGKey(1), scfg.render.field, opt)
    step = jax.jit(build_train_step(scfg, opt))
    state, metrics = step(state, _batch(depth=True), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert "coarse_ds" in metrics


def test_trunk_impl_auto_resolves_measured_engine_trade():
    """"auto" picks the engine per docs/performance.md: XLA at bf16 while a
    dispatch's activations fit (<= 8192x64 points), Pallas at f32 or at
    larger per-dispatch batches; grad_accum shrinks the dispatch."""
    from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
    from satnerf_tpu.train.step import resolve_trunk_impl, step_config_from_main

    def pipe(**over):
        kw = dict(
            trunk_impl="auto", n_samples=64, batch_size=8192,
            compute_dtype="bfloat16",
        )
        kw.update(over)
        return RSSemanticConfig(**kw)

    assert resolve_trunk_impl(pipe()) == "xla"
    assert resolve_trunk_impl(pipe(compute_dtype="float32")) == "pallas"
    assert resolve_trunk_impl(pipe(batch_size=16384)) == "pallas"
    assert resolve_trunk_impl(pipe(batch_size=16384, grad_accum=2)) == "xla"
    assert resolve_trunk_impl(pipe(n_samples=128)) == "pallas"
    # explicit settings pass through untouched
    assert resolve_trunk_impl(pipe(trunk_impl="pallas")) == "pallas"
    assert resolve_trunk_impl(pipe(trunk_impl="xla", compute_dtype="float32")) == "xla"

    # the resolved engine lands in the jit-static FieldConfig
    cfg = MainConfig(RunConfig(dataset_name="X"), pipe(batch_size=32768))
    scfg = step_config_from_main(cfg, steps_per_epoch=4)
    assert scfg.render.field.trunk_impl == "pallas"


def test_trunk_bwd_auto_resolves_stored_when_activations_fit():
    """"auto" picks the chip-measured pallas backward (2026-08-18, 8192 bf16:
    stored 191.7 ms/step vs recompute 204.2): "stored" while one bf16
    dispatch's activations fit HBM (<= 8192x64 points), "recompute" beyond
    that boundary and for f32 (double-width residuals, unmeasured)."""
    from satnerf_tpu.configs import RSSemanticConfig
    from satnerf_tpu.train.step import resolve_trunk_bwd

    def pipe(**over):
        kw = dict(
            trunk_bwd="auto", n_samples=64, batch_size=8192,
            compute_dtype="bfloat16",
        )
        kw.update(over)
        return RSSemanticConfig(**kw)

    assert resolve_trunk_bwd(pipe()) == "stored"
    assert resolve_trunk_bwd(pipe(batch_size=16384)) == "recompute"
    assert resolve_trunk_bwd(pipe(batch_size=32768, grad_accum=4)) == "stored"
    assert resolve_trunk_bwd(pipe(compute_dtype="float32")) == "recompute"
    # explicit settings pass through untouched
    assert resolve_trunk_bwd(pipe(trunk_bwd="recompute")) == "recompute"
    assert (
        resolve_trunk_bwd(pipe(trunk_bwd="stored", compute_dtype="float32"))
        == "stored"
    )


def test_sin_impl_auto_resolves_quality_safe():
    """"auto" -> the degree-7 kernel for every dtype (poly5 measured a
    consistent DSM-MAE cost and stays opt-in); explicit values pass
    through."""
    from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
    from satnerf_tpu.train.step import resolve_sin_impl, step_config_from_main

    def pipe(**over):
        kw = dict(sin_impl="auto", compute_dtype="bfloat16")
        kw.update(over)
        return RSSemanticConfig(**kw)

    assert resolve_sin_impl(pipe()) == "poly"
    assert resolve_sin_impl(pipe(compute_dtype="float32")) == "poly"
    assert resolve_sin_impl(pipe(sin_impl="poly5")) == "poly5"
    assert resolve_sin_impl(pipe(sin_impl="exact")) == "exact"

    cfg = MainConfig(RunConfig(dataset_name="X"), pipe(sin_impl="poly5"))
    scfg = step_config_from_main(cfg, steps_per_epoch=4)
    assert scfg.render.field.sin_impl == "poly5"


def test_tj_instead_of_beta_disables_uncertainty_losses():
    """use_tj_instead_of_beta permanently disables the beta losses: the
    reference forces first_beta_epoch=1e7 in this mode
    (semantic/pipelines/rs_semantic.py:30-32)."""
    from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
    from satnerf_tpu.train.step import step_config_from_main

    run = RunConfig(dataset_name="X")
    scfg = step_config_from_main(
        MainConfig(run, RSSemanticConfig(use_tj_instead_of_beta=True)),
        steps_per_epoch=4,
    )
    assert scfg.first_beta_epoch >= 10_000_000
    # without the flag the configured epoch passes through
    scfg = step_config_from_main(
        MainConfig(run, RSSemanticConfig(first_beta_epoch=3)),
        steps_per_epoch=4,
    )
    assert scfg.first_beta_epoch == 3


def test_sc_stride_full_step_trains():
    """sc_stride=2 through the full train step (rs_semantic, depth on):
    loss finite and decreasing, and the knob threads from the pipeline
    config into the render config."""
    from dataclasses import replace

    scfg = _scfg(depth=True)
    scfg = replace(scfg, render=replace(scfg.render, sc_stride=2))
    opt = make_optimizer(5e-3, steps_per_epoch=scfg.steps_per_epoch)
    state = create_train_state(jax.random.PRNGKey(0), scfg.render.field, opt)
    step = jax.jit(build_train_step(scfg, opt))
    batch = _batch(depth=True)
    first = None
    for i in range(15):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        if i == 0:
            first = float(metrics["loss"])
    assert np.isfinite(first)
    assert float(metrics["loss"]) < first

    from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
    from satnerf_tpu.train.step import step_config_from_main

    cfg = MainConfig(RunConfig(), RSSemanticConfig(sc_stride=4))
    sc = step_config_from_main(cfg, steps_per_epoch=4, n_classes=5)
    assert sc.render.sc_stride == 4


def test_beta_ramp_warmup_schedule():
    """Opt-in beta warm-up (round-5): beta_active ramps linearly over
    beta_ramp_epochs instead of the reference's one-step gate — 0 before
    first_beta_epoch, fractional inside the ramp, 1 after."""
    scfg = _scfg("rs_semantic", steps_per_epoch=5, beta_ramp_epochs=2.0)
    opt = make_optimizer(1e-3, steps_per_epoch=5)
    state = create_train_state(jax.random.PRNGKey(1), scfg.render.field, opt)
    step = jax.jit(build_train_step(scfg, opt))
    batch = _batch()

    betas = {}
    for i in range(16):
        s = int(state.step)
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        betas[s] = float(metrics["beta_loss_activated"])
    # first_beta_epoch=1 (start step 5), ramp = 2 epochs = 10 steps
    assert betas[0] == 0.0 and betas[4] == 0.0
    np.testing.assert_allclose(betas[5], 0.0, atol=1e-6)
    np.testing.assert_allclose(betas[10], 0.5, atol=1e-6)
    np.testing.assert_allclose(betas[14], 0.9, atol=1e-6)
    assert betas[15] == 1.0
    # the mixing itself must stay finite and trainable mid-ramp
    assert np.isfinite(betas[7])


def test_beta_ramp_zero_is_reference_exact_gate():
    """beta_ramp_epochs=0 (default) keeps the one-step gate bit-exact."""
    kw = dict(steps_per_epoch=5)
    scfg_gate = _scfg("rs_semantic", **kw)
    scfg_ramp0 = _scfg("rs_semantic", beta_ramp_epochs=0.0, **kw)
    opt = make_optimizer(1e-3, steps_per_epoch=5)
    s1 = create_train_state(jax.random.PRNGKey(1), scfg_gate.render.field, opt)
    s2 = create_train_state(jax.random.PRNGKey(1), scfg_ramp0.render.field, opt)
    f1 = jax.jit(build_train_step(scfg_gate, opt))
    f2 = jax.jit(build_train_step(scfg_ramp0, opt))
    batch = _batch()
    for i in range(7):
        s1, m1 = f1(s1, batch, jax.random.PRNGKey(i))
        s2, m2 = f2(s2, batch, jax.random.PRNGKey(i))
    np.testing.assert_array_equal(
        np.asarray(m1["loss"]), np.asarray(m2["loss"])
    )
