"""Multi-chip (virtual 8-device CPU mesh) tests: sharded train step equals
the single-device step, and the gradient psum happens implicitly."""

import jax
import jax.numpy as jnp
import numpy as np

from satnerf_tpu.models.field import FieldConfig
from satnerf_tpu.parallel import make_mesh, shard_batch, shard_train_step
from satnerf_tpu.render.renderer import RenderConfig
from satnerf_tpu.train.state import create_train_state, make_optimizer
from satnerf_tpu.train.step import StepConfig, build_train_step


def _setup(b=64):
    fcfg = FieldConfig(variant="satnerf", layers=2, feat=64, skips=(1,))
    rcfg = RenderConfig(field=fcfg, n_samples=8)
    scfg = StepConfig(render=rcfg, steps_per_epoch=4, sc_lambda=0.05)
    opt = make_optimizer(1e-3, steps_per_epoch=4)
    state = create_train_state(jax.random.PRNGKey(0), fcfg, opt)
    rng = np.random.default_rng(0)
    o = rng.uniform(-0.5, 0.5, (b, 3)).astype(np.float32)
    d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (b, 1))
    batch = {
        "rays": np.concatenate(
            [o, d, np.zeros((b, 1), np.float32), np.ones((b, 1), np.float32)], 1
        ),
        "extras": np.concatenate(
            [np.tile([[0.3, 0.3, 0.9]], (b, 1)).astype(np.float32),
             rng.integers(0, 4, (b, 1)).astype(np.float32)], 1
        ),
        "rgbs": rng.uniform(0, 1, (b, 3)).astype(np.float32),
    }
    return scfg, opt, state, batch


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_step_matches_single_device():
    scfg, opt, state, batch = _setup()
    step = build_train_step(scfg, opt)

    # single device
    s1, m1 = jax.jit(step)(state, {k: jnp.asarray(v) for k, v in batch.items()},
                           jax.random.PRNGKey(7))

    # 8-device data-parallel
    mesh = make_mesh(8)
    sharded = shard_train_step(step, mesh)
    s8, m8 = sharded(state, shard_batch(batch, mesh), jax.random.PRNGKey(7))

    np.testing.assert_allclose(
        float(m8["loss"]), float(m1["loss"]), rtol=2e-5
    )
    # updated parameters identical across layouts
    w1 = np.asarray(s1.params["field"]["trunk"][0]["w"])
    w8 = np.asarray(s8.params["field"]["trunk"][0]["w"])
    np.testing.assert_allclose(w8, w1, atol=1e-6)


def test_sharded_steps_run_consecutively():
    scfg, opt, state, batch = _setup()
    mesh = make_mesh(8)
    step = shard_train_step(build_train_step(scfg, opt), mesh)
    sb = shard_batch(batch, mesh)
    for i in range(3):
        state, metrics = step(state, sb, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 3


def test_sharded_image_render_matches_single_device():
    from satnerf_tpu.render.renderer import (
        RenderConfig,
        render_image_chunked,
        render_image_sharded,
    )
    from satnerf_tpu.train.state import init_params
    from satnerf_tpu.models.field import FieldConfig
    import jax

    fcfg = FieldConfig(variant="rs_semantic", layers=2, feat=64, skips=(1,),
                       mapping=True)
    rcfg = RenderConfig(field=fcfg, n_samples=8)
    params = init_params(jax.random.PRNGKey(0), fcfg, t_vocab=4)
    rng = np.random.default_rng(5)
    b = 100  # not divisible by 8 -> exercises padding
    o = rng.uniform(-0.5, 0.5, (b, 3)).astype(np.float32)
    d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (b, 1))
    rays = np.concatenate(
        [o, d, np.zeros((b, 1), np.float32), np.ones((b, 1), np.float32)], 1
    )
    extras = np.concatenate(
        [np.tile([[0.3, 0.3, 0.9]], (b, 1)).astype(np.float32),
         rng.integers(0, 4, (b, 1)).astype(np.float32)], 1
    )

    single = render_image_chunked(params, rcfg, rays, extras, chunk=64)
    mesh = make_mesh(8)
    sharded = render_image_sharded(params, rcfg, rays, extras, mesh, chunk=64)
    assert sharded["rgb"].shape == (100, 3)
    np.testing.assert_allclose(sharded["rgb"], single["rgb"], atol=1e-5)
    np.testing.assert_allclose(sharded["depth"], single["depth"], atol=1e-5)
    np.testing.assert_array_equal(
        sharded["semantic_label"], single["semantic_label"]
    )


def test_trainer_data_parallel_smoke(tmp_path):
    """Trainer with data_parallel=8: full fit with sharded batches."""
    from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
    from satnerf_tpu.datasets.synthetic import generate_scene
    from satnerf_tpu.pipelines import load_pipeline
    from satnerf_tpu.train.loop import Trainer

    generate_scene(str(tmp_path / "ds" / "SYN_DP"), n_train=2, n_test=1,
                   img_size=32, n_tie_points=60)
    run = RunConfig(
        dataset_name="SYN_DP", datasets_dp=str(tmp_path / "ds"),
        cache_dp=str(tmp_path / "cache"), workspace_dp=str(tmp_path / "train"),
        max_train_steps=6, num_sanity_val_steps=0, data_parallel=8,
    )
    pipe = RSSemanticConfig(
        n_samples=4, fc_layers=2, fc_units=32, fc_skips=[1], batch_size=128,
        depth_enabled=True, render_chunk_size=2048,
    )
    pipeline = load_pipeline(MainConfig(run, pipe))
    pipeline.prepare_run()
    pipeline.load_datasets()
    trainer = Trainer(pipeline, log_every=3)
    state = trainer.fit(validate_every_epoch=True)
    assert int(jax.device_get(state.step)) == 6
    assert np.isfinite(trainer.history[-1]["loss"])


def test_dp_sharded_step_with_pallas_kernels():
    """The fused Pallas field kernels must compose with the data-parallel
    sharded train step (same loss + params as the single-device XLA path)."""
    from satnerf_tpu.train.state import create_train_state, make_optimizer
    from satnerf_tpu.train.step import StepConfig, build_train_step
    from satnerf_tpu.render.renderer import RenderConfig
    from satnerf_tpu.parallel import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
    )
    import __graft_entry__ as graft

    mesh = make_mesh(8)
    repl, data = replicated_sharding(mesh), batch_sharding(mesh)
    opt = make_optimizer(5e-4, steps_per_epoch=100)

    def one_step(trunk_impl, sharded):
        fcfg = FieldConfig(
            variant="rs_semantic", layers=2, feat=256, skips=(1,),
            mapping=True, siren=True, n_classes=5, trunk_impl=trunk_impl,
        )
        rcfg = RenderConfig(field=fcfg, n_samples=8, solar_correction=True)
        scfg = StepConfig(render=rcfg, steps_per_epoch=100, sc_lambda=0.05,
                          first_beta_epoch=0, semantic=True, car_index=4)
        state = create_train_state(jax.random.PRNGKey(0), fcfg, opt, t_vocab=50)
        step = build_train_step(scfg, opt)
        batch = graft._batch(256)
        if sharded:
            state = jax.device_put(state, repl)
            batch = {k: jax.device_put(v, data) for k, v in batch.items()}
            step = jax.jit(step, in_shardings=(repl, data, repl),
                           out_shardings=(repl, repl))
        else:
            step = jax.jit(step)
        return step(state, batch, jax.random.PRNGKey(1))

    st_p, m_p = one_step("pallas", sharded=True)
    st_x, m_x = one_step("xla", sharded=False)
    assert abs(float(m_p["loss"]) - float(m_x["loss"])) < 1e-5
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), st_p.params, st_x.params
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4


def test_sharded_step_with_chunked_scan_remat():
    """remat_chunks composes with DP sharding: the checkpointed scan runs
    inside each shard and the result matches the plain sharded step."""
    from dataclasses import replace

    scfg, opt, state, batch = _setup()
    scfg_remat = replace(scfg, render=replace(scfg.render, remat_chunks=2))
    mesh = make_mesh(8)

    plain = shard_train_step(build_train_step(scfg, opt), mesh)
    remat = shard_train_step(build_train_step(scfg_remat, opt), mesh)
    sb = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(1)
    s1, m1 = plain(state, sb, key)
    s2, m2 = remat(state, sb, key)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6
    )
    f1 = jax.flatten_util.ravel_pytree(s1.params)[0]
    f2 = jax.flatten_util.ravel_pytree(s2.params)[0]
    np.testing.assert_allclose(
        np.asarray(f1), np.asarray(f2), atol=2e-6,
        err_msg="remat_chunks changed the sharded update",
    )
