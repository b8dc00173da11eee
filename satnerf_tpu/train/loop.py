"""Training loop: the explicit replacement for Lightning's Trainer.fit.

ref flow: framework/pipelines.py:238-338 (run_pipeline) +
baseline/pipelines/base_ray_pipeline.py:56-193 (train/validation steps).

Structure per run:
* the combined ray store moves to device HBM once; each step is one jitted
  program gathering its batch by permutation indices (no per-step host
  tensors besides a ~4 KB index slice);
* metrics are fetched every ``log_every`` steps to keep the device pipeline
  deep (the reference logs through Lightning every step);
* validation per epoch renders the full test images through fixed-shape
  chunks, computes PSNR/SSIM, builds DSMs for the first two images and logs
  the NCC-registered altitude MAE; best train/mae drives checkpointing;
* the depth-supervision drop boundary switches to a step program without the
  depth forward (the reference keeps paying for it, gated to zero).
"""

from __future__ import annotations

import dataclasses
import os
import signal
import time

import jax
import jax.numpy as jnp
import numpy as np

from satnerf_tpu.eval import metrics as image_metrics
from satnerf_tpu.eval.dsm import compute_dsm_and_mae
from satnerf_tpu.logger import logger
from satnerf_tpu.parallel import make_mesh, replicated_sharding
from satnerf_tpu.render.renderer import render_image_chunked
from satnerf_tpu.train.checkpoint import CheckpointManager
from satnerf_tpu.train.data import (
    DEPTH_KEYS,
    EpochSampler,
    TRAIN_KEYS,
    device_store,
    gather_batch,
)
from satnerf_tpu.train.profiling import PhaseProfiler, TraceCapture
from satnerf_tpu.train.state import create_train_state, make_optimizer
from satnerf_tpu.train.step import build_train_step


def val_chunk_rays(pipeline_cfg, n_samples: int) -> int:
    """Validation render chunk in RAYS.

    The configured render_chunk_size is the reference's points-per-chunk
    GPU-memory knob (÷ n_samples, ref: eval/utils/util.py:14-42), but
    flooring at its tiny default (40960/64 = 640 rays) makes big-image
    validation TUNNEL-LATENCY-bound: a 768² image at 1024 rays/chunk is
    ~576 round trips ≈ minutes/image (measured, round-4 dress rehearsal).
    The sc-free validation render comfortably fits 8192 rays on-chip, so
    the auto-derived value floors there (and caps at 16384). An explicit
    ``val_chunk_rays`` in the pipeline config wins outright — the memory
    escape hatch (e.g. hierarchical eval tripling points/ray, ADVICE r4).
    """
    explicit = int(getattr(pipeline_cfg, "val_chunk_rays", 0) or 0)
    if explicit > 0:
        return explicit
    return max(
        8192, min(int(pipeline_cfg.render_chunk_size) // n_samples, 16384)
    )


def _make_step_fn(scfg, optimizer, with_depth: bool, mesh=None,
                  scan_steps: int = 1):
    """jitted (state, store, depth_store, idx, depth_idx, key) -> ...

    Under data parallelism the index vectors are sharded along the 'data'
    axis while stores/state/key stay replicated: the gather then yields a
    batch sharded over rays, the mean-reductions in the loss make XLA insert
    the gradient psum, and the updated (replicated) state comes back.

    With ``scan_steps`` K > 1, the index arrays carry a leading (K,) axis
    and K steps run on-device under one dispatch (lax.scan); the returned
    metrics are those of the LAST step in the block, matching what the
    per-step path would log at the same step index.

    The per-step PRNG key is ``fold_in(run_key, step_index)``, so the random
    stream is identical for every ``steps_per_dispatch`` setting and across
    checkpoint resumes.
    """
    base = build_train_step(scfg, optimizer)

    def one(state, store, depth_store, idx, depth_idx, key):
        batch = gather_batch(store, idx)
        if with_depth:
            d = gather_batch(depth_store, depth_idx, prefix="depth_")
            batch.update(d)
        return base(state, batch, key)

    if scan_steps == 1:
        def fn(state, store, depth_store, idx, depth_idx, key, step0):
            return one(
                state, store, depth_store, idx, depth_idx,
                jax.random.fold_in(key, step0),
            )
    else:
        def fn(state, store, depth_store, idx, depth_idx, key, step0):
            def body(st, inp):
                i, di, s = inp
                st, metrics = one(
                    st, store, depth_store, i, di,
                    jax.random.fold_in(key, s),
                )
                return st, metrics

            steps = step0 + jnp.arange(scan_steps)
            state, ms = jax.lax.scan(body, state, (idx, depth_idx, steps))
            return state, jax.tree.map(lambda x: x[-1], ms)

    if mesh is None:
        # donate the train state: params/opt buffers are reused in place
        return jax.jit(fn, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    from satnerf_tpu.parallel import batch_sharding, replicated_sharding

    repl = replicated_sharding(mesh)
    data = (
        batch_sharding(mesh)
        if scan_steps == 1
        else NamedSharding(mesh, P(None, "data"))
    )
    return jax.jit(
        fn,
        in_shardings=(repl, repl, repl, data, data, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


class Trainer:
    def __init__(self, pipeline, writer=None, log_every: int = 100) -> None:
        self.pipeline = pipeline
        self.cfg = pipeline.cfg
        self.log_every = log_every
        self.writer = writer
        self.history: list[dict] = []
        self.profiler = PhaseProfiler()
        self.trace = TraceCapture()
        self._stop_requested = False

    def request_stop(self) -> None:
        """Ask the fit loop to checkpoint and exit after the current step."""
        self._stop_requested = True

    def _install_signal_handlers(self):
        """Graceful preemption: SIGTERM/SIGINT finish the in-flight step,
        write ckpoints/last and return — killing a TPU client mid-step can
        wedge the device runtime (single-tenant chips especially), and the
        reference's only recovery is manual resume (ref:
        run/resume_training.py:16-36)."""
        previous = {}

        def handler(signum, frame):
            # async-signal-safe: only set the flag (logging here can deadlock
            # on the logging lock held by the interrupted main thread)
            self._stop_requested = True

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                previous[sig] = signal.signal(sig, handler)
            except ValueError:  # not in the main thread
                pass
        return previous

    def _restore_signal_handlers(self, previous):
        for sig, old in previous.items():
            signal.signal(sig, old)

    # ------------------------------------------------------------------
    def fit(self, max_steps: int | None = None, validate_every_epoch: bool = True,
            step_callbacks: dict | None = None):
        """Run the training loop.

        ``step_callbacks`` maps global step numbers to ``fn(state, step)``
        hooks invoked exactly when the device counter reaches that step
        (the dispatch block is clipped to land on the boundary) — the
        analogue of the reference's Lightning callbacks
        (ref: framework/pipelines.py ``configure_callbacks``), used e.g.
        for learning-curve evaluation at fixed horizons. Callback wall
        time is excluded from the reported training rate.
        """
        cfg = self.cfg
        pipeline = self.pipeline
        if not pipeline.loaded:
            pipeline.load_datasets()
        run_dp = cfg.run.run_dp or pipeline.prepare_run()

        # Multi-process pod runs share one run directory; host-side artifact
        # writers (TB events, profiler/trace dumps, validation files) belong
        # to process 0 only — the standard JAX multihost convention.
        # Concurrent writers are not just redundant: two processes
        # constructing SummaryWriter on the same fresh dir race on
        # tensorboardX's exists-then-makedirs check. Checkpoint saves are the
        # one exception: orbax save is itself a multi-process collective
        # (primary-host writes internally), so every process calls it with
        # broadcast-synchronised decisions (see validate / checkpoint.py).
        # Compute, including validation renders, runs on every process.
        lead = jax.process_index() == 0
        if not lead:
            self.trace.dir = None  # shared-dir trace capture is lead-only
        if self.writer is None and lead:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(os.path.join(run_dp, "tb"))
            except ImportError:  # pragma: no cover
                self.writer = None

        max_steps = max_steps or cfg.run.max_train_steps
        rgb = pipeline.datasets["rgb"]
        batch_size = cfg.pipeline.batch_size
        subsample = (
            cfg.pipeline.epoch_subsampling
            if cfg.pipeline.epoch_subsampling_activated
            else None
        )
        sampler = EpochSampler(
            len(rgb), batch_size, shuffle=cfg.run.shuffle_dataset,
            seed=cfg.run.seed, subsample=subsample,
        )
        steps_per_epoch = sampler.steps_per_epoch
        num_epochs = max(max_steps // steps_per_epoch, 1)

        optimizer = make_optimizer(
            cfg.pipeline.learnrate, cfg.pipeline.lr_scheduler,
            steps_per_epoch, num_epochs,
        )

        # step configs: with + without depth (switch at the drop boundary)
        has_depth = "depth" in pipeline.datasets
        scfg_nd = pipeline.step_config(steps_per_epoch, with_depth=False)
        scfg_d = (
            pipeline.step_config(steps_per_epoch, with_depth=True)
            if has_depth
            else None
        )
        ds_drop = pipeline.ds_drop_step if has_depth else 0
        if has_depth:
            logger.info(
                "Depth", f"depth supervision active until step {ds_drop}"
            )

        fcfg = scfg_nd.render.field
        key = jax.random.PRNGKey(cfg.run.seed)
        key, init_key = jax.random.split(key)
        state = create_train_state(
            init_key, fcfg, optimizer, pipeline.t_vocab,
            use_fine_network=scfg_nd.render.use_fine_network,
        )

        ckpt = CheckpointManager(run_dp, cfg.run.save_every_n_epochs)
        if cfg.run.resume_from_ckpoint:
            state = ckpt.restore(state, path=cfg.run.ckpoint_fp or None)
        elif cfg.run.warm_start_fp:
            # params-only transfer: fresh optimizer state + step 0, so the
            # new run gets a full LR schedule over the transferred weights
            from satnerf_tpu.train.checkpoint import load_warm_start_params

            params = load_warm_start_params(
                jax.device_get(state.params), cfg.run.warm_start_fp
            )
            state = state.replace(params=params, opt_state=optimizer.init(params))

        # device placement (replicated across the data mesh when DP > 1)
        mesh = None
        self._mesh = None
        if cfg.run.data_parallel > 1:
            mesh = make_mesh(cfg.run.data_parallel)
            self._mesh = mesh
            repl = replicated_sharding(mesh)
            store = device_store(rgb.combined, TRAIN_KEYS, sharding=repl)
            state = jax.device_put(state, repl)
        else:
            store = device_store(rgb.combined, TRAIN_KEYS)

        depth_store = None
        depth_sampler = None
        if has_depth:
            dcomb = pipeline.datasets["depth"].combined
            depth_store = device_store(
                {"rays": dcomb["rays"], "extras": dcomb["extras"],
                 "depths": dcomb["depths"], "weights": dcomb["weights"]},
                DEPTH_KEYS,
                sharding=replicated_sharding(mesh) if mesh else None,
            )
            # the BA tie-point set can be smaller than a ray batch; clamp
            # the depth batch to the dataset size and align it to the mesh
            # (fixed jit shape either way; grad_accum trimming happens in
            # the step itself)
            n_dev = mesh.devices.size if mesh is not None else 1
            n_depth = int(dcomb["rays"].shape[0])
            depth_batch = min(batch_size, n_depth)
            depth_batch = max(depth_batch - depth_batch % n_dev, n_dev)
            assert depth_batch <= n_depth, (
                f"{n_depth} tie points cannot shard over {n_dev} devices"
            )
            depth_sampler = EpochSampler(
                n_depth, depth_batch, seed=cfg.run.seed + 1
            )

        if mesh is not None:
            assert batch_size % mesh.devices.size == 0, (
                f"batch_size {batch_size} must divide over "
                f"{mesh.devices.size} devices"
            )
        step_d = (
            _make_step_fn(scfg_d, optimizer, True, mesh) if has_depth else None
        )
        step_nd = _make_step_fn(scfg_nd, optimizer, False, mesh)
        spd = max(int(getattr(cfg.run, "steps_per_dispatch", 1)), 1)
        scan_d = scan_nd = None
        if spd > 1:
            scan_nd = _make_step_fn(
                scfg_nd, optimizer, False, mesh, scan_steps=spd
            )
            if has_depth:
                scan_d = _make_step_fn(
                    scfg_d, optimizer, True, mesh, scan_steps=spd
                )

        # sanity validation (ref: num_sanity_val_steps=1)
        if cfg.run.num_sanity_val_steps > 0 and validate_every_epoch:
            self.validate(state, scfg_nd, epoch=0, display_epoch=0, sanity=True)

        n_dev = mesh.devices.size if mesh is not None else 1
        dummy_didx = np.zeros(
            depth_sampler.batch_size if depth_sampler else n_dev, np.int32
        )
        last_metrics: dict | None = None
        t_last = time.time()
        # cumulative training-only clock: intervals that contain validation
        # or checkpointing are excluded by re-anchoring t_last after them.
        # Per-interval rates over the remote tunnel are noisy (the tunnel
        # applies enqueue backpressure, so host-side interval timing tracks
        # queue admission, not completion); the cumulative rate is the
        # honest long-horizon number and is what the console prints.
        train_time_acc = 0.0
        steps_timed = 0
        # host-side step mirror: reading state.step from device every
        # iteration would be a blocking round trip per step (catastrophic
        # over a remote device tunnel); the device counter is only consulted
        # once here and at checkpoints
        start_step = int(jax.device_get(state.step))
        if start_step:
            # resume determinism: replay the samplers to where the
            # interrupted run left off, so the post-resume batch sequence
            # (and with it the whole trajectory — per-step PRNG keys are
            # step-indexed) matches the uninterrupted run's
            sampler.fast_forward(start_step)
            if depth_sampler is not None:
                depth_sampler.fast_forward(min(start_step, ds_drop))
        step_i = start_step
        last_log_step = start_step
        cb_steps = sorted(s for s in (step_callbacks or {}) if s > start_step)
        prev_handlers = self._install_signal_handlers()

        while step_i < max_steps and not self._stop_requested:
            use_depth = has_depth and step_i < ds_drop
            next_cb = next((s for s in cb_steps if s > step_i), max_steps)
            # largest block that crosses no step-accurate boundary
            # (logging, epoch/validation end, depth drop, callbacks, run end)
            block = min(
                max_steps - step_i,
                ((step_i // self.log_every) + 1) * self.log_every - step_i,
                ((step_i // steps_per_epoch) + 1) * steps_per_epoch - step_i,
                (ds_drop - step_i) if use_depth else max_steps,
                next_cb - step_i,
                spd,
            )
            if block == spd and spd > 1:
                idx = jnp.asarray(
                    np.stack([sampler.next_batch() for _ in range(spd)])
                )
                didx = jnp.asarray(
                    np.stack([depth_sampler.next_batch() for _ in range(spd)])
                    if use_depth
                    else np.broadcast_to(dummy_didx, (spd,) + dummy_didx.shape)
                )
                fn = scan_d if use_depth else scan_nd
            else:
                block = 1
                idx = jnp.asarray(sampler.next_batch())
                didx = (
                    jnp.asarray(depth_sampler.next_batch())
                    if use_depth
                    else jnp.asarray(dummy_didx)
                )
                fn = step_d if use_depth else step_nd
            self.trace.step(step_i, block)
            with self.profiler.phase("train_step"):
                state, metrics = fn(
                    state, store, depth_store, idx, didx, key,
                    np.int32(step_i),
                )
            step_i += block
            last_metrics = metrics

            if step_i % self.log_every == 0 or step_i >= max_steps:
                fetched = jax.device_get(last_metrics)  # forces completion
                now = time.time()
                if steps_timed or last_log_step > start_step:
                    train_time_acc += now - t_last
                    steps_timed += step_i - last_log_step
                    rate = steps_timed / max(train_time_acc, 1e-9)
                else:
                    # first boundary: the elapsed interval is dominated by
                    # the remote compile — report it raw, but don't let it
                    # pollute the cumulative training-rate accumulator
                    rate = (step_i - last_log_step) / max(now - t_last, 1e-9)
                last_log_step = step_i
                t_last = now
                self._log_train(step_i, fetched, rate, batch_size)

            if step_callbacks and step_i in step_callbacks:
                # close the timing interval so callback wall time (e.g. a
                # full learning-curve eval) never pollutes the train rate.
                # Skip when the log branch above already closed it at this
                # exact step: re-fetching costs a second ~250-500 ms tunnel
                # round trip and would charge the gap to a 0-step interval.
                if last_log_step != step_i:
                    if last_metrics is not None:
                        jax.device_get(last_metrics)  # forces completion
                    now = time.time()
                    if steps_timed or last_log_step > start_step:
                        train_time_acc += now - t_last
                        steps_timed += step_i - last_log_step
                    last_log_step = step_i
                step_callbacks[step_i](state, step_i)
                t_last = time.time()

            # epoch boundary (or end of run) -> validation + checkpoints
            new_epoch = step_i // steps_per_epoch
            at_boundary = step_i % steps_per_epoch == 0
            run_done = step_i >= max_steps
            if validate_every_epoch and (
                (at_boundary and new_epoch % cfg.run.check_val_every_n_epoch == 0)
                or run_done
            ):
                # close the current timing interval before validation so the
                # steps since the last log boundary keep their training time
                # (t_last is re-anchored after validation; without this,
                # those steps would be counted against a clock that dropped
                # their interval, inflating the cumulative rate). Skip when
                # an earlier branch already closed it at this exact step —
                # the re-fetch is a wasted tunnel round trip charged to a
                # 0-step interval.
                if last_log_step != step_i:
                    if last_metrics is not None:
                        jax.device_get(last_metrics)  # forces completion
                    now = time.time()
                    if steps_timed or last_log_step > start_step:
                        train_time_acc += now - t_last
                        steps_timed += step_i - last_log_step
                    last_log_step = step_i
                with self.profiler.phase("validate"):
                    val = self.validate(
                        state, scfg_nd, epoch=new_epoch - 1, display_epoch=new_epoch
                    )
                mae = val.get("train/mae")
                if mae is not None:
                    ckpt.maybe_save_best(state, mae)
                ckpt.maybe_save_epoch(state, new_epoch)
                ckpt.save_last(state)
                t_last = time.time()  # don't charge val/ckpt to the rate

        ckpt.save_last(state)
        if self.writer is not None:
            self.writer.flush()
        self._restore_signal_handlers(prev_handlers)
        if self._stop_requested:
            logger.warning(
                "Run", "stop requested (signal or API); checkpointed to last"
            )
        self.trace.close()
        if lead:
            self.profiler.dump(os.path.join(run_dp, "profiler"))
        final_step = int(jax.device_get(state.step))
        assert final_step == step_i or self._stop_requested, (final_step, step_i)
        logger.info(
            "Run",
            f"finished at step {final_step} "
            f"({final_step - start_step} steps this session)",
        )
        return state

    # ------------------------------------------------------------------
    def _log_train(self, step: int, metrics: dict, rate: float, batch_size: int):
        if self.writer is not None:
            for k, v in metrics.items():
                self.writer.add_scalar(f"train/{k}", float(v), step)
            self.writer.add_scalar("train/steps_per_sec", rate, step)
            self.writer.add_scalar("train/rays_per_sec", rate * batch_size, step)
        logger.debug_every_n(
            "Train",
            f"step {step}: loss={float(metrics['loss']):.4f} "
            f"psnr={float(metrics['psnr']):.2f} {rate:.1f} it/s",
            n=1,
        )
        self.history.append({"step": step, **{k: float(v) for k, v in metrics.items()}})

    # ------------------------------------------------------------------
    def validate(self, state, scfg, epoch: int, display_epoch: int, sanity=False):
        """Full-image validation over the rgb_test split
        (ref: base_ray_pipeline.py:101-193)."""
        from satnerf_tpu.viz.visualize import run_all

        pipeline = self.pipeline
        cfg = self.cfg
        # no validation consumer reads solar-correction outputs; dropping
        # the sc ray pass renders validation images ~1.9x faster
        rcfg = dataclasses.replace(scfg.render, solar_correction=False)
        rgb_test = pipeline.datasets["rgb_test"]
        # keep params device-resident: pulling them to host would re-upload
        # the full pytree on every render chunk (ruinous over a remote tunnel)
        params = state.params
        # pod runs: renders/metrics run on every process (SPMD), but file
        # outputs (visualizer TIFs, DSM products) are written by process 0
        # only — render_image_chunked returns host numpy, so skipping the
        # write-side entirely on non-lead processes involves no collective.
        lead = jax.process_index() == 0
        visualizers = pipeline.visualizers() if (not sanity and lead) else []
        out: dict = {}
        test_psnrs: list[float] = []
        # Chunk is in RAYS. The configured render_chunk_size is the
        # reference's points-per-chunk GPU-memory knob (÷ n_samples), but
        # flooring at its tiny default (40960/64 = 640 rays) makes big-image
        # validation TUNNEL-LATENCY-bound: a 768² image at 1024 rays/chunk
        # is ~576 round trips ≈ minutes/image (measured, round-4 dress
        # rehearsal). The sc-free validation render comfortably fits 8192
        # rays on-chip, so floor there: 72 round trips for the same image.
        chunk = val_chunk_rays(cfg.pipeline, rcfg.n_samples)

        mesh = getattr(self, "_mesh", None)
        # sanity mode exists to smoke the render/eval path before training
        # starts (ref: num_sanity_val_steps=1 — ONE batch, not a split);
        # rendering every image would block startup for minutes over the
        # remote tunnel, so check a single image and return.
        n_images = 1 if sanity else len(rgb_test.data)
        for i in range(n_images):
            item = rgb_test.image_item(i)
            split = item["split"]
            res = render_image_chunked(
                params, rcfg, item["rays"], item["extras"],
                chunk=max(chunk, mesh.devices.size) if mesh else chunk,
                mesh=mesh,
            )
            h, w = item["h"], item["w"]
            gt = item["rgbs"].reshape(h, w, 3)
            pred = res["rgb"].reshape(h, w, 3)
            psnr = float(image_metrics.psnr(jnp.asarray(pred), jnp.asarray(gt)))
            ssim = float(image_metrics.ssim(jnp.asarray(pred), jnp.asarray(gt)))

            if split == "test":
                test_psnrs.append(psnr)
            sample_idx = i - 1 if split == "test" else i
            run_all(
                visualizers, rgb_test, item, res, writer=self.writer,
                sample_idx=sample_idx, split=split, epoch=display_epoch,
                run_dp=cfg.run.run_dp,
            )
            tag = f"{split}_{sample_idx}"
            if self.writer is not None:
                self.writer.add_scalar(f"{split}/ssim_{sample_idx}", ssim, display_epoch)
                img_stack = np.concatenate([gt, pred], axis=1)
                self.writer.add_image(
                    f"val/{tag}", np.moveaxis(img_stack, -1, 0), display_epoch
                )

            if i <= 1 and not sanity and lead:
                output_dp = os.path.join(
                    cfg.run.run_dp, "visualization", split, "dsm"
                )
                try:
                    mae = compute_dsm_and_mae(
                        rgb_test, item["rays"], res["depth"], output_dp,
                        item["name"], epoch,
                    )
                    out[f"{split}/mae"] = float(mae["mean"])
                    if self.writer is not None:
                        self.writer.add_scalar(
                            f"{split}/mae", float(mae["mean"]), display_epoch
                        )
                except Exception as exc:  # DSM failures must not kill training
                    logger.warning("Validate", f"DSM/MAE failed: {exc}")

            out[f"{split}/psnr_{sample_idx}"] = psnr
        if jax.process_count() > 1:
            # DSM/MAE is computed (and its files written) on the lead only;
            # checkpoint saves are orbax COLLECTIVES, so the best-mae save
            # decision must be identical on every process — broadcast the
            # lead's MAE values. All processes reach this point (validate
            # runs as part of the SPMD program), so the collective is safe.
            from jax.experimental import multihost_utils

            mae_keys = ("train/mae", "test/mae")
            vals = np.array(
                [out.get(k, np.nan) for k in mae_keys], np.float32
            )
            vals = np.asarray(multihost_utils.broadcast_one_to_all(vals))
            for k, v in zip(mae_keys, vals):
                if np.isfinite(v):
                    out[k] = float(v)
        if test_psnrs:
            out["test/psnr"] = float(np.mean(test_psnrs))
            if self.writer is not None:
                self.writer.add_scalar(
                    "test/psnr", out["test/psnr"], display_epoch
                )
        logger.info(
            "Validate",
            f"epoch {display_epoch}: "
            + " ".join(f"{k}={v:.3f}" for k, v in out.items()),
        )
        return out
