"""Training-throughput benchmark on the real TPU chip.

Measures rays/sec of the FULL flagship training step — RS-Semantic field
(8x512 SIREN trunk + all heads), 64 samples/ray, solar-correction pass,
depth supervision, all loss terms and the Adam update fused in one jit —
i.e. the exact per-step work of the reference's paper configuration
(configs/pipelines/rs_semantic.toml: batch_size=1024, n_samples=64), at
this port's production settings (batch 8192, bfloat16 GEMMs, fast_sin
SIREN activations; see docs/performance.md).

Methodology note (important on this tunnel): ``block_until_ready`` on the
axon PJRT plugin returns before remote execution finishes, so naive
dispatch-loop timing over-reports by >100x. This bench therefore scans K
steps ON DEVICE inside one jit (``lax.scan``) and times to a forced scalar
readback of the final loss — the only honest clock through the tunnel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the reference implementation's single-GPU
step rate: the repo publishes no number (SURVEY.md §6), so we use 10 it/s x
1024 rays = 10,240 rays/s, a generous estimate for PyTorch SatNeRF training
on the V100/A100-class hardware the reference targets (the original SatNeRF
reports ~10 h for 300k iterations => ~8.3 it/s => ~8.5k rays/s; 10,240
rounds that UP in the reference's favour).

Measured provenance (2026-08-17, tools/ref_torch_train.py --paper-timing):
the actual reference training step (its own model/renderer/losses, imported
from the reference tree) at the paper config runs at 44.65 s/step =
22.9 rays/s on this host's single CPU core — torch, f32, all losses, sc
pass. That measurement anchors the FLOP accounting behind the GPU
estimate: a V100's ~15 TFLOP/s f32 over this step's ~7e12 FLOPs at
realistic MLP utilisation lands within a factor ~2 of the 10k figure, and
the SatNeRF paper's published wall-clock corroborates it.

Verified on one v5e chip (2026-08-17, honest readback timing, incl. the
solar-correction head pruning + the round-2 minimax sine): 42.9k rays/s at
batch 8192 bf16 (192 ms/step), 30.5k rays/s f32 (269 ms/step), 30.5k
rays/s at the reference batch of 1024 bf16 (33.6 ms/step, pre-pruning).
SATNERF_BENCH_SIN=poly5 (the opt-in degree-5 sine; PSNR-neutral with a
measured DSM-MAE cost, docs/performance.md): 46.5k. Large-batch modes:
batch 16384 via SATNERF_BENCH_REMAT_CHUNKS=2 (37.1k) or
SATNERF_BENCH_IMPL=pallas (39.2k; 41.3k with poly5).
"""

from __future__ import annotations

import json
import multiprocessing
import os
import sys
import time

import numpy as np

REFERENCE_RAYS_PER_SEC = 10_240.0

# Most recent verified measurement on this hardware (2026-08-20 09:31
# post-reboot probe, honest scan+readback timing, batch 8192 bf16, sc head
# pruning + minimax sine): reported with "stale": true if the live run
# cannot complete (e.g. the single-tenant TPU tunnel is held by another
# client).
LAST_KNOWN_RAYS_PER_SEC = 42_925.3

# Production config; overridable for large-batch / impl experiments:
#   SATNERF_BENCH_BATCH=16384 SATNERF_BENCH_IMPL=pallas python bench.py
#   SATNERF_BENCH_REMAT_CHUNKS=2 for the chunked-scan remat path
BATCH_SIZE = int(os.environ.get("SATNERF_BENCH_BATCH", 8192))
DEPTH_RAYS = 1024
TRUNK_IMPL = os.environ.get("SATNERF_BENCH_IMPL", "xla")
REMAT_CHUNKS = int(os.environ.get("SATNERF_BENCH_REMAT_CHUNKS", 0))
SIN_IMPL = os.environ.get("SATNERF_BENCH_SIN", "poly")
if SIN_IMPL == "auto":  # resolve like train/step.py: quality-safe kernel
    SIN_IMPL = "poly"
assert SIN_IMPL in ("poly", "poly5", "poly7f", "exact"), (
    f"SATNERF_BENCH_SIN={SIN_IMPL!r}: use poly, poly5, poly7f, exact, or auto"
)
# solar-correction quadrature stride (opt-in, quality-gated like the sine
# engines; see docs/performance.md): every k-th z rung on the sc half only
SC_STRIDE = int(os.environ.get("SATNERF_BENCH_SC_STRIDE", 1))
TRUNK_BWD = os.environ.get("SATNERF_BENCH_BWD", "recompute")
if TRUNK_BWD == "auto":  # resolve like models/field.py: stored at 8192/bf16
    TRUNK_BWD = "stored" if BATCH_SIZE <= 8192 else "recompute"
assert TRUNK_BWD in ("recompute", "stored"), (
    f"SATNERF_BENCH_BWD={TRUNK_BWD!r}: use recompute, stored, or auto"
)
if TRUNK_IMPL != "pallas" and TRUNK_BWD != "recompute":
    # trunk_bwd only selects the Pallas kernel's VJP; on the XLA trunk it
    # is ignored — normalise so the config label never records a knob the
    # measured program didn't use.
    print(f"bench: SATNERF_BENCH_BWD={TRUNK_BWD} ignored with "
          f"SATNERF_BENCH_IMPL={TRUNK_IMPL} (pallas-only knob)",
          file=sys.stderr)
    TRUNK_BWD = "recompute"
CONFIG_DESC = (
    f"batch{BATCH_SIZE}/{TRUNK_IMPL}/chunks{REMAT_CHUNKS}/bf16"
    + ("" if SIN_IMPL == "poly" else f"/{SIN_IMPL}")
    + ("" if TRUNK_BWD == "recompute" else f"/bwd-{TRUNK_BWD}")
    + ("" if SC_STRIDE == 1 else f"/sc{SC_STRIDE}")
)
IS_DEFAULT_CONFIG = (
    (BATCH_SIZE, TRUNK_IMPL, REMAT_CHUNKS, SIN_IMPL, TRUNK_BWD, SC_STRIDE)
    == (8192, "xla", 0, "poly", "recompute", 1)
)
SCAN_STEPS = 50  # long enough to amortise the ~0.4 s tunnel readback


def main(deadline_s: float | None = None) -> None:
    t_start = time.time()

    # Graceful-stop contract with _guarded_main: SIGTERM only sets a flag
    # that is honoured at the inter-trial safe points below (between device
    # dispatches), mirroring the Trainer's preemption handler. Dying inside
    # a device call can wedge the single-tenant chip grant (see CLAUDE.md).
    import signal

    stop_requested = False

    def _on_sigterm(signum, frame):
        nonlocal stop_requested
        stop_requested = True

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # not the main thread of the process; keep default handling

    def over_deadline() -> bool:
        if stop_requested:
            return True
        return deadline_s is not None and time.time() - t_start > deadline_s

    import jax

    from __graft_entry__ import _batch
    from satnerf_tpu.models.field import FieldConfig
    from satnerf_tpu.render.renderer import RenderConfig
    from satnerf_tpu.train.state import create_train_state, make_optimizer
    from satnerf_tpu.train.step import StepConfig, build_train_step

    fcfg = FieldConfig(variant="rs_semantic", mapping=True, siren=True,
                       n_classes=5, trunk_impl=TRUNK_IMPL, sin_impl=SIN_IMPL,
                       trunk_bwd=TRUNK_BWD)
    rcfg = RenderConfig(
        field=fcfg, n_samples=64, solar_correction=True,
        compute_dtype="bfloat16", remat_chunks=REMAT_CHUNKS,
        sc_stride=SC_STRIDE,
    )
    scfg = StepConfig(
        render=rcfg, steps_per_epoch=1000, sc_lambda=0.05, first_beta_epoch=0,
        depth=True, semantic=True, car_index=4, use_car_reg_loss=True,
        car_reg_loss_start=0,
    )
    opt = make_optimizer(5e-4, steps_per_epoch=1000)
    state = create_train_state(jax.random.PRNGKey(0), fcfg, opt, t_vocab=50)
    step = build_train_step(scfg, opt)

    batch = jax.device_put(_batch(BATCH_SIZE, depth=DEPTH_RAYS))

    def many_steps(state, batch, key):
        def body(st, k):
            st, metrics = step(st, batch, k)
            return st, metrics["loss"]

        return jax.lax.scan(body, state, jax.random.split(key, SCAN_STEPS))

    many_j = jax.jit(many_steps, donate_argnums=(0,))

    # warmup / compile (forced readback completes remote execution)
    key = jax.random.PRNGKey(1)
    state, losses = many_j(state, batch, key)
    assert np.isfinite(float(losses[-1]))

    best = float("inf")
    final_loss = float(losses[-1])
    for _ in range(3):
        # self-bounding between trials: exiting here (between dispatches)
        # is safe for the chip grant, unlike being killed mid-step
        if stop_requested and best == float("inf"):
            raise SystemExit(1)  # no measurement yet; parent reports stale
        if best < float("inf") and over_deadline():
            break
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, losses = many_j(state, batch, sub)
        final_loss = float(losses[-1])  # forced readback = honest clock
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(final_loss)

    rays_per_sec = SCAN_STEPS * BATCH_SIZE / best

    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
                "config": CONFIG_DESC,
            }
        )
    )


def _guarded_main(timeout_s: float = 720.0) -> None:
    """Run the measurement in a child process with a deadline so a wedged
    device cannot hang the caller; report the last verified number as stale
    if the live run cannot complete.

    The child bounds itself between trials (safe points); if it is stuck
    inside a device call past the parent deadline, escalate SIGTERM ->
    grace -> SIGKILL. Killing a TPU client mid-step can wedge the
    single-tenant chip grant (see CLAUDE.md), so the kill is a last resort
    after a long grace period, not the primary bound."""
    proc = multiprocessing.Process(target=main, args=(timeout_s * 0.8,))
    proc.start()
    proc.join(timeout_s)
    if proc.is_alive():
        proc.terminate()  # SIGTERM first: lets the runtime unwind cleanly
        proc.join(60.0)
        if proc.is_alive():
            proc.kill()
            proc.join()
    if proc.exitcode != 0:
        print(
            json.dumps(
                {
                    "metric": "train_rays_per_sec_per_chip",
                    "value": LAST_KNOWN_RAYS_PER_SEC,
                    "unit": "rays/s",
                    "vs_baseline": round(
                        LAST_KNOWN_RAYS_PER_SEC / REFERENCE_RAYS_PER_SEC, 3
                    ),
                    "stale": True,
                    "config": "batch8192/xla/chunks0/bf16 (last-known default)",
                    "error": "live bench did not complete (device unavailable); "
                             "value is the last verified measurement"
                             + ("" if IS_DEFAULT_CONFIG else
                                f" FOR THE DEFAULT CONFIG, not the requested "
                                f"{CONFIG_DESC}"),
                }
            )
        )


if __name__ == "__main__":
    if os.environ.get("SATNERF_BENCH_NO_GUARD"):
        main()
    else:
        _guarded_main()
