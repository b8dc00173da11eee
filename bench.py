"""Training-throughput benchmark on the real TPU chip.

Measures rays/sec of the FULL flagship training step — RS-Semantic field
(8x512 SIREN trunk + all heads), 64 samples/ray, solar-correction pass,
depth supervision, all loss terms and the Adam update fused in one jit —
i.e. the exact per-step work of the reference's paper configuration
(configs/pipelines/rs_semantic.toml: batch_size=1024, n_samples=64), at
this port's production settings (batch 8192, bfloat16 GEMMs, fast_sin
SIREN activations, sc_stride=2 strided solar-correction quadrature; see
docs/performance.md).

Default-config decision (round 4, on the record): the scored config is
``sc_stride=2`` — the strided solar-correction quadrature that PASSED its
pre-registered n=3 paired-seed DSM-MAE quality gate (mean ΔMAE +0.000 m,
docs/performance.md "strided solar-correction quadrature") AND a 30k-step
full-horizon production battery (docs/validation_run.md). It is the
recommended production throughput config. ``SATNERF_BENCH_SC_STRIDE=1``
remains the reference-exact parity setting (every sc z-rung evaluated,
ref: /root/reference/baseline/components/rendering.py:47-66), and the
*training-config* default in configs/ also stays 1 for strict parity; the
bench scores the config we actually recommend running in production.

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

Capture hardening (round 4, after two rounds of driver captures losing to
transient tunnel contention): the guarded parent now records per-attempt
diagnostics (child exit code, elapsed, last phase marker) and RETRIES once
within its deadline budget after a backoff — transient grant contention on
the single-tenant tunnel clears on the ~2-15 min scale (CLAUDE.md). On a
successful default-config run the measured number is persisted to
``.bench_last_live.json``; the stale fallback reads THAT artifact (newest
verified live probe) instead of a hand-edited constant.

Verified on one v5e chip (honest readback timing): 55.7k rays/s at batch
8192 bf16 sc_stride=2 (147 ms/step, the scored default); 42.9k at
sc_stride=1 (190.7 ms/step, reference-exact quadrature); 30.5 k rays/s f32.
SATNERF_BENCH_SIN=poly5 (opt-in degree-5 sine; PSNR-neutral with a
measured DSM-MAE cost, docs/performance.md): 46.5k at stride 1. Large-batch
modes: batch 16384 via SATNERF_BENCH_REMAT_CHUNKS=2 (37.1k) or
SATNERF_BENCH_IMPL=pallas (39.2k); 16384/sc2 fits without remat (49.8k) —
all below the 8192 frontier (docs/performance.md "stacked levers").
"""

from __future__ import annotations

import json
import multiprocessing
import os
import sys
import tempfile
import time

import numpy as np

REFERENCE_RAYS_PER_SEC = 10_240.0

# Backstop constant only: the stale fallback path prefers the newest live
# probe artifact (.bench_last_live.json, written by every successful
# default-config run) and uses this value only when no artifact exists.
# (2026-08-20 09:31 post-reboot probe, honest scan+readback timing, batch
# 8192 bf16 sc_stride=1.)
LAST_KNOWN_RAYS_PER_SEC = 42_925.3

LAST_LIVE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_last_live.json"
)

# Production config; overridable for large-batch / impl experiments:
#   SATNERF_BENCH_BATCH=16384 SATNERF_BENCH_IMPL=pallas python bench.py
#   SATNERF_BENCH_REMAT_CHUNKS=2 for the chunked-scan remat path
BATCH_SIZE = int(os.environ.get("SATNERF_BENCH_BATCH", 8192))
DEPTH_RAYS = 1024
TRUNK_IMPL = os.environ.get("SATNERF_BENCH_IMPL", "xla")
REMAT_CHUNKS = int(os.environ.get("SATNERF_BENCH_REMAT_CHUNKS", 0))
# Hierarchical (coarse-to-fine) fine-pass bench: SATNERF_BENCH_HIER=<N>
# enables use_fine_network with N PDF-resampled fine rungs (the production
# hier config is N=128: 64 coarse + 64+128 fine field points per ray).
# The stored-activation backward exceeds HBM at batch 8192 in this mode,
# so unless overridden the bench drops to the hier production settings
# batch 4096 + remat_chunks=2 (tools/syn_long_run.py does the same).
HIER_N_IMPORTANCE = int(os.environ.get("SATNERF_BENCH_HIER", 0))
if HIER_N_IMPORTANCE > 0:
    if "SATNERF_BENCH_BATCH" not in os.environ:
        BATCH_SIZE = 4096
    if "SATNERF_BENCH_REMAT_CHUNKS" not in os.environ:
        REMAT_CHUNKS = 2
SIN_IMPL = os.environ.get("SATNERF_BENCH_SIN", "poly")
if SIN_IMPL == "auto":  # resolve like train/step.py: quality-safe kernel
    SIN_IMPL = "poly"
assert SIN_IMPL in ("poly", "poly5", "poly7f", "exact"), (
    f"SATNERF_BENCH_SIN={SIN_IMPL!r}: use poly, poly5, poly7f, exact, or auto"
)
# Solar-correction quadrature stride. Default 2 = the gate-passed
# production config (see module docstring); 1 = reference-exact.
SC_STRIDE = int(os.environ.get("SATNERF_BENCH_SC_STRIDE", 2))
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
    + ("" if HIER_N_IMPORTANCE == 0 else f"/hier{HIER_N_IMPORTANCE}")
)
IS_DEFAULT_CONFIG = (
    (BATCH_SIZE, TRUNK_IMPL, REMAT_CHUNKS, SIN_IMPL, TRUNK_BWD, SC_STRIDE,
     HIER_N_IMPORTANCE)
    == (8192, "xla", 0, "poly", "recompute", 2, 0)
)
SCAN_STEPS = 50  # long enough to amortise the ~0.4 s tunnel readback


def _read_last_live():
    """(rays_per_sec, config, recorded_at) from the newest live-probe
    artifact; falls back to the in-code backstop constant."""
    try:
        with open(LAST_LIVE_PATH) as f:
            d = json.load(f)
        return (
            float(d["rays_per_sec"]),
            str(d.get("config", "unknown")),
            str(d.get("recorded_at", "unknown")),
        )
    except Exception:
        return (
            LAST_KNOWN_RAYS_PER_SEC,
            "batch8192/xla/chunks0/bf16 (in-code backstop)",
            "2026-08-20T09:31Z",
        )


def _write_last_live(rays_per_sec: float, ms_per_step: float) -> None:
    """Atomically persist a successful default-config live measurement so
    later stale fallbacks report a machine-recorded number, not a
    hand-edited constant."""
    # Plausibility guard (round-5, ADVICE): a run that completed while the
    # single-tenant tunnel was contended can be artificially slow yet exit 0;
    # don't let it DEPRESS the stale-fallback artifact below half of the
    # best known-healthy number. (Upward moves always persist.)
    floor = 0.5 * max(LAST_KNOWN_RAYS_PER_SEC, _read_last_live()[0])
    if rays_per_sec < floor:
        print(
            f"bench: measured {rays_per_sec:.0f} rays/s is implausibly low "
            f"(< half the known-healthy number); keeping the existing "
            f"live-probe artifact as the stale fallback",
            file=sys.stderr,
        )
        return
    payload = {
        "rays_per_sec": round(rays_per_sec, 1),
        "ms_per_step": round(ms_per_step, 2),
        "config": CONFIG_DESC,
        "recorded_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    try:
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(LAST_LIVE_PATH), suffix=".tmp"
        )
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
        os.replace(tmp, LAST_LIVE_PATH)
    except OSError as exc:  # read-only checkout etc.: measurement still prints
        print(f"bench: could not persist live artifact ({exc})",
              file=sys.stderr)


def main(deadline_s: float | None = None, phase_path: str | None = None) -> None:
    t_start = time.time()

    def phase(msg: str) -> None:
        """Leave a breadcrumb for the guarded parent's diagnostics: if the
        child dies or is killed, the last phase line pinpoints where."""
        if not phase_path:
            return
        try:
            with open(phase_path, "a") as f:
                f.write(f"{msg} t={time.time() - t_start:.1f}s\n")
        except OSError:
            pass

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

    phase("imports")
    import jax

    from __graft_entry__ import _batch
    from satnerf_tpu.models.field import FieldConfig
    from satnerf_tpu.render.renderer import RenderConfig
    from satnerf_tpu.train.state import create_train_state, make_optimizer
    from satnerf_tpu.train.step import StepConfig, build_train_step

    phase("build")
    fcfg = FieldConfig(variant="rs_semantic", mapping=True, siren=True,
                       n_classes=5, trunk_impl=TRUNK_IMPL, sin_impl=SIN_IMPL,
                       trunk_bwd=TRUNK_BWD)
    rcfg = RenderConfig(
        field=fcfg, n_samples=64, solar_correction=True,
        compute_dtype="bfloat16", remat_chunks=REMAT_CHUNKS,
        sc_stride=SC_STRIDE,
        n_importance=HIER_N_IMPORTANCE,
        use_fine_network=HIER_N_IMPORTANCE > 0,
    )
    scfg = StepConfig(
        render=rcfg, steps_per_epoch=1000, sc_lambda=0.05, first_beta_epoch=0,
        depth=True, semantic=True, car_index=4, use_car_reg_loss=True,
        car_reg_loss_start=0,
    )
    opt = make_optimizer(5e-4, steps_per_epoch=1000)
    state = create_train_state(jax.random.PRNGKey(0), fcfg, opt, t_vocab=50,
                               use_fine_network=HIER_N_IMPORTANCE > 0)
    step = build_train_step(scfg, opt)

    batch = jax.device_put(_batch(BATCH_SIZE, depth=DEPTH_RAYS))

    def many_steps(state, batch, key):
        def body(st, k):
            st, metrics = step(st, batch, k)
            return st, metrics["loss"]

        return jax.lax.scan(body, state, jax.random.split(key, SCAN_STEPS))

    many_j = jax.jit(many_steps, donate_argnums=(0,))

    # warmup / compile (forced readback completes remote execution)
    phase("compile")
    key = jax.random.PRNGKey(1)
    state, losses = many_j(state, batch, key)
    assert np.isfinite(float(losses[-1]))
    phase("warm")

    best = float("inf")
    final_loss = float(losses[-1])
    for trial in range(3):
        # self-bounding between trials: exiting here (between dispatches)
        # is safe for the chip grant, unlike being killed mid-step
        if stop_requested and best == float("inf"):
            raise SystemExit(1)  # no measurement yet; parent reports stale
        if best < float("inf") and over_deadline():
            break
        phase(f"trial-{trial + 1}")
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, losses = many_j(state, batch, sub)
        final_loss = float(losses[-1])  # forced readback = honest clock
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(final_loss)

    rays_per_sec = SCAN_STEPS * BATCH_SIZE / best
    phase("done")

    if IS_DEFAULT_CONFIG:
        _write_last_live(rays_per_sec, best / SCAN_STEPS * 1e3)

    line = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
        "config": CONFIG_DESC,
    }
    if SC_STRIDE != 1:
        # self-contained comparability note (ADVICE round-4): the scored
        # config evaluates 1/SC_STRIDE of the solar-correction quadrature
        # rungs; reference-exact work-per-ray is SC_STRIDE=1.
        line["quadrature"] = (
            f"sc_stride={SC_STRIDE} gate-passed strided sc quadrature "
            f"(docs/performance.md); reference-exact is sc_stride=1 "
            f"(~42.9k rays/s on this chip)"
        )
    print(json.dumps(line))


def _run_attempt(join_s: float, child_deadline_s: float,
                 grace_s: float = 60.0) -> dict:
    """One guarded child run; returns {"ok", "exit", "elapsed_s", "phase"}.

    The child bounds itself between trials (safe points); if it is stuck
    inside a device call past ``join_s``, escalate SIGTERM -> grace ->
    SIGKILL. Killing a TPU client mid-step can wedge the single-tenant chip
    grant (see CLAUDE.md), so the kill is a last resort after a long grace
    period, not the primary bound."""
    fd, phase_path = tempfile.mkstemp(prefix="bench_phase_", suffix=".log")
    os.close(fd)
    t0 = time.time()
    killed = False
    try:
        proc = multiprocessing.Process(
            target=main, args=(child_deadline_s, phase_path)
        )
        proc.start()
        proc.join(join_s)
        if proc.is_alive():
            killed = True
            proc.terminate()  # SIGTERM first: lets the runtime unwind cleanly
            proc.join(grace_s)
            if proc.is_alive():
                proc.kill()
                proc.join()
        last_phase = "(no phase recorded)"
        try:
            with open(phase_path) as f:
                lines = [ln.strip() for ln in f if ln.strip()]
            if lines:
                last_phase = lines[-1]
        except OSError:
            pass
        return {
            "ok": proc.exitcode == 0,
            "exit": proc.exitcode,
            "elapsed_s": round(time.time() - t0, 1),
            "phase": last_phase,
            "killed_by_parent_deadline": killed,
        }
    finally:
        try:
            os.unlink(phase_path)
        except OSError:
            pass


def _guarded_main(timeout_s: float = 720.0, retry_backoff_s: float = 150.0) -> None:
    """Run the measurement in a child process with a deadline so a wedged
    device cannot hang the caller; retry once on a fast failure (transient
    single-tenant grant contention clears on the minutes scale); report the
    newest verified live number as stale — with per-attempt diagnostics —
    only if no attempt can complete.

    Budget layout within ``timeout_s`` (default 720 s): attempt 1 gets up
    to 430 s (a cold live run is ~240 s incl. remote compile). If it FAILS
    FAST (e.g. UNAVAILABLE at backend init), there is budget for a backoff
    + a full second attempt. If it HANGS the full window, the grant is
    likely wedged (clears in ~15-20 min, CLAUDE.md) — no retry would fit,
    so we go straight to the diagnosed stale report."""
    t0 = time.time()
    attempts: list[dict] = []
    # a live attempt needs ~240 s; don't start one we can't finish
    MIN_LIVE_WINDOW = 250.0
    while True:
        remaining = timeout_s - (time.time() - t0)
        if attempts and remaining < MIN_LIVE_WINDOW:
            break
        if len(attempts) >= 2:
            break
        # cap at the remaining budget (never floor past it: a hung first
        # attempt must not overrun a small timeout_s, ADVICE round-4). A
        # fast-failing attempt (e.g. UNAVAILABLE at init) still fits a tiny
        # budget and yields diagnostics; only a truly spent budget skips.
        # First-attempt window 580 s (round 5): post-wedge remote compiles
        # were measured at 7-13 min cold — a 430 s window killed a HEALTHY
        # child mid-compile (phase diagnostics showed compile t=36s..430s).
        # 580 s still leaves a fast-fail retry inside the 720 s contract.
        join_s = min(580.0, remaining - 20.0)
        if join_s < 5.0:
            break
        # SIGTERM grace before SIGKILL: scaled into the remaining budget but
        # never below 15 s — SIGKILL mid-step wedges the single-tenant grant
        grace_s = min(60.0, max(15.0, remaining - join_s))
        res = _run_attempt(join_s, child_deadline_s=join_s * 0.9,
                           grace_s=grace_s)
        if res["ok"]:
            return
        attempts.append(res)
        remaining = timeout_s - (time.time() - t0)
        if len(attempts) < 2 and remaining > MIN_LIVE_WINDOW:
            # scale the backoff down to fit the remaining budget rather than
            # retrying immediately against a still-contended grant
            backoff = min(retry_backoff_s, remaining - MIN_LIVE_WINDOW)
            print(
                f"bench: attempt {len(attempts)} failed "
                f"(exit={res['exit']}, phase={res['phase']!r}); retrying "
                f"after {backoff:.0f}s backoff",
                file=sys.stderr,
            )
            if backoff > 0:
                time.sleep(backoff)

    value, cfg, recorded_at = _read_last_live()
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": value,
                "unit": "rays/s",
                "vs_baseline": round(value / REFERENCE_RAYS_PER_SEC, 3),
                "stale": True,
                "config": f"{cfg} (last-known live, {recorded_at})",
                "error": "live bench did not complete; value is the newest "
                         "verified live measurement"
                         + ("" if IS_DEFAULT_CONFIG else
                            f" FOR THE DEFAULT CONFIG, not the requested "
                            f"{CONFIG_DESC}"),
                "attempts": attempts,
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("SATNERF_BENCH_NO_GUARD"):
        main()
    else:
        _guarded_main()
