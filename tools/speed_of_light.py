"""On-chip speed-of-light attribution for the flagship train step.

Times, with the same honest scan+readback methodology as bench.py (the
tunnel's block_until_ready is unreliable):

  gemm       the bare trunk GEMM chain at the production shapes/dtype
             (8 layers x 512, skip concat at 4, on the per-step point count
             incl. the solar-correction half) — the MXU floor
  gemm+sin   same chain with the production fast_sin activation — isolates
             the VPU sine cost ON the GEMM critical path
  fwd        the full render-path forward (render_rays, no grad)
  step       the full fused train step (losses + Adam)

and derives achieved TFLOP/s + MFU against the chip's bf16 peak. Use this
to see how far the step is from the hardware ceiling and which gap
(sine / non-GEMM epilogue / backward) is worth attacking next.

Usage:  python tools/speed_of_light.py [--batch 8192] [--samples 64]
            [--dtype bfloat16] [--scan 30] [--peak-tflops 197]
            [--sc-stride 2]
(peak default 197 = v5e bf16; its oft-quoted 394 figure is int8. v4 ~275
bf16. Measured 2026-08-20 on this v5e: the bare production GEMM chain hits
164.6 TFLOP/s = 84% of the 197 bf16 peak, which corroborates 197 as the
correct denominator — 394 would put a pure large-GEMM chain at 42%.)
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


def _timed(fn, *args, scan_trials=3):
    """Best-of-N wall time of fn(*args) with a forced scalar readback."""
    out = fn(*args)
    _force(out)
    best = float("inf")
    for _ in range(scan_trials):
        t0 = time.perf_counter()
        out = fn(*args)
        _force(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _force(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf.ravel()[0], np.float32))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--scan", type=int, default=30)
    ap.add_argument("--feat", type=int, default=512)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip bf16 peak; v5e is 197 TFLOP/s bf16 (394 is "
                         "its int8 number), v4 ~275 bf16")
    ap.add_argument("--sin", default="poly",
                    choices=["poly", "poly5", "poly7f"])
    ap.add_argument("--sc-stride", type=int, default=1,
                    help="solar-correction quadrature stride (2 = the "
                         "gate-passed production config); scales the "
                         "per-step point count the FLOP accounting uses")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from satnerf_tpu.ops.fastmath import fast_sin, fast_sin5, fast_sin7f

    sin_fn = {"poly": fast_sin, "poly5": fast_sin5,
              "poly7f": fast_sin7f}[args.sin]

    dt = jnp.dtype(args.dtype)
    # per-step field points: main half + solar-correction half (every
    # sc_stride-th z rung on the sc half; renderer.py sc_stride quadrature)
    # per-ray rung count mirrors the renderer exactly: the strided slice is
    # anchored at (S-1) % stride (renderer.py:186), giving each ray
    # ceil(samples/stride) sc rungs — NOT ceil(batch*samples/stride), which
    # undercounts ~3% whenever stride does not divide samples (ADVICE r4)
    n_sc = args.batch * (-(-args.samples // max(args.sc_stride, 1)))
    n_points = args.batch * args.samples + n_sc
    xyz_in = 63  # posenc(10 freqs) of xyz + raw (rs_semantic mapping)
    feat, layers, skip = args.feat, args.layers, {4}
    scan_k = args.scan

    key = jax.random.PRNGKey(0)
    ws = []
    fan_in = xyz_in
    for i in range(layers):
        if i in skip:
            fan_in += xyz_in
        key, sub = jax.random.split(key)
        ws.append(jax.random.normal(sub, (fan_in, feat), dt) * 0.02)
        fan_in = feat
    x0 = jax.random.normal(key, (n_points, xyz_in), dt)

    gemm_flops = 2 * n_points * sum(int(w.shape[0]) * int(w.shape[1]) for w in ws)

    def chain(x0, ws, act):
        def one_pass(x, _):
            h = x
            for i, w in enumerate(ws):
                if i in skip:
                    h = jnp.concatenate([h, x], axis=-1)
                h = h @ w
                if act:
                    h = sin_fn(h)
            # fold the output back to the input width so the scan carries
            # a fixed shape; the extra (feat x xyz_in) GEMM is negligible
            return (h[:, :xyz_in]).astype(x.dtype), h.sum()

        _, sums = jax.lax.scan(one_pass, x0, None, length=scan_k)
        return sums

    rows = []

    for name, act in (("gemm", False), ("gemm+sin", True)):
        fn = jax.jit(lambda x, ws=ws, a=act: chain(x, ws, a))
        dt_s = _timed(fn, x0) / scan_k
        tflops = gemm_flops / dt_s / 1e12
        rows.append(
            {
                "what": name,
                "ms": round(dt_s * 1e3, 2),
                "achieved_tflops": round(tflops, 1),
                "mfu_vs_peak": round(tflops / args.peak_tflops, 3),
            }
        )

    # full forward + full train step at the same config (bench.py shapes)
    from __graft_entry__ import _batch
    from satnerf_tpu.models.field import FieldConfig
    from satnerf_tpu.render.renderer import RenderConfig, render_rays
    from satnerf_tpu.train.state import create_train_state, make_optimizer
    from satnerf_tpu.train.step import StepConfig, build_train_step

    fcfg = FieldConfig(variant="rs_semantic", mapping=True, siren=True,
                       n_classes=5, sin_impl=args.sin)
    rcfg = RenderConfig(field=fcfg, n_samples=args.samples,
                        solar_correction=True, compute_dtype=args.dtype,
                        sc_stride=args.sc_stride)
    scfg = StepConfig(render=rcfg, steps_per_epoch=1000, sc_lambda=0.05,
                      first_beta_epoch=0, depth=True, semantic=True,
                      car_index=4, use_car_reg_loss=True, car_reg_loss_start=0)
    opt = make_optimizer(5e-4, steps_per_epoch=1000)
    state = create_train_state(jax.random.PRNGKey(0), fcfg, opt, t_vocab=50)
    step = build_train_step(scfg, opt)
    batch = jax.device_put(_batch(args.batch, depth=min(1024, args.batch)))

    rays = batch["rays"]
    extras = batch["extras"]

    def fwd_many(params, rays, extras, key):
        def body(c, k):
            res = render_rays(params, rcfg, rays, extras, k)
            return c + res["rgb"].sum(), None

        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jax.random.split(key, scan_k))
        return out

    fwd_j = jax.jit(fwd_many)
    fwd_s = _timed(fwd_j, state.params, rays, extras, jax.random.PRNGKey(2))
    rows.append({"what": "fwd (render_rays)", "ms": round(fwd_s / scan_k * 1e3, 2)})

    def step_many(state, batch, key):
        def body(st, k):
            st, metrics = step(st, batch, k)
            return st, metrics["loss"]

        return jax.lax.scan(body, state, jax.random.split(key, scan_k))

    step_j = jax.jit(step_many, donate_argnums=(0,))
    st2, losses = step_j(state, batch, jax.random.PRNGKey(3))
    _force(losses)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        st2, losses = step_j(st2, batch, jax.random.PRNGKey(4))
        _force(losses)
        best = min(best, time.perf_counter() - t0)
    step_s = best / scan_k
    # fwd+bwd+update FLOPs ~ 3x the forward GEMMs (fwd, dL/dx, dL/dW)
    step_tflops = 3 * gemm_flops / step_s / 1e12
    rows.append(
        {
            "what": "train step (fused)",
            "ms": round(step_s * 1e3, 2),
            "achieved_tflops_3x_gemm": round(step_tflops, 1),
            "mfu_vs_peak": round(step_tflops / args.peak_tflops, 3),
        }
    )

    print(json.dumps({
        "config": {
            "batch": args.batch, "samples": args.samples, "dtype": args.dtype,
            "sc_stride": args.sc_stride,
            "points_per_step": n_points, "gemm_flops_per_step": gemm_flops,
            "peak_tflops": args.peak_tflops,
            "backend": jax.default_backend(),
        },
        "rows": rows,
    }, indent=2))


if __name__ == "__main__":
    main()
