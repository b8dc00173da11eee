"""Prototype: two-half-tile interleaved SIREN trunk forward in Pallas.

Hypothesis (REFUTED, 2026-08-17 on a v5e): pallas loses to XLA at 8192
partly because the in-tile chain GEMM->sin->GEMM serializes MXU and VPU;
splitting each row tile in half and interleaving the two halves' ops gives
the scheduler an independent VPU op to run under every MXU op.

Measured: base 29.20 ms vs interleaved 29.78 ms per 1,048,576-point trunk
forward (bf16, production shapes) — bit-identical outputs, NO overlap win.
Mosaic either already schedules the overlap or the kernel is bound
elsewhere (VMEM bandwidth / issue rate). Kept as the record of a measured
dead end; see docs/performance.md.

Methodology note: the timing scan threads the carry into the input —
with loop-invariant inputs XLA hoists the kernel out of the scan and
reports a physically impossible 12x-too-fast number (the same artifact
that produced the old render-throughput table).
"""
import sys, time, functools
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from satnerf_tpu.ops.pallas.trunk import (
    TrunkSpec, pack_trunk, fused_trunk, _dot, _sin_f32, _preact, LANE,
    FWD_TILE, _pad_rows, _pad_lanes,
)

spec = TrunkSpec(layers=8, feat=512, skips=(4,), c_in=63)


def _fwd_kernel_il(spec, x_ref, w0_ref, w_mid_ref, w_skip_ref, b_ref, out_ref):
    dt = x_ref.dtype
    T = x_ref.shape[0]
    H = T // 2
    xA = x_ref[:H]
    xB = x_ref[H:]
    b0 = b_ref[0:1, :].astype(jnp.float32)
    # layer 0
    aA = _dot(xA, w0_ref[:]) + b0
    aB = _dot(xB, w0_ref[:]) + b0
    hA = _sin_f32(spec.w0 * aA).astype(dt)
    hB = None  # pending sin for B
    pB = spec.w0 * aB  # pre-activation awaiting sin
    for i in range(1, spec.layers):
        # MXU on A (needs hA) while VPU does the pending sin for B
        aA = _preact(spec, i, hA, xA, w_mid_ref, w_skip_ref, b_ref)
        hB = _sin_f32(pB).astype(dt)
        # MXU on B (needs hB) while VPU sins A
        aB = _preact(spec, i, hB, xB, w_mid_ref, w_skip_ref, b_ref)
        hA = _sin_f32(aA).astype(dt)
        pB = aB
    hB = _sin_f32(pB).astype(dt)
    out_ref[:H] = hA
    out_ref[H:] = hB


def fused_trunk_il(x, packed):
    F = spec.feat
    xp, n = _pad_rows(_pad_lanes(x), FWD_TILE)
    n_pad = xp.shape[0]
    kern = functools.partial(_fwd_kernel_il, spec)
    out = pl.pallas_call(
        kern,
        grid=(n_pad // FWD_TILE,),
        in_specs=[
            pl.BlockSpec((FWD_TILE, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.layers - 1, F, F), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.n_skip, LANE, F), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.layers, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FWD_TILE, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, F), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(xp, packed["w0"], packed["w_mid"], packed["w_skip"], packed["b"])
    return out[:n]


def main():
    N = 8192 * 64 * 2
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    trunk = []
    fan = spec.c_in
    for i in range(spec.layers):
        cin = fan + (spec.c_in if i in spec.skips else 0) if i else fan
        key, k1, k2 = jax.random.split(key, 3)
        trunk.append({"w": jax.random.normal(k1, (cin, spec.feat)) * 0.02,
                      "b": jax.random.normal(k2, (spec.feat,)) * 0.01})
        fan = spec.feat
    packed = jax.tree_util.tree_map(lambda a: a, pack_trunk(trunk, spec, dt))
    x = (jax.random.normal(key, (N, spec.c_in)) * 0.5).astype(dt)

    K = 20
    def many(fn, x, packed, _):
        # carry feeds the input so the scan body cannot be hoisted
        def body(c, _):
            h = fn(x + c.astype(x.dtype), packed)
            return (h[0, 0].astype(jnp.float32) * 1e-6), None
        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=K)
        return out

    base = jax.jit(lambda x, p: many(lambda a, b: fused_trunk(spec, False, a, b), x, p, None))
    inter = jax.jit(lambda x, p: many(fused_trunk_il, x, p, None))

    # numerics check
    o1 = fused_trunk(spec, False, x[:1024], packed)
    o2 = fused_trunk_il(x[:1024], packed)
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
    print("max abs diff base vs interleaved:", err, flush=True)

    for name, f in (("base", base), ("interleaved", inter)):
        out = f(x, packed); float(np.asarray(out))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(x, packed); float(np.asarray(out))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / K * 1e3:.2f} ms per trunk fwd ({N} pts)", flush=True)


if __name__ == "__main__":
    main()
