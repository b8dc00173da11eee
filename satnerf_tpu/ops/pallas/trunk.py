"""Fused SIREN-trunk Pallas kernel: the field's 8x512 MLP in one TPU pass.

Why: XLA materialises every trunk layer's (N, 512) activations to HBM
(forward AND backward), which together with the sine VPU work leaves the
batch-8192 train step at ~200 ms where the MXU floor is ~90 ms
(docs/performance.md). This kernel keeps ALL trunk weights resident in
VMEM (~4 MB bf16), streams row tiles of the point batch through the
layer chain in-register, and applies the fast_sin polynomial activation
(ops/fastmath.py) between GEMMs — trunk activations never leave the chip.

Equivalence: matches ``models/field.py`` trunk semantics exactly
(ref architecture: baseline/models/nerf.py:118-134 fc_net with skip
concat at layer 4, SIREN w0=30 first layer, ref: commons.py:21-27):

    h_0 = sin(w0 * (enc_x @ W_0 + b_0))
    h_i = sin(h_{i-1} @ W_i + b_i)            i not in skips
    h_i = sin([enc_x, h_{i-1}] @ W_i + b_i)   i in skips

The skip concat is computed as a split GEMM (x @ W_x + h @ W_h) so no
concatenated tensor is ever built. GEMMs accumulate in f32 on the MXU
(``preferred_element_type``), the sine runs in f32 on the VPU, and the
activation is cast back to the compute dtype — matching the XLA path
within compute-dtype rounding.

The backward pass is a second Pallas kernel (custom VJP): it re-runs the
forward per tile keeping the pre-activations in VMEM, then sweeps the
layer chain in reverse. Weight/bias gradients accumulate in f32 directly
in the (constant-index-mapped, hence VMEM-resident) output blocks across
the sequential TPU grid; input gradients stream out per tile.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from satnerf_tpu.ops.fastmath import (
    _HALF_PI,
    _INV_PI2,
    _PI2_F32,
    _PI2_HI,
    _PI2_LO,
    _Q1,
    _Q2,
    _S1,
    _S2,
    _S3,
)

LANE = 128  # TPU lane width: first-layer input is padded to this


@dataclass(frozen=True)
class TrunkSpec:
    """Static trunk architecture (hashable; closed over by the kernels)."""

    layers: int
    feat: int
    skips: tuple
    c_in: int  # true (unpadded) input width
    w0: float = 30.0
    # sine kernel selection (ops/fastmath.py): "poly" = Cody-Waite two-term
    # reduction + degree-7 kernel; "poly5" = one-term reduction + degree-5
    # (~1.5e-4 abs err, bf16 PSNR-bound path); "poly7f" = one-term
    # reduction + degree-7 (fast_sin7f)
    sin_mode: str = "poly"
    # backward engine: "recompute" re-runs the forward per tile in VMEM
    # (memory-frugal: O(tile) residuals — the only option once the batch's
    # activations exceed HBM, i.e. >= 16384 rays at the flagship shape);
    # "stored" makes the forward write every pre-activation tile to HBM
    # and the VJP consume them (XLA-style residuals: skips the L-GEMM
    # recompute at the cost of 2*L*N*F bytes of pipelined HBM traffic)
    bwd: str = "recompute"

    def __post_init__(self):
        assert self.feat % LANE == 0, "feat must be a multiple of 128"
        assert self.c_in <= LANE, "encoded input must fit one lane tile"
        assert 0 not in self.skips, "skip at layer 0 is not meaningful"
        assert self.sin_mode in ("poly", "poly5", "poly7f"), self.sin_mode
        assert self.bwd in ("recompute", "stored"), self.bwd

    @property
    def n_skip(self) -> int:
        return max(len(self.skips), 1)


# -----------------------------------------------------------------------
# shared in-kernel math
# -----------------------------------------------------------------------


def _reduce(x, mode="poly"):
    """Range reduction to [-pi, pi] (f32): Cody-Waite two-term ("poly"),
    or the one-term reduction of the fast variants (ops/fastmath.py)."""
    n = jnp.round(x * _INV_PI2)
    if mode in ("poly5", "poly7f"):
        return x - n * _PI2_F32
    r = x - n * _PI2_HI
    return r - n * _PI2_LO


def _sin_poly(r, mode="poly"):
    """Odd minimax polynomial on the [-pi/2, pi/2] fold (ops/fastmath.py)."""
    r2 = r * r
    if mode == "poly5":
        p = _Q2 * r2 + _Q1
    else:
        p = _S3
        p = p * r2 + _S2
        p = p * r2 + _S1
    return r + r * r2 * p


def _sin_f32(x, mode="poly"):
    r = _reduce(x, mode)
    r = jnp.where(r > _HALF_PI, np.pi - r, r)
    r = jnp.where(r < -_HALF_PI, -np.pi - r, r)
    return _sin_poly(r, mode)


def _cos_f32(x, mode="poly"):
    """cos(x) = sin(pi/2 - |r|) for r the [-pi, pi] reduction of x."""
    r = _reduce(x, mode)
    return _sin_poly(_HALF_PI - jnp.abs(r), mode)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_at_b(a, b):  # a^T @ b, contracting rows
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_a_bt(a, b):  # a @ b^T, contracting b's columns
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _preact(spec: TrunkSpec, i: int, h, x, w_mid_ref, w_skip_ref, b_ref):
    """f32 pre-activation of layer i >= 1 from the previous activation h."""
    a = _dot(h, w_mid_ref[i - 1])
    if i in spec.skips:
        a = a + _dot(x, w_skip_ref[spec.skips.index(i)])
    return a + b_ref[i : i + 1, :].astype(jnp.float32)


# -----------------------------------------------------------------------
# forward kernel
# -----------------------------------------------------------------------


def _fwd_kernel(spec: TrunkSpec, emit_acts: bool, x_ref, w0_ref, w_mid_ref,
                w_skip_ref, b_ref, out_ref, *acts_out):
    dt = x_ref.dtype
    x = x_ref[:]
    a0 = _dot(x, w0_ref[:]) + b_ref[0:1, :].astype(jnp.float32)
    if emit_acts:  # bwd="stored": pre-activations are the backward residual
        acts_out[0][0, :, :] = a0.astype(dt)
    h = _sin_f32(spec.w0 * a0, spec.sin_mode).astype(dt)
    for i in range(1, spec.layers):
        a = _preact(spec, i, h, x, w_mid_ref, w_skip_ref, b_ref)
        if emit_acts:
            acts_out[0][i, :, :] = a.astype(dt)
        h = _sin_f32(a, spec.sin_mode).astype(dt)
    out_ref[:] = h


# -----------------------------------------------------------------------
# backward kernel
# -----------------------------------------------------------------------


def _bwd_kernel(spec: TrunkSpec, x_ref, w0_ref, w_mid_ref, w_skip_ref, b_ref,
                g_ref, gx_ref, gw0_ref, gwmid_ref, gwskip_ref, gb_ref,
                acts_ref, hs_ref):
    """One row tile: recompute the forward (stashing pre-activations in
    VMEM), then reverse sweep. The weight/bias gradient outputs use a
    constant index map, so their blocks stay VMEM-resident across the
    sequential grid and serve as the accumulators directly."""
    dt = x_ref.dtype
    L = spec.layers
    x = x_ref[:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gw0_ref[:] = jnp.zeros_like(gw0_ref)
        gwmid_ref[:] = jnp.zeros_like(gwmid_ref)
        gwskip_ref[:] = jnp.zeros_like(gwskip_ref)
        gb_ref[:] = jnp.zeros_like(gb_ref)

    # ---- forward recompute, stashing pre- AND post-activations -----------
    # (stashing h_i too costs one more (L, tile, F) VMEM block but removes
    # L redundant sine recomputations from the reverse sweep — the VPU
    # sine is the kernel's serial bottleneck, docs/performance.md)
    a0 = _dot(x, w0_ref[:]) + b_ref[0:1, :].astype(jnp.float32)
    acts_ref[0, :, :] = a0.astype(dt)
    h = _sin_f32(spec.w0 * a0, spec.sin_mode).astype(dt)
    hs_ref[0, :, :] = h
    for i in range(1, L):
        a = _preact(spec, i, h, x, w_mid_ref, w_skip_ref, b_ref)
        acts_ref[i, :, :] = a.astype(dt)
        h = _sin_f32(a, spec.sin_mode).astype(dt)
        hs_ref[i, :, :] = h

    _bwd_sweep(spec, x, w0_ref, w_mid_ref, w_skip_ref, g_ref, gx_ref,
               gw0_ref, gwmid_ref, gwskip_ref, gb_ref, acts_ref, hs_ref)


def _bwd_sweep(spec: TrunkSpec, x, w0_ref, w_mid_ref, w_skip_ref, g_ref,
               gx_ref, gw0_ref, gwmid_ref, gwskip_ref, gb_ref, acts_ref,
               hs_ref):
    """Reverse sweep over the layer chain given stashed pre-activations
    ``acts_ref`` (L, T, F) and post-activations ``hs_ref`` (L, T, F)."""
    dt = x.dtype
    L = spec.layers
    g = g_ref[:].astype(jnp.float32)  # d loss / d h_{L-1}
    gx_skip = jnp.zeros((x.shape[0], LANE), jnp.float32)
    for i in range(L - 1, 0, -1):
        a = acts_ref[i, :, :].astype(jnp.float32)
        ga = g * _cos_f32(a, spec.sin_mode)  # layers >= 1 use w0 = 1
        ga_dt = ga.astype(dt)
        h_prev = hs_ref[i - 1, :, :]
        gwmid_ref[i - 1, :, :] += _dot_at_b(h_prev, ga_dt)
        gb_ref[i : i + 1, :] += jnp.sum(ga, axis=0, keepdims=True)
        if i in spec.skips:
            s = spec.skips.index(i)
            gwskip_ref[s, :, :] += _dot_at_b(x, ga_dt)
            gx_skip = gx_skip + _dot_a_bt(ga_dt, w_skip_ref[s])
        g = _dot_a_bt(ga_dt, w_mid_ref[i - 1])

    # layer 0: h_0 = sin(w0 * a0)
    ga0 = (
        g
        * _cos_f32(spec.w0 * acts_ref[0, :, :].astype(jnp.float32), spec.sin_mode)
        * spec.w0
    )
    ga0_dt = ga0.astype(dt)
    gw0_ref[:] += _dot_at_b(x, ga0_dt)
    gb_ref[0:1, :] += jnp.sum(ga0, axis=0, keepdims=True)
    gx_ref[:] = (_dot_a_bt(ga0_dt, w0_ref[:]) + gx_skip).astype(dt)


def _bwd_kernel_stored(spec: TrunkSpec, x_ref, w0_ref, w_mid_ref, w_skip_ref,
                       acts_in_ref, g_ref, gx_ref, gw0_ref, gwmid_ref,
                       gwskip_ref, gb_ref, hs_ref):
    """Stored-activation backward (``bwd="stored"``): the forward pass
    already wrote every pre-activation tile to HBM (XLA-style residuals),
    so this kernel skips the L-GEMM forward recompute entirely — it loads
    the (L, T, F) activation block, rebuilds h_i with L sines, and runs
    the same reverse sweep. Trades ~2 * L*N*F bytes of HBM traffic
    (pipelined behind compute by Mosaic's blocked input streaming) for the
    recompute GEMMs; only viable when the whole batch's activations fit
    in HBM — the recompute kernel remains the engine for >= 16384
    (docs/performance.md "hybrid backward")."""
    dt = x_ref.dtype
    L = spec.layers
    x = x_ref[:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gw0_ref[:] = jnp.zeros_like(gw0_ref)
        gwmid_ref[:] = jnp.zeros_like(gwmid_ref)
        gwskip_ref[:] = jnp.zeros_like(gwskip_ref)
        gb_ref[:] = jnp.zeros_like(gb_ref)

    # post-activations from the stored pre-activations: L sines, no GEMMs
    hs_ref[0, :, :] = _sin_f32(
        spec.w0 * acts_in_ref[0, :, :].astype(jnp.float32), spec.sin_mode
    ).astype(dt)
    for i in range(1, L - 1):  # h_{L-1} is never read by the sweep
        hs_ref[i, :, :] = _sin_f32(
            acts_in_ref[i, :, :].astype(jnp.float32), spec.sin_mode
        ).astype(dt)

    _bwd_sweep(spec, x, w0_ref, w_mid_ref, w_skip_ref, g_ref, gx_ref,
               gw0_ref, gwmid_ref, gwskip_ref, gb_ref, acts_in_ref, hs_ref)


# -----------------------------------------------------------------------
# host-side wrappers
# -----------------------------------------------------------------------


def pack_trunk(trunk_params: list, spec: TrunkSpec, dtype) -> dict:
    """Pack the per-layer {'w','b'} list of models/field.py into the padded
    stacked arrays the kernels consume. Pure jnp (pads/stacks/slices), so
    it runs under jit and is transparently differentiable: gradients flow
    back to the original per-layer pytree through its transpose."""
    F, L = spec.feat, spec.layers
    w0 = trunk_params[0]["w"].astype(dtype)
    w0p = jnp.zeros((LANE, F), dtype).at[: spec.c_in, :].set(w0)
    mids, skips = [], []
    for i in range(1, L):
        w = trunk_params[i]["w"]
        if i in spec.skips:
            # reference concat order is [enc_x, h] (models/field.py:261)
            wx = w[: spec.c_in, :].astype(dtype)
            wh = w[spec.c_in :, :].astype(dtype)
            skips.append(jnp.zeros((LANE, F), dtype).at[: spec.c_in, :].set(wx))
            mids.append(wh)
        else:
            mids.append(w.astype(dtype))
    w_mid = jnp.stack(mids)  # (L-1, F, F)
    w_skip = (
        jnp.stack(skips)
        if skips
        else jnp.zeros((1, LANE, F), dtype)  # placeholder, never indexed
    )
    b = jnp.stack([trunk_params[i]["b"] for i in range(L)]).astype(jnp.float32)
    return {"w0": w0p, "w_mid": w_mid, "w_skip": w_skip, "b": b}


def _pad_rows(x, tile):
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x, n


def _pad_lanes(x):
    c = x.shape[1]
    if c < LANE:
        x = jnp.concatenate(
            [x, jnp.zeros((x.shape[0], LANE - c), x.dtype)], axis=1
        )
    return x


FWD_TILE = 512
BWD_TILE = 256


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_trunk(spec: TrunkSpec, interpret: bool, x, packed):
    """x: (N, c_in) points in compute dtype -> (N, feat) trunk activations.

    ``packed`` comes from :func:`pack_trunk`. Differentiable in both ``x``
    and ``packed`` (custom VJP backed by the backward kernel). When NOT
    being differentiated (eval/render), no activation residuals are
    emitted regardless of ``spec.bwd``.
    """
    out, _ = _trunk_fwd_call(spec, interpret, x, packed, emit_acts=False)
    return out


def _trunk_fwd_call(spec, interpret, x, packed, emit_acts: bool):
    F, L = spec.feat, spec.layers
    xp, n = _pad_rows(_pad_lanes(x), FWD_TILE)
    n_pad = xp.shape[0]
    kern = functools.partial(_fwd_kernel, spec, emit_acts)
    out_specs = [pl.BlockSpec((FWD_TILE, F), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((n_pad, F), x.dtype)]
    if emit_acts:
        out_specs.append(pl.BlockSpec((L, FWD_TILE, F), lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((L, n_pad, F), x.dtype))
    outs = pl.pallas_call(
        kern,
        grid=(n_pad // FWD_TILE,),
        in_specs=[
            pl.BlockSpec((FWD_TILE, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.layers - 1, F, F), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.n_skip, LANE, F), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.layers, F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(xp, packed["w0"], packed["w_mid"], packed["w_skip"], packed["b"])
    # NB the padded-row tail of acts is kept: the backward re-pads to
    # BWD_TILE from the same n_pad multiple, so rows align tile-for-tile
    return outs[0][:n], (outs[1] if emit_acts else None)


def _fused_trunk_fwd(spec, interpret, x, packed):
    out, acts = _trunk_fwd_call(
        spec, interpret, x, packed, emit_acts=spec.bwd == "stored"
    )
    return out, (x, packed, acts)


def _fused_trunk_bwd(spec, interpret, res, g):
    x, packed, acts = res
    F, L = spec.feat, spec.layers
    tile = BWD_TILE
    xp, n = _pad_rows(_pad_lanes(x), tile)
    gp, _ = _pad_rows(g.astype(x.dtype), tile)
    n_pad = xp.shape[0]
    stored = spec.bwd == "stored"
    const3 = lambda i: (0, 0, 0)
    const2 = lambda i: (0, 0)
    in_specs = [
        pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((LANE, F), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((L - 1, F, F), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((spec.n_skip, LANE, F), const3,
                     memory_space=pltpu.VMEM),
    ]
    if stored:
        # the forward wrote acts at the FWD_TILE row padding (a multiple
        # of BWD_TILE), so slicing to this pass's padding aligns tiles
        kern = functools.partial(_bwd_kernel_stored, spec)
        operands = (xp, packed["w0"], packed["w_mid"], packed["w_skip"],
                    acts[:, :n_pad, :], gp)
        in_specs.append(
            pl.BlockSpec((L, tile, F), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
        )
        scratch = [pltpu.VMEM((L, tile, F), x.dtype)]  # post-activations
    else:
        kern = functools.partial(_bwd_kernel, spec)
        operands = (xp, packed["w0"], packed["w_mid"], packed["w_skip"],
                    packed["b"], gp)
        in_specs.append(pl.BlockSpec((L, F), const2,
                                     memory_space=pltpu.VMEM))
        scratch = [
            pltpu.VMEM((L, tile, F), x.dtype),  # stashed pre-activations
            pltpu.VMEM((L, tile, F), x.dtype),  # stashed post-activations
        ]
    in_specs.append(pl.BlockSpec((tile, F), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    gx, gw0, gwmid, gwskip, gb = pl.pallas_call(
        kern,
        grid=(n_pad // tile,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, F), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, F, F), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.n_skip, LANE, F), const3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, F), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, LANE), x.dtype),
            jax.ShapeDtypeStruct((LANE, F), jnp.float32),
            jax.ShapeDtypeStruct((L - 1, F, F), jnp.float32),
            jax.ShapeDtypeStruct((spec.n_skip, LANE, F), jnp.float32),
            jax.ShapeDtypeStruct((L, F), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(*operands)

    c = x.shape[1]
    gx = gx[:n, :c]
    g_packed = {
        "w0": gw0.astype(packed["w0"].dtype),
        "w_mid": gwmid.astype(packed["w_mid"].dtype),
        "w_skip": gwskip.astype(packed["w_skip"].dtype),
        "b": gb.astype(packed["b"].dtype),
    }
    return gx.astype(x.dtype), g_packed


fused_trunk.defvjp(_fused_trunk_fwd, _fused_trunk_bwd)
