"""Fully-fused field kernel: trunk + ALL heads in one Pallas pass.

Builds on ops/pallas/trunk.py (which fuses only the 8x512 trunk): this
kernel additionally evaluates every head — sigma, feats, rgb, sun
visibility, sky, beta, semantic (ref model: semantic/models/rs_semantic.py:
139-340 and its baseline ancestors) — while the row tile is still resident
in VMEM, and emits one packed (N, 128) block of RAW pre-nonlinearity head
outputs. Neither the trunk activations, nor ``feats``, nor any head hidden
layer ever reaches HBM; per point the kernel writes 128 lanes + the (N, F)
``shared`` trunk output (kept as the backward-pass residual) instead of
the ~2,300 lanes of f32 temps the XLA lowering materialises.

Design choices:
- concat inputs ([enc_x, h] skip, [feats, sun_d], [feats, t_emb]) are split
  GEMMs against zero-padded weight blocks — no concatenated tensors;
- sun_d / t_emb / t_s_emb ride in ONE (N, 128) "aux" input block;
- the final per-head linears project straight into disjoint columns of the
  packed output (weights pre-padded to (fl, 128) with the column offset
  baked in), so the whole "small heads" stage is a handful of MXU calls;
- column nonlinearities (softplus/sigmoid/rgb padding) are applied OUTSIDE
  by the caller in jnp: XLA fuses them into the output read, and their
  autodiff composes with this kernel's custom VJP for free.

Backward = two kernels: a heads kernel (recomputes head hiddens from the
saved ``shared``, accumulates head weight grads in constant-index output
blocks across the sequential grid, emits g_shared/g_aux per tile) chained
into the existing trunk backward kernel.

Supported configurations (others fall back to the XLA path, see
models/field.py): SIREN trunk with poly sin, variants snerf/satnerf/
rs_semantic (no view-dir head), fc_use_full_features=False,
use_tj_instead_of_beta=False, use_separate_beta_for_s=False.

Packed output column layout (all f32, pre-nonlinearity):
    0       sigma
    1:4     rgb (before sigmoid + rgb_padding)
    4       sun_v (before sigmoid)
    5:8     sky (before sigmoid)
    8       beta (before softplus)        [has_beta]
    9:9+C   semantic logits               [has_semantic]
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from satnerf_tpu.ops.pallas.trunk import (
    LANE,
    TrunkSpec,
    _cos_f32,
    _dot,
    _dot_a_bt,
    _dot_at_b,
    _fused_trunk_bwd,
    _pad_lanes,
    _pad_rows,
    _sin_f32,
)

COL_SIGMA = 0
COL_RGB = 1
COL_SUN = 4
COL_SKY = 5
COL_BETA = 8
COL_SEM = 9


@dataclass(frozen=True)
class FieldSpec:
    """Static full-field architecture (hashable; closed over by kernels).

    ``heads_on=False`` builds the solar-correction variant of the kernel:
    only sigma + the sun-visibility chain are evaluated (the sc pass's loss
    terms read nothing else — ref: baseline/components/loss.py:13-29, and
    see ``field_forward(n_full=...)``); the rgb/sky/beta/semantic chains and
    their weights are dropped from the program entirely.
    """

    trunk: TrunkSpec
    fl: int  # feat_last (head hidden width)
    tau: int  # t-embedding width
    n_classes: int
    has_beta: bool
    has_semantic: bool
    use_tj_for_s: bool
    sep_t_s: bool  # use_separate_tj_for_semantic
    heads_on: bool = True

    def __post_init__(self):
        assert self.fl % LANE == 0 and self.fl <= 512
        assert COL_SEM + self.n_classes <= LANE
        assert 3 + 2 * self.tau <= LANE

    # aux block column offsets
    @property
    def aux_t(self) -> int:
        return 3

    @property
    def aux_t_s(self) -> int:
        return 3 + self.tau

    def hidden_bias_index(self) -> dict:
        """Static row index of each head-hidden bias in the b_heads stack."""
        rows = ["sv0", "sv1", "sv2"]
        if self.heads_on:
            rows = ["rgb0"] + rows + ["sky0"]
            if self.has_beta:
                rows.append("b0")
            if self.has_semantic:
                rows.append("s0")
        return {name: i for i, name in enumerate(rows)}

    def head_keys(self) -> list:
        keys = ["w_feats", "b_feats"]
        if self.heads_on:
            keys += ["w_rgb0"]
        keys += ["w_sv0_f", "w_sv0_aux", "w_sv1", "w_sv2"]
        if self.heads_on:
            keys += ["w_sky0_aux"]
            if self.has_beta:
                keys += ["w_b0_f", "w_b0_aux"]
            if self.has_semantic:
                keys += ["w_s0_f"]
                if self.use_tj_for_s:
                    keys += ["w_s0_aux"]
        keys += ["w2_shared", "w2_sv"]
        if self.heads_on:
            keys += ["w2_rgb", "w2_sky"]
            if self.has_beta:
                keys += ["w2_beta"]
            if self.has_semantic:
                keys += ["w2_sem"]
        keys += ["b_heads", "b_small"]
        return keys


# -----------------------------------------------------------------------
# packing
# -----------------------------------------------------------------------


def _place_cols(w, dtype, at: int):
    return jnp.zeros((w.shape[0], LANE), dtype).at[
        :, at : at + w.shape[1]
    ].set(w.astype(dtype))


def _place_rows(w, dtype, at: int):
    return jnp.zeros((LANE, w.shape[1]), dtype).at[
        at : at + w.shape[0], :
    ].set(w.astype(dtype))


def pack_heads(params: dict, spec: FieldSpec, dtype) -> dict:
    """Pack every head's weights into the padded blocks the kernel consumes.
    Pure jnp -> differentiable; gradients flow back through the transpose."""
    F, fl = spec.trunk.feat, spec.fl
    bias_idx = spec.hidden_bias_index()
    hb_rows = [None] * len(bias_idx)

    def hb(name, b):
        hb_rows[bias_idx[name]] = (
            jnp.zeros((fl,), jnp.float32).at[: b.shape[0]].set(
                b.astype(jnp.float32)
            )
        )

    p: dict = {}
    p["w_feats"] = params["feats"]["w"].astype(dtype)  # (F, F)
    p["b_feats"] = params["feats"]["b"].astype(jnp.float32).reshape(1, F)

    if spec.heads_on:
        p["w_rgb0"] = params["rgb"][0]["w"].astype(dtype)  # (F, fl)
        hb("rgb0", params["rgb"][0]["b"])

    w_sv0 = params["sun_v"][0]["w"]  # (F+3, fl)
    p["w_sv0_f"] = w_sv0[:F, :].astype(dtype)
    p["w_sv0_aux"] = _place_rows(w_sv0[F:, :], dtype, at=0)
    hb("sv0", params["sun_v"][0]["b"])
    p["w_sv1"] = params["sun_v"][1]["w"].astype(dtype)
    hb("sv1", params["sun_v"][1]["b"])
    p["w_sv2"] = params["sun_v"][2]["w"].astype(dtype)
    hb("sv2", params["sun_v"][2]["b"])

    if spec.heads_on:
        p["w_sky0_aux"] = _place_rows(params["sky"][0]["w"], dtype, at=0)
        hb("sky0", params["sky"][0]["b"])

        if spec.has_beta:
            w_b0 = params["beta"][0]["w"]  # (F+tau, fl)
            p["w_b0_f"] = w_b0[:F, :].astype(dtype)
            p["w_b0_aux"] = _place_rows(w_b0[F:, :], dtype, at=spec.aux_t)
            hb("b0", params["beta"][0]["b"])

        if spec.has_semantic:
            w_s0 = params["semantic"][0]["w"]  # (F[+tau], fl)
            p["w_s0_f"] = w_s0[:F, :].astype(dtype)
            if spec.use_tj_for_s:
                at = spec.aux_t_s if spec.sep_t_s else spec.aux_t
                p["w_s0_aux"] = _place_rows(w_s0[F:, :], dtype, at=at)
            hb("s0", params["semantic"][0]["b"])

    # final projections -> packed output columns
    p["w2_shared"] = _place_cols(params["sigma"]["w"], dtype, COL_SIGMA)
    p["w2_sv"] = _place_cols(params["sun_v"][3]["w"], dtype, COL_SUN)
    if spec.heads_on:
        p["w2_rgb"] = _place_cols(params["rgb"][1]["w"], dtype, COL_RGB)
        p["w2_sky"] = _place_cols(params["sky"][1]["w"], dtype, COL_SKY)
        if spec.has_beta:
            p["w2_beta"] = _place_cols(params["beta"][1]["w"], dtype, COL_BETA)
        if spec.has_semantic:
            p["w2_sem"] = _place_cols(params["semantic"][1]["w"], dtype, COL_SEM)

    p["b_heads"] = jnp.stack(hb_rows)  # (n_hidden, fl) f32

    bs = jnp.zeros((LANE,), jnp.float32)
    bs = bs.at[COL_SIGMA].set(params["sigma"]["b"][0].astype(jnp.float32))
    bs = bs.at[COL_SUN].set(params["sun_v"][3]["b"][0].astype(jnp.float32))
    if spec.heads_on:
        bs = bs.at[COL_RGB : COL_RGB + 3].set(
            params["rgb"][1]["b"].astype(jnp.float32)
        )
        bs = bs.at[COL_SKY : COL_SKY + 3].set(
            params["sky"][1]["b"].astype(jnp.float32)
        )
        if spec.has_beta:
            bs = bs.at[COL_BETA].set(
                params["beta"][1]["b"][0].astype(jnp.float32)
            )
        if spec.has_semantic:
            bs = bs.at[COL_SEM : COL_SEM + spec.n_classes].set(
                params["semantic"][1]["b"].astype(jnp.float32)
            )
    p["b_small"] = bs.reshape(1, LANE)
    return p


def pack_aux(spec: FieldSpec, sun_d, t_emb, t_s_emb, dtype):
    """sun_d / t_emb / t_s_emb -> one (N, 128) aux block."""
    n = sun_d.shape[0]
    aux = jnp.zeros((n, LANE), dtype)
    aux = aux.at[:, 0:3].set(sun_d.astype(dtype))
    if t_emb is not None and spec.has_beta and spec.heads_on:
        aux = aux.at[:, spec.aux_t : spec.aux_t + spec.tau].set(
            t_emb.astype(dtype)
        )
    if t_s_emb is not None and spec.sep_t_s and spec.heads_on:
        aux = aux.at[:, spec.aux_t_s : spec.aux_t_s + spec.tau].set(
            t_s_emb.astype(dtype)
        )
    return aux


# -----------------------------------------------------------------------
# forward
# -----------------------------------------------------------------------


def _heads_forward(spec: FieldSpec, shared, aux, hp):
    """Head chains from the (T, F) trunk output; returns the raw packed
    (T, LANE) f32 output. ``hp`` maps packed-weight names to arrays."""
    _sin = lambda _v: _sin_f32(_v, spec.trunk.sin_mode)
    dt = shared.dtype
    bias_idx = spec.hidden_bias_index()
    b_heads = hp["b_heads"]

    def bias(name):
        i = bias_idx[name]
        return b_heads[i : i + 1, :].astype(jnp.float32)

    feats = (_dot(shared, hp["w_feats"]) + hp["b_feats"][0:1, :]).astype(dt)

    sv = _sin(
        _dot(feats, hp["w_sv0_f"]) + _dot(aux, hp["w_sv0_aux"]) + bias("sv0")
    ).astype(dt)
    sv = _sin(_dot(sv, hp["w_sv1"]) + bias("sv1")).astype(dt)
    sv = _sin(_dot(sv, hp["w_sv2"]) + bias("sv2")).astype(dt)

    out = _dot(shared, hp["w2_shared"])
    out = out + _dot(sv, hp["w2_sv"])

    if spec.heads_on:
        hr = _sin(_dot(feats, hp["w_rgb0"]) + bias("rgb0")).astype(dt)
        out = out + _dot(hr, hp["w2_rgb"])

        hsky = jnp.maximum(
            _dot(aux, hp["w_sky0_aux"]) + bias("sky0"), 0.0
        ).astype(dt)
        out = out + _dot(hsky, hp["w2_sky"])

        if spec.has_beta:
            hbet = _sin(
                _dot(feats, hp["w_b0_f"]) + _dot(aux, hp["w_b0_aux"])
                + bias("b0")
            ).astype(dt)
            out = out + _dot(hbet, hp["w2_beta"])

        if spec.has_semantic:
            a_s = _dot(feats, hp["w_s0_f"]) + bias("s0")
            if spec.use_tj_for_s:
                a_s = a_s + _dot(aux, hp["w_s0_aux"])
            hs = _sin(a_s).astype(dt)
            out = out + _dot(hs, hp["w2_sem"])

    return out + hp["b_small"][0:1, :]


def _fwd_kernel(spec: FieldSpec, keys, emit_shared: bool, emit_acts: bool,
                x_ref, aux_ref, tw0, twmid, twskip, tb, *refs):
    head_refs = refs[: len(keys)]
    out_ref = refs[len(keys)]
    tspec = spec.trunk
    dt = x_ref.dtype
    _sin = lambda _v: _sin_f32(_v, spec.trunk.sin_mode)
    x = x_ref[:]

    a0 = _dot(x, tw0[:]) + tb[0:1, :].astype(jnp.float32)
    if emit_acts:  # trunk bwd="stored": pre-activations as residuals
        refs[len(keys) + 2][0, :, :] = a0.astype(dt)
    h = _sin(tspec.w0 * a0).astype(dt)
    for i in range(1, tspec.layers):
        a = _dot(h, twmid[i - 1])
        if i in tspec.skips:
            a = a + _dot(x, twskip[tspec.skips.index(i)])
        a = a + tb[i : i + 1, :].astype(jnp.float32)
        if emit_acts:
            refs[len(keys) + 2][i, :, :] = a.astype(dt)
        h = _sin(a).astype(dt)
    if emit_shared:  # backward residual; skipped on the eval path
        refs[len(keys) + 1][:] = h

    hp = {k: r[:] for k, r in zip(keys, head_refs)}
    out_ref[:] = _heads_forward(spec, h, aux_ref[:], hp).astype(jnp.float32)


FWD_TILE = 512
BWD_TILE = 256


def _whole(arr):
    shape = arr.shape
    return pl.BlockSpec(
        shape, lambda i, _s=shape: tuple(0 for _ in _s),
        memory_space=pltpu.VMEM,
    )


def _row_spec(tile, width):
    return pl.BlockSpec((tile, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_field(spec: FieldSpec, interpret: bool, x, aux, packed_trunk,
                packed_heads):
    """(N, c_in) points + (N, 128) aux -> (N, 128) raw packed head outputs.

    Differentiable in x, aux and both packed-weight pytrees (custom VJP
    backed by the heads + trunk backward kernels). When NOT being
    differentiated (eval/render), the kernel skips emitting the (N, F)
    ``shared`` backward residual.
    """
    out, _, _ = _fwd_call(spec, interpret, x, aux, packed_trunk,
                          packed_heads, emit_shared=False)
    return out


def _fwd_call(spec, interpret, x, aux, packed_trunk, packed_heads,
              emit_shared: bool):
    tspec = spec.trunk
    F, L = tspec.feat, tspec.layers
    xp, n = _pad_rows(_pad_lanes(x), FWD_TILE)
    auxp, _ = _pad_rows(aux, FWD_TILE)
    n_pad = xp.shape[0]

    # trunk bwd="stored" residuals ride along only when differentiating
    emit_acts = emit_shared and tspec.bwd == "stored"
    keys = spec.head_keys()
    head_arrays = [packed_heads[k] for k in keys]
    kern = functools.partial(_fwd_kernel, spec, keys, emit_shared, emit_acts)

    out_specs = [_row_spec(FWD_TILE, LANE)]
    out_shape = [jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32)]
    if emit_shared:
        out_specs.append(_row_spec(FWD_TILE, F))
        out_shape.append(jax.ShapeDtypeStruct((n_pad, F), x.dtype))
    if emit_acts:
        out_specs.append(pl.BlockSpec((L, FWD_TILE, F), lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((L, n_pad, F), x.dtype))

    outs = pl.pallas_call(
        kern,
        grid=(n_pad // FWD_TILE,),
        in_specs=[
            _row_spec(FWD_TILE, LANE),
            _row_spec(FWD_TILE, LANE),
            _whole(packed_trunk["w0"]),
            _whole(packed_trunk["w_mid"]),
            _whole(packed_trunk["w_skip"]),
            _whole(packed_trunk["b"]),
        ] + [_whole(a) for a in head_arrays],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(xp, auxp, packed_trunk["w0"], packed_trunk["w_mid"],
      packed_trunk["w_skip"], packed_trunk["b"], *head_arrays)

    shared = outs[1][:n] if emit_shared else None
    acts = outs[2] if emit_acts else None
    return outs[0][:n], shared, acts


def _fused_field_fwd(spec, interpret, x, aux, packed_trunk, packed_heads):
    out, shared, acts = _fwd_call(spec, interpret, x, aux, packed_trunk,
                                  packed_heads, emit_shared=True)
    return out, (x, aux, packed_trunk, packed_heads, shared, acts)


# -----------------------------------------------------------------------
# backward
# -----------------------------------------------------------------------


def _heads_bwd_kernel(spec: FieldSpec, keys, shared_ref, aux_ref, g_ref,
                      *refs):
    """Recompute head hiddens from shared/aux, reverse the chains, and
    accumulate head weight grads in the constant-index output blocks."""
    n_in = len(keys)
    head_refs = refs[:n_in]
    gshared_ref, gaux_ref = refs[n_in], refs[n_in + 1]
    gw = {k: r for k, r in zip(keys, refs[n_in + 2 :])}

    dt = shared_ref.dtype
    _sin = lambda _v: _sin_f32(_v, spec.trunk.sin_mode)
    _cos = lambda _v: _cos_f32(_v, spec.trunk.sin_mode)
    hp = {k: r[:] for k, r in zip(keys, head_refs)}
    bias_idx = spec.hidden_bias_index()
    b_heads = hp["b_heads"]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in refs[n_in + 2 :]:
            r[:] = jnp.zeros_like(r)

    def bias(name):
        i = bias_idx[name]
        return b_heads[i : i + 1, :].astype(jnp.float32)

    shared = shared_ref[:]
    aux = aux_ref[:]
    g_out = g_ref[:]  # (T, LANE) f32
    g_out_dt = g_out.astype(dt)

    # ---- recompute forward hiddens -----------------------------------------
    a_feats = _dot(shared, hp["w_feats"]) + hp["b_feats"][0:1, :]
    feats = a_feats.astype(dt)

    a_sv1 = (
        _dot(feats, hp["w_sv0_f"]) + _dot(aux, hp["w_sv0_aux"]) + bias("sv0")
    )
    sv1 = _sin(a_sv1).astype(dt)
    a_sv2 = _dot(sv1, hp["w_sv1"]) + bias("sv1")
    sv2 = _sin(a_sv2).astype(dt)
    a_sv3 = _dot(sv2, hp["w_sv2"]) + bias("sv2")
    sv3 = _sin(a_sv3).astype(dt)

    if spec.heads_on:
        a_hr = _dot(feats, hp["w_rgb0"]) + bias("rgb0")
        hr = _sin(a_hr).astype(dt)

        a_sky = _dot(aux, hp["w_sky0_aux"]) + bias("sky0")
        hsky = jnp.maximum(a_sky, 0.0).astype(dt)

        if spec.has_beta:
            a_hb = (
                _dot(feats, hp["w_b0_f"]) + _dot(aux, hp["w_b0_aux"])
                + bias("b0")
            )
            hbet = _sin(a_hb).astype(dt)
        if spec.has_semantic:
            a_hs = _dot(feats, hp["w_s0_f"]) + bias("s0")
            if spec.use_tj_for_s:
                a_hs = a_hs + _dot(aux, hp["w_s0_aux"])
            hs = _sin(a_hs).astype(dt)

    # ---- reverse sweep ------------------------------------------------------
    gb_rows: list = []

    g_shared = _dot_a_bt(g_out_dt, hp["w2_shared"])
    gw["w2_shared"][:] += _dot_at_b(shared, g_out_dt)

    g_feats = None
    if spec.heads_on:
        # rgb
        gw["w2_rgb"][:] += _dot_at_b(hr, g_out_dt)
        ga_hr = (
            _dot_a_bt(g_out_dt, hp["w2_rgb"]) * _cos(a_hr)
        ).astype(dt)
        gw["w_rgb0"][:] += _dot_at_b(feats, ga_hr)
        g_feats = _dot_a_bt(ga_hr, hp["w_rgb0"])
        gb_rows.append(("rgb0", ga_hr))

    # sun chain
    gw["w2_sv"][:] += _dot_at_b(sv3, g_out_dt)
    ga3 = (_dot_a_bt(g_out_dt, hp["w2_sv"]) * _cos(a_sv3)).astype(dt)
    gw["w_sv2"][:] += _dot_at_b(sv2, ga3)
    ga2 = (_dot_a_bt(ga3, hp["w_sv2"]) * _cos(a_sv2)).astype(dt)
    gw["w_sv1"][:] += _dot_at_b(sv1, ga2)
    ga1 = (_dot_a_bt(ga2, hp["w_sv1"]) * _cos(a_sv1)).astype(dt)
    gw["w_sv0_f"][:] += _dot_at_b(feats, ga1)
    gw["w_sv0_aux"][:] += _dot_at_b(aux, ga1)
    g_sv_feats = _dot_a_bt(ga1, hp["w_sv0_f"])
    g_feats = g_sv_feats if g_feats is None else g_feats + g_sv_feats
    g_aux = _dot_a_bt(ga1, hp["w_sv0_aux"])
    gb_rows += [("sv2", ga3), ("sv1", ga2), ("sv0", ga1)]

    if spec.heads_on:
        # sky (relu)
        gw["w2_sky"][:] += _dot_at_b(hsky, g_out_dt)
        g_hsky = _dot_a_bt(g_out_dt, hp["w2_sky"])
        ga_sky = jnp.where(a_sky > 0.0, g_hsky, 0.0).astype(dt)
        gw["w_sky0_aux"][:] += _dot_at_b(aux, ga_sky)
        g_aux = g_aux + _dot_a_bt(ga_sky, hp["w_sky0_aux"])
        gb_rows.append(("sky0", ga_sky))

        if spec.has_beta:
            gw["w2_beta"][:] += _dot_at_b(hbet, g_out_dt)
            ga_hb = (
                _dot_a_bt(g_out_dt, hp["w2_beta"]) * _cos(a_hb)
            ).astype(dt)
            gw["w_b0_f"][:] += _dot_at_b(feats, ga_hb)
            gw["w_b0_aux"][:] += _dot_at_b(aux, ga_hb)
            g_feats = g_feats + _dot_a_bt(ga_hb, hp["w_b0_f"])
            g_aux = g_aux + _dot_a_bt(ga_hb, hp["w_b0_aux"])
            gb_rows.append(("b0", ga_hb))

        if spec.has_semantic:
            gw["w2_sem"][:] += _dot_at_b(hs, g_out_dt)
            ga_hs = (
                _dot_a_bt(g_out_dt, hp["w2_sem"]) * _cos(a_hs)
            ).astype(dt)
            gw["w_s0_f"][:] += _dot_at_b(feats, ga_hs)
            g_feats = g_feats + _dot_a_bt(ga_hs, hp["w_s0_f"])
            if spec.use_tj_for_s:
                gw["w_s0_aux"][:] += _dot_at_b(aux, ga_hs)
                g_aux = g_aux + _dot_a_bt(ga_hs, hp["w_s0_aux"])
            gb_rows.append(("s0", ga_hs))

    # feats = shared @ w_feats + b (linear)
    g_feats_dt = g_feats.astype(dt)
    gw["w_feats"][:] += _dot_at_b(shared, g_feats_dt)
    g_shared = g_shared + _dot_a_bt(g_feats_dt, hp["w_feats"])
    gw["b_feats"][:] += jnp.sum(
        g_feats.astype(jnp.float32), axis=0, keepdims=True
    )

    for name, ga in gb_rows:
        i = bias_idx[name]
        gw["b_heads"][i : i + 1, :] += jnp.sum(
            ga.astype(jnp.float32), axis=0, keepdims=True
        )
    gw["b_small"][:] += jnp.sum(g_out, axis=0, keepdims=True)

    gshared_ref[:] = g_shared.astype(dt)
    gaux_ref[:] = g_aux.astype(dt)


def _fused_field_bwd(spec, interpret, res, g):
    x, aux, packed_trunk, packed_heads, shared, acts = res
    tspec = spec.trunk
    F = tspec.feat
    tile = BWD_TILE

    keys = spec.head_keys()
    head_arrays = [packed_heads[k] for k in keys]

    sp, n = _pad_rows(shared, tile)
    auxp, _ = _pad_rows(aux, tile)
    gp, _ = _pad_rows(g.astype(jnp.float32), tile)
    n_pad = sp.shape[0]

    kern = functools.partial(_heads_bwd_kernel, spec, keys)
    outs = pl.pallas_call(
        kern,
        grid=(n_pad // tile,),
        in_specs=[
            _row_spec(tile, F),
            _row_spec(tile, LANE),
            _row_spec(tile, LANE),
        ] + [_whole(a) for a in head_arrays],
        out_specs=[
            _row_spec(tile, F),
            _row_spec(tile, LANE),
        ] + [_whole(a) for a in head_arrays],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, F), shared.dtype),
            jax.ShapeDtypeStruct((n_pad, LANE), shared.dtype),
        ] + [
            jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in head_arrays
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(sp, auxp, gp, *head_arrays)

    g_shared, g_aux = outs[0][:n], outs[1][:n]
    g_heads = {
        k: gv.astype(packed_heads[k].dtype)
        for k, gv in zip(keys, outs[2:])
    }

    gx, g_trunk = _fused_trunk_bwd(tspec, interpret,
                                   (x, packed_trunk, acts), g_shared)
    return gx, g_aux.astype(aux.dtype), g_trunk, g_heads


fused_field.defvjp(_fused_field_fwd, _fused_field_bwd)
