"""Unified satellite-NeRF field: trunk MLP + heads as pure param pytrees.

One statically-configured field family replaces the reference's four model
classes (ref: baseline/models/nerf.py:93-212, snerf.py:101-243,
satnerf.py:101-255, semantic/models/rs_semantic.py:139-340). Architecture per
point:

    enc(xyz) -> 8x512 trunk (skip-concat at layer 4, SIREN w0=30 first layer)
      -> sigma head        Linear(feat,1)+softplus
      -> feats             Linear(feat,feat)                (no nonlinearity)
      -> rgb head          Linear(feat[+dir][+tau],fl)+nl+Linear(fl,3)+sigmoid
                           then rgb*(1+2*pad)-pad            (pad=0.001)
      -> sun-vis head      Linear(feat+3,fl)+nl+2x[Linear(fl,fl)+nl]
                           +Linear(fl,1)+sigmoid             (snerf+)
      -> sky head          Linear(3,fl)+relu+Linear(fl,3)+sigmoid
      -> beta head         Linear(feat+tau,fl)+nl+Linear(fl,1)+softplus
                           (satnerf+)
      -> beta_s head       same shape, optional               (rs_semantic)
      -> semantic head     Linear(feat[+tau],fl)+nl+Linear(fl,n_classes)
                           [+sigmoid]                         (rs_semantic)

with fl = feat (fc_use_full_features) or feat//2.

Weight init mirrors the reference's torch defaults so trained behaviour is
statistically identical: Linear U(+-1/sqrt(fan_in)) for weights and biases;
SIREN layers (trunk + sun-vis net) get U(+-sqrt(6/fan_in)) weights with the
first layer of each at U(+-1/fan_in) (ref: baseline/models/commons.py:5-18).

TPU-first shape discipline: the forward is a flat (N, C) batched matmul chain
— callers flatten (rays, samples) and concatenate solar-correction / depth
points into the SAME invocation so the MXU sees one large GEMM per layer
instead of the reference's chunked repeat_interleave loops
(ref: satnerf.py:36-70). Optional bfloat16 compute for the trunk.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from satnerf_tpu.core.encoding import encoded_size, positional_encoding

VARIANTS = ("nerf", "snerf", "satnerf", "rs_semantic")


@dataclass(frozen=True)
class FieldConfig:
    """Static field architecture flags (hashable: safe as a jit static arg)."""

    variant: str = "satnerf"
    layers: int = 8
    feat: int = 512
    skips: tuple = (4,)
    siren: bool = True
    # SIREN sine implementation: "poly" (fast_sin minimax polynomial,
    # ~2e-6 abs error, ~2x faster end-to-end on TPU), "poly5" (degree-5
    # kernel, ~1.5e-4 abs err — for bf16, which rounds coarser than that
    # anyway), "poly7f" (one-term reduction + degree-7 kernel, <=4e-5:
    # splits poly5's saving without its systematic bias), or "exact"
    # (XLA sin).
    sin_impl: str = "poly"
    # trunk execution: "xla" (layer-by-layer jnp ops) or "pallas" (fused
    # VMEM-resident kernel, ops/pallas/trunk.py; SIREN-only, feat % 128 == 0)
    trunk_impl: str = "xla"
    # pallas trunk backward: "recompute" (VMEM forward recompute, O(tile)
    # residuals — required when activations exceed HBM, >= 16384 rays) or
    # "stored" (forward writes pre-activations to HBM, VJP consumes them —
    # XLA-style, skips the L recompute GEMMs; see ops/pallas/trunk.py)
    trunk_bwd: str = "recompute"
    # Positional encoding usage differs per reference variant: NeRF uses
    # mapping=True + ReLU (ref: nerf.py:99-104 defaults), Shadow-NeRF and
    # SatNeRF feed RAW xyz into the SIREN trunk (mapping=False defaults,
    # ref: snerf.py:101-110, satnerf.py:101-110 + pipeline constructors),
    # RS-Semantic always encodes (ref: rs_semantic.py:160-168).
    mapping: bool = False
    mapping_pos_n_freq: int = 10
    mapping_dir_n_freq: int = 4
    fc_use_full_features: bool = False
    t_embedding_tau: int = 4
    rgb_padding: float = 0.001
    # rs_semantic options (ref: configs/pipelines/rs_semantic.toml:55-66)
    n_classes: int = 5
    semantic_sigmoid: bool = True
    use_tj_for_s: bool = False
    use_tj_instead_of_beta: bool = False
    use_separate_beta_for_s: bool = False
    use_separate_tj_for_semantic: bool = False

    def __post_init__(self):
        assert self.variant in VARIANTS, f"unknown variant {self.variant}"
        assert self.sin_impl in ("poly", "poly5", "poly7f", "exact"), self.sin_impl
        assert self.trunk_impl in ("xla", "pallas"), self.trunk_impl
        assert self.trunk_bwd in ("recompute", "stored"), self.trunk_bwd

    # -- capability flags --------------------------------------------------
    @property
    def has_sun(self) -> bool:
        return self.variant in ("snerf", "satnerf", "rs_semantic")

    @property
    def has_beta(self) -> bool:
        return self.variant in ("satnerf", "rs_semantic")

    @property
    def has_semantic(self) -> bool:
        return self.variant == "rs_semantic"

    @property
    def use_dir(self) -> bool:
        # only classic NeRF consumes view directions (input_sizes=[3,3],
        # ref: nerf.py:107; sat variants use input_sizes=[3,0])
        return self.variant == "nerf"

    @property
    def feat_last(self) -> int:
        return self.feat if self.fc_use_full_features else self.feat // 2

    @property
    def xyz_in(self) -> int:
        return encoded_size(self.mapping_pos_n_freq, 3) if self.mapping else 3

    @property
    def dir_in(self) -> int:
        if not self.use_dir:
            return 0
        return encoded_size(self.mapping_dir_n_freq, 3) if self.mapping else 3


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------


def _linear_init(key, fan_in: int, fan_out: int, w_bound: float | None = None):
    """torch.nn.Linear default: U(+-1/sqrt(fan_in)) for W and b; optional
    SIREN weight bound override (bias keeps the torch default)."""
    kw, kb = jax.random.split(key)
    default = 1.0 / np.sqrt(fan_in)
    wb = default if w_bound is None else w_bound
    return {
        "w": jax.random.uniform(
            kw, (fan_in, fan_out), jnp.float32, minval=-wb, maxval=wb
        ),
        "b": jax.random.uniform(
            kb, (fan_out,), jnp.float32, minval=-default, maxval=default
        ),
    }


def _siren_bound(fan_in: int, first: bool) -> float:
    # ref: commons.py:5-18 — sine_init sqrt(6/fan_in); first layer 1/fan_in
    return 1.0 / fan_in if first else float(np.sqrt(6.0 / fan_in))


def init_field_params(key: jax.Array, cfg: FieldConfig) -> dict:
    """Initialise all field parameters as a nested dict pytree."""
    keys = iter(jax.random.split(key, 64))
    p: dict = {}

    # trunk
    trunk = []
    for i in range(cfg.layers):
        if i == 0:
            fan_in = cfg.xyz_in
        elif i in cfg.skips:
            fan_in = cfg.feat + cfg.xyz_in
        else:
            fan_in = cfg.feat
        wb = _siren_bound(fan_in, first=(i == 0)) if cfg.siren else None
        trunk.append(_linear_init(next(keys), fan_in, cfg.feat, wb))
    p["trunk"] = trunk

    p["sigma"] = _linear_init(next(keys), cfg.feat, 1)
    p["feats"] = _linear_init(next(keys), cfg.feat, cfg.feat)

    rgb_in = cfg.feat + cfg.dir_in
    if cfg.has_semantic and cfg.use_tj_instead_of_beta:
        rgb_in += cfg.t_embedding_tau
    p["rgb"] = [
        _linear_init(next(keys), rgb_in, cfg.feat_last),
        _linear_init(next(keys), cfg.feat_last, 3),
    ]

    if cfg.has_sun:
        sun_layers = []
        fl = cfg.feat_last
        dims = [(cfg.feat + 3, fl), (fl, fl), (fl, fl), (fl, 1)]
        for i, (fi, fo) in enumerate(dims):
            wb = _siren_bound(fi, first=(i == 0)) if cfg.siren else None
            sun_layers.append(_linear_init(next(keys), fi, fo, wb))
        p["sun_v"] = sun_layers
        p["sky"] = [
            _linear_init(next(keys), 3, cfg.feat_last),
            _linear_init(next(keys), cfg.feat_last, 3),
        ]

    if cfg.has_beta:
        p["beta"] = [
            _linear_init(next(keys), cfg.feat + cfg.t_embedding_tau, cfg.feat_last),
            _linear_init(next(keys), cfg.feat_last, 1),
        ]

    if cfg.has_semantic:
        if cfg.use_separate_beta_for_s:
            p["beta_s"] = [
                _linear_init(
                    next(keys), cfg.feat + cfg.t_embedding_tau, cfg.feat_last
                ),
                _linear_init(next(keys), cfg.feat_last, 1),
            ]
        s_in = cfg.feat + (cfg.t_embedding_tau if cfg.use_tj_for_s else 0)
        p["semantic"] = [
            _linear_init(next(keys), s_in, cfg.feat_last),
            _linear_init(next(keys), cfg.feat_last, cfg.n_classes),
        ]

    return p


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _linear(layer, x, dtype=None):
    w, b = layer["w"], layer["b"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = x @ w
    # bias in the RESULT dtype, not x's: the f32 head layers (dtype=None)
    # take bf16 features against f32 weights, so y promotes to f32 — and
    # casting b to x's bf16 would needlessly quantise the head bias
    # (~0.4% rel) in outputs that are documented to stay f32
    return y + b.astype(y.dtype)


def _pallas_ok(cfg: FieldConfig) -> bool:
    return (
        cfg.trunk_impl == "pallas"
        and cfg.siren
        and cfg.sin_impl in ("poly", "poly5", "poly7f")
        and cfg.feat % 128 == 0
        and cfg.xyz_in <= 128
    )


def _use_pallas_field(cfg: FieldConfig) -> bool:
    """Full trunk+heads fusion (ops/pallas/field_fused.py)."""
    return (
        _pallas_ok(cfg)
        and cfg.has_sun  # nerf's view-dir rgb head is not in the kernel
        and cfg.feat_last % 128 == 0
        and not cfg.use_tj_instead_of_beta
        and not cfg.use_separate_beta_for_s
    )


def _use_pallas_trunk(cfg: FieldConfig) -> bool:
    """Trunk-only fusion (ops/pallas/trunk.py); heads stay in XLA."""
    return _pallas_ok(cfg)


def _act(cfg: FieldConfig, x, first: bool = False):
    if cfg.siren:
        # sin args are phase-sensitive: evaluate in f32 even when the GEMMs
        # run in bfloat16, then return to the compute dtype
        w0 = 30.0 if first else 1.0
        if cfg.sin_impl != "exact":
            # XLA's exact sin dominates the whole train step on TPU (VPU
            # range reduction); the ~2e-6-accurate polynomial is ~2x
            # end-to-end (see ops/fastmath.py and docs/performance.md)
            from satnerf_tpu.ops.fastmath import fast_sin, fast_sin5, fast_sin7f

            f = {"poly": fast_sin, "poly5": fast_sin5,
                 "poly7f": fast_sin7f}[cfg.sin_impl]
            return f(w0 * x.astype(jnp.float32)).astype(x.dtype)
        y = jnp.sin(w0 * x.astype(jnp.float32))
        return y.astype(x.dtype)
    return jax.nn.relu(x)


def field_forward(
    params: dict,
    cfg: FieldConfig,
    xyz,
    view_dir=None,
    sun_d=None,
    t_emb=None,
    t_s_emb=None,
    compute_dtype=None,
    n_full=None,
) -> dict:
    """Evaluate the field at a flat batch of points.

    Args:
        xyz: (N, 3) scene-normalised positions.
        view_dir: (N, 3) unit view directions (NeRF variant only).
        sun_d: (N, 3) unit sun directions (snerf+).
        t_emb: (N, tau) transient embedding rows (satnerf+).
        t_s_emb: (N, tau) separate semantic embedding (optional).
        compute_dtype: e.g. jnp.bfloat16 for the trunk/head GEMMs; sensitive
            nonlinearities (softplus/sigmoid/sin args) stay f32 by casting
            back at head outputs.
        n_full: if set, evaluate the rgb/sky/beta/beta_s/semantic heads only
            on the first n_full points; sigma and sun_v still cover all N.
            Used by the renderer's solar-correction pass, whose loss terms
            (ref: baseline/components/loss.py:13-29) read only
            transparency/weights (from sigma) and sun_v for the appended
            sun-ray points — the other heads there are dead compute.
    Returns:
        dict of per-point outputs (all f32): rgb (M,3), sigma (N,), plus
        sun_v (N,1), sky (M,3), beta (M,1), beta_s (M,1), semantic (M,C)
        depending on the variant flags, where M = n_full or N.
    """
    dt = compute_dtype
    enc_x = positional_encoding(xyz, cfg.mapping_pos_n_freq) if cfg.mapping else xyz
    if dt is not None:
        enc_x = enc_x.astype(dt)

    nf = n_full if (n_full is not None and n_full < xyz.shape[0]) else None

    def _m(x):
        """Restrict a per-point input/feature to the heads-on prefix."""
        return x if (x is None or nf is None) else x[:nf]

    if _use_pallas_field(cfg):
        # sc-aware: the kernel is built in two variants — full (all heads)
        # for the first n_full points, and a sigma+sun_v-only program for the
        # solar-correction half, mirroring the XLA path's head pruning
        return _fused_field_forward(
            params, cfg, enc_x, sun_d, t_emb, t_s_emb, dt, nf
        )

    if _use_pallas_trunk(cfg):
        from satnerf_tpu.ops.pallas.trunk import (
            TrunkSpec,
            fused_trunk,
            pack_trunk,
        )

        spec = TrunkSpec(
            layers=cfg.layers, feat=cfg.feat, skips=tuple(cfg.skips),
            c_in=cfg.xyz_in, sin_mode=cfg.sin_impl, bwd=cfg.trunk_bwd,
        )
        kdt = dt if dt is not None else jnp.float32
        packed = pack_trunk(params["trunk"], spec, kdt)
        interpret = jax.default_backend() != "tpu"
        shared = fused_trunk(spec, interpret, enc_x.astype(kdt), packed)
    else:
        h = enc_x
        for i, layer in enumerate(params["trunk"]):
            if i in cfg.skips:
                h = jnp.concatenate([enc_x, h], axis=-1)
            h = _linear(layer, h, dt)
            h = _act(cfg, h, first=(i == 0))
        shared = h

    sigma = jax.nn.softplus(_linear(params["sigma"], shared).astype(jnp.float32))
    feats = _linear(params["feats"], shared, dt)

    out = {"sigma": sigma[..., 0]}

    # rgb head
    feats_m, t_emb_m, t_s_emb_m = _m(feats), _m(t_emb), _m(t_s_emb)
    rgb_in = feats_m
    if cfg.use_dir:
        enc_d = (
            positional_encoding(_m(view_dir), cfg.mapping_dir_n_freq)
            if cfg.mapping
            else _m(view_dir)
        )
        rgb_in = jnp.concatenate([rgb_in, enc_d.astype(rgb_in.dtype)], axis=-1)
    if cfg.has_semantic and cfg.use_tj_instead_of_beta:
        rgb_in = jnp.concatenate([rgb_in, t_emb_m.astype(rgb_in.dtype)], axis=-1)
    hr = _act(cfg, _linear(params["rgb"][0], rgb_in, dt))
    rgb = jax.nn.sigmoid(_linear(params["rgb"][1], hr).astype(jnp.float32))
    out["rgb"] = rgb * (1.0 + 2.0 * cfg.rgb_padding) - cfg.rgb_padding

    if cfg.has_sun:
        # all sun-vis activations use w0=1 (ref: snerf.py sun_v_layers use
        # Siren() without the w0=30 first-layer boost)
        sv = jnp.concatenate([feats, sun_d.astype(feats.dtype)], axis=-1)
        for layer in params["sun_v"][:-1]:
            sv = _act(cfg, _linear(layer, sv, dt))
        out["sun_v"] = jax.nn.sigmoid(
            _linear(params["sun_v"][-1], sv).astype(jnp.float32)
        )
        sk = jax.nn.relu(
            _linear(params["sky"][0], _m(sun_d).astype(jnp.float32))
        )
        out["sky"] = jax.nn.sigmoid(_linear(params["sky"][1], sk).astype(jnp.float32))

    if cfg.has_beta:
        bi = jnp.concatenate([feats_m, t_emb_m.astype(feats_m.dtype)], axis=-1)
        hb = _act(cfg, _linear(params["beta"][0], bi, dt))
        out["beta"] = jax.nn.softplus(
            _linear(params["beta"][1], hb).astype(jnp.float32)
        )

    if cfg.has_semantic:
        if cfg.use_separate_beta_for_s:
            bsi = t_s_emb_m if cfg.use_separate_tj_for_semantic else t_emb_m
            bi = jnp.concatenate([feats_m, bsi.astype(feats_m.dtype)], axis=-1)
            hb = _act(cfg, _linear(params["beta_s"][0], bi, dt))
            out["beta_s"] = jax.nn.softplus(
                _linear(params["beta_s"][1], hb).astype(jnp.float32)
            )
        si = feats_m
        if cfg.use_tj_for_s:
            st = t_s_emb_m if cfg.use_separate_tj_for_semantic else t_emb_m
            si = jnp.concatenate([si, st.astype(si.dtype)], axis=-1)
        hs = _act(cfg, _linear(params["semantic"][0], si, dt))
        logits = _linear(params["semantic"][1], hs).astype(jnp.float32)
        if cfg.semantic_sigmoid:
            logits = jax.nn.sigmoid(logits)
        out["semantic"] = logits

    return out


def _fused_field_forward(params, cfg: FieldConfig, enc_x, sun_d, t_emb,
                         t_s_emb, dt, nf=None):
    """Full trunk+heads evaluation through the fused Pallas kernel
    (ops/pallas/field_fused.py) + the column-wise nonlinearity epilogue.
    Output dict is identical to the XLA path's.

    With ``nf`` set (renderer's solar-correction batch layout), the first
    ``nf`` points run the all-heads kernel and the remaining sc points run
    the reduced sigma+sun_v-only kernel variant (FieldSpec(heads_on=False))
    — the sc half's rgb/sky/beta/semantic compute is dead
    (ref: baseline/components/loss.py:13-29) and is skipped INSIDE the
    fused program, matching the XLA path's pruning."""
    from satnerf_tpu.ops.pallas.field_fused import (
        COL_BETA,
        COL_RGB,
        COL_SEM,
        COL_SIGMA,
        COL_SKY,
        COL_SUN,
        FieldSpec,
        fused_field,
        pack_aux,
        pack_heads,
    )
    from satnerf_tpu.ops.pallas.trunk import TrunkSpec, pack_trunk

    kdt = dt if dt is not None else jnp.float32
    tspec = TrunkSpec(
        layers=cfg.layers, feat=cfg.feat, skips=tuple(cfg.skips),
        c_in=cfg.xyz_in, sin_mode=cfg.sin_impl, bwd=cfg.trunk_bwd,
    )
    spec = FieldSpec(
        trunk=tspec, fl=cfg.feat_last, tau=cfg.t_embedding_tau,
        n_classes=cfg.n_classes, has_beta=cfg.has_beta,
        has_semantic=cfg.has_semantic, use_tj_for_s=cfg.use_tj_for_s,
        sep_t_s=cfg.use_separate_tj_for_semantic,
    )
    packed_trunk = pack_trunk(params["trunk"], tspec, kdt)
    packed_heads = pack_heads(params, spec, kdt)
    aux = pack_aux(spec, sun_d, t_emb, t_s_emb, kdt)
    interpret = jax.default_backend() != "tpu"
    x = enc_x.astype(kdt)

    if nf is None:
        raw = fused_field(spec, interpret, x, aux, packed_trunk, packed_heads)
        raw_h = raw
    else:
        from dataclasses import replace as _replace

        spec_sc = _replace(spec, heads_on=False)
        packed_sc = pack_heads(params, spec_sc, kdt)
        aux_sc = pack_aux(
            spec_sc,
            sun_d[nf:] if sun_d is not None else None,
            None, None, kdt,
        )
        raw_sc = fused_field(
            spec_sc, interpret, x[nf:], aux_sc, packed_trunk, packed_sc
        )
        if nf == 0:  # pure sigma+sun_v evaluation (chunked-scan sc tiles)
            raw = raw_sc
            raw_h = raw_sc[:0]
        else:
            raw_h = fused_field(
                spec, interpret, x[:nf], aux[:nf], packed_trunk, packed_heads
            )
            raw = jnp.concatenate([raw_h, raw_sc], axis=0)

    out = {"sigma": jax.nn.softplus(raw[:, COL_SIGMA])}
    rgb = jax.nn.sigmoid(raw_h[:, COL_RGB : COL_RGB + 3])
    out["rgb"] = rgb * (1.0 + 2.0 * cfg.rgb_padding) - cfg.rgb_padding
    out["sun_v"] = jax.nn.sigmoid(raw[:, COL_SUN : COL_SUN + 1])
    out["sky"] = jax.nn.sigmoid(raw_h[:, COL_SKY : COL_SKY + 3])
    if cfg.has_beta:
        out["beta"] = jax.nn.softplus(raw_h[:, COL_BETA : COL_BETA + 1])
    if cfg.has_semantic:
        logits = raw_h[:, COL_SEM : COL_SEM + cfg.n_classes]
        if cfg.semantic_sigmoid:
            logits = jax.nn.sigmoid(logits)
        out["semantic"] = logits
    return out
