"""Import reference PyTorch(-Lightning) checkpoints into satnerf_tpu params.

Migration path for users of the reference implementation: a Lightning .ckpt
(state_dict keys like ``model_coarse.fc_net.0.weight``,
``model_t.embedding_vocab...``, ref: framework/util/load_ckpoint.py:94-129
key scheme) converts into our param pytree, after which rendering/eval/
fine-tuning continue on TPU. Golden tests verify converted weights reproduce
the torch forward exactly.

Layer mapping (see models/field.py for the architecture):
    fc_net.{2i}           -> trunk[i]
    sigma_from_xyz.0      -> sigma
    feats_from_xyz        -> feats
    rgb_from_xyzdir.{0,2} -> rgb[0..1]
    sun_v_net.{0,2,4,6}   -> sun_v[0..3]
    sky_color.{0,2}       -> sky[0..1]
    beta_from_xyz.{0,2}   -> beta[0..1]
    semantic_beta_from_xyz.{0,2} -> beta_s[0..1]
    semantic_prediction.{0,2}    -> semantic[0..1]
    (torch Linear weights are (out, in) -> transposed to our (in, out))
"""

from __future__ import annotations

import numpy as np

from satnerf_tpu.models.field import FieldConfig

_HEAD_MAP = {
    "sigma_from_xyz.0": ("sigma", None),
    "feats_from_xyz": ("feats", None),
    "rgb_from_xyzdir.0": ("rgb", 0),
    "rgb_from_xyzdir.2": ("rgb", 1),
    "sun_v_net.0": ("sun_v", 0),
    "sun_v_net.2": ("sun_v", 1),
    "sun_v_net.4": ("sun_v", 2),
    "sun_v_net.6": ("sun_v", 3),
    "sky_color.0": ("sky", 0),
    "sky_color.2": ("sky", 1),
    "beta_from_xyz.0": ("beta", 0),
    "beta_from_xyz.2": ("beta", 1),
    "semantic_beta_from_xyz.0": ("beta_s", 0),
    "semantic_beta_from_xyz.2": ("beta_s", 1),
    "semantic_prediction.0": ("semantic", 0),
    "semantic_prediction.2": ("semantic", 1),
}


def _to_np(tensor) -> np.ndarray:
    if hasattr(tensor, "detach"):
        return tensor.detach().cpu().numpy()
    return np.asarray(tensor)


def field_params_from_torch_state(state_dict: dict, cfg: FieldConfig) -> dict:
    """Convert a single field module's state dict (keys relative to the
    module, e.g. ``fc_net.0.weight``) into our field param pytree."""
    params: dict = {"trunk": [None] * cfg.layers}
    heads: dict = {}

    for key, value in state_dict.items():
        if not (key.endswith(".weight") or key.endswith(".bias")):
            continue
        base = key.rsplit(".", 1)[0]
        kind = "w" if key.endswith(".weight") else "b"
        arr = _to_np(value).astype(np.float32)
        if kind == "w":
            arr = arr.T  # torch (out, in) -> ours (in, out)

        if base.startswith("fc_net."):
            idx = int(base.split(".")[1])
            assert idx % 2 == 0, f"unexpected activation params at {key}"
            layer = idx // 2
            entry = params["trunk"][layer] or {}
            entry[kind] = arr
            params["trunk"][layer] = entry
        elif base in _HEAD_MAP:
            name, sub = _HEAD_MAP[base]
            slot = heads.setdefault(name, {} if sub is None else {})
            if sub is None:
                slot[kind] = arr
            else:
                slot.setdefault(sub, {})[kind] = arr
        else:
            raise KeyError(f"unmapped reference parameter: {key}")

    for name, slot in heads.items():
        if isinstance(slot, dict) and all(isinstance(k, int) for k in slot):
            params[name] = [slot[i] for i in sorted(slot)]
        else:
            params[name] = slot

    assert all(layer is not None for layer in params["trunk"]), (
        "missing trunk layers in the checkpoint"
    )
    return params


def params_from_lightning_ckpt(
    ckpt_fp: str, cfg: FieldConfig, t_vocab: int | None = None
) -> dict:
    """Load a reference Lightning checkpoint file into our full param dict.

    Model prefixes follow the reference's ``model_<key>.`` scheme
    (ref: load_ckpoint.py:94-129): ``model_coarse`` -> field,
    ``model_fine`` -> fine, ``model_t`` / ``model_t_s`` -> embeddings.
    """
    import torch

    raw = torch.load(ckpt_fp, map_location="cpu", weights_only=True)
    state = raw.get("state_dict", raw)

    groups: dict[str, dict] = {}
    for key, value in state.items():
        if not key.startswith("model_"):
            continue
        model_key, rest = key[len("model_"):].split(".", 1)
        groups.setdefault(model_key, {})[rest] = value

    params: dict = {"field": field_params_from_torch_state(groups["coarse"], cfg)}
    if "fine" in groups:
        params["fine"] = field_params_from_torch_state(groups["fine"], cfg)
    for src, dst in (("t", "t"), ("t_s", "t_s")):
        if src in groups:
            table = _to_np(groups[src]["weight"]).astype(np.float32)
            if t_vocab is not None:
                assert table.shape[0] == t_vocab, (
                    f"t vocab mismatch: ckpt {table.shape[0]} vs cfg {t_vocab}"
                )
            params[dst] = table
    return params


# -- export (the reverse direction) -----------------------------------------

_INV_HEAD_MAP = {v: k for k, v in _HEAD_MAP.items()}


def torch_state_from_field_params(field: dict, prefix: str) -> dict:
    """One field param pytree -> reference state-dict entries under
    ``<prefix>.`` (exact inverse of ``field_params_from_torch_state``)."""
    import torch

    state: dict = {}

    def put(base: str, entry: dict) -> None:
        w = np.ascontiguousarray(np.asarray(entry["w"], np.float32).T)
        b = np.ascontiguousarray(np.asarray(entry["b"], np.float32))
        state[f"{prefix}.{base}.weight"] = torch.from_numpy(w)
        state[f"{prefix}.{base}.bias"] = torch.from_numpy(b)

    for i, layer in enumerate(field["trunk"]):
        put(f"fc_net.{2 * i}", layer)
    for name, value in field.items():
        if name == "trunk":
            continue
        if isinstance(value, (list, tuple)):
            for sub, entry in enumerate(value):
                put(_INV_HEAD_MAP[(name, sub)], entry)
        else:
            put(_INV_HEAD_MAP[(name, None)], value)
    return state


def save_lightning_ckpt(
    params: dict, ckpt_fp: str, epoch: int = 0, global_step: int = 0
) -> str:
    """Write our param dict as a reference-compatible Lightning checkpoint.

    The inverse migration path: models trained (or fine-tuned) here load
    straight into the reference's torch pipelines via its own
    ``load_ckpoint`` machinery (ref: framework/util/load_ckpoint.py:60-129
    ``model_<key>.<param>`` scheme). Round-trip is exact
    (tests/test_import_torch.py).
    """
    import torch

    state: dict = {}
    for model_key, field_key in (("model_coarse", "field"), ("model_fine", "fine")):
        if field_key in params:
            state.update(
                torch_state_from_field_params(params[field_key], model_key)
            )
    for src in ("t", "t_s"):
        if src in params:
            state[f"model_{src}.weight"] = torch.from_numpy(
                np.ascontiguousarray(np.asarray(params[src], np.float32))
            )
    torch.save(
        {"state_dict": state, "epoch": epoch, "global_step": global_step},
        ckpt_fp,
    )
    return ckpt_fp
