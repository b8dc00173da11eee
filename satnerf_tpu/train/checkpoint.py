"""Checkpointing: orbax save/restore of the full TrainState.

Policy mirrors the reference (ref: framework/pipelines.py:260-293 +
framework/util/load_ckpoint.py:12-129): track the best ``train/mae``
(minimum), keep ``last`` always, optionally keep every-n-epochs snapshots.
A checkpoint carries {params, opt_state, step} so a resumed run continues the
optimizer trajectory exactly.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from satnerf_tpu.logger import logger
from satnerf_tpu.train.state import TrainState


def packed_device_get(tree):
    """Pull a device pytree to host with ONE transfer per dtype group.

    ``jax.device_get`` of a train state issues one transfer per leaf
    (~50-150 of them); over the remote tunnel each pays the round-trip
    latency, which made a 60 MB checkpoint save cost ~15 min at the round-4
    dress rehearsal (measured; the host-side orbax write is ~0.2 s). Packing
    all leaves of a dtype into one on-device concatenation turns the pull
    into <=3 bulk transfers, leaving only the wire bandwidth.

    Host-resident leaves pass through untouched.
    """
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = [None] * len(leaves)
    groups: dict = {}
    for i, leaf in enumerate(leaves):
        if not isinstance(leaf, jax.Array):
            out[i] = np.asarray(leaf)
            continue
        groups.setdefault(jnp.result_type(leaf).name, []).append(i)
    for _, idxs in groups.items():
        if len(idxs) == 1:
            out[idxs[0]] = np.asarray(jax.device_get(leaves[idxs[0]]))
            continue
        packed = jnp.concatenate([jnp.ravel(leaves[i]) for i in idxs])
        flat = np.asarray(jax.device_get(packed))  # one bulk transfer
        offset = 0
        for i in idxs:
            n = int(np.prod(leaves[i].shape)) if leaves[i].shape else 1
            out[i] = flat[offset:offset + n].reshape(leaves[i].shape)
            offset += n
    return jax.tree_util.tree_unflatten(treedef, out)


class CheckpointManager:
    def __init__(self, run_dp: str, save_every_n_epochs: int = -1) -> None:
        self.ckpt_dp = os.path.abspath(os.path.join(run_dp, "ckpoints"))
        os.makedirs(self.ckpt_dp, exist_ok=True)
        self.save_every_n_epochs = save_every_n_epochs
        self.best_mae = float("inf")
        self._ckptr = ocp.PyTreeCheckpointer()

    # -- save ----------------------------------------------------------------
    def _save(self, name: str, state: TrainState,
              params_only: bool = False) -> None:
        # pod runs: orbax's save is a COLLECTIVE in multi-process mode (it
        # barriers internally and writes from the primary host only), so
        # every process must call it, with identical decisions — gating it
        # to process 0 deadlocks process 0 in orbax's barrier. Decision
        # symmetry for best-mae is provided by the validate()-side broadcast
        # (train/loop.py).
        import time

        path = os.path.join(self.ckpt_dp, name)
        payload = {"params": state.params, "step": state.step}
        if not params_only:
            payload["opt_state"] = state.opt_state
        t0 = time.monotonic()
        payload = packed_device_get(payload)
        t_pull = time.monotonic() - t0
        payload["step"] = np.asarray(payload["step"])
        self._ckptr.save(path, payload, force=True)
        mb = sum(
            leaf.nbytes for leaf in jax.tree_util.tree_leaves(payload)
        ) / 1e6
        logger.info(
            "Checkpoint",
            f"saved {name} ({mb:.1f} MB"
            + (", params-only" if params_only else "")
            + f"; device pull {t_pull:.1f}s, total "
            f"{time.monotonic() - t0:.1f}s)",
        )

    def save_last(self, state: TrainState) -> None:
        self._save("last", state)

    def maybe_save_best(self, state: TrainState, train_mae: float) -> bool:
        """Monitor train/mae (min), like the reference's best-checkpoint
        callback (ref: pipelines.py:268-275).

        The best snapshot exists for EVAL consumers (eval/loader.py restores
        raw and reads params only), so it saves params-only — a third of the
        full-state bytes through the tunnel's slow direction, which matters
        because best-saves fire on every improvement. Resuming continues
        from ``last`` (full optimizer state), as the resume CLI does.
        """
        if train_mae < self.best_mae:
            self.best_mae = train_mae
            self._save("best", state, params_only=True)
            return True
        return False

    def maybe_save_epoch(self, state: TrainState, epoch: int) -> None:
        n = self.save_every_n_epochs
        if n > 0 and epoch % n == 0:
            self._save(f"epoch_{epoch}", state, params_only=True)

    # -- restore ---------------------------------------------------------------
    def restore(
        self,
        template_state: TrainState,
        name: str = "last",
        path: str | None = None,
    ) -> TrainState:
        """Restore by name from this run's ckpoints, or from an explicit
        checkpoint directory (the reference's ckpoint_fp warm-start flow,
        ref: framework/configs.py:33-34)."""
        path = path or os.path.join(self.ckpt_dp, name)
        raw = self._ckptr.restore(path)
        if "opt_state" not in raw:
            raise ValueError(
                f"{path} is a params-only (eval) checkpoint — it carries no "
                "optimizer state to resume from. Resume from the 'last' "
                "checkpoint, or warm-start (RunConfig.warm_start_fp) to "
                "continue from these weights with a fresh optimizer."
            )
        target = {
            "params": jax.device_get(template_state.params),
            "opt_state": jax.device_get(template_state.opt_state),
            "step": np.asarray(template_state.step),
        }
        restored = self._ckptr.restore(path, item=target)
        logger.info("Checkpoint", f"restored {name} at step {int(restored['step'])}")
        return TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )


def filter_params(params: dict, only_prefixes=None, ignore_prefixes=None) -> dict:
    """Select a sub-pytree by '/'-joined path prefixes.

    ref: framework/util/load_ckpoint.py:94-129 (extract_model_state_dict with
    ignore_prefixes/only_use_prefixes) — used for partial weight transfer,
    e.g. warm-starting a semantic run from a SatNeRF checkpoint while
    dropping the semantic head.
    """

    def keep(path: str) -> bool:
        if only_prefixes and not any(path.startswith(p) for p in only_prefixes):
            return False
        if ignore_prefixes and any(path.startswith(p) for p in ignore_prefixes):
            return False
        return True

    def rec(node, path: str):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                sub = rec(v, f"{path}/{k}" if path else str(k))
                if sub is not None:
                    out[k] = sub
            return out or None
        if isinstance(node, (list, tuple)):
            out_l = []
            for i, v in enumerate(node):
                sub = rec(v, f"{path}/{i}")
                out_l.append(sub)
            return out_l if any(s is not None for s in out_l) else None
        return node if keep(path) else None

    return rec(params, "") or {}


def merge_params(target: dict, source: dict) -> dict:
    """Overlay ``source`` leaves onto ``target`` (shapes must match where
    present) — the load side of partial weight transfer."""

    def rec(t, s):
        if s is None:
            return t
        if isinstance(t, dict):
            return {k: rec(t[k], s.get(k)) if isinstance(s, dict) else t[k]
                    for k in t}
        if isinstance(t, (list, tuple)):
            s_list = s if isinstance(s, (list, tuple)) else [None] * len(t)
            return [rec(tv, sv) for tv, sv in zip(t, s_list)]
        if hasattr(s, "shape") and hasattr(t, "shape"):
            assert s.shape == t.shape, f"shape mismatch {s.shape} vs {t.shape}"
        return s if s is not None else t

    return rec(target, source)


def load_warm_start_params(template_params: dict, ckpt_dp: str) -> dict:
    """Params-only warm start from a checkpoint directory.

    Loads the checkpoint's params and overlays them onto freshly initialised
    ``template_params`` (shapes must match where present; keys absent from
    the source keep their fresh init). If the target is hierarchical
    (``fine`` in the template) and the source checkpoint predates the fine
    field, the fine field is seeded from the source's trained coarse field —
    the natural coarse-to-fine refinement start.

    ref: framework/util/load_ckpoint.py:94-129 (extract_model_state_dict) —
    the reference's partial weight-transfer flow, here with the fine-field
    seeding the reference's scaffolded-but-dead hierarchical path never
    needed.
    """
    restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt_dp))
    src = restored.get("params", restored)
    src_step = restored.get("step")
    src = {k: v for k, v in src.items() if k in template_params}
    params = merge_params(dict(template_params), src)
    if "fine" in template_params and "fine" not in src and "field" in src:
        params["fine"] = jax.tree.map(np.array, params["field"])
        logger.info("Checkpoint", "warm start: fine field seeded from the "
                                  "source's trained coarse field")
    logger.info(
        "Checkpoint",
        f"warm start: params loaded from {ckpt_dp}"
        + (f" (source step {int(src_step)})" if src_step is not None else "")
        + f"; transferred top-level keys: {sorted(src)}",
    )
    return params


def find_ckpoint_fp(run_dp: str, epoch: int | None = None) -> str:
    """Locate a checkpoint dir by epoch or fall back to last
    (ref: framework/util/load_ckpoint.py:12-27)."""
    dp = os.path.join(run_dp, "ckpoints")
    if epoch is not None:
        cand = os.path.join(dp, f"epoch_{epoch}")
        if os.path.isdir(cand):
            return cand
        logger.warning(
            "Checkpoint",
            f"requested epoch {epoch} snapshot not found in {dp}; "
            "falling back to best/last",
        )
    for name in ("best", "last"):
        cand = os.path.join(dp, name)
        if os.path.isdir(cand):
            return cand
    raise FileNotFoundError(f"no checkpoint found in {dp}")
