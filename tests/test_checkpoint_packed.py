"""Checkpoint save-path tests (round-5): the packed device pull and the
params-only best snapshot.

The round-4 dress rehearsal measured ~15 min to save a 60 MB checkpoint:
the host-side orbax write is ~0.2 s, so the cost was entirely the
leaf-by-leaf device->host pull over the remote tunnel. packed_device_get
collapses the pull into one bulk transfer per dtype group; best/epoch
snapshots additionally drop the optimizer state (eval consumers read params
only; resume continues from 'last').
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from satnerf_tpu.train.checkpoint import (
    CheckpointManager,
    load_warm_start_params,
    packed_device_get,
)
from satnerf_tpu.train.state import TrainState


def _tree():
    return {
        "a": jnp.arange(12, dtype=jnp.float32).reshape(3, 4) / 7.0,
        "nested": {
            "w": jnp.ones((5, 2), jnp.float32) * 0.3,
            "bf": jnp.arange(6, dtype=jnp.bfloat16).reshape(2, 3),
            "i": jnp.asarray([3, 4], jnp.int32),
        },
        "scalar": jnp.asarray(7, jnp.int32),
        "host": np.arange(4, dtype=np.float64),  # host leaf passes through
    }


def test_packed_matches_device_get():
    tree = _tree()
    ref = jax.device_get(tree)
    got = packed_device_get(tree)
    flat_ref, def_ref = jax.tree_util.tree_flatten(ref)
    flat_got, def_got = jax.tree_util.tree_flatten(got)
    assert def_ref == def_got
    for r, g in zip(flat_ref, flat_got):
        assert isinstance(g, np.ndarray) or np.isscalar(g)
        assert np.asarray(r).dtype == np.asarray(g).dtype
        assert np.asarray(r).shape == np.asarray(g).shape
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def _state():
    params = {"field": {"w": jnp.ones((4, 4)) * 0.5, "b": jnp.zeros(4)},
              "t": jnp.ones((3, 2))}
    opt = optax.adam(1e-3)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.asarray(17, jnp.int32)), opt


def test_best_is_params_only_and_eval_loadable(tmp_path):
    state, _ = _state()
    mgr = CheckpointManager(str(tmp_path))
    assert mgr.maybe_save_best(state, train_mae=1.0)
    import orbax.checkpoint as ocp

    raw = ocp.PyTreeCheckpointer().restore(str(tmp_path / "ckpoints" / "best"))
    assert "opt_state" not in raw  # a third of the bytes over the tunnel
    assert int(raw["step"]) == 17
    np.testing.assert_allclose(raw["params"]["field"]["w"],
                               np.ones((4, 4)) * 0.5)
    # not an improvement -> no save
    assert not mgr.maybe_save_best(state, train_mae=2.0)


def test_resume_from_params_only_best_raises_clearly(tmp_path):
    state, _ = _state()
    mgr = CheckpointManager(str(tmp_path))
    mgr.maybe_save_best(state, train_mae=1.0)
    with pytest.raises(ValueError, match="params-only"):
        mgr.restore(state, path=str(tmp_path / "ckpoints" / "best"))


def test_last_roundtrips_full_state(tmp_path):
    state, _ = _state()
    mgr = CheckpointManager(str(tmp_path))
    mgr.save_last(state)
    fresh, _ = _state()
    fresh = fresh.replace(step=jnp.asarray(0, jnp.int32))
    restored = mgr.restore(fresh)
    assert int(restored.step) == 17
    np.testing.assert_allclose(
        np.asarray(restored.params["field"]["w"]), np.ones((4, 4)) * 0.5
    )
    # optimizer state survives (mu exists and matches shape)
    ref_leaves = jax.tree_util.tree_leaves(state.opt_state)
    got_leaves = jax.tree_util.tree_leaves(restored.opt_state)
    assert len(ref_leaves) == len(got_leaves)


def test_warm_start_accepts_params_only_best(tmp_path):
    state, _ = _state()
    mgr = CheckpointManager(str(tmp_path))
    mgr.maybe_save_best(state, train_mae=1.0)
    template = {"field": {"w": jnp.zeros((4, 4)), "b": jnp.ones(4)},
                "t": jnp.zeros((3, 2)), "fine": {"w": jnp.zeros((4, 4)),
                                                 "b": jnp.zeros(4)}}
    out = load_warm_start_params(
        jax.device_get(template), str(tmp_path / "ckpoints" / "best")
    )
    np.testing.assert_allclose(out["field"]["w"], np.ones((4, 4)) * 0.5)
    # fine seeded from the trained coarse field
    np.testing.assert_allclose(out["fine"]["w"], np.ones((4, 4)) * 0.5)
