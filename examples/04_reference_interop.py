"""Round-trip interop with the PyTorch reference implementation.

Exports the example run's trained parameters to a reference-compatible
Lightning checkpoint (loadable by wagnva/semantic-nerf-for-satellite-data
via its own load_ckpoint machinery), then imports it back and verifies the
round trip is exact. The same APIs import real reference checkpoints —
see docs/migration.md for the full migration guide.

    python examples/04_reference_interop.py
"""

import os

import numpy as np

from _common import example_workspace, get_or_train_run


def main():
    run_dp = get_or_train_run()
    out_fp = os.path.join(example_workspace(), "exported_reference.ckpt")

    import jax

    from satnerf_tpu.eval.loader import load_run
    from satnerf_tpu.models.import_torch import (
        params_from_lightning_ckpt,
        save_lightning_ckpt,
    )

    pipeline, params, rcfg, step = load_run(run_dp, load_datasets=False)
    save_lightning_ckpt(params, out_fp, global_step=step)
    print(f"exported reference-format checkpoint: {out_fp}")

    reimported = params_from_lightning_ckpt(out_fp, rcfg.field)
    missing = set(params) - set(reimported)
    assert not missing, f"param groups not covered by the export: {missing}"
    a_leaves = jax.tree_util.tree_leaves({k: params[k] for k in reimported})
    b_leaves = jax.tree_util.tree_leaves(reimported)
    assert len(a_leaves) == len(b_leaves) and a_leaves
    for a, b in zip(a_leaves, b_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print(f"round trip exact: {len(b_leaves)} parameter tensors identical")


if __name__ == "__main__":
    main()
