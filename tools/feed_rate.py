"""Standalone host->device feed-rate measurement for the training loop.

The <15-min v4-8 north star (BASELINE.md) needs ~8 x 43k = 344k rays/s of
effective feed. This tool measures what the host side of the Trainer's
feeding design actually costs per step, isolated from the train compute:

  1. EpochSampler.next_batch(): the per-step host work (permutation slice;
     a fresh np permutation per epoch, amortised),
  2. device_put of the index vector(s) with the data-mesh sharding -- the
     ONLY per-step host->device transfer in the design (the ray store
     lives in HBM; the gather runs inside the jitted step, train/data.py).

Because only int32 indices cross the host boundary (4 bytes/ray vs ~60
bytes/ray of payload a torch-style loader would ship), the feed rate is
orders of magnitude above the target by construction; this records the
measured number (VERDICT r2 item 7).

Usage: JAX_PLATFORMS=cpu python tools/feed_rate.py [--rays N] [--batch B]
           [--devices D] [--spd K] [--steps S]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=27_648_000,
                    help="combined ray-store size (default: ~full-scene)")
    ap.add_argument("--batch", type=int, default=65536,
                    help="global batch (default: v4-8 -- 8 x 8192)")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--spd", type=int, default=4,
                    help="steps_per_dispatch (indices stacked per dispatch)")
    ap.add_argument("--steps", type=int, default=2000)
    args = ap.parse_args(argv)

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from satnerf_tpu.parallel.mesh import batch_sharding, make_mesh
    from satnerf_tpu.train.data import EpochSampler

    mesh = make_mesh(args.devices)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = (
        batch_sharding(mesh)
        if args.spd == 1
        else NamedSharding(mesh, P(None, "data"))
    )

    sampler = EpochSampler(args.rays, args.batch, seed=0)

    # warm the first epoch permutation outside the timed loop, like the
    # trainer's first step; per-epoch re-permutes ARE timed below
    sampler.next_batch()

    def draw():
        if args.spd == 1:
            return sampler.next_batch()
        return np.stack([sampler.next_batch() for _ in range(args.spd)])

    # timed loop: host sampling + sharded device_put, readback-forced.
    # Sync on a rolling window instead of retaining every handle: keeping
    # all `steps` arrays live until one final block holds ~2 GB at the
    # defaults and distorts the measurement with allocator pressure, while
    # a 64-dispatch window still keeps the device queue deep enough to
    # measure pipelined feed rate rather than per-put latency.
    window = 64
    t0 = time.time()
    puts = []
    for _ in range(args.steps):
        idx = draw()
        puts.append(jax.device_put(idx, sh))
        if len(puts) >= window:
            jax.block_until_ready(puts)
            puts.clear()
    jax.block_until_ready(puts)
    dt = time.time() - t0

    rays = args.steps * args.spd * args.batch
    rate = rays / dt
    print(
        f"feed: {args.steps} dispatches x {args.spd} steps x "
        f"{args.batch} rays in {dt:.3f}s"
    )
    print(
        f"FEED_RATE rays_per_s={rate:.0f} target=344000 "
        f"margin_x={rate / 344000:.1f} devices={args.devices} "
        f"store_rays={args.rays}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
