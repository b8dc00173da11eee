"""Train the flagship RS-Semantic model on a generated synthetic scene.

No DFC2019 download needed: `satnerf_tpu.datasets.synthetic` writes a full
root.json scene layout (multi-date RGB GeoTIFFs with RPC metadata, CLS
semantic labels, bundle-adjustment tie points) that exercises the whole
pipeline. Runs anywhere JAX runs; a few minutes on CPU, seconds on a TPU.

    python examples/01_train_synthetic.py
"""

from _common import example_workspace, get_or_train_run


def main():
    run_dp = get_or_train_run()
    print(f"\ntrained run: {run_dp}")
    print(f"workspace:   {example_workspace()}")
    print("next: python examples/02_eval_battery.py")


if __name__ == "__main__":
    main()
