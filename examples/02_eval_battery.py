"""Run the full evaluation battery on the example run.

One checkpoint restore, each image rendered exactly once, three consumers:
PSNR/SSIM + DSM altitude MAE (NCC-registered), point-cloud export, and
semantic metrics (accuracy / mIoU / confusion). Results land as
results.json files plus gathered text tables, matching the reference's
eval output conventions (ref: eval/eval.py, eval/gather_eval.py).

    python examples/02_eval_battery.py
"""

import os

from _common import example_workspace, get_or_train_run


def main():
    run_dp = get_or_train_run()
    out_dp = os.path.join(example_workspace(), "evalout")
    os.makedirs(out_dp, exist_ok=True)

    from satnerf_tpu.eval.eval import eval_all

    eval_all(run_dp, out_dp, splits=("test",))
    print(f"\nresults under: {out_dp}")
    gathered = os.path.join(out_dp, "gathered.txt")
    if os.path.isfile(gathered):
        print(open(gathered).read())


if __name__ == "__main__":
    main()
