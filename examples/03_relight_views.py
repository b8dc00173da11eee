"""Novel-view synthesis with relighting and re-dating.

Loads the example run into a persistent RenderService (parameters stay
device-resident; the chunked render program compiles once) and renders the
same viewpoint at noon and dusk plus a different transient timestamp —
the paper's shadow/transient sweeps as three PNG files.

    python examples/03_relight_views.py
"""

import os

import numpy as np

from _common import example_workspace, get_or_train_run


def _save(fp, rgb01):
    from PIL import Image

    Image.fromarray((np.clip(rgb01, 0, 1) * 255).astype(np.uint8)).save(fp)
    print(" wrote", fp)


def main():
    run_dp = get_or_train_run()
    from satnerf_tpu.serve import RenderService

    svc = RenderService(run_dp, chunk=4096)
    view = svc.view_names()[0]
    out = os.path.join(example_workspace(), "relight")
    os.makedirs(out, exist_ok=True)

    noon = svc.render(view, sun_elevation=85.0)
    dusk = svc.render(view, sun_elevation=10.0, sun_azimuth=75.0)
    redate = svc.render(view, ts=1)

    _save(os.path.join(out, f"{view}_noon.png"), noon["rgb"])
    _save(os.path.join(out, f"{view}_dusk.png"), dusk["rgb"])
    _save(os.path.join(out, f"{view}_ts1.png"), redate["rgb"])
    print("stats:", svc.stats())


if __name__ == "__main__":
    main()
