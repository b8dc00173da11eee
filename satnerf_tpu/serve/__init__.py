"""Model serving: persistent compiled renderer + a small HTTP endpoint.

Beyond-reference production feature: the reference renders novel views only
through offline CLIs (ref: eval/render_view-equivalent sweeps); this package
keeps a trained model resident on the device with its render executable
compiled once, and serves view requests (relighting via sun angles,
re-dating via the transient embedding) at interactive latency.
"""

from satnerf_tpu.serve.service import RenderService  # noqa: F401
from satnerf_tpu.serve.http_server import serve  # noqa: F401
