"""Core NeRF math: ray layout/construction, encoding, sampling, compositing,
scene normalization. Pure functions over jnp/numpy arrays — everything here is
jit/vmap-compatible and shape-static."""

from satnerf_tpu.core.rays import (  # noqa: F401
    RAY_DIM,
    EXTRAS_DIM,
    ray_component,
    extras_component,
    set_ray_component,
    build_rays_from_rpc,
    construct_sun_dir,
)
from satnerf_tpu.core.encoding import positional_encoding  # noqa: F401
from satnerf_tpu.core.sampling import (  # noqa: F401
    sample_pdf,
    sample_pdf_midpoint,
    sample_rays,
)
from satnerf_tpu.core.compositing import convert_sigmas  # noqa: F401
from satnerf_tpu.core.normalization import SceneNormalization  # noqa: F401
