from satnerf_tpu.render.renderer import (  # noqa: F401
    RenderConfig,
    render_rays,
    render_image_chunked,
)
