from pixelnerf_tpu.render.renderer import (  # noqa: F401
    RendererConfig,
    render_rays,
)
