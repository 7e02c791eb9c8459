from pixelnerf_tpu.utils import cameras, config, hocon, metrics, rays  # noqa: F401
