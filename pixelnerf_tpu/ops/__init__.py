from pixelnerf_tpu.ops.composite import alpha_composite, composite_deltas  # noqa: F401
from pixelnerf_tpu.ops.grid_sample import grid_sample_2d  # noqa: F401
from pixelnerf_tpu.ops.interpolate import resize_area, resize_bilinear  # noqa: F401
from pixelnerf_tpu.ops.sampling import (  # noqa: F401
    sample_coarse,
    sample_fine,
    sample_fine_depth,
)
