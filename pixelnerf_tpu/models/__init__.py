from pixelnerf_tpu.models.code import PositionalEncoding  # noqa: F401
from pixelnerf_tpu.models.encoder import (  # noqa: F401
    ConvEncoder,
    ImageEncoder,
    SpatialEncoder,
)
from pixelnerf_tpu.models.mlp import ImplicitNet  # noqa: F401
from pixelnerf_tpu.models.pixelnerf import (  # noqa: F401
    PixelNeRFNet,
    SceneEncoding,
    make_model,
)
from pixelnerf_tpu.models.resnetfc import ResnetFC  # noqa: F401
