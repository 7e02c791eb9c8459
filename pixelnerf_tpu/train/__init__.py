from pixelnerf_tpu.train.step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
    sample_rays,
)
from pixelnerf_tpu.train.trainer import Trainer, data_loop  # noqa: F401
