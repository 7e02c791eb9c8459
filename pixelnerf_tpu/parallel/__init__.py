from pixelnerf_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    RAYS_AXIS,
    batch_sharding,
    make_mesh,
    parse_mesh_spec,
    replicated,
    shard_train_step,
)
