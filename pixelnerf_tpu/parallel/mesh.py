"""Device-mesh construction and sharding specs for SPMD scale-out.

Replaces the reference's torch.nn.DataParallel over the ray dim
(reference: src/render/nerf.py:354-371, dim=1 scatter) and whole-model DP
(train/multigpu.py:72-76) with a single `jax.sharding.Mesh` over ICI/DCN:

* axis "data": the object super-batch SB (the reference's multigpu.py axis)
* axis "rays": the per-object ray batch R (the reference's bind_parallel axis)

Parameters and optimizer state are replicated; gradients are all-reduced
by XLA (psum over both axes) as a consequence of the replicated out-sharding
— the SPMD equivalent of DataParallel's gradient reduction, but overlapped
with the backward pass by the XLA scheduler and riding ICI.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "parse_mesh_spec",
    "batch_sharding",
    "replicated",
    "shard_train_step",
    "shard_train_step_shmap",
]

DATA_AXIS = "data"
RAYS_AXIS = "rays"


def parse_mesh_spec(spec: str, n_devices: Optional[int] = None) -> Dict[str, int]:
    """Parse 'data:2,rays:4' into {'data': 2, 'rays': 4}.

    Empty spec = all devices on the rays axis (matching the reference's
    default DataParallel-over-rays behavior, nerf.py:370).
    """
    if n_devices is None:
        n_devices = len(jax.devices())
    if not spec:
        return {DATA_AXIS: 1, RAYS_AXIS: n_devices}
    out: Dict[str, int] = {DATA_AXIS: 1, RAYS_AXIS: 1}
    for part in spec.split(","):
        name, size = part.split(":")
        name = name.strip()
        if name not in out:
            raise ValueError(f"Unknown mesh axis {name!r} (use data/rays)")
        out[name] = int(size)
    total = out[DATA_AXIS] * out[RAYS_AXIS]
    if total != n_devices:
        raise ValueError(
            f"Mesh {out} covers {total} devices but {n_devices} are available"
        )
    return out


def make_mesh(
    axis_sizes: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, rays) mesh. Default: all devices on rays."""
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = {DATA_AXIS: 1, RAYS_AXIS: len(devices)}
    shape = (axis_sizes[DATA_AXIS], axis_sizes[RAYS_AXIS])
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, (DATA_AXIS, RAYS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> Dict[str, NamedSharding]:
    """Shardings for the train-step batch contract (train/step.py).

    Images/poses/intrinsics shard over the object axis only; rays are
    *generated inside* the jitted step and constrained to (data, rays)
    there, so nothing in the input needs a rays-axis sharding.
    """
    data = NamedSharding(mesh, P(DATA_AXIS))
    rays = NamedSharding(mesh, P(DATA_AXIS, RAYS_AXIS))
    return {
        "images": data,
        "images_u8": data,
        "image_ord": data,
        "poses": data,
        "focal": data,
        "c": data,
        "bbox": data,
        "src_images": data,
        "src_poses": data,
        "src_c": data,
        "z_bounds": data,
        # externally-supplied (SB, R, ...) ray batches (train/step.py
        # 'rays'/'rgb_gt' bypass) shard over both mesh axes
        "rays": rays,
        "rgb_gt": rays,
    }


def shard_train_step(train_step, mesh: Mesh):
    """jit the train step with replicated params and data-sharded batch.

    The loss is a global mean over (SB, R); with batch inputs sharded over
    'data' and the per-step ray tensor constrained over ('data', 'rays'),
    XLA partitions the encoder over objects, the field evaluation over
    objects x rays, and inserts the gradient all-reduce automatically
    (out-sharding of params/opt_state is replicated).

    NOTE: GSPMD cannot auto-partition pallas_call, so on a multi-device
    TPU mesh this mode requires the XLA fallback paths (ResnetFC
    use_pallas=False; index_features falls back off-TPU automatically).
    The default production mode is `shard_train_step_shmap`, which runs
    the Pallas kernels per-shard.
    """
    repl = replicated(mesh)
    bshard = batch_sharding(mesh)

    def in_batch_shardings(batch: Dict) -> Dict:
        return {k: bshard.get(k, repl) for k in batch}

    def run(state, batch, rng):
        jitted = jax.jit(
            train_step,
            in_shardings=(repl, in_batch_shardings(batch), repl),
            out_shardings=(repl, repl),
        )
        return jitted(state, batch, rng)

    return run


# batch keys sharded over the object axis in shard_map mode (same contract
# as batch_sharding above)
_DATA_SHARDED_KEYS = frozenset(
    {
        "images", "images_u8", "image_ord", "poses", "focal", "c", "bbox",
        "src_images", "src_poses", "src_c", "z_bounds",
    }
)
# (SB, R, ...) keys sharded over BOTH axes (injected ray batches)
_RAY_SHARDED_KEYS = frozenset({"rays", "rgb_gt"})


def globalize_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Multi-host input pipeline: assemble per-host local batches into
    global jax.Arrays sharded over the 'data' axis.

    Each host loads a disjoint slice of the global object batch
    (data.loader.BatchLoader num_shards/shard_id); this stitches the host-
    local numpy arrays into addressable shards of one global array
    (jax.make_array_from_process_local_data). No-op on a single process.
    """
    if jax.process_count() == 1:
        return batch
    repl = replicated(mesh)
    bshard = batch_sharding(mesh)
    import numpy as _np

    return {
        k: jax.make_array_from_process_local_data(
            bshard.get(k, repl), _np.asarray(v)
        )
        for k, v in batch.items()
    }


def shard_train_step_shmap(train_step, mesh: Mesh, n_outputs: int = 2):
    """Explicit-SPMD alternative to `shard_train_step`: runs the step under
    `shard_map` instead of relying on GSPMD auto-partitioning.

    Why both exist: auto-partitioning cannot split a `pallas_call`, so the
    fused Pallas field MLP (ops/resnetfc_pallas.py) only scales out on this
    path — each shard runs the megakernel on its local (SB/data, R/rays)
    slice and the step pmeans gradients across the mesh (build the step
    with `make_train_step(..., pmean_axes=("data", "rays"))`).

    Contract: state and rng replicated; batch leaves with known keys sharded
    over 'data' (SB divisible by the data axis); the step's `num_rays` is
    rays per rays-shard. Outputs (replicated): a tuple of `n_outputs`
    pytrees — (state, metrics) for a train step (n_outputs=2), metrics only
    for an eval step built with the same pmean_axes (n_outputs=1).
    """
    try:  # jax>=0.8 top-level API; the experimental alias is deprecated
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    # the replication-check kwarg was renamed check_rep -> check_vma; key on
    # the actual signature, not on which import succeeded (a jax where the
    # top-level API still takes check_rep would TypeError at trace time)
    import inspect

    _params = inspect.signature(shard_map).parameters
    if "check_vma" in _params:
        _rep_kwargs = {"check_vma": False}
    elif "check_rep" in _params:
        _rep_kwargs = {"check_rep": False}
    else:
        _rep_kwargs = {}
    from jax.sharding import PartitionSpec

    P_ = PartitionSpec
    out_specs = (P_(),) * n_outputs if n_outputs > 1 else P_()
    # one shard_map + jit per batch-key set — rebuilding them per call would
    # defeat the jit trace cache and recompile the whole step every step
    cache = {}

    def run(state, batch, rng):
        key = frozenset(batch)
        if key not in cache:
            batch_specs = {
                k: (
                    P_(DATA_AXIS, RAYS_AXIS)
                    if k in _RAY_SHARDED_KEYS
                    else P_(DATA_AXIS) if k in _DATA_SHARDED_KEYS else P_()
                )
                for k in batch
            }
            cache[key] = jax.jit(
                shard_map(
                    train_step,
                    mesh=mesh,
                    in_specs=(P_(), batch_specs, P_()),
                    out_specs=out_specs,
                    **_rep_kwargs,
                )
            )
        return cache[key](state, batch, rng)

    return run
