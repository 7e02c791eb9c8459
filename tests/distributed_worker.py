"""Worker for the 2-process jax.distributed input-pipeline test.

Run by tests/test_train_parallel.py::test_two_process_distributed_step —
NOT a pytest module. Each process:

1. initializes jax.distributed on a local CPU backend with 4 virtual
   devices (8 global),
2. loads its disjoint half of a deterministic in-memory dataset via
   `BatchLoader(num_shards=2, shard_id=pid)`,
3. assembles the global batch with `parallel.mesh.globalize_batch`
   (jax.make_array_from_process_local_data over the 'data' axis),
4. runs ONE shard_map train step on a (data:2, rays:4) global mesh,
5. prints `CHECKSUM <loss> <param-sum>` — the runner asserts both
   processes print identical values (replicated state stayed replicated).

This exercises the multi-host path that single-process tests short-circuit
(`jax.process_count()==1` in globalize_batch). Replaces the correctness
torch gets from DistributedSampler + DataParallel in the reference
(trainlib/trainer.py:17-30).
"""

import os
import sys

# PYTHONPATH breaks axon plugin discovery (CLAUDE.md); sys.path instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid,
        cluster_detection_method="deactivate",
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    import numpy as np
    import jax.numpy as jnp
    import optax

    from pixelnerf_tpu.data.loader import BatchLoader, make_step_batch
    from pixelnerf_tpu.models.pixelnerf import make_model
    from pixelnerf_tpu.parallel.mesh import (
        DATA_AXIS, RAYS_AXIS, globalize_batch, make_mesh, replicated,
        shard_train_step_shmap,
    )
    from pixelnerf_tpu.render.renderer import RendererConfig
    from pixelnerf_tpu.train.step import (
        create_train_state, make_train_step,
    )
    from pixelnerf_tpu.utils.hocon import ConfigTree

    NV, H, W = 3, 16, 16

    class FakeDataset:
        """Deterministic per-object SRN-style dict contract (data/srn.py)."""

        def __len__(self):
            return 8

        def __getitem__(self, i):
            rng = np.random.default_rng(1000 + i)
            images = rng.uniform(-1, 1, (NV, H, W, 3)).astype(np.float32)
            poses = np.tile(np.eye(4, dtype=np.float32), (NV, 1, 1))
            poses[:, 2, 3] = 1.3 + 0.1 * np.arange(NV)
            return {
                "images": images,
                "poses": poses,
                "focal": np.float32(W),
                "c": np.array([W / 2.0, H / 2.0], np.float32),
            }

    conf = ConfigTree(
        {
            "use_encoder": True,
            "use_xyz": True,
            "use_code": True,
            "code": {"num_freqs": 2, "freq_factor": 1.5, "include_input": True},
            "use_viewdirs": True,
            "use_code_viewdirs": False,
            "mlp_coarse": {"type": "resnet", "n_blocks": 2, "d_hidden": 16,
                           "combine_layer": 1, "combine_type": "average"},
            "mlp_fine": {"type": "resnet", "n_blocks": 2, "d_hidden": 16,
                         "combine_layer": 1, "combine_type": "average"},
            "encoder": {"backbone": "resnet18", "pretrained": False,
                        "num_layers": 2},
        }
    )
    model = make_model(conf)

    mesh = make_mesh({DATA_AXIS: 2, RAYS_AXIS: 4})
    loader = BatchLoader(
        FakeDataset(), batch_size=2, shuffle=True, seed=0, prefetch=False,
        num_shards=jax.process_count(), shard_id=jax.process_index(),
    )
    data = next(iter(loader))
    local = make_step_batch(data, np.random.default_rng(5), [2])
    batch = globalize_batch(local, mesh)
    SBg = batch["images"].shape[0]
    assert SBg == 4, SBg  # 2 local objects per host, 4 global

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(local["src_images"]), jnp.asarray(local["src_poses"]),
        jnp.asarray(local["focal"]), jnp.zeros((2, 4, 3)),
        viewdirs=jnp.zeros((2, 4, 3)),
    )
    tx = optax.adam(1e-3)
    repl = replicated(mesh)
    # replicate host-identical state onto the global mesh
    state = jax.jit(
        lambda: create_train_state(
            jax.tree.map(jnp.asarray, variables), tx
        ),
        out_shardings=repl,
    )()

    rcfg = RendererConfig(n_coarse=4, n_fine=0)
    step = make_train_step(
        model, rcfg, tx, num_rays=8, z_near=0.5, z_far=2.0,
        pmean_axes=(DATA_AXIS, RAYS_AXIS),
    )
    run = shard_train_step_shmap(step, mesh)
    state, aux = run(state, batch, jax.random.PRNGKey(3))
    jax.block_until_ready(state)

    loss = float(aux["t"])
    psum = float(
        sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(state.params))
    )
    assert np.isfinite(loss)
    print(f"CHECKSUM {loss:.9e} {psum:.9e}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
