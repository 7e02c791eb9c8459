"""Train-step + SPMD tests: device ray sampling, overfit, sharded == single."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from pixelnerf_tpu.models.pixelnerf import make_model
from pixelnerf_tpu.parallel.mesh import (
    DATA_AXIS,
    RAYS_AXIS,
    batch_sharding,
    make_mesh,
    parse_mesh_spec,
    replicated,
)
from pixelnerf_tpu.render.renderer import RendererConfig
from pixelnerf_tpu.train.step import create_train_state, make_train_step, sample_rays
from pixelnerf_tpu.utils.hocon import ConfigTree
from pixelnerf_tpu.utils.rays import gen_rays


def _tiny_model():
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
    return make_model(conf)


def _batch(SB=2, NV=3, NS=2, H=16, W=16, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.uniform(-1, 1, (SB, NV, H, W, 3)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (SB, NV, 1, 1))
    # distinct camera per view so view identity is recoverable from rays
    poses[..., 2, 3] = 1.3 + 0.2 * np.arange(NV)[None, :]
    poses[..., 0, 3] = 0.1 * np.arange(NV)[None, :]
    return {
        "images": jnp.asarray(images),
        "poses": jnp.asarray(poses),
        "focal": jnp.full((SB, 2), float(W), dtype=jnp.float32),
        "c": jnp.full((SB, 2), W / 2.0, dtype=jnp.float32),
        "src_images": jnp.asarray(images[:, :NS]),
        "src_poses": jnp.asarray(poses[:, :NS]),
    }


def test_sample_rays_matches_gen_rays():
    """Per-pixel analytic rays must equal the full gen_rays tensor rows."""
    batch = _batch(SB=1, NV=2, H=8, W=8)
    rays, rgb_gt = sample_rays(
        jax.random.PRNGKey(3), batch["images"], batch["poses"], batch["focal"],
        batch["c"], 0.5, 2.0, num_rays=64,
    )
    # brute force: full ray grid per view
    full = np.stack(
        [
            np.asarray(
                gen_rays(batch["poses"][0], 8, 8, batch["focal"][0, 0], 0.5, 2.0)
            )
        ]
    )  # (1, NV, H, W, 8)
    imgs01 = np.asarray(batch["images"]) * 0.5 + 0.5
    rays = np.asarray(rays)
    matched = 0
    for r in range(64):
        # find the pixel this ray corresponds to by matching direction
        diffs = np.linalg.norm(full[0].reshape(-1, 8) - rays[0, r], axis=-1)
        j = diffs.argmin()
        assert diffs[j] < 1e-5
        vid, rem = divmod(j, 64)
        y, x = divmod(rem, 8)
        np.testing.assert_allclose(
            np.asarray(rgb_gt)[0, r], imgs01[0, vid, y, x], atol=1e-6
        )
        matched += 1
    assert matched == 64


def test_sample_rays_bbox_restricts_pixels():
    batch = _batch(SB=1, NV=2, H=16, W=16)
    bbox = jnp.asarray([[[4, 5, 8, 9], [2, 3, 6, 7]]], dtype=jnp.float32)
    rays, _ = sample_rays(
        jax.random.PRNGKey(0), batch["images"], batch["poses"], batch["focal"],
        batch["c"], 0.5, 2.0, num_rays=256, bbox=bbox,
    )
    # Reconstruct pixel coords from ray dirs: dx*fx/(-dz) = -(x-cx)
    d = np.asarray(rays[0, :, 3:6])
    # dirs are normalized; recover tan: x = cx + dx/(-dz)*fx ... camera axis -z
    x = 8.0 + d[:, 0] / (-d[:, 2]) * 16.0
    y = 8.0 - d[:, 1] / (-d[:, 2]) * 16.0
    assert (x >= 2 - 1e-3).all() and (x <= 9 + 1 + 1e-3).all()
    assert (y >= 3 - 1e-3).all() and (y <= 9 + 1 + 1e-3).all()


@pytest.mark.slow
def test_overfit_tiny_scene():
    """End-to-end slice: loss decreases when overfitting one tiny scene."""
    model = _tiny_model()
    batch = _batch(SB=1, NV=2, NS=1, H=16, W=16)
    batch["src_images"] = batch["src_images"][:, :1]
    batch["src_poses"] = batch["src_poses"][:, :1]
    rcfg = RendererConfig(n_coarse=8, n_fine=4, n_fine_depth=2, white_bkgd=True)

    key = jax.random.PRNGKey(0)
    variables = model.init(
        key, batch["src_images"], batch["src_poses"], batch["focal"],
        jnp.zeros((1, 4, 3)), viewdirs=jnp.zeros((1, 4, 3)),
    )
    tx = optax.adam(5e-3)
    state = create_train_state(variables, tx)
    step = jax.jit(
        make_train_step(model, rcfg, tx, num_rays=32, z_near=0.5, z_far=2.0)
    )

    losses = []
    for i in range(40):
        state, aux = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(aux["t"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first * 0.7, f"no learning: {first:.4f} -> {last:.4f}"
    assert np.isfinite(losses).all()


def test_parse_mesh_spec():
    assert parse_mesh_spec("", 8) == {"data": 1, "rays": 8}
    assert parse_mesh_spec("data:2,rays:4", 8) == {"data": 2, "rays": 4}
    with pytest.raises(ValueError):
        parse_mesh_spec("data:3,rays:4", 8)


@pytest.mark.parametrize("n_fine", [0, 4])
def test_remat_step_matches_plain(n_fine):
    """remat=True must accept BOTH renderer call arities — the plain 3-arg
    query_fn form (n_fine=0 / no-cache models) and the 5-arg QueryCache
    form — and reproduce the remat=False step bit-for-bit (regression:
    jax.checkpoint static_argnums=(2,3) rejected the 3-arg call)."""
    model = _tiny_model()
    batch = _batch(SB=1, NV=2, NS=1, H=16, W=16)
    batch["src_images"] = batch["src_images"][:, :1]
    batch["src_poses"] = batch["src_poses"][:, :1]
    rcfg = RendererConfig(n_coarse=4, n_fine=n_fine)

    key = jax.random.PRNGKey(0)
    variables = model.init(
        key, batch["src_images"], batch["src_poses"], batch["focal"],
        jnp.zeros((1, 4, 3)), viewdirs=jnp.zeros((1, 4, 3)),
    )
    tx = optax.adam(1e-3)
    outs = []
    for remat in (False, True):
        step = jax.jit(
            make_train_step(
                model, rcfg, tx, num_rays=16, z_near=0.5, z_far=2.0,
                remat=remat,
            )
        )
        state, aux = step(
            create_train_state(variables, tx), batch, jax.random.PRNGKey(3)
        )
        assert np.isfinite(float(aux["t"]))
        outs.append((state, aux))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        outs[0], outs[1],
    )


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    """One sharded train step must equal the unsharded step numerically."""
    model = _tiny_model()
    SB, R = 4, 32
    batch = _batch(SB=SB, NV=2, NS=2, H=16, W=16)
    rcfg = RendererConfig(n_coarse=4, n_fine=0)

    key = jax.random.PRNGKey(0)
    variables = model.init(
        key, batch["src_images"], batch["src_poses"], batch["focal"],
        jnp.zeros((SB, 4, 3)), viewdirs=jnp.zeros((SB, 4, 3)),
    )
    tx = optax.adam(1e-3)

    # single device
    step_s = jax.jit(
        make_train_step(model, rcfg, tx, num_rays=R, z_near=0.5, z_far=2.0)
    )
    st0 = create_train_state(variables, tx)
    st1, aux1 = step_s(st0, batch, jax.random.PRNGKey(7))

    # 2x4 mesh
    mesh = make_mesh({DATA_AXIS: 2, RAYS_AXIS: 4})
    repl = replicated(mesh)
    bshard = batch_sharding(mesh)
    step_m = make_train_step(
        model, rcfg, tx, num_rays=R, z_near=0.5, z_far=2.0,
        ray_spec=P(DATA_AXIS, RAYS_AXIS),
    )
    with jax.sharding.set_mesh(mesh):
        st0_m = jax.device_put(create_train_state(variables, tx), repl)
        batch_m = {k: jax.device_put(v, bshard[k]) for k, v in batch.items()}
        jitted = jax.jit(
            step_m,
            in_shardings=(repl, {k: bshard[k] for k in batch_m}, repl),
            out_shardings=(repl, repl),
        )
        st2, aux2 = jitted(st0_m, batch_m, jax.random.PRNGKey(7))
        jax.block_until_ready(st2)

    np.testing.assert_allclose(float(aux1["t"]), float(aux2["t"]), rtol=2e-4)
    # different reduction orders under SPMD shift near-zero Adam second
    # moments; tolerance covers the rsqrt amplification
    for a, b in zip(jax.tree.leaves(st1.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4)


@pytest.mark.slow
def test_shmap_step_runs_and_replicates():
    """shard_map explicit-SPMD path (parallel.mesh.shard_train_step_shmap):
    per-shard ray sampling + pmean'd grads produce a replicated, finite,
    updated state on a (data:2, rays:4) mesh."""
    from pixelnerf_tpu.parallel.mesh import shard_train_step_shmap

    SB, R_per_shard = 4, 8
    model = _tiny_model()
    batch = _batch(SB=SB)
    rcfg = RendererConfig(n_coarse=4, n_fine=0)

    key = jax.random.PRNGKey(0)
    variables = model.init(
        key, batch["src_images"], batch["src_poses"], batch["focal"],
        jnp.zeros((SB, 4, 3)), viewdirs=jnp.zeros((SB, 4, 3)),
    )
    tx = optax.adam(1e-3)
    mesh = make_mesh({DATA_AXIS: 2, RAYS_AXIS: 4})
    step = make_train_step(
        model, rcfg, tx, num_rays=R_per_shard, z_near=0.5, z_far=2.0,
        pmean_axes=(DATA_AXIS, RAYS_AXIS),
    )
    run = shard_train_step_shmap(step, mesh)

    st0 = create_train_state(variables, tx)
    st1, aux = run(st0, batch, jax.random.PRNGKey(3))
    jax.block_until_ready(st1)

    assert np.isfinite(float(aux["t"]))
    assert int(st1.step) == 1
    # params actually moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(st0.params), jax.tree.leaves(st1.params))
    )
    assert moved
    # second step composes (exercises donation/caching)
    st2, aux2 = run(st1, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(aux2["t"]))


def _conv_model():
    """Tiny model with the ConvEncoder backbone (group norm — per-sample,
    so encode() is invariant to data-axis sharding, unlike train-mode BN)."""
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
            "encoder": {"backbone": "custom", "pretrained": False},
        }
    )
    return make_model(conf)


def _deterministic_ray_batch(model, batch, R, rcfg_unused=None, seed=11):
    """Pre-sample a fixed ray batch host-side and inject it (train/step.py
    'rays'/'rgb_gt' bypass) so single-device and SPMD runs evaluate the
    exact same function of the parameters."""
    rays, rgb_gt = sample_rays(
        jax.random.PRNGKey(seed), batch["images"], batch["poses"],
        batch["focal"], batch["c"], 0.5, 2.0, num_rays=R,
    )
    out = dict(batch)
    out["rays"] = rays
    out["rgb_gt"] = rgb_gt
    return out


def _grad_equivalence_case(model, mesh_axes, batch, R):
    """Shared body: one deterministic train step, single-device vs shard_map
    over `mesh_axes`; pmean'd grads must reproduce the global-mean step.

    This is the correctness the reference gets for free from DataParallel's
    gradient reduction (nerf.py:354-371) — here it proves the production
    shard_map path (the only mode that scales the Pallas kernels)."""
    from pixelnerf_tpu.parallel.mesh import shard_train_step_shmap

    SB = batch["images"].shape[0]
    # perturb=0 + noise_std=0: z samples and compositing are deterministic,
    # so per-shard RNG folding cannot introduce differences
    rcfg = RendererConfig(n_coarse=6, n_fine=4, n_fine_depth=2, perturb=0.0)
    batch = _deterministic_ray_batch(model, batch, R)

    key = jax.random.PRNGKey(0)
    variables = model.init(
        key, batch["src_images"], batch["src_poses"], batch["focal"],
        jnp.zeros((SB, 4, 3)), viewdirs=jnp.zeros((SB, 4, 3)),
    )
    tx = optax.adam(1e-3)

    step_s = jax.jit(
        make_train_step(model, rcfg, tx, num_rays=R, z_near=0.5, z_far=2.0)
    )
    st0 = create_train_state(variables, tx)
    st1, aux1 = step_s(st0, batch, jax.random.PRNGKey(7))

    mesh = make_mesh(mesh_axes)
    n_ray_shards = mesh_axes[RAYS_AXIS]
    step_m = make_train_step(
        model, rcfg, tx, num_rays=R // n_ray_shards, z_near=0.5, z_far=2.0,
        pmean_axes=(DATA_AXIS, RAYS_AXIS),
    )
    run = shard_train_step_shmap(step_m, mesh)
    st2, aux2 = run(st0, batch, jax.random.PRNGKey(7))
    jax.block_until_ready(st2)

    np.testing.assert_allclose(float(aux1["t"]), float(aux2["t"]), rtol=1e-5)
    # Adam's rsqrt amplifies fp reassociation noise in near-zero second
    # moments; params tolerance accounts for that, grads-level agreement is
    # what rtol on the loss + the update direction check below pin down.
    for a, b in zip(jax.tree.leaves(st1.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4
        )


@pytest.mark.slow
def test_shmap_grads_match_single_device_rays_axis():
    """(data:1, rays:8): the production BN encoder replicates over the data
    axis, so the rays-axis pmean must reproduce single-device numerics."""
    model = _tiny_model()
    batch = _batch(SB=2, NV=3, NS=2, H=16, W=16)
    _grad_equivalence_case(model, {DATA_AXIS: 1, RAYS_AXIS: 8}, batch, R=32)


@pytest.mark.slow
def test_shmap_grads_match_single_device_both_axes():
    """(data:2, rays:4) with the group-norm ConvEncoder: per-sample norm
    makes encode() data-sharding-invariant, so BOTH mesh axes must
    reproduce single-device numerics exactly (train-mode BatchNorm is the
    one deliberate shard-local deviation; see parallel/mesh.py)."""
    model = _conv_model()
    batch = _batch(SB=4, NV=3, NS=2, H=32, W=32)
    _grad_equivalence_case(model, {DATA_AXIS: 2, RAYS_AXIS: 4}, batch, R=32)


@pytest.mark.slow
def test_two_process_distributed_step():
    """Real 2-process jax.distributed CPU run: sharded BatchLoader +
    globalize_batch (make_array_from_process_local_data) + one shard_map
    train step on a global (data:2, rays:4) mesh. Both processes must
    agree bit-for-bit on loss and updated params (replication held)."""
    import socket
    import subprocess

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    env = {
        k: v for k, v in __import__("os").environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")
    }
    import os as _os
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    worker = _os.path.join(repo, "tests", "distributed_worker.py")
    procs = [
        subprocess.Popen(
            ["python", worker, coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=repo, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        lines = [l for l in out.splitlines() if l.startswith("CHECKSUM")]
        assert lines, f"no checksum in output:\n{out}\n{err}"
        outs.append(lines[-1])
    assert outs[0] == outs[1], f"process disagreement: {outs}"


@pytest.mark.slow
def test_compact_transfer_batch_matches_full():
    """The uint8+index wire format must produce the same step result as the
    full f32 batch (u8 round-trip is lossless for u8-sourced images)."""
    from pixelnerf_tpu.data.loader import make_step_batch

    SB, NV, H, W = 2, 4, 16, 16
    host = np.random.default_rng(0)
    u8 = host.integers(0, 256, (SB, NV, H, W, 3), dtype=np.uint8)
    images = u8.astype(np.float32) / 255.0 * 2.0 - 1.0
    poses = np.tile(np.eye(4, dtype=np.float32), (SB, NV, 1, 1))
    poses[..., 2, 3] = 1.4
    data = {
        "images": images,
        "poses": poses,
        "focal": np.full((SB,), float(W), np.float32),
        "c": np.full((SB, 2), W / 2.0, np.float32),
    }

    full = make_step_batch(data, np.random.default_rng(7), [2])
    compact = make_step_batch(
        data, np.random.default_rng(7), [2], compact_transfer=True
    )

    model = _tiny_model()
    rcfg = RendererConfig(n_coarse=4, n_fine=0)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        key, jnp.asarray(full["src_images"]), jnp.asarray(full["src_poses"]),
        jnp.asarray(full["focal"]), jnp.zeros((SB, 4, 3)),
        viewdirs=jnp.zeros((SB, 4, 3)),
    )
    tx = optax.adam(1e-3)
    step = jax.jit(
        make_train_step(model, rcfg, tx, num_rays=8, z_near=0.5, z_far=2.0)
    )
    st = create_train_state(variables, tx)
    _, aux_full = step(st, {k: jnp.asarray(v) for k, v in full.items()},
                       jax.random.PRNGKey(3))
    _, aux_comp = step(st, {k: jnp.asarray(v) for k, v in compact.items()},
                       jax.random.PRNGKey(3))
    np.testing.assert_allclose(
        float(aux_comp["t"]), float(aux_full["t"]), rtol=1e-6
    )
