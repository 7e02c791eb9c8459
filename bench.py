"""Benchmark: training-step ray throughput on one chip.

Measures the primary BASELINE.md metric — rays/s/chip with the flagship
SRN-config model (ResNet-34 encoder, 5-block 512-wide coarse+fine MLPs,
64 coarse + 32 fine samples, 2 source views, 128x128 images), full train
step including backward and Adam update.

Prints ONE JSON line:
    {"metric": "train_rays_per_s_per_chip", "value": N, "unit": "rays/s",
     "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md); vs_baseline is
measured against the round-1 recorded value in BENCH_BASELINE.json (created
on first run) so later rounds show the speedup factor.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_PATH = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")

# Benchmark config: reference train defaults scaled to saturate one TPU chip
# (reference uses SB=4, 128 rays/obj on GPUs — README.md:140,253; a TPU chip
# wants a larger ray batch to fill the MXU).
SB = 4
NV = 3
NS = 2
H = W = 128
RAYS_PER_OBJ = 1024
WARMUP = 2
# steady-state: the single end-of-chain host fetch (~38 ms tunnel RTT)
# amortizes over ITERS; 10 keeps the artifact under ~4 ms/step
ITERS = 10


def main(argv=None) -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--rays", type=int, default=RAYS_PER_OBJ,
        help="rays per object; non-default values are measured against the "
        "same recorded 1024-ray baseline (PERFORMANCE.md MFU table)",
    )
    args = parser.parse_args(argv)
    rays_per_obj = args.rays
    import jax
    import jax.numpy as jnp
    import optax

    from pixelnerf_tpu.utils import hocon
    from pixelnerf_tpu.models.pixelnerf import make_model
    from pixelnerf_tpu.render.renderer import RendererConfig
    from pixelnerf_tpu.train.step import create_train_state, make_train_step

    conf = hocon.load(os.path.join(os.path.dirname(__file__), "conf/exp/srn.conf"))
    model = make_model(conf["model"])
    rcfg = RendererConfig.from_conf(conf["renderer"])

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (SB, NV, H, W, 3)).astype(np.float32))
    poses = np.tile(np.eye(4, dtype=np.float32), (SB, NV, 1, 1))
    poses[..., 2, 3] = 1.3
    batch = {
        "images": images,
        "poses": jnp.asarray(poses),
        "focal": jnp.full((SB, 2), float(W), dtype=jnp.float32),
        "c": jnp.full((SB, 2), W / 2.0, dtype=jnp.float32),
        "src_images": images[:, :NS],
        "src_poses": jnp.asarray(poses[:, :NS]),
    }

    key = jax.random.PRNGKey(0)
    variables = model.init(
        key, batch["src_images"], batch["src_poses"], batch["focal"],
        jnp.zeros((SB, 8, 3)), viewdirs=jnp.zeros((SB, 8, 3)),
    )
    tx = optax.adam(1e-4)
    state = create_train_state(variables, tx)
    train_step = jax.jit(
        make_train_step(
            model, rcfg, tx, num_rays=rays_per_obj, z_near=0.8, z_far=1.8,
        )
    )

    # warmup/compile. NOTE: execution must be forced with a host fetch —
    # on the axon remote backend block_until_ready alone does not guarantee
    # the computation ran (lazy dispatch), which silently yields
    # dispatch-only timings.
    for i in range(WARMUP):
        state, aux = train_step(state, batch, jax.random.PRNGKey(i))
        _ = float(aux["t"])

    # steady-state throughput: chain ITERS steps through the state
    # dependency and fetch ONCE at the end — the final host fetch cannot
    # complete before every chained step ran, and real training does not
    # sync the host every step. Per-step keys are pre-split ON DEVICE so
    # the timed loop dispatches against device-resident arrays only (a
    # host-side PRNGKey per step shows up as a per-step host->device
    # transfer in the device timeline; real training can batch its key
    # derivation the same way).
    keys = jax.random.split(jax.random.PRNGKey(100), ITERS)
    keys.block_until_ready()
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, aux = train_step(state, batch, keys[i])
    # the last step's metrics depend on the whole state chain; one fetch
    # forces every step
    _ = float(aux["t"])
    dt = time.perf_counter() - t0

    total_rays = SB * rays_per_obj * ITERS
    rays_per_s = total_rays / dt

    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            base = json.load(f)["value"]
    elif rays_per_obj != RAYS_PER_OBJ:
        base = rays_per_s  # never record a non-default shape as the baseline
    else:
        base = rays_per_s
        with open(BASELINE_PATH, "w") as f:
            json.dump(
                {"metric": "train_rays_per_s_per_chip", "value": rays_per_s}, f
            )

    print(
        json.dumps(
            {
                "metric": "train_rays_per_s_per_chip",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / base, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
