"""Profile the training step under jax.profiler (xprof/TensorBoard).

The reference marks its hot regions with torch profiler ranges but ships no
driver (reference: src/model/models.py:156, encoder.py:90, resnetfc.py:139,
nerf.py:175,264 — SURVEY §5). This is the TPU-native equivalent: the same
units are annotated with `jax.named_scope` in the model; this tool runs
warmup + N profiled steps of the full train step (or a forward render) and
writes a TensorBoard-profile trace you can open with
`tensorboard --logdir <out>` (Profile tab) or upload to xprof.

Usage:
    python -m pixelnerf_tpu.tools.profile_step -c conf/exp/srn.conf \
        --out /tmp/prof --steps 3 [--sb 4] [--rays 1024] [--forward-only]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-c", "--conf", default="conf/exp/srn.conf")
    parser.add_argument("--out", required=True, help="trace output directory")
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--sb", type=int, default=4, help="object batch")
    parser.add_argument("--nv", type=int, default=3)
    parser.add_argument("--ns", type=int, default=2, help="source views")
    parser.add_argument("--size", type=int, default=128, help="image H=W")
    parser.add_argument("--rays", type=int, default=1024, help="rays/object")
    parser.add_argument("--forward-only", action="store_true")
    parser.add_argument("--remat", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pixelnerf_tpu.models.pixelnerf import make_model
    from pixelnerf_tpu.render.renderer import RendererConfig, render_rays
    from pixelnerf_tpu.train.step import create_train_state, make_train_step
    from pixelnerf_tpu.utils import hocon

    conf = hocon.load(args.conf)
    model = make_model(conf["model"])
    rcfg = RendererConfig.from_conf(conf["renderer"])

    SB, NV, NS, H, W, R = args.sb, args.nv, args.ns, args.size, args.size, args.rays
    host = np.random.default_rng(0)
    images = jnp.asarray(host.uniform(-1, 1, (SB, NV, H, W, 3)).astype(np.float32))
    poses = np.tile(np.eye(4, dtype=np.float32), (SB, NV, 1, 1))
    poses[..., 2, 3] = 1.3
    batch = {
        "images": images,
        "poses": jnp.asarray(poses),
        "focal": jnp.full((SB, 2), float(W)),
        "c": jnp.full((SB, 2), W / 2.0),
        "src_images": images[:, :NS],
        "src_poses": jnp.asarray(poses[:, :NS]),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["src_images"], batch["src_poses"],
        batch["focal"], jnp.zeros((SB, 8, 3)), viewdirs=jnp.zeros((SB, 8, 3)),
    )

    if args.forward_only:
        def fwd(variables, rng):
            enc = model.apply(
                variables, batch["src_images"], batch["src_poses"],
                batch["focal"], batch["c"], method="encode",
            )

            def qf(xyz, vd, coarse):
                return model.apply(variables, enc, xyz, vd, coarse, method="query")

            rays = jnp.concatenate(
                [
                    jnp.zeros((SB, R, 3)),
                    jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (SB, R, 1)),
                    jnp.full((SB, R, 1), 0.8),
                    jnp.full((SB, R, 1), 1.8),
                ],
                axis=-1,
            )
            out = render_rays(qf, rays, rng, rcfg, use_viewdirs=model.use_viewdirs)
            head = out["fine"] if rcfg.using_fine else out["coarse"]
            return head["rgb"]

        run = jax.jit(fwd)
        run(variables, jax.random.PRNGKey(1)).block_until_ready()  # compile
        with jax.profiler.trace(args.out):
            for i in range(args.steps):
                with jax.profiler.StepTraceAnnotation("render", step_num=i):
                    out = run(variables, jax.random.PRNGKey(2 + i))
            out.block_until_ready()
    else:
        tx = optax.adam(1e-4)
        state = create_train_state(variables, tx)
        step = jax.jit(
            make_train_step(
                model, rcfg, tx, num_rays=R, z_near=0.8, z_far=1.8,
                remat=True if args.remat else "auto", nviews=NS,
            )
        )
        for i in range(2):  # compile + warm
            state, aux = step(state, batch, jax.random.PRNGKey(i))
            float(aux["t"])
        with jax.profiler.trace(args.out):
            for i in range(args.steps):
                with jax.profiler.StepTraceAnnotation("train", step_num=i):
                    state, aux = step(state, batch, jax.random.PRNGKey(100 + i))
            float(aux["t"])

    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
