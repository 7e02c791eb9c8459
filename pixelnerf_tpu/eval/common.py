"""Shared eval-script plumbing: load model + weights + dataset from args."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def load_model_and_dataset(args, conf, want_split: str):
    """Build the model from conf, load the latest checkpoint, open the split.

    Mirrors the preamble every reference eval script repeats
    (e.g. eval/gen_video.py:66-110).
    """
    import jax

    from pixelnerf_tpu.data import get_split_dataset
    from pixelnerf_tpu.models.pixelnerf import make_model
    from pixelnerf_tpu.render.renderer import RendererConfig
    from pixelnerf_tpu.utils import checkpoint as ckpt_io

    size_kw = (
        {"image_size": tuple(args.image_size)}
        if getattr(args, "image_size", None)
        else {}
    )
    dset = get_split_dataset(
        args.dataset_format, args.datadir, want_split=want_split,
        training=False, **size_kw,
    )
    model = make_model(conf["model"])

    sample = dset[0]
    images = sample["images"][:1][None]  # (1, 1, H, W, 3)
    poses = sample["poses"][:1][None]
    focal = np.asarray(sample["focal"], dtype=np.float32).reshape(-1)[:1]
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(images),
        jnp.asarray(poses),
        jnp.asarray(focal),
        jnp.zeros((1, 8, 3)),
        viewdirs=jnp.zeros((1, 8, 3)),
    )
    variables = dict(
        ckpt_io.load_model_weights(
            variables, args.checkpoints_path, args.name, resume=True
        )
    )
    rcfg = RendererConfig.from_conf(conf["renderer"], lindisp=dset.lindisp)
    return model, variables, dset, rcfg


def encode_views(model, variables, images, poses, focal, c=None):
    """Encode (NS, H, W, 3) source views into a SceneEncoding (SB=1)."""
    focal = np.asarray(focal, dtype=np.float32).reshape(-1)
    c_arr = jnp.asarray(np.asarray(c, dtype=np.float32))[None] if c is not None else None
    return model.apply(
        variables,
        jnp.asarray(images)[None],
        jnp.asarray(poses)[None],
        jnp.asarray(focal[:1]) if focal.size == 1 else jnp.asarray(focal)[None],
        c_arr,
        method="encode",
    )
