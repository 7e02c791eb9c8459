"""Export / import compact bf16 model checkpoints for in-repo archival.

The live checkpoint layout (`utils/checkpoint.py`, mirroring the
reference's checkpoints/<exp>/pixel_nerf_latest, src/model/models.py:
268-316) stores f32 model variables (~60 MB for the flagship). For
committing a trained model into the repository, `export` casts every
floating leaf except batch_stats to bfloat16 (~30 MB msgpack) — bf16
round-off is far below the 1/255 quantization of the training images —
while BN running statistics stay f32 (they are tiny and accumulate).

`import` restores a live `pixel_nerf_latest` from such an artifact,
casting back up to f32, so every CLI (eval_approx, eval_mesh, gen_video,
eval_real) runs unchanged against the archived model:

    python -m pixelnerf_tpu.tools.export_checkpoint export \
        --ckpt checkpoints/srn600/pixel_nerf_latest --out checkpoints/srn600_bf16.ckpt
    python -m pixelnerf_tpu.tools.export_checkpoint import \
        --artifact checkpoints/srn600_bf16.ckpt --ckpt /tmp/ck/srn600/pixel_nerf_latest
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _map_leaves(tree, fn, path=()):
    if isinstance(tree, dict):
        return {k: _map_leaves(v, fn, path + (k,)) for k, v in tree.items()}
    return fn(path, tree)


def _cast_down(path, leaf):
    arr = np.asarray(leaf)
    in_stats = any(p == "batch_stats" for p in path)
    if arr.dtype == np.float32 and not in_stats:
        import jax.numpy as jnp

        return np.asarray(arr, dtype=jnp.bfloat16)
    return arr


def _cast_up(path, leaf):
    arr = np.asarray(leaf)
    if arr.dtype.name == "bfloat16":
        return arr.astype(np.float32)
    return arr


def export(ckpt_path: str, out_path: str) -> None:
    import flax.serialization

    with open(ckpt_path, "rb") as f:
        tree = flax.serialization.msgpack_restore(f.read())
    small = _map_leaves(tree, _cast_down)
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(small))
    os.replace(tmp, out_path)
    print(
        f"Wrote {out_path}: {os.path.getsize(out_path) / 1e6:.1f} MB "
        f"(from {os.path.getsize(ckpt_path) / 1e6:.1f} MB)"
    )


def import_(artifact_path: str, ckpt_path: str) -> None:
    import flax.serialization

    with open(artifact_path, "rb") as f:
        tree = flax.serialization.msgpack_restore(f.read())
    full = _map_leaves(tree, _cast_up)
    os.makedirs(os.path.dirname(ckpt_path) or ".", exist_ok=True)
    tmp = ckpt_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(full))
    os.replace(tmp, ckpt_path)
    print(f"Wrote {ckpt_path}: {os.path.getsize(ckpt_path) / 1e6:.1f} MB")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=("export", "import"))
    parser.add_argument("--ckpt", type=str, required=True,
                        help="live pixel_nerf_latest path (source for "
                        "export, destination for import)")
    parser.add_argument("--out", type=str, default=None,
                        help="export: artifact output path")
    parser.add_argument("--artifact", type=str, default=None,
                        help="import: bf16 artifact path")
    args = parser.parse_args(argv)
    if args.mode == "export":
        if not args.out:
            parser.error("export requires --out")
        export(args.ckpt, args.out)
    else:
        if not args.artifact:
            parser.error("import requires --artifact")
        import_(args.artifact, args.ckpt)


if __name__ == "__main__":
    main()
