"""Port torchvision ImageNet ResNet weights into a pixelnerf_tpu checkpoint.

Reproduces the reference's `pretrained=True` encoder initialization
(reference: src/model/encoder.py:62-68 loads torchvision resnet18/34 with
ImageNet weights). This environment cannot download weights, so the port
is a tool: given a torchvision state_dict file (``.pth``/``.pt`` from
`torch.hub` / `torchvision.models.resnet34(weights=...)`, or an ``.npz``
with the same keys), it writes the converted encoder params+batch_stats
either into an existing experiment checkpoint (in place of the randomly
initialized encoder trunk) or to a standalone ``.npz``.

Usage:
    # seed an experiment's encoder before training
    python -m pixelnerf_tpu.tools.port_encoder_weights \
        --weights resnet34-imagenet.pth --backbone resnet34 \
        --checkpoint checkpoints/srn_car/pixel_nerf_latest

    # or just convert
    python -m pixelnerf_tpu.tools.port_encoder_weights \
        --weights resnet34-imagenet.pth --backbone resnet34 --out enc.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def _load_state_dict(path: str):
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return sd


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--weights", required=True, help=".pth/.pt/.npz state_dict")
    parser.add_argument("--backbone", default="resnet34",
                        choices=("resnet18", "resnet34"))
    parser.add_argument("--num_stages", type=int, default=3,
                        help="encoder num_layers - 1")
    parser.add_argument("--checkpoint", default=None,
                        help="experiment checkpoint to update in place")
    parser.add_argument("--out", default=None, help="standalone .npz output")
    args = parser.parse_args(argv)

    from pixelnerf_tpu.models.resnet import port_torchvision_resnet

    sd = _load_state_dict(args.weights)
    params, stats = port_torchvision_resnet(
        sd, backbone=args.backbone, num_stages=args.num_stages
    )
    n = sum(np.asarray(v).size for v in _leaves(params))
    print(f"ported {n/1e6:.2f}M params ({args.backbone}, {args.num_stages} stages)")

    if args.checkpoint:
        import flax.serialization

        from pixelnerf_tpu.utils import checkpoint as ckpt_io

        with open(args.checkpoint, "rb") as f:
            tree = flax.serialization.msgpack_restore(f.read())
        # the trunk lives at encoder/model in both collections
        tree["params"]["encoder"]["model"] = params
        tree.setdefault("batch_stats", {}).setdefault("encoder", {})["model"] = stats
        ckpt_io.save_pytree(args.checkpoint, tree)
        print(f"updated encoder trunk in {args.checkpoint}")
    if args.out:
        flat = {}

        def walk(d, prefix, sink):
            for k, v in d.items():
                key = f"{prefix}/{k}" if prefix else k
                if isinstance(v, dict):
                    walk(v, key, sink)
                else:
                    sink[key] = np.asarray(v)

        walk(params, "params", flat)
        walk(stats, "batch_stats", flat)
        np.savez(args.out, **flat)
        print(f"wrote {args.out}")
    if not args.checkpoint and not args.out:
        parser.error("give --checkpoint and/or --out")


def _leaves(d):
    for v in d.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
