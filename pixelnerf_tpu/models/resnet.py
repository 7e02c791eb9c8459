"""ResNet-18/34 feature trunk in Flax (NHWC, TPU-native).

Functional re-implementation of the torchvision ResNet trunk the reference
encoder consumes (reference: src/model/encoder.py:62-68, 130-148):
7x7/2 stem conv + norm + relu, optional 3x3/2 maxpool, then 4 stages of
BasicBlocks. Channels-last layout and Kaiming(fan_out) init to match
torchvision semantics; norm layer selectable like the reference's
get_norm_layer (src/util/util.py:330-351): batch | group | instance | none.

BatchNorm runs as standard train-mode BN with mutable `batch_stats` when
``train=True`` and uses running statistics when ``train=False`` — same as
torch module train/eval modes. Pretrained ImageNet weights can be ported
from a torchvision state_dict via `port_torchvision_resnet` (weights are
not downloadable in this environment, so random init is the default; the
reference defaults to pretrained=True — documented deviation).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = ["ResNetTrunk", "STAGE_BLOCKS", "port_torchvision_resnet"]

STAGE_BLOCKS = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3)}
STAGE_CHANNELS = (64, 128, 256, 512)

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _make_norm(norm_type: str, dtype, train: bool) -> Optional[Callable]:
    if norm_type == "batch":
        return lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
            name=name,
        )
    if norm_type == "group":
        return lambda name: nn.GroupNorm(num_groups=32, dtype=dtype, name=name)
    if norm_type == "instance":
        # InstanceNorm == GroupNorm with one channel per group, no affine
        return lambda name: nn.GroupNorm(
            num_groups=None, group_size=1, use_bias=False, use_scale=False,
            dtype=dtype, name=name,
        )
    if norm_type == "none":
        return None
    raise NotImplementedError(f"normalization layer [{norm_type}] not found")


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    norm_type: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = _make_norm(self.norm_type, self.dtype, train)
        identity = x

        out = nn.Conv(
            self.filters, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, kernel_init=_conv_init,
            dtype=self.dtype, name="conv1",
        )(x)
        if norm:
            out = norm("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.filters, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)],
            use_bias=False, kernel_init=_conv_init, dtype=self.dtype, name="conv2",
        )(out)
        if norm:
            out = norm("bn2")(out)

        if self.stride != 1 or x.shape[-1] != self.filters:
            identity = nn.Conv(
                self.filters, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, kernel_init=_conv_init, dtype=self.dtype,
                name="downsample_conv",
            )(x)
            if norm:
                identity = norm("downsample_bn")(identity)

        return nn.relu(out + identity)


class ResNetTrunk(nn.Module):
    """Returns the per-stage feature list [stem, layer1, ..., layer4][:num_stages+1].

    :param backbone 'resnet18' | 'resnet34'
    :param num_stages how many residual stages to run (0-4); the encoder's
        `num_layers` = num_stages + 1 feature maps are returned
    :param use_first_pool skip the stem maxpool when False
        (reference: conf/exp/sn64.conf use_first_pool=False for 64x64 inputs)
    """

    backbone: str = "resnet34"
    num_stages: int = 3
    use_first_pool: bool = True
    norm_type: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        norm = _make_norm(self.norm_type, self.dtype, train)
        blocks = STAGE_BLOCKS[self.backbone]

        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            kernel_init=_conv_init, dtype=self.dtype, name="conv1",
        )(x)
        if norm:
            x = norm("bn1")(x)
        x = nn.relu(x)
        latents = [x]

        for stage in range(self.num_stages):
            if stage == 0:
                if self.use_first_pool:
                    x = nn.max_pool(
                        x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
                    )
                stride = 1
            else:
                stride = 2
            for blk in range(blocks[stage]):
                x = BasicBlock(
                    filters=STAGE_CHANNELS[stage],
                    stride=stride if blk == 0 else 1,
                    norm_type=self.norm_type,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{blk}",
                )(x, train=train)
            latents.append(x)
        return latents


def port_torchvision_resnet(
    state_dict: Dict[str, Any], backbone: str = "resnet34", num_stages: int = 3
):
    """Convert a torchvision ResNet state_dict into (params, batch_stats).

    Accepts a dict of numpy arrays (or torch tensors) keyed torchvision-style
    ('conv1.weight', 'layer1.0.conv1.weight', 'bn1.running_mean', ...). Use
    this to reproduce the reference's pretrained=True encoder
    (src/model/encoder.py:62-68) when ImageNet weights are available locally.
    """

    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def conv_kernel(key):
        # torch OIHW -> flax HWIO
        return np.transpose(to_np(state_dict[key]), (2, 3, 1, 0))

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_bn(dst_p, dst_s, prefix):
        dst_p["scale"] = to_np(state_dict[prefix + ".weight"])
        dst_p["bias"] = to_np(state_dict[prefix + ".bias"])
        dst_s["mean"] = to_np(state_dict[prefix + ".running_mean"])
        dst_s["var"] = to_np(state_dict[prefix + ".running_var"])

    params["conv1"] = {"kernel": conv_kernel("conv1.weight")}
    params["bn1"] = {}
    stats["bn1"] = {}
    put_bn(params["bn1"], stats["bn1"], "bn1")

    blocks = STAGE_BLOCKS[backbone]
    for stage in range(num_stages):
        for blk in range(blocks[stage]):
            src = f"layer{stage + 1}.{blk}"
            dst = f"layer{stage + 1}_{blk}"
            p: Dict[str, Any] = {
                "conv1": {"kernel": conv_kernel(src + ".conv1.weight")},
                "conv2": {"kernel": conv_kernel(src + ".conv2.weight")},
                "bn1": {},
                "bn2": {},
            }
            s: Dict[str, Any] = {"bn1": {}, "bn2": {}}
            put_bn(p["bn1"], s["bn1"], src + ".bn1")
            put_bn(p["bn2"], s["bn2"], src + ".bn2")
            if src + ".downsample.0.weight" in state_dict:
                p["downsample_conv"] = {
                    "kernel": conv_kernel(src + ".downsample.0.weight")
                }
                p["downsample_bn"] = {}
                s["downsample_bn"] = {}
                put_bn(p["downsample_bn"], s["downsample_bn"], src + ".downsample.1")
            params[dst] = p
            stats[dst] = s
    return params, stats
