"""LPIPS (VGG16) perceptual distance in JAX.

The reference computes LPIPS with the `lpips` package
(reference: eval/calc_metrics.py:150-156,188-191 — `lpips.LPIPS(net="vgg")`
on [-1, 1] NCHW pairs). Neither the package nor its pretrained weights
exist in this environment, so this module implements the same math
natively (XLA convs, runs on CPU or TPU) plus a porter for the torch
state dicts, making LPIPS one command away the moment a weight file
appears (see tools/port_lpips_weights.py).

The computation (lpips v0.1, net='vgg', spatial=False):

1. scale inputs: (x - shift) / scale per channel (ImageNet statistics
   re-expressed for [-1, 1] inputs; constants below are the package's
   ScalingLayer buffers),
2. VGG16 feature taps after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3,
3. channel-unit-normalize each tap (x / sqrt(sum_c x^2 + 1e-10)),
4. squared difference of normalized taps,
5. per-tap 1x1 non-negative linear head to 1 channel ("lin" layers),
6. spatial mean, sum over the 5 taps.

Parameters are a plain dict pytree:
    {"convs": [(w (kh,kw,ci,co), b (co,)) x 13], "lins": [w (c_l,) x 5]}
(13 VGG16 convs; lin weights are diagonal-free 1x1 convs stored as their
channel vector). `lpips_distance` is jittable; `lpips_pairwise` wraps it
for numpy NCHW pairs.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

__all__ = [
    "VGG_CFG",
    "TAPS",
    "random_params",
    "lpips_distance",
    "make_lpips",
    "params_from_state_dicts",
    "load_params",
    "default_weights_path",
]

# VGG16 convolution plan: (out_channels, maxpool_before) per conv, in order
VGG_CFG = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]
# feature taps AFTER the relu of these conv indices (0-based):
# relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
TAPS = (1, 3, 6, 9, 12)
_TAP_CHANNELS = (64, 128, 256, 512, 512)

# lpips.ScalingLayer buffers (inputs already in [-1, 1])
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


def default_weights_path() -> str:
    """Weight-file search path: $PIXELNERF_LPIPS_WEIGHTS or the cache dir."""
    env = os.environ.get("PIXELNERF_LPIPS_WEIGHTS")
    if env:
        return env
    return os.path.expanduser("~/.cache/pixelnerf_tpu/lpips_vgg.npz")


def random_params(seed: int = 0) -> Dict:
    """Random-weight parameter pytree (tests; NOT a perceptual metric)."""
    rng = np.random.default_rng(seed)
    convs = []
    cin = 3
    for cout, _pool in VGG_CFG:
        w = rng.normal(0, (2.0 / (9 * cin)) ** 0.5, (3, 3, cin, cout))
        b = rng.normal(0, 0.01, (cout,))
        convs.append((w.astype(np.float32), b.astype(np.float32)))
        cin = cout
    lins = [
        np.abs(rng.normal(0, 0.05, (c,))).astype(np.float32)
        for c in _TAP_CHANNELS
    ]
    return {"convs": convs, "lins": lins}


def lpips_distance(params: Dict, im1, im2):
    """LPIPS distance for a batch of [-1, 1] NHWC image pairs -> (N,).

    Jittable; cite reference eval/calc_metrics.py:150-156 for the metric's
    role in the eval pipeline.
    """
    import jax.numpy as jnp
    from jax import lax

    def scale(x):
        return (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)

    def taps(x):
        feats = []
        for i, ((w, b), (cout, pool)) in enumerate(
            zip(params["convs"], VGG_CFG)
        ):
            if pool:
                x = lax.reduce_window(
                    x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
            x = lax.conv_general_dilated(
                x, jnp.asarray(w), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(b)
            x = jnp.maximum(x, 0.0)
            if i in TAPS:
                feats.append(x)
        return feats

    def unit(x):
        return x * lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-10)

    f1 = taps(scale(im1))
    f2 = taps(scale(im2))
    total = 0.0
    for a, b, lin in zip(f1, f2, params["lins"]):
        d = (unit(a) - unit(b)) ** 2
        total = total + jnp.mean(
            jnp.sum(d * jnp.asarray(lin), axis=-1), axis=(1, 2)
        )
    return total


def make_lpips(params: Dict):
    """(im1, im2 numpy NCHW [-1,1]) -> float, jitted once (reference
    lpips.LPIPS.__call__ signature used by calc_metrics)."""
    import jax
    import jax.numpy as jnp

    dist = jax.jit(lambda a, b: lpips_distance(params, a, b))

    def _fn(im1: np.ndarray, im2: np.ndarray) -> float:
        a = jnp.asarray(
            np.transpose(np.asarray(im1, np.float32), (0, 2, 3, 1))
        )
        b = jnp.asarray(
            np.transpose(np.asarray(im2, np.float32), (0, 2, 3, 1))
        )
        return float(np.mean(np.asarray(dist(a, b))))

    return _fn


def _sorted_conv_items(sd: Dict[str, np.ndarray]) -> List[np.ndarray]:
    """Extract the 13 VGG conv (weight, bias) pairs from a state dict in
    layer order. Accepts torchvision layout (features.<i>.weight) and the
    lpips full-model layout (net.slice<k>.<i>.weight — lpips preserves the
    torchvision indices when slicing, pretrained_networks.py)."""
    ws = {}
    bs = {}
    for k, v in sd.items():
        parts = k.split(".")
        if parts[-1] not in ("weight", "bias"):
            continue
        v = np.asarray(v)
        if parts[-1] == "weight" and v.ndim != 4:
            continue
        if "lin" in k:
            continue
        try:
            idx = int(parts[-2])
        except ValueError:
            continue
        (ws if parts[-1] == "weight" else bs)[idx] = v
    order = sorted(ws)
    if len(order) != len(VGG_CFG):
        raise ValueError(
            f"expected {len(VGG_CFG)} VGG convs, found {len(order)}"
        )
    out = []
    for idx in order:
        w = ws[idx]  # torch (co, ci, kh, kw) -> HWIO
        out.append(
            (
                np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
                bs[idx].astype(np.float32),
            )
        )
    return out


def _lin_vectors(sd: Dict[str, np.ndarray]) -> List[np.ndarray]:
    """lin<k>.model.1.weight (1, C, 1, 1) -> (C,) vectors, k = 0..4."""
    lins = {}
    for k, v in sd.items():
        if "lin" not in k or not k.endswith("weight"):
            continue
        head = k.split(".")[0]
        if not head.startswith("lin"):
            continue
        lins[int(head[3:])] = np.asarray(v).reshape(-1).astype(np.float32)
    if sorted(lins) != list(range(5)):
        raise ValueError(f"expected lin0..lin4 heads, found {sorted(lins)}")
    return [lins[i] for i in range(5)]


def params_from_state_dicts(
    vgg_sd: Dict[str, np.ndarray],
    lin_sd: Optional[Dict[str, np.ndarray]] = None,
) -> Dict:
    """Build the parameter pytree from torch state dicts.

    :param vgg_sd torchvision vgg16 (features.*) OR a full lpips.LPIPS
        state dict (net.slice*), which may also contain the lin heads
    :param lin_sd the lpips linear-head state dict (lin*.model.1.weight)
        when not already inside vgg_sd
    """
    convs = _sorted_conv_items(vgg_sd)
    src = lin_sd if lin_sd is not None else vgg_sd
    lins = _lin_vectors(src)
    for lin, c in zip(lins, _TAP_CHANNELS):
        if lin.shape[0] != c:
            raise ValueError(f"lin head size {lin.shape[0]} != {c}")
    return {"convs": convs, "lins": lins}


def load_params(path: Optional[str] = None) -> Optional[Dict]:
    """Load a ported .npz (tools/port_lpips_weights.py); None if absent."""
    path = path or default_weights_path()
    if not os.path.exists(path):
        return None
    z = np.load(path)
    convs = [
        (z[f"conv{i}_w"], z[f"conv{i}_b"]) for i in range(len(VGG_CFG))
    ]
    lins = [z[f"lin{i}"] for i in range(5)]
    return {"convs": convs, "lins": lins}
