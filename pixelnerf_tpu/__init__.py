"""pixelnerf_tpu — a TPU-native few-shot conditional NeRF framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
etiiiR/pixel-nerf (PyTorch, CVPR'21 pixelNeRF + pollen-workload fork):

* pixel-aligned ResNet image encoder with feature-pyramid concat
  (reference: src/model/encoder.py)
* latent-conditioned ResNet-style NeRF MLP with cross-view pooling
  (reference: src/model/resnetfc.py)
* stratified coarse + inverse-CDF fine differentiable volume renderer
  (reference: src/render/nerf.py)
* SRN / DVR (NMR ShapeNet, DTU) / NeRF-synthetic dataset loaders
  (reference: src/data/)
* generic training loop, checkpointing, eval suite
  (reference: train/, eval/)

Design stance (see SURVEY.md §7): everything on the compute path is
functional and jit-compiled once — `encode()` returns an explicit
`SceneEncoding` pytree instead of module buffers; rendering is a pure
function `render_rays(params, encoding, rays, rng)`; scale-out is SPMD
via `jax.sharding.Mesh` + `shard_map`/pjit over (data, rays) axes instead
of torch DataParallel.
"""

__version__ = "0.1.0"

from pixelnerf_tpu.utils import config as config  # noqa: F401
