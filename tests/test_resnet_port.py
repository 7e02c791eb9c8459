"""ResNet trunk + torchvision weight porter vs a torch reference.

Builds the torchvision BasicBlock ResNet trunk directly in torch (the
reference consumes torchvision resnet18/34, src/model/encoder.py:62-68),
ports its state_dict through `port_torchvision_resnet`, and checks the
Flax trunk reproduces the torch features exactly (eval-mode BN) — this is
the path that reproduces the reference's pretrained=True encoder.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn_t = torch.nn

from pixelnerf_tpu.models.resnet import (
    STAGE_BLOCKS,
    ResNetTrunk,
    port_torchvision_resnet,
)


class _BasicBlock(nn_t.Module):
    """torchvision.models.resnet.BasicBlock, reproduced minimally."""

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn_t.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn_t.BatchNorm2d(planes)
        self.conv2 = nn_t.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn_t.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = nn_t.Sequential(
                nn_t.Conv2d(inplanes, planes, 1, stride, bias=False),
                nn_t.BatchNorm2d(planes),
            )

    def forward(self, x):
        idt = x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return torch.relu(out + idt)


class _TorchTrunk(nn_t.Module):
    def __init__(self, backbone="resnet18", num_stages=3, use_first_pool=True):
        super().__init__()
        blocks = STAGE_BLOCKS[backbone]
        chans = (64, 128, 256, 512)
        self.use_first_pool = use_first_pool
        self.num_stages = num_stages
        self.conv1 = nn_t.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn_t.BatchNorm2d(64)
        self.maxpool = nn_t.MaxPool2d(3, 2, 1)
        inp = 64
        for stage in range(num_stages):
            layers = []
            for blk in range(blocks[stage]):
                stride = (2 if stage > 0 else 1) if blk == 0 else 1
                layers.append(_BasicBlock(inp, chans[stage], stride))
                inp = chans[stage]
            setattr(self, f"layer{stage + 1}", nn_t.Sequential(*layers))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        feats = [x]
        for stage in range(self.num_stages):
            if stage == 0 and self.use_first_pool:
                x = self.maxpool(x)
            x = getattr(self, f"layer{stage + 1}")(x)
            feats.append(x)
        return feats


@pytest.mark.parametrize("use_first_pool", [True, False])
def test_trunk_matches_torch(use_first_pool):
    import jax.numpy as jnp

    torch.manual_seed(0)
    tm = _TorchTrunk("resnet18", num_stages=2, use_first_pool=use_first_pool)
    # random running stats so eval-mode BN is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn_t.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)
    tm.eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = [f.numpy() for f in tm(torch.from_numpy(x))]

    params, stats = port_torchvision_resnet(
        tm.state_dict(), backbone="resnet18", num_stages=2
    )
    trunk = ResNetTrunk(backbone="resnet18", num_stages=2,
                        use_first_pool=use_first_pool)
    got = trunk.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        train=False,
    )
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(
            np.transpose(np.asarray(g), (0, 3, 1, 2)), r, rtol=2e-4, atol=2e-4
        )


def test_port_cli_roundtrip(tmp_path):
    """port_encoder_weights CLI: .npz state_dict -> experiment checkpoint."""
    import flax.serialization
    import jax
    import jax.numpy as jnp

    from pixelnerf_tpu.models.encoder import SpatialEncoder
    from pixelnerf_tpu.tools.port_encoder_weights import main as port_main
    from pixelnerf_tpu.utils.checkpoint import save_pytree

    torch.manual_seed(1)
    tm = _TorchTrunk("resnet18", num_stages=2)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    npz = tmp_path / "weights.npz"
    np.savez(str(npz), **sd)

    enc = SpatialEncoder(backbone="resnet18", pretrained=False, num_layers=3)
    x = jnp.zeros((1, 32, 32, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    ckpt = tmp_path / "pixel_nerf_latest"
    # wrap like a model checkpoint: encoder/model subtree
    tree = {
        "params": {"encoder": flax.serialization.to_state_dict(variables["params"])},
        "batch_stats": {
            "encoder": flax.serialization.to_state_dict(variables["batch_stats"])
        },
    }
    save_pytree(str(ckpt), tree)

    port_main([
        "--weights", str(npz), "--backbone", "resnet18", "--num_stages", "2",
        "--checkpoint", str(ckpt),
    ])

    with open(ckpt, "rb") as f:
        restored = flax.serialization.msgpack_restore(f.read())
    got = restored["params"]["encoder"]["model"]["conv1"]["kernel"]
    want = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(np.asarray(got), want)
