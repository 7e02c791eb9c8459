"""Loss configuration wiring: RGB losses, uncertainty rejection, alpha loss.

Reference: src/model/loss.py; the reference configures uncertainty/alpha
losses but never wires them into a train script (train/train.py:111-116) —
here use_uncertainty is REJECTED at config-parse time with a clear error
and the NV2 alpha regularizer IS wired into the train step (VERDICT r1 #6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pixelnerf_tpu.models.losses import (
    ConfigError,
    alpha_loss_from_conf,
    alpha_loss_nv2,
    l1_loss,
    mse_loss,
    rgb_loss_from_conf,
    rgb_with_uncertainty,
)
from pixelnerf_tpu.utils.hocon import ConfigTree


def test_rgb_loss_selection():
    assert rgb_loss_from_conf(ConfigTree({"use_l1": False})) is mse_loss
    assert rgb_loss_from_conf(ConfigTree({"use_l1": True})) is l1_loss


def test_use_uncertainty_rejected_with_clear_error():
    conf = ConfigTree({"use_uncertainty": True})
    # coarse head never uses uncertainty (reference loss.py:91-103)
    assert rgb_loss_from_conf(conf, coarse=True) is mse_loss
    with pytest.raises(ConfigError, match="use_uncertainty"):
        rgb_loss_from_conf(conf, coarse=False)
    # library users threading betas themselves can opt in
    fn = rgb_loss_from_conf(conf, coarse=False, allow_uncertainty=True)
    out = fn(jnp.zeros((4, 3)), jnp.ones((4, 3)), jnp.ones((4,)))
    np.testing.assert_allclose(float(out), 1.0, atol=1e-6)


def test_rgb_with_uncertainty_value():
    # beta=1: mean squared error + log(1) = mse
    o = jnp.asarray([[0.5, 0.5, 0.5]])
    t = jnp.asarray([[0.0, 1.0, 0.0]])
    betas = jnp.ones((1,))
    np.testing.assert_allclose(
        float(rgb_with_uncertainty(o, t, betas)), 0.25, atol=1e-6
    )


def test_alpha_loss_from_conf_disabled():
    assert alpha_loss_from_conf(None) == (None, 0)
    assert alpha_loss_from_conf(ConfigTree({"lambda_alpha": 0.0})) == (None, 0)


def test_alpha_loss_epoch_gate_and_value():
    fn, init_epoch = alpha_loss_from_conf(
        ConfigTree({"lambda_alpha": 0.1, "clamp_alpha": 50, "init_epoch": 5})
    )
    assert init_epoch == 5
    a = jnp.asarray([0.5, 0.9, 0.1])
    assert float(fn(a, epoch=0)) == 0.0  # gated before init_epoch
    val = float(fn(a, epoch=5))
    expect = 0.1 * float(
        jnp.mean(
            jnp.maximum(
                jnp.log(jnp.clip(a, 0.01, 0.99))
                + jnp.log(1 - jnp.clip(a, 0.01, 0.99)),
                -50.0,
            )
        )
    )
    np.testing.assert_allclose(val, expect, rtol=1e-6)
    # force_opaque: BCE toward alpha=1 — lower loss for higher alpha
    lo = float(alpha_loss_nv2(jnp.asarray([0.2]), 1.0, 100, 9, 0, True))
    hi = float(alpha_loss_nv2(jnp.asarray([0.9]), 1.0, 100, 9, 0, True))
    assert hi < lo


def test_train_step_wires_alpha_loss(rng):
    """make_train_step(alpha_loss_fn=...) adds the 'ra' aux term and the
    total includes it; gradients stay finite."""
    from pixelnerf_tpu.models.pixelnerf import make_model
    from pixelnerf_tpu.render.renderer import RendererConfig
    from pixelnerf_tpu.train.step import create_train_state, make_train_step
    from pixelnerf_tpu.utils import hocon
    from pixelnerf_tpu.utils.config import PROJECT_ROOT
    import os

    conf = hocon.load(os.path.join(PROJECT_ROOT, "conf", "default.conf"))
    conf["model"]["mlp_coarse"]["d_hidden"] = 16
    conf["model"]["mlp_fine"]["d_hidden"] = 16
    conf["model"]["encoder"]["backbone"] = "resnet18"
    conf["model"]["encoder"]["num_layers"] = 2
    model = make_model(conf["model"])
    rcfg = RendererConfig(n_coarse=6, n_fine=4, n_fine_depth=2)

    SB, NV, NS, H, W, R = 1, 2, 1, 16, 16, 8
    imgs = jnp.asarray(rng.uniform(-1, 1, (SB, NV, H, W, 3)).astype(np.float32))
    poses = np.tile(np.eye(4, dtype=np.float32), (SB, NV, 1, 1))
    poses[..., 2, 3] = 1.3
    batch = dict(
        images=imgs, poses=jnp.asarray(poses),
        focal=jnp.full((SB, 2), float(W)), c=jnp.full((SB, 2), W / 2.0),
        src_images=imgs[:, :NS], src_poses=jnp.asarray(poses[:, :NS]),
    )
    variables = model.init(
        jax.random.PRNGKey(0), batch["src_images"], batch["src_poses"],
        batch["focal"], jnp.zeros((SB, 8, 3)), viewdirs=jnp.zeros((SB, 8, 3)),
    )
    tx = optax.adam(1e-3)
    state = create_train_state(variables, tx)

    fn, init_epoch = alpha_loss_from_conf(
        ConfigTree({"lambda_alpha": 0.05, "clamp_alpha": 50, "init_epoch": 0})
    )
    step = jax.jit(
        make_train_step(
            model, rcfg, tx, num_rays=R, z_near=0.8, z_far=1.8,
            nviews=NS, alpha_loss_fn=lambda a: fn(a, init_epoch),
        )
    )
    new_state, aux = step(state, batch, jax.random.PRNGKey(1))
    assert "ra" in aux
    assert np.isfinite(float(aux["t"]))
    np.testing.assert_allclose(
        float(aux["t"]),
        float(aux["rc"]) + float(aux["rf"]) + float(aux["ra"]),
        rtol=1e-5,
    )
