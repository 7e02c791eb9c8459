"""Training losses (reference: src/model/loss.py).

Pure functions over arrays; configuration resolved host-side.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

__all__ = [
    "ConfigError",
    "rgb_loss_from_conf",
    "alpha_loss_from_conf",
    "mse_loss",
    "l1_loss",
    "rgb_with_uncertainty",
    "rgb_with_background",
    "alpha_loss_nv2",
]


class ConfigError(ValueError):
    """A config requests behavior the training step does not wire."""


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def rgb_loss_from_conf(
    conf, coarse: bool = True, allow_uncertainty: bool = False
) -> Callable:
    """reference loss.py:91-103 (uncertainty branch applies to fine only).

    `use_uncertainty` needs a 5-channel field head and per-ray beta
    threading that the training step does not wire (the reference's train
    scripts never wire it either — train/train.py:111-116 builds only the
    plain RGB losses). Rejected here with a clear error at config-parse
    time instead of a delayed TypeError mid-step; callers that thread
    betas themselves (the 3-arg `rgb_with_uncertainty`) pass
    allow_uncertainty=True.
    """
    if conf.get_bool("use_uncertainty", False) and not coarse:
        if not allow_uncertainty:
            raise ConfigError(
                "loss.rgb*.use_uncertainty requires a beta (uncertainty) "
                "head the training step does not provide; use "
                "rgb_with_uncertainty directly with your own beta "
                "threading, or drop the key (the reference train scripts "
                "never wire it either: train/train.py:111-116)"
            )
        return rgb_with_uncertainty_from_conf(conf)
    return l1_loss if conf.get_bool("use_l1", False) else mse_loss


def alpha_loss_from_conf(conf):
    """Build the Neural-Volumes opacity regularizer from a `loss.alpha`
    subtree (lambda_alpha / clamp_alpha / init_epoch, reference
    conf/exp/pollen.conf:73-79). Returns (fn(alpha, epoch) -> scalar,
    init_epoch) or (None, 0) when disabled. The reference configures this
    loss but never wires it into a train script; here the training CLI
    applies it to the finest head's composited alpha once
    epoch >= init_epoch (host-side gate, reference loss.py:29-33).
    """
    if conf is None:
        return None, 0
    lambda_alpha = conf.get_float("lambda_alpha", 0.0)
    if lambda_alpha <= 0.0:
        return None, 0
    clamp_alpha = conf.get_float("clamp_alpha", 100.0)
    init_epoch = conf.get_int("init_epoch", 5)
    force_opaque = conf.get_bool("force_opaque", False)

    def fn(alpha: jnp.ndarray, epoch: int) -> jnp.ndarray:
        return alpha_loss_nv2(
            alpha, lambda_alpha, clamp_alpha, epoch, init_epoch,
            force_opaque=force_opaque,
        )

    return fn, init_epoch


def rgb_with_uncertainty(
    outputs: jnp.ndarray, targets: jnp.ndarray, betas: jnp.ndarray, use_l1: bool = False
) -> jnp.ndarray:
    """Kendall'17 heteroscedastic loss (reference loss.py:51-68).

    :param outputs (B, 3), targets (B, 3), betas (B)
    """
    elem = jnp.abs(outputs - targets) if use_l1 else (outputs - targets) ** 2
    weighted = jnp.mean(elem, axis=-1) / betas
    return jnp.mean(weighted) + jnp.mean(jnp.log(betas))


def rgb_with_uncertainty_from_conf(conf):
    use_l1 = conf.get_bool("use_l1", False)

    def fn(outputs, targets, betas):
        return rgb_with_uncertainty(outputs, targets, betas, use_l1=use_l1)

    return fn


def rgb_with_background(
    outputs: jnp.ndarray, targets: jnp.ndarray, lambda_bg: jnp.ndarray,
    use_l1: bool = False,
) -> jnp.ndarray:
    """reference loss.py:71-88."""
    elem = jnp.abs(outputs - targets) if use_l1 else (outputs - targets) ** 2
    weighted = jnp.mean(elem, axis=-1) / (1.0 + lambda_bg)
    return jnp.mean(weighted) + jnp.mean(jnp.log(lambda_bg))


def alpha_loss_nv2(
    alpha_fine: jnp.ndarray,
    lambda_alpha: float,
    clamp_alpha: float,
    epoch: int,
    init_epoch: int,
    force_opaque: bool = False,
) -> jnp.ndarray:
    """Neural Volumes opacity regularizer with epoch gate
    (reference loss.py:4-48). Epoch gating is a host-side condition.
    """
    if lambda_alpha <= 0.0 or epoch < init_epoch:
        return jnp.zeros(())
    a = jnp.clip(alpha_fine, 0.01, 0.99)
    if force_opaque:
        # BCE against all-ones target
        loss = -jnp.log(a)
        return lambda_alpha * jnp.mean(loss)
    loss = jnp.log(a) + jnp.log(1.0 - a)
    loss = jnp.maximum(loss, -clamp_alpha)
    return lambda_alpha * jnp.mean(loss)
