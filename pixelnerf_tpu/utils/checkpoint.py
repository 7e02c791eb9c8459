"""Checkpoint I/O with latest/backup/init semantics.

Mirrors the reference's crash-safe checkpoint layout under
checkpoints/<exp>/ (reference src/model/models.py:268-316,
train/trainlib/trainer.py:67-114, 202-215):

* pixel_nerf_latest  — model variables (params + batch_stats)
* pixel_nerf_init    — optional warm-start checkpoint
* pixel_nerf_backup  — previous latest, copied before each overwrite
* _optim             — optimizer state
* _iter              — {"iter": step, "epoch": epoch}
* _lrsched           — lr-schedule state (epoch counter)

Serialization is flax msgpack (to_bytes/from_bytes) against a live target
pytree, so layouts are validated on load.
"""

from __future__ import annotations

import json
import os
from shutil import copyfile
from typing import Any, Optional

import flax.serialization

__all__ = [
    "save_pytree",
    "load_pytree",
    "save_model_weights",
    "load_model_weights",
]


def save_pytree(path: str, tree: Any) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(tree))
    os.replace(tmp, path)


def load_pytree(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(target, f.read())


def _ckpt_paths(checkpoints_path: str, name: str, opt_init: bool):
    ckpt_name = "pixel_nerf_init" if opt_init else "pixel_nerf_latest"
    backup_name = "pixel_nerf_init_backup" if opt_init else "pixel_nerf_backup"
    d = os.path.join(checkpoints_path, name)
    return os.path.join(d, ckpt_name), os.path.join(d, backup_name)


def save_model_weights(
    variables: Any, checkpoints_path: str, name: str, opt_init: bool = False
) -> str:
    """Save model variables, backing up the previous checkpoint first
    (reference models.py:300-316)."""
    ckpt_path, backup_path = _ckpt_paths(checkpoints_path, name, opt_init)
    os.makedirs(os.path.dirname(ckpt_path), exist_ok=True)
    if os.path.exists(ckpt_path):
        copyfile(ckpt_path, backup_path)
    save_pytree(ckpt_path, variables)
    return ckpt_path


def load_model_weights(
    variables: Any,
    checkpoints_path: str,
    name: str,
    resume: bool = False,
    opt_init: bool = False,
) -> Any:
    """Load weights per the reference's resume rules (models.py:268-298):
    init checkpoint when not resuming (if present), else latest."""
    if opt_init and not resume:
        return variables
    ckpt_name = "pixel_nerf_init" if (opt_init or not resume) else "pixel_nerf_latest"
    path = os.path.join(checkpoints_path, name, ckpt_name)
    if os.path.exists(path):
        print("Load", path)
        return load_pytree(path, variables)
    if not opt_init and resume:
        import warnings

        warnings.warn(
            f"WARNING: {path} does not exist, not loaded!! "
            "Model will be re-initialized."
        )
    return variables
