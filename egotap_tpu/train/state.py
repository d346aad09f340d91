"""Train state + checkpoint I/O (Orbax native, .pth import).

Checkpoint layout mirrors the reference's tag scheme
({epoch|best|nan|inf}_net_{Name}.pth, reference model/base_model.py:64-114)
as Orbax directories ``{experiment_dir}/ckpt_{tag}`` holding the full
state; previous epoch checkpoints are deleted on save like the reference.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    frozen: Any  # non-optimized subnet variables (e.g. pretrained heatmap nets)


def _ckpt_dir(experiment_dir: str, tag) -> str:
    return os.path.abspath(os.path.join(experiment_dir, f"ckpt_{tag}"))


def save_checkpoint(experiment_dir: str, tag, state: TrainState,
                    keep_previous: bool = False) -> str:
    path = _ckpt_dir(experiment_dir, tag)
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state))
    # reference deletes the previous epoch's files on save (:95-114)
    if isinstance(tag, int) and tag > 1 and not keep_previous:
        prev = _ckpt_dir(experiment_dir, tag - 1)
        if os.path.exists(prev):
            shutil.rmtree(prev)
    return path


def load_checkpoint(experiment_dir: str, tag,
                    template: TrainState,
                    restore_opt_state: bool = True) -> TrainState:
    """Restore a checkpoint. With restore_opt_state=False only the model
    variables (params/batch_stats/frozen/step) are taken and the template's
    optimizer state is kept — evaluation must not depend on the training
    optimizer (e.g. testing an AdamW-trained run from an Adam-configured
    process)."""
    path = _ckpt_dir(experiment_dir, tag)
    with ocp.PyTreeCheckpointer() as ckptr:
        if restore_opt_state:
            restored = ckptr.restore(path, item=jax.device_get(template))
            return jax.tree.map(jnp.asarray, restored)
        raw = ckptr.restore(path)
    as_arr = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
    return template.replace(
        step=jnp.asarray(raw["step"]),
        params=as_arr(raw["params"]),
        batch_stats=as_arr(raw["batch_stats"]),
        frozen=as_arr(raw["frozen"]),
    )


def checkpoint_exists(experiment_dir: str, tag) -> bool:
    return os.path.isdir(_ckpt_dir(experiment_dir, tag))
