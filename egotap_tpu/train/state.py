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


def merge_partial_weights(target, source, parts) -> tuple:
    """Update leaves of ``target`` whose tree path contains any substring in
    ``parts`` with the same-path, same-shape leaf from ``source``.

    The JAX equivalent of the reference's cross-experiment transfer
    ``load_partial_weights`` (model/base_model.py:150-162): substring key
    filter + non-strict load — keys missing from the source or with
    mismatched shapes are silently kept from the target, matching
    ``load_state_dict(..., strict=False)``.

    Returns (merged_tree, loaded_paths).
    """
    flat_src = {
        "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(source)[0]}
    loaded = []

    def pick(path, leaf):
        key = "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                       for k in path)
        if any(part in key for part in parts):
            src = flat_src.get(key)
            if src is not None and np.shape(src) == np.shape(leaf):
                loaded.append(key)
                return jnp.asarray(src)
        return leaf

    merged = jax.tree_util.tree_map_with_path(pick, target)
    return merged, loaded


def load_partial_weights(target, checkpoint_path: str, parts,
                         convert: Optional[str] = None):
    """Load a checkpoint (orbax dir or converted ``.pth``) and merge the
    leaves matching ``parts`` substrings into ``target`` (a variables tree).

    convert: for ``.pth`` files, which converter to run first —
    "heatmap_net" / "lifter" / a resnet model name; orbax checkpoints are
    used as-is. Returns (merged_tree, loaded_paths)."""
    if os.path.isdir(checkpoint_path):
        with ocp.PyTreeCheckpointer() as ckptr:
            source = ckptr.restore(os.path.abspath(checkpoint_path))
    else:
        from egotap_tpu.compat.convert import (convert_heatmap_net,
                                               convert_lifter)
        from egotap_tpu.compat.torch_loader import load_torch_checkpoint
        state_dict = load_torch_checkpoint(checkpoint_path)
        if convert == "lifter":
            source = convert_lifter(state_dict)
        else:
            source = convert_heatmap_net(state_dict, convert or "resnet18")
    return merge_partial_weights(target, source, parts)
