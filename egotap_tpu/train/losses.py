"""Loss functions (pure jnp), reference-parity semantics.

  * `mpjpe`: mean per-joint L2 (reference utils/loss.py:79-85).
  * `cos_sim`: summed bone-direction cosine similarity; used with a
    NEGATIVE lambda so training maximizes alignment
    (reference utils/loss.py:44-77; lambda_cos_sim = -0.01).
  * `heatmap_mse` / `limb_heatmap_mse`: stage-1 targets; limb maps are
    normalized by sqrt(pixel length) on both sides
    (reference model/heatmap_shared_model.py:110-153).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

COS_EPS = 1e-8  # torch.nn.CosineSimilarity default


def mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean L2 over joints and batch. pred/gt (..., J, 3) in cm."""
    return jnp.mean(jnp.linalg.norm(gt - pred, axis=-1))


def per_sample_mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """(B, J, 3) -> (B,) per-sample mean joint error."""
    return jnp.mean(jnp.linalg.norm(gt - pred, axis=-1), axis=-1)


def _bone_vectors(pose: jnp.ndarray, parents) -> jnp.ndarray:
    parents = jnp.asarray(parents)
    return (pose - pose[..., parents, :])[..., 1:, :]


def cos_sim(pred: jnp.ndarray, gt: jnp.ndarray, parents,
            estimate_head: bool = True) -> jnp.ndarray:
    """Summed cosine similarity of bone vectors (mean over batch).

    When the root is not estimated (EgoCap), a zero root row is prepended
    to both poses and the first bone is dropped from the sum
    (reference utils/loss.py:54-77).
    """
    if not estimate_head:
        zeros = jnp.zeros(pred.shape[:-2] + (1, 3), dtype=pred.dtype)
        pred = jnp.concatenate([zeros, pred], axis=-2)
        gt = jnp.concatenate([jnp.zeros_like(zeros), gt], axis=-2)
    bp = _bone_vectors(pred, parents)
    bg = _bone_vectors(gt, parents)
    # torch.nn.CosineSimilarity: x.y / (max(|x|,eps) * max(|y|,eps))
    np_ = jnp.maximum(jnp.linalg.norm(bp, axis=-1), COS_EPS)
    ng_ = jnp.maximum(jnp.linalg.norm(bg, axis=-1), COS_EPS)
    cos = jnp.sum(bp * bg, axis=-1) / (np_ * ng_)
    if not estimate_head:
        cos = cos[..., 1:]
    return jnp.mean(jnp.sum(cos, axis=-1))


def heatmap_mse(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def limb_heatmap_mse(pred: jnp.ndarray, gt: jnp.ndarray,
                     plength: jnp.ndarray, channel_axis: int = -1
                     ) -> jnp.ndarray:
    """MSE of sqrt(pixel-length)-normalized limb maps.

    pred/gt: heatmaps with the limb-channel axis at `channel_axis`
    (NHWC default: -1); plength: (..., L) per-channel pixel lengths.
    """
    if channel_axis in (-1, pred.ndim - 1):
        norm = jnp.sqrt(plength)[..., None, None, :]
    else:
        norm = jnp.sqrt(plength)[..., None, None]
    return jnp.mean(((pred - gt) / norm) ** 2)


def bone_length_loss(pred: jnp.ndarray, gt: jnp.ndarray, parents
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cos, length) limb loss pair (reference utils/loss.py:21-42;
    instantiated but unused in the shipped configs — provided for parity)."""
    bp = _bone_vectors(pred, parents)
    bg = _bone_vectors(gt, parents)
    np_ = jnp.maximum(jnp.linalg.norm(bp, axis=-1), COS_EPS)
    ng_ = jnp.maximum(jnp.linalg.norm(bg, axis=-1), COS_EPS)
    cos = jnp.mean(jnp.sum(jnp.sum(bp * bg, axis=-1) / (np_ * ng_), axis=-1))
    length = jnp.mean(jnp.sum((np_ - ng_) ** 2, axis=-1))
    return cos, length


def l1_regularizer(params) -> jnp.ndarray:
    """Sum of absolute values over a parameter pytree (reference
    utils/loss.py:15-19 — defined upstream but never invoked by any
    shipped config; provided for drop-in parity with custom recipes)."""
    import jax
    return sum(jnp.sum(jnp.abs(p)) for p in jax.tree.leaves(params))
