"""Batched Procrustes (similarity-transform) alignment for PA-MPJPE.

Reference: ``batch_compute_similarity_transform_torch``
(utils/util.py:328-379). The 3x3 SVD runs per sample; sign conventions do
not matter because R = V Z U^T is invariant to the paired column-sign
ambiguity of the SVD, so jnp.linalg.svd matches torch.svd bit-for-bit in
the result.

f64 note: the covariance K is accumulated in f32 but the SVD runs in f64 on
CPU-backed eval... on TPU jnp.linalg.svd is f32; adequate for mm-scale
metrics (unit-tested to 1e-4 vs the torch oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def similarity_align(S1: jnp.ndarray, S2: jnp.ndarray) -> jnp.ndarray:
    """Align S1 to S2 with a per-sample scaled rotation + translation.

    S1, S2: (B, J, 3) point sets. Returns S1_hat (B, J, 3).
    """
    # work in (B, 3, J) like the reference
    X1 = jnp.swapaxes(S1, -1, -2)
    X2 = jnp.swapaxes(S2, -1, -2)

    mu1 = X1.mean(axis=-1, keepdims=True)
    mu2 = X2.mean(axis=-1, keepdims=True)
    X1c = X1 - mu1
    X2c = X2 - mu2

    var1 = jnp.sum(X1c ** 2, axis=(-1, -2))

    K = jnp.einsum("bij,bkj->bik", X1c, X2c,
                   precision=jax.lax.Precision.HIGHEST)

    U, _, Vh = jnp.linalg.svd(K)
    V = jnp.swapaxes(Vh, -1, -2)

    det = jnp.linalg.det(jnp.einsum("bij,bkj->bik", U, V,
                                    precision=jax.lax.Precision.HIGHEST))
    Z = jnp.broadcast_to(jnp.eye(3, dtype=S1.dtype), K.shape).copy()
    Z = Z.at[:, -1, -1].set(jnp.sign(det))

    R = V @ Z @ jnp.swapaxes(U, -1, -2)

    scale = jnp.trace(R @ K, axis1=-2, axis2=-1) / var1
    t = mu2 - scale[:, None, None] * (R @ mu1)
    S1_hat = scale[:, None, None] * (R @ X1) + t
    return jnp.swapaxes(S1_hat, -1, -2)
