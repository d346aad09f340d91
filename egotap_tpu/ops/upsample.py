"""Bilinear upsampling with align_corners=True as banded matmuls.

The reference decoder uses ``nn.Upsample(scale_factor=2, mode='bilinear',
align_corners=True)`` (reference model/net_architecture.py:126).
``jax.image.resize`` implements half-pixel-center sampling only, so the
align-corners variant is expressed exactly as two precomputed 1-D
interpolation matrices applied along H and W — small dense matmuls that run
on the MXU and fuse with the surrounding convolutions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) align-corners linear interpolation matrix."""
    W = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        W[:, 0] = 1.0
        return W
    src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    W[np.arange(out_size), lo] += 1.0 - frac
    W[np.arange(out_size), hi] += frac
    return W


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """Exact ``Upsample(scale_factor=2, bilinear, align_corners=True)``.

    x: (..., H, W, C) NHWC. Returns (..., 2H, 2W, C).

    Precision: HIGHEST for f32 inputs (checkpoint-parity eval path);
    default for bf16 (the interpolation error is below bf16 activation
    granularity anyway, and the multi-pass f32 emulation costs ~8% of the
    heatmap stage).
    """
    h, w = x.shape[-3], x.shape[-2]
    Wh = jnp.asarray(_interp_matrix(h, 2 * h))
    Ww = jnp.asarray(_interp_matrix(w, 2 * w))
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    x = jnp.einsum("oh,...hwc->...owc", Wh.astype(x.dtype), x, precision=prec)
    x = jnp.einsum("pw,...owc->...opc", Ww.astype(x.dtype), x, precision=prec)
    return x
