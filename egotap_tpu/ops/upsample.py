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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


import os

# The one-pass Pallas kernel is shipped OFF: despite halving nominal HBM
# traffic it measured a net LOSS at every decoder grid in-context
# (bench.py 1272 -> 1126 pairs/s all-sizes, 1234 gated to <=16; isolated
# two-pass einsums fuse with their producers, the pallas_call does not).
# Kept parity-tested as the documented dead end; opt in to re-measure.
ONE_PASS_ENABLE = bool(int(os.environ.get("EGOTAP_UPSAMPLE_ONE_PASS", "0")))


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


def _upsample_two_pass(x: jnp.ndarray) -> jnp.ndarray:
    """Reference formulation: two banded einsums (H then W). Exact for
    f32 (HIGHEST precision); materializes the (..., 2H, W, C) intermediate
    in HBM, which makes it bandwidth-bound at ~2x the minimal traffic."""
    h, w = x.shape[-3], x.shape[-2]
    Wh = jnp.asarray(_interp_matrix(h, 2 * h))
    Ww = jnp.asarray(_interp_matrix(w, 2 * w))
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    x = jnp.einsum("oh,...hwc->...owc", Wh.astype(x.dtype), x, precision=prec)
    x = jnp.einsum("pw,...owc->...opc", Ww.astype(x.dtype), x, precision=prec)
    return x


@functools.lru_cache(maxsize=None)
def _lerp_taps(in_size: int) -> tuple:
    """Static 2-tap (lo, hi, frac) vectors for 2x align-corners."""
    if in_size == 1:
        return ((0,), (0,), (0.0,))
    src = np.arange(2 * in_size) * (in_size - 1) / (2 * in_size - 1)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    return tuple(lo), tuple(hi), tuple(frac)


def _upsample_kernel(x_ref, o_ref, a_ref, *, h: int, w: int):
    """One-pass 2x bilinear upsample for one (image, channel-block) cell.

    Each output row/column is a 2-tap lerp of input rows/columns with
    STATIC indices and weights, so both separable passes are unrolled
    VPU slice-lerps in VMEM — no MXU matmuls (K would be the tiny spatial
    dim), no transposes, and the doubled-H intermediate never leaves VMEM.
    """
    x = x_ref[0]                                     # (H, W, CB)
    lo, hi, fr = _lerp_taps(h)
    for o in range(2 * h):
        f = fr[o]
        row = x[lo[o]] if f == 0.0 else \
            x[lo[o]] * (1.0 - f) + x[hi[o]] * f
        a_ref[o] = row.astype(a_ref.dtype)           # (W, CB)
    a = a_ref[...]                                   # (2H, W, CB)
    lo, hi, fr = _lerp_taps(w)
    for p in range(2 * w):
        f = fr[p]
        col = a[:, lo[p]] if f == 0.0 else \
            a[:, lo[p]] * (1.0 - f) + a[:, hi[p]] * f
        o_ref[0, :, p, :] = col.astype(o_ref.dtype)  # (2H, CB)


def _upsample_pallas(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x: (N, H, W, C) -> (N, 2H, 2W, C), one HBM read + one write."""
    n, h, w, c = x.shape
    # largest channel block whose in+scratch+out working set stays under
    # ~4 MB of VMEM, leaving room for grid double-buffering (a 512-wide
    # block at 32x32 spatial measures 0.93 ms vs 0.40 at 256)
    cb = c
    for cand in (512, 256, 128, 64):
        if c % cand == 0 and 14 * h * w * cand <= (4 << 20):
            cb = cand
            break
    else:
        for cand in (512, 256, 128, 64):
            if c % cand == 0:
                cb = cand
                break
    kernel = functools.partial(_upsample_kernel, h=h, w=w)
    return pl.pallas_call(
        kernel,
        grid=(n, c // cb),
        in_specs=[pl.BlockSpec((1, h, w, cb), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2 * h, 2 * w, cb),
                               lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((2 * h, w, cb), x.dtype)],
        interpret=interpret,
    )(x)


@jax.custom_vjp
def _upsample_fused(x):
    return jax.lax.platform_dependent(
        x, tpu=_upsample_pallas, default=_upsample_two_pass)


def _upsample_fused_fwd(x):
    return _upsample_fused(x), None


def _upsample_fused_bwd(_, g):
    # the bwd of a linear op: the same interpolation with transposed
    # matrices (differentiate the einsum formulation)
    _, vjp = jax.vjp(_upsample_two_pass,
                     jnp.zeros(g.shape[:-3] + (g.shape[-3] // 2,
                                               g.shape[-2] // 2,
                                               g.shape[-1]), g.dtype))
    return vjp(g)


_upsample_fused.defvjp(_upsample_fused_fwd, _upsample_fused_bwd)


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """Exact ``Upsample(scale_factor=2, bilinear, align_corners=True)``.

    x: (..., H, W, C) NHWC. Returns (..., 2H, 2W, C).

    Precision/paths:
      * f32 inputs (checkpoint-parity eval path): two banded einsums at
        HIGHEST precision — bit-stable parity formulation.
      * bf16: the same two-pass einsums at default precision (the interp
        error is below bf16 activation granularity). The one-pass Pallas
        kernel (`EGOTAP_UPSAMPLE_ONE_PASS=1`) is off by default — see
        the ONE_PASS_ENABLE note.
    """
    if not ONE_PASS_ENABLE or x.dtype == jnp.float32:
        return _upsample_two_pass(x)
    h, w, c = x.shape[-3], x.shape[-2], x.shape[-1]
    if h < 8 or w < 8 or c % 64 != 0:
        return _upsample_two_pass(x)
    lead = x.shape[:-3]
    flat = x.reshape((-1, h, w, c))
    return _upsample_fused(flat).reshape(lead + (2 * h, 2 * w, c))
