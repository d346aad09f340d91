"""Fused int8 ResNet layer1 (Pallas): all residual-block convs per image
in one VMEM-resident kernel.

Why: layer1 is the last backbone stage far from the int8 roofline
(~21% measured on v5e — docs/ROUND2.md). Its 64 output channels cap MXU
lane use at 50%, and the generic quantized path (ops/quant.py) pays
~4 full HBM passes per conv for dynamic quantize/dequantize. This kernel
reads each (64, 64, 64) feature map into VMEM ONCE, then runs the whole
layer1 stack — for every BasicBlock: quantize -> 3x3 conv -> BN -> ReLU
-> quantize -> 3x3 conv -> BN -> +residual -> ReLU — entirely on chip,
writing only the final activations back. Matches the compute of the
reference's torchvision layer1 split (model/net_architecture.py:68-85)
at inference.

Scheme:
  * BN is folded into the convs (inference-only; scale/sqrt(var+eps)
    into the kernel, the rest into a bias) — ops/quant.py's per-channel
    weight quantization absorbs the fold.
  * 3x3 convs run as one im2col matmul per conv: patches
    (H*W, 9*C) int8 @ weights (9*C, C) int8 -> int32, built with nine
    static shifted copies inside VMEM (no HBM traffic).
  * activations use a per-IMAGE dynamic scale computed in VMEM (free —
    the data is already resident), which is also batch-composition
    independent, unlike the generic per-tensor dynamic scale.

`fused_layer1_reference` is the pure-jnp twin (identical math, lax
convs) used for CPU parity tests and as the interpret-mode oracle.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(kernel: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
            mean: jnp.ndarray, var: jnp.ndarray, eps: float
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold inference BatchNorm into a conv: returns (kernel', bias')
    with conv'(x) = BN(conv(x))."""
    g = (scale / jnp.sqrt(var + eps)).astype(jnp.float32)
    return kernel.astype(jnp.float32) * g[None, None, None, :], \
        (bias - mean * g).astype(jnp.float32)


def _quantize_folded(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(3,3,C,C) folded f32 kernel -> ((9C, C) int8 im2col rows laid out
    as (di*3+dj)*C + c, per-out-channel scale)."""
    ws = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
    wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
    k = w.shape[0]
    c_in = w.shape[2]
    return wq.reshape(k * k * c_in, w.shape[3]), ws


def pack_blocks(block_params: Sequence[dict], eps: float
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fold + quantize a layer's BasicBlock parameter dicts.

    block_params: per block {conv1, bn1_scale, bn1_bias, bn1_mean,
    bn1_var, conv2, bn2_*}. Returns (w_q (2n, 9C, C) int8,
    w_scale (2n, C) f32, bias (2n, C) f32) in conv execution order."""
    wqs, wss, bs = [], [], []
    for p in block_params:
        for ci in ("1", "2"):
            w, b = fold_bn(p[f"conv{ci}"], p[f"bn{ci}_scale"],
                           p[f"bn{ci}_bias"], p[f"bn{ci}_mean"],
                           p[f"bn{ci}_var"], eps)
            wq, ws = _quantize_folded(w)
            wqs.append(wq)
            wss.append(ws)
            bs.append(b)
    return jnp.stack(wqs), jnp.stack(wss), jnp.stack(bs)


def _quant_image(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image symmetric int8: (H, W, C) f32 -> (int8, scale)."""
    a_scale = jnp.maximum(jnp.max(jnp.abs(a)), 1e-12) / 127.0
    return jnp.clip(jnp.round(a / a_scale), -127, 127).astype(jnp.int8), \
        a_scale


def _kernel(x_ref, wq_ref, ws_ref, b_ref, y_ref, pad_ref, patch_ref,
            *, n_convs: int):
    h, w, c = x_ref.shape[1:]
    act = x_ref[0].astype(jnp.float32)
    residual = act

    for conv in range(n_convs):
        aq, a_scale = _quant_image(act)
        # zero the halo, then place the quantized image
        pad_ref[:] = jnp.zeros_like(pad_ref)
        pad_ref[1:h + 1, 1:w + 1, :] = aq
        # im2col: nine static shifted views -> (H*W, 9C)
        for di in range(3):
            for dj in range(3):
                t = di * 3 + dj
                patch_ref[:, t * c:(t + 1) * c] = \
                    pad_ref[di:di + h, dj:dj + w, :].reshape(h * w, c)
        acc = jnp.dot(patch_ref[:], wq_ref[conv],
                      preferred_element_type=jnp.int32)
        ws = ws_ref[conv:conv + 1, :]       # (1, C) — keep operands 2-D
        b = b_ref[conv:conv + 1, :]
        out = acc.astype(jnp.float32) * (a_scale * ws) + b
        out = out.reshape(h, w, c)
        if conv % 2 == 0:          # conv1 of a block
            act = jnp.maximum(out, 0.0)
        else:                       # conv2: residual add, new residual
            act = jnp.maximum(out + residual, 0.0)
            residual = act

    y_ref[0] = act.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_layer1_int8(x: jnp.ndarray, w_q: jnp.ndarray,
                      w_scale: jnp.ndarray, bias: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """x (N, H, W, C) -> (N, H, W, C); w_q/w_scale/bias from pack_blocks.
    Requires stride-1 equal-channel blocks (true for every torchvision
    layer1)."""
    n, h, w, c = x.shape
    n_convs = w_q.shape[0]
    grid = (n,)
    kernel = functools.partial(_kernel, n_convs=n_convs)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_convs, 9 * c, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_convs, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_convs, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, c), jnp.int8),
            pltpu.VMEM((h * w, 9 * c), jnp.int8),
        ],
        interpret=interpret,
    )(x, w_q, w_scale, bias)


def fused_layer1_reference(x: jnp.ndarray, w_q: jnp.ndarray,
                           w_scale: jnp.ndarray, bias: jnp.ndarray
                           ) -> jnp.ndarray:
    """Pure-jnp twin of the kernel (same per-image quantization and int32
    conv math via lax.conv on the int8 values)."""
    n_convs = w_q.shape[0]
    c = x.shape[-1]
    act = x.astype(jnp.float32)
    residual = act

    for conv in range(n_convs):
        a_scale = jnp.maximum(
            jnp.max(jnp.abs(act), axis=(1, 2, 3), keepdims=True),
            1e-12) / 127.0
        aq = jnp.clip(jnp.round(act / a_scale), -127, 127).astype(jnp.int8)
        wk = w_q[conv].reshape(3, 3, c, c)
        acc = jax.lax.conv_general_dilated(
            aq, wk, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (a_scale * w_scale[conv]) \
            + bias[conv]
        if conv % 2 == 0:
            act = jnp.maximum(out, 0.0)
        else:
            act = jnp.maximum(out + residual, 0.0)
            residual = act
    return act.astype(x.dtype)
