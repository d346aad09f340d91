"""int8 quantized convolution for heatmap-net inference.

The stage-1 UNets are ~70% of the eval step and their big decoder convs
already run at ~95% of the bf16 MXU roofline — the remaining single-chip
speed lever is precision. v5e executes int8 at 2x the bf16 rate
(measured: 360 TOP/s vs 189 TF/s, tools/probe_int8.py).

Scheme (TensorRT-style PTQ, computed on the fly — no calibration pass):
  * weights: symmetric per-output-channel int8 (quantized from the stored
    f32 params each step; they are read from HBM anyway and the rounding
    fuses into that read),
  * activations: symmetric per-tensor int8 with a dynamic scale
    (max|x|/127, one reduction that fuses into the producer),
  * accumulation in int32, dequantized into the compute dtype.

Inference-only: training, the f32 test CLI, and checkpoint layouts are
untouched (the quantized modules declare the SAME parameter tree as
nn.Conv). Gated by ``Config.int8_heatmap_inference``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


def quantize_weights(kernel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(k,k,in,out) f32 kernel -> (int8 kernel, per-out-channel scale)."""
    w = kernel.astype(jnp.float32)
    w_scale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
    wq = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
    return wq, w_scale


def quantized_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                   stride: Union[int, Tuple[int, int]] = 1,
                   padding: Sequence[Tuple[int, int]] = ((0, 0), (0, 0)),
                   groups: int = 1,
                   bias: Optional[jnp.ndarray] = None,
                   precomputed: Optional[Tuple[jnp.ndarray, jnp.ndarray]]
                   = None) -> jnp.ndarray:
    """NHWC int8 conv with dynamic activation / per-channel weight scales;
    `precomputed` supplies already-quantized (kernel_q, scale)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    wq, w_scale = precomputed if precomputed is not None \
        else quantize_weights(kernel)

    xf = x.astype(jnp.float32)
    a_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)

    acc = jax.lax.conv_general_dilated(
        xq, wq, stride, tuple(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (a_scale * w_scale)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def quantized_dense(x: jnp.ndarray, kernel: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None,
                    precomputed: Optional[Tuple[jnp.ndarray, jnp.ndarray]]
                    = None) -> jnp.ndarray:
    """int8 matmul with dynamic per-tensor activation / per-column weight
    scales; x (..., K), kernel (K, N)."""
    if precomputed is not None:
        wq, w_scale = precomputed
    else:
        w = kernel.astype(jnp.float32)
        w_scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 127.0, 1e-12)
        wq = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)

    xf = x.astype(jnp.float32)
    a_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (a_scale * w_scale)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


class QDense(nn.Module):
    """Drop-in nn.Dense replacement running `quantized_dense` with the
    identical parameter tree."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        pre = None
        if self.has_variable("qparams", "kernel_q"):
            pre = (self.get_variable("qparams", "kernel_q"),
                   self.get_variable("qparams", "scale"))
        return quantized_dense(x, kernel, bias, precomputed=pre)


def quantize_conv_tree(params) -> dict:
    """Build the 'qparams' collection for a quantized net's params tree:
    every wide conv kernel (the ones QConv actually quantizes, i.e.
    in_ch >= 128) maps to {kernel_q, scale} at the same path. Feed the
    result as apply({..., 'qparams': tree}, ...) so per-step weight
    rounding disappears from the hot path (~0.3 ms per large conv)."""
    import jax

    def eligible(node):
        k = node.get("kernel")
        return (k is not None and not isinstance(k, dict)
                and getattr(k, "ndim", 0) == 4 and k.shape[2] >= 128)

    def walk(node):
        if eligible(node):  # a bare conv module's own params
            wq, ws = quantize_weights(node["kernel"])
            return {"kernel_q": wq, "scale": ws}
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                sub = walk(v)
                if sub:
                    out[k] = sub
        return out

    return jax.jit(walk)(params)


class QConv(nn.Module):
    """Drop-in nn.Conv replacement running `quantized_conv`; declares the
    identical parameter tree (kernel [+ bias]) so the same variables serve
    both the full-precision and the quantized graph."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        in_ch = x.shape[-1] // self.groups
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, in_ch, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        pad = ((self.padding, self.padding),) * 2
        if in_ch < 128:
            # narrow contraction dims (stem's 3 RGB channels, the 64-wide
            # layer1 blocks) lose more to quantize/dequantize overhead than
            # the MXU gains (measured: int8 stem 0.59 ms vs bf16 0.44) —
            # run them in the compute dtype with the same parameters
            out = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), (self.stride, self.stride), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups)
            if bias is not None:
                out = out + bias.astype(out.dtype)
            return out
        if self.has_variable("qparams", "kernel_q"):
            # pre-quantized weights (quantize_conv_tree) — per-step weight
            # rounding measures ~0.3 ms per large conv on v5e
            wq = self.get_variable("qparams", "kernel_q")
            ws = self.get_variable("qparams", "scale")
            return quantized_conv(x, kernel, self.stride, pad, self.groups,
                                  bias, precomputed=(wq, ws))
        return quantized_conv(x, kernel, self.stride, pad,
                              self.groups, bias)
