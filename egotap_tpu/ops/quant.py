"""int8 PTQ inference ops: convs (stage-1 UNets) + matmuls (lifter).

The stage-1 UNets are ~70% of the eval step and their big decoder convs
already run at ~95% of the bf16 MXU roofline — the remaining single-chip
speed lever is precision. int8's win is strongly shape-dependent on v5e
(fixed-harness measurements, tools/probe_int4.py + docs/ROUND4.md:
199 TOP/s at 8192x2048x2048 but 270-339 TOP/s at the lifter's real
matmul shapes — the old "360 TOP/s" figure was a broken-harness
artifact) and comes as much from HALVED activation HBM traffic and
better small-channel MXU packing as from raw MXU rate.

Scheme (TensorRT-style PTQ):
  * weights: symmetric per-output-channel int8. At serving they are
    PRE-quantized off the hot path (`quantize_conv_tree` /
    `quantize_dense_tree` -> a 'qparams' variable collection holding
    {kernel_q, scale}), which removes both the per-step rounding and the
    f32 kernel HBM reads; without qparams the rounding happens inline
    (bitwise-identical results, tests/test_quantized.py).
  * activations: symmetric per-tensor int8. Two modes:
      - dynamic (default): max|x|/127 per call — no calibration needed,
        but the scale couples samples in a batch (an outlier sample
        changes everyone's quantization) and costs extra HBM passes;
      - static calibrated (the serving config): `calibrate_amax` records
        per-module max|x| over calibration batches ("calib" collection
        sown by QConv / QDense / QuantStub); `amax_to_qparams` turns that
        into fixed per-module "a_scale" qparams entries. With a_scale
        present, per-sample outputs are batch-composition-independent,
        the max-reduction passes disappear from the hot path, and int8
        pays off down to 64-channel convs (QConv's threshold logic).
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


def quantize_activation(x: jnp.ndarray,
                        a_scale: Optional[jnp.ndarray] = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x (compute dtype) -> (int8 xq, per-tensor scale). Uses the given
    static calibrated scale, or a dynamic max|x|/127 when None."""
    xf = x.astype(jnp.float32)
    if a_scale is None:
        a_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    return xq, a_scale


def _conv1x1_as_dot() -> bool:
    """Experimental: lower 1x1 convs to an explicit reshape + dot_general
    instead of lax.conv (probing whether XLA's small-spatial 1x1 int8 conv
    lowering is the decoder-skip bottleneck, tools/probe_1x1.py).

    TRACE-TIME flag: jit caches are NOT keyed on this env var, so it must
    be set before the first trace of any quantized conv in the process —
    fresh-process probe scripts only. Flipping it mid-process silently
    leaves already-traced programs on the old lowering."""
    import os
    return os.environ.get("EGOTAP_1X1_AS_DOT", "0") == "1"


def _is_1x1(kernel_hw: Tuple[int, int],
            padding: Sequence[Tuple[int, int]], groups: int) -> bool:
    return (kernel_hw == (1, 1) and groups == 1
            and tuple(map(tuple, padding)) == ((0, 0), (0, 0)))


def _dot_1x1(x: jnp.ndarray, w: jnp.ndarray,
             stride: Tuple[int, int], out_dtype) -> jnp.ndarray:
    """1x1/VALID conv == strided subsample + matmul over flattened pixels."""
    if stride != (1, 1):
        x = x[:, ::stride[0], ::stride[1], :]
    b, h, wd, c = x.shape
    acc = jax.lax.dot_general(
        x.reshape(b * h * wd, c), w.reshape(c, -1),
        (((1,), (0,)), ((), ())), preferred_element_type=out_dtype)
    return acc.reshape(b, h, wd, -1)


def quantized_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                   stride: Union[int, Tuple[int, int]] = 1,
                   padding: Sequence[Tuple[int, int]] = ((0, 0), (0, 0)),
                   groups: int = 1,
                   bias: Optional[jnp.ndarray] = None,
                   precomputed: Optional[Tuple[jnp.ndarray, jnp.ndarray]]
                   = None,
                   a_scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """NHWC int8 conv with per-channel weight scales and dynamic (default)
    or static calibrated (`a_scale`) activation scales; `precomputed`
    supplies already-quantized (kernel_q, scale)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    wq, w_scale = precomputed if precomputed is not None \
        else quantize_weights(kernel)

    xq, a_scale = quantize_activation(x, a_scale)

    if _is_1x1(wq.shape[:2], padding, groups) and _conv1x1_as_dot():
        acc = _dot_1x1(xq, wq, stride, jnp.int32)
    else:
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
                    = None,
                    a_scale: Optional[jnp.ndarray] = None,
                    pre_q: Optional[Tuple[jnp.ndarray, jnp.ndarray]]
                    = None) -> jnp.ndarray:
    """int8 matmul with per-column weight scales and dynamic or static
    (`a_scale`) per-tensor activation scales; x (..., K), kernel (K, N).
    `pre_q` supplies an already-quantized (xq, a_scale) input — several
    consumers of one activation (e.g. q/k/v on a LayerNorm output) then
    share a single quantize pass instead of each re-reading x from HBM."""
    if precomputed is not None:
        wq, w_scale = precomputed
    else:
        w = kernel.astype(jnp.float32)
        w_scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 127.0, 1e-12)
        wq = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)

    if pre_q is not None:
        xq, a_scale = pre_q
    else:
        xq, a_scale = quantize_activation(x, a_scale)

    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (a_scale * w_scale)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _calib_or_static(mod: nn.Module, x: jnp.ndarray
                     ) -> Optional[jnp.ndarray]:
    """Shared QConv/QDense activation-scale plumbing: record max|x| into
    the 'calib' collection when it is mutable (calibration pass; sow is a
    no-op otherwise and XLA DCEs the reduction), and return the static
    calibrated scale if one has been installed in qparams."""
    if not mod.is_initializing():
        # during init every collection is mutable and the sow would leak a
        # 'calib' collection into the init variable tree
        mod.sow("calib", "amax", jnp.max(jnp.abs(x.astype(jnp.float32))),
                init_fn=lambda: jnp.zeros((), jnp.float32),
                reduce_fn=jnp.maximum)
    if mod.has_variable("qparams", "a_scale"):
        return mod.get_variable("qparams", "a_scale")
    return None


def calibrate_amax(apply_fn, variables: dict, batches,
                   **apply_kwargs) -> dict:
    """Run `apply_fn(variables, batch, mutable=["calib"], ...)` over
    calibration batches and return the element-wise maximum 'calib' tree
    (per-module max|activation| observed)."""
    import jax

    amax = None
    for batch in batches:
        _, mut = apply_fn(variables, batch, mutable=["calib"],
                          **apply_kwargs)
        tree = mut["calib"]
        amax = tree if amax is None else jax.tree.map(jnp.maximum,
                                                      amax, tree)
    return amax


def amax_to_qparams(amax_tree: dict) -> dict:
    """Convert a 'calib' amax tree into a qparams fragment: every 'amax'
    leaf becomes an 'a_scale' = max(amax, eps)/127 entry at the same
    module path (mergeable with quantize_conv_tree's output via
    merge_qparams)."""
    out = {}
    for k, v in amax_tree.items():
        if k == "amax":
            out["a_scale"] = jnp.maximum(jnp.asarray(v, jnp.float32),
                                         1e-12) / 127.0
        elif isinstance(v, dict):
            sub = amax_to_qparams(v)
            if sub:
                out[k] = sub
    return out


def merge_qparams(*trees: dict) -> dict:
    """Deep-merge qparams fragments (e.g. quantize_conv_tree weights +
    amax_to_qparams activation scales)."""
    out: dict = {}
    for tree in trees:
        for k, v in (tree or {}).items():
            if isinstance(v, dict) and isinstance(out.get(k), dict):
                out[k] = merge_qparams(out[k], v)
            else:
                out[k] = v
    return out


class QDense(nn.Module):
    """Drop-in nn.Dense replacement running `quantized_dense` with the
    identical parameter tree. Pass ``pre_q=(xq, a_scale)`` (from a shared
    `QuantStub`) to skip this module's own input quantize pass."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 pre_q: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
                 ) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        pre = None
        if self.has_variable("qparams", "kernel_q"):
            pre = (self.get_variable("qparams", "kernel_q"),
                   self.get_variable("qparams", "scale"))
        a_scale = _calib_or_static(self, x) if pre_q is None else None
        return quantized_dense(x, kernel, bias, precomputed=pre,
                               a_scale=a_scale, pre_q=pre_q)


class QuantStub(nn.Module):
    """Quantize one activation ONCE for several downstream int8 consumers
    (e.g. the ViT's q/k/v projections all read the same LayerNorm output).
    Owns its own calib/qparams 'a_scale' entry; returns (xq, a_scale) to
    feed `QDense(..., pre_q=...)`. With a static calibrated scale the
    single quantize fuses into the producer and replaces N per-consumer
    HBM quantize passes."""

    @nn.compact
    def __call__(self, x: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return quantize_activation(x, _calib_or_static(self, x))


def quantize_conv_tree(params) -> dict:
    """Build the 'qparams' collection for a quantized net's params tree:
    every wide conv kernel (the ones QConv can quantize, i.e.
    in_ch >= 64) maps to {kernel_q, scale} at the same path. Feed the
    result as apply({..., 'qparams': tree}, ...) so per-step weight
    rounding disappears from the hot path (~0.3 ms per large conv)."""
    import jax

    def eligible(node):
        k = node.get("kernel")
        return (k is not None and not isinstance(k, dict)
                and getattr(k, "ndim", 0) == 4 and k.shape[2] >= 64)

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


def quantize_dense_tree(params) -> dict:
    """Dense counterpart of `quantize_conv_tree`: every wide 2D kernel
    (in_dim >= 64, i.e. everything QDense would quantize) maps to
    {kernel_q, scale} at the same module path. Entries at paths without a
    QDense (e.g. the ViT patch_proj nn.Dense or PU cell matmuls) are
    simply never read. Feeding the result through the 'qparams'
    collection removes the per-step weight rounding AND the f32 weight
    reads from the hot path (the lifter ViT reads ~48 MB of f32 dense
    kernels per layer per step otherwise; int8 is a quarter of that)."""
    import jax

    def eligible(node):
        k = node.get("kernel")
        return (k is not None and not isinstance(k, dict)
                and getattr(k, "ndim", 0) == 2 and k.shape[0] >= 64)

    def quantize(kernel):
        w = kernel.astype(jnp.float32)
        w_scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 127.0, 1e-12)
        wq = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
        return wq, w_scale

    def walk(node):
        if eligible(node):
            wq, ws = quantize(node["kernel"])
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
        a_scale = _calib_or_static(self, x) if in_ch >= 64 else None
        if in_ch < 128 and a_scale is None:
            # narrow contraction dims lose more to DYNAMIC
            # quantize/dequantize overhead than the MXU gains (measured:
            # int8 stem 0.59 ms vs bf16 0.44) — run them in the compute
            # dtype. With a CALIBRATED static scale the max-reduction and
            # its HBM passes disappear and int8 wins down to 64 channels
            # (layer1 chain: 1.07 ms bf16 -> 0.25 ms static int8 on v5e,
            # tools/bench_layer1.py), so 64-wide convs quantize once
            # calibration installs a_scale. The 3-channel stem always
            # stays in the compute dtype.
            if _is_1x1((k, k), pad, self.groups) and _conv1x1_as_dot():
                out = _dot_1x1(x, kernel.astype(x.dtype),
                               (self.stride, self.stride), x.dtype)
            else:
                out = jax.lax.conv_general_dilated(
                    x, kernel.astype(x.dtype), (self.stride, self.stride),
                    pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
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
                                  bias, precomputed=(wq, ws),
                                  a_scale=a_scale)
        return quantized_conv(x, kernel, self.stride, pad,
                              self.groups, bias, a_scale=a_scale)
