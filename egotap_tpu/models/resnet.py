"""ResNet encoders (flax.linen, NHWC) with the torchvision layer split.

The reference's stage-1 backbone wraps a torchvision ResNet and re-slices
its children into a 5-level feature pyramid (reference
model/net_architecture.py:53-85):
    layer0: conv1+bn1+relu     -> (H/2,  64)
    layer1: maxpool + layer1   -> (H/4,  64 * e)
    layer2: layer2             -> (H/8,  128 * e)
    layer3: layer3             -> (H/16, 256 * e)
    layer4: layer4             -> (H/32, 512 * e)
with expansion e = 1 (resnet18/34) or 4 (resnet50/101).

Module/parameter naming mirrors the torch state_dict keys (dots replaced by
underscores), so checkpoint conversion is a mechanical transpose
(`egotap_tpu.compat.convert`).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from egotap_tpu.models.layers import BN_EPS, BN_MOMENTUM

RESNET_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
}


def feature_expansion(model_name: str) -> int:
    kind, _ = RESNET_SPECS[model_name]
    return 1 if kind == "basic" else 4


def _bn(name: str, train: bool, dtype, views: int = 1):
    # views > 1: per-view batch statistics + sequential running updates,
    # matching the reference's one-encoder-call-per-view loop
    # (net_architecture.py:45-51) while the convs run one folded pass
    from egotap_tpu.models.layers import TorchBatchNorm
    return TorchBatchNorm(use_running_average=not train, name=name,
                          stats_groups=views, dtype=dtype)


def _conv(features: int, kernel: int, stride: int, name: str, dtype,
          groups: int = 1, quant: bool = False):
    pad = kernel // 2
    if quant:
        from egotap_tpu.ops.quant import QConv
        return QConv(features, kernel, stride, pad, groups,
                     use_bias=False, name=name)
    return nn.Conv(features, kernel_size=(kernel, kernel),
                   strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)],
                   feature_group_count=groups,
                   use_bias=False, name=name, dtype=dtype)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    quant: bool = False
    bn_views: int = 1  # train-mode per-view BN statistics (see _bn)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = x.dtype
        g, q, v = self.groups, self.quant, self.bn_views
        if q and not train and g == 1:
            # int8 inference: fold BN into the convs so the dequant
            # epilogue is one multiply-add instead of the BN chain
            # (measured 0.51 -> 0.41 ms for one net's layer1, /tmp parity
            # in tests/test_quantized.py). Identical parameter tree via
            # the shadow modules.
            return self._folded_inference(x)
        identity = x
        out = _conv(self.features, 3, self.stride, "conv1", dt, g, q)(x)
        out = _bn("bn1", train, dt, v)(out)
        out = nn.relu(out)
        out = _conv(self.features, 3, 1, "conv2", dt, g, q)(out)
        out = _bn("bn2", train, dt, v)(out)
        if self.downsample:
            identity = _conv(self.features, 1, self.stride, "downsample_0",
                             dt, g, q)(x)
            identity = _bn("downsample_1", train, dt, v)(identity)
        return nn.relu(out + identity)

    def _folded_inference(self, x: jnp.ndarray) -> jnp.ndarray:
        """BN-folded int8 inference path; precision per conv follows
        QConv's rules (in_ch >= 128 dynamic; >= 64 with a calibrated
        a_scale; otherwise the compute dtype with folded weights)."""
        from egotap_tpu.ops.fused_layer1 import fold_bn
        from egotap_tpu.ops.quant import quantized_conv
        f = self.features
        in_ch = x.shape[-1]

        def folded_conv(inp, name_conv, name_bn, k, stride):
            kernel, a_scale = _QConvParams(
                (k, k, inp.shape[-1], f), name=name_conv)(inp)
            s, b, m, v = _BNParams(f, name=name_bn)()
            w, c = fold_bn(kernel, s, b, m, v, BN_EPS)
            pad = ((k // 2, k // 2),) * 2
            if a_scale is None and inp.shape[-1] < 128:
                out = jax.lax.conv_general_dilated(
                    inp, w.astype(inp.dtype), (stride, stride), pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return out + c.astype(out.dtype)
            return quantized_conv(inp, w, stride, pad, bias=c,
                                  a_scale=a_scale)

        out = nn.relu(folded_conv(x, "conv1", "bn1", 3, self.stride))
        out = folded_conv(out, "conv2", "bn2", 3, 1)
        identity = x
        if self.downsample:
            identity = folded_conv(x, "downsample_0", "downsample_1", 1,
                                   self.stride)
        return nn.relu(out + identity.astype(out.dtype))


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output channels = 4 * features
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    quant: bool = False
    bn_views: int = 1  # train-mode per-view BN statistics (see _bn)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = x.dtype
        g, q, v = self.groups, self.quant, self.bn_views
        identity = x
        out = _conv(self.features, 1, 1, "conv1", dt, g, q)(x)
        out = _bn("bn1", train, dt, v)(out)
        out = nn.relu(out)
        out = _conv(self.features, 3, self.stride, "conv2", dt, g, q)(out)
        out = _bn("bn2", train, dt, v)(out)
        out = nn.relu(out)
        out = _conv(self.features * 4, 1, 1, "conv3", dt, g, q)(out)
        out = _bn("bn3", train, dt, v)(out)
        if self.downsample:
            identity = _conv(self.features * 4, 1, self.stride,
                             "downsample_0", dt, g, q)(x)
            identity = _bn("downsample_1", train, dt, v)(identity)
        return nn.relu(out + identity)


class _ConvKernelParams(nn.Module):
    """Declares an nn.Conv-identical kernel param (same path/shape/init)
    without building the conv — the fused layer1 kernel consumes the raw
    array instead."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _QConvParams(nn.Module):
    """nn.Conv-identical kernel param plus the QConv calibration plumbing
    (calib amax sow / static a_scale read) at the same module path, for
    paths that consume the kernel as a raw array (BN folding, fused
    kernels)."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        from egotap_tpu.ops.quant import _calib_or_static
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            self.shape, jnp.float32)
        return kernel, _calib_or_static(self, x)


class _BNParams(nn.Module):
    """Declares nn.BatchNorm-identical variables (params scale/bias,
    batch_stats mean/var) and returns them as arrays."""

    features: int

    @nn.compact
    def __call__(self):
        f = self.features
        scale = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((f,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((f,), jnp.float32))
        return scale, bias, mean.value, var.value


class _FusedBlockParams(nn.Module):
    """Parameter-tree twin of a no-downsample BasicBlock: declares the
    identical conv1/bn1/conv2/bn2 variables and hands the arrays to the
    fused Pallas layer1 kernel (ops/fused_layer1.py)."""

    features: int
    in_ch: int

    @nn.compact
    def __call__(self) -> dict:
        f, ci = self.features, self.in_ch
        out = {"conv1": _ConvKernelParams((3, 3, ci, f), name="conv1")(),
               "conv2": _ConvKernelParams((3, 3, f, f), name="conv2")()}
        for bn in ("bn1", "bn2"):
            s, b, m, v = _BNParams(f, name=bn)()
            out.update({f"{bn}_scale": s, f"{bn}_bias": b,
                        f"{bn}_mean": m, f"{bn}_var": v})
        return out


class S2DStemConv(nn.Module):
    """The ResNet stem (7x7 stride-2 conv on 3 channels) computed via
    space-to-depth: x rearranged to (H/2, W/2, 4*C) and the SAME stored
    (7,7,C,F) kernel re-indexed into an equivalent (4,4,4*C,F) kernel.

    Identical math (every product pairs the same input pixel with the same
    tap; sums accumulate in f32 either way), but the contraction dim grows
    from 7*7*3=147 to 4*4*12=192 with denser lane packing — the naive stem
    measures ~22% MFU on v5e, the dominant backbone inefficiency. The
    parameter tree matches nn.Conv exactly (params["conv1"]["kernel"]) so
    checkpoint conversion/initialization are unchanged.
    """

    features: int
    in_channels: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax
        C, F = self.in_channels, self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, C, F),
            jnp.float32)
        # (du, dv)-phase extraction via strided slices: sublane-dim strides
        # keep the (tiny) channel dim contiguous — a reshape+transpose with
        # innermost dims (2, 2, C) would be a worst-case tiled relayout
        y = jnp.concatenate(
            [x[:, du::2, dv::2, :] for du in range(2) for dv in range(2)],
            axis=-1)                           # (B, H/2, W/2, 4*C)

        # K4[ai, aj, ((du*2+dv)*C)+c, f] = W[2*ai+du-1, 2*aj+dv-1, c, f]
        # (out-of-range taps are zero); derivation: output pixel p reads
        # input rows u = 2p+i-3, i in [0,7); with u = 2a+du and
        # a = p-2+ai this gives i = 2*ai+du-1.
        k4 = jnp.zeros((4, 4, 4 * C, F), kernel.dtype)
        for ai in range(4):
            for aj in range(4):
                for du in range(2):
                    for dv in range(2):
                        i, j = 2 * ai + du - 1, 2 * aj + dv - 1
                        if 0 <= i < 7 and 0 <= j < 7:
                            k4 = k4.at[ai, aj,
                                       (du * 2 + dv) * C:(du * 2 + dv + 1) * C
                                       ].set(kernel[i, j])
        out = jax.lax.conv_general_dilated(
            y, k4.astype(x.dtype), window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out


class ResNetEncoder(nn.Module):
    """ResNet feature-pyramid encoder.

    Returns [input, layer0, layer1, layer2, layer3, layer4] like the
    reference's Encoder_Block.forward (model/net_architecture.py:75-85).
    """

    model_name: str = "resnet18"
    groups: int = 1  # >1 = several weight-independent nets fused group-wise
    # space-to-depth stem: math-identical (see S2DStemConv) but measured
    # NEUTRAL end to end on v5e — the stem conv's MXU gain (~22% -> denser
    # packing) is offset by the phase-extraction pass; default off
    stem_s2d: bool = False
    quant: bool = False  # int8 inference convs (ops/quant.py)
    # >1: the folded batch interleaves this many stereo views (row i is
    # view i % bn_views) and train-mode BN computes PER-VIEW statistics
    # with sequential running updates — matching the reference's
    # one-encoder-call-per-view loop (net_architecture.py:45-51)
    bn_views: int = 1
    # fused Pallas int8 layer1 (ops/fused_layer1.py): math-equivalent,
    # parity-tested; shipped OFF because the measured kernel is slower
    # than XLA's bf16 convs on v5e today (Mosaic's int8 dot runs at
    # ~92 TOP/s at N=64 vs the 1.07 ms bf16 chain — tools/bench_layer1.py)
    fused_layer1: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        kind, depths = RESNET_SPECS[self.model_name]
        block = BasicBlock if kind == "basic" else Bottleneck
        g, v = self.groups, self.bn_views
        dt = x.dtype

        if self.stem_s2d and g == 1 and x.shape[1] % 2 == 0:
            out = S2DStemConv(64, x.shape[-1], name="conv1")(x)
        else:
            out = _conv(64 * g, 7, 2, "conv1", dt, g, self.quant)(x)
        out = _bn("bn1", train, dt, v)(out)
        layer0 = nn.relu(out)

        out = nn.max_pool(layer0, window_shape=(3, 3), strides=(2, 2),
                          padding=[(1, 1), (1, 1)])

        feats = []
        widths = (64, 128, 256, 512)
        for li, (width, depth) in enumerate(zip(widths, depths), start=1):
            if (li == 1 and self.quant and self.fused_layer1
                    and not train and kind == "basic" and g == 1
                    and out.shape[-1] == width):
                # fused int8 layer1 (ops/fused_layer1.py): whole-stage
                # Pallas kernel, one HBM read/write per image instead of
                # per conv; identical parameter tree via the shadow
                # modules above. The reference computes this stage as
                # torchvision layer1 (net_architecture.py:68-85).
                import jax
                from egotap_tpu.ops.fused_layer1 import (fused_layer1_int8,
                                                         pack_blocks)
                blocks = [_FusedBlockParams(width, out.shape[-1],
                                            name=f"layer{li}_{bi}")()
                          for bi in range(depth)]
                wq, ws, b = pack_blocks(blocks, BN_EPS)
                out = fused_layer1_int8(
                    out, wq, ws, b,
                    interpret=jax.default_backend() != "tpu")
                feats.append(out)
                continue
            for bi in range(depth):
                stride = 2 if (li > 1 and bi == 0) else 1
                in_ch = out.shape[-1]
                out_ch = width * g * (1 if kind == "basic" else 4)
                need_ds = (stride != 1) or (in_ch != out_ch)
                out = block(width * g, stride=stride, downsample=need_ds,
                            groups=g, quant=self.quant, bn_views=v,
                            name=f"layer{li}_{bi}")(out, train=train)
            feats.append(out)

        layer1, layer2, layer3, layer4 = feats
        return [x, layer0, layer1, layer2, layer3, layer4]
