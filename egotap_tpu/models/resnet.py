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


def _bn(name: str, train: bool, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        epsilon=BN_EPS, name=name, dtype=dtype)


def _conv(features: int, kernel: int, stride: int, name: str, dtype,
          groups: int = 1):
    pad = kernel // 2
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

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = x.dtype
        g = self.groups
        identity = x
        out = _conv(self.features, 3, self.stride, "conv1", dt, g)(x)
        out = _bn("bn1", train, dt)(out)
        out = nn.relu(out)
        out = _conv(self.features, 3, 1, "conv2", dt, g)(out)
        out = _bn("bn2", train, dt)(out)
        if self.downsample:
            identity = _conv(self.features, 1, self.stride, "downsample_0",
                             dt, g)(x)
            identity = _bn("downsample_1", train, dt)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output channels = 4 * features
    stride: int = 1
    downsample: bool = False
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = x.dtype
        g = self.groups
        identity = x
        out = _conv(self.features, 1, 1, "conv1", dt, g)(x)
        out = _bn("bn1", train, dt)(out)
        out = nn.relu(out)
        out = _conv(self.features, 3, self.stride, "conv2", dt, g)(out)
        out = _bn("bn2", train, dt)(out)
        out = nn.relu(out)
        out = _conv(self.features * 4, 1, 1, "conv3", dt, g)(out)
        out = _bn("bn3", train, dt)(out)
        if self.downsample:
            identity = _conv(self.features * 4, 1, self.stride,
                             "downsample_0", dt, g)(x)
            identity = _bn("downsample_1", train, dt)(identity)
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """ResNet feature-pyramid encoder.

    Returns [input, layer0, layer1, layer2, layer3, layer4] like the
    reference's Encoder_Block.forward (model/net_architecture.py:75-85).
    """

    model_name: str = "resnet18"
    groups: int = 1  # >1 = several weight-independent nets fused group-wise

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        kind, depths = RESNET_SPECS[self.model_name]
        block = BasicBlock if kind == "basic" else Bottleneck
        g = self.groups
        dt = x.dtype

        out = _conv(64 * g, 7, 2, "conv1", dt, g)(x)
        out = _bn("bn1", train, dt)(out)
        layer0 = nn.relu(out)

        out = nn.max_pool(layer0, window_shape=(3, 3), strides=(2, 2),
                          padding=[(1, 1), (1, 1)])

        feats = []
        widths = (64, 128, 256, 512)
        for li, (width, depth) in enumerate(zip(widths, depths), start=1):
            for bi in range(depth):
                stride = 2 if (li > 1 and bi == 0) else 1
                in_ch = out.shape[-1]
                out_ch = width * g * (1 if kind == "basic" else 4)
                need_ds = (stride != 1) or (in_ch != out_ch)
                out = block(width * g, stride=stride, downsample=need_ds,
                            groups=g, name=f"layer{li}_{bi}")(out, train=train)
            feats.append(out)

        layer1, layer2, layer3, layer4 = feats
        return [x, layer0, layer1, layer2, layer3, layer4]
