"""Shared layer builders (flax.linen), NHWC, torch-parity semantics.

Mirrors the reference's layer factories (model/network_utils.py:91-148):
  * ``ConvReLU``  — Conv + ReLU (the UNet decoder's ``convrelu``),
  * ``FCBlock``   — Linear + BatchNorm1d + LeakyReLU(0.2)
    (``make_fc_layer``; BN runs over whatever leading dims are flattened
    into the batch — callers flatten (B, J) to B*J rows exactly like the
    reference, see SURVEY hard-parts note),
  * ``ConvBlock`` — Conv + BatchNorm2d + LeakyReLU(0.2) (``make_conv_layer``).

BatchNorm parity with torch: momentum 0.1 (linen momentum = 0.9),
eps 1e-5, biased batch variance for normalization, unbiased for the
running-stat update — flax.linen.BatchNorm matches torch here except for
the unbiased running-var correction, which `compat.convert` accounts for
when loading torch checkpoints (inference uses the stored running stats
directly, so eval-path parity is exact).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

# torch defaults
BN_MOMENTUM = 0.9  # linen decay == 1 - torch momentum (0.1)
BN_EPS = 1e-5
LEAKY_SLOPE = 0.2


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


class ConvReLU(nn.Module):
    """Conv2d + ReLU (reference ``convrelu``, network_utils.py:144-148)."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    stride: int = 1
    groups: int = 1
    quant: bool = False  # int8 inference conv (ops/quant.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.quant:
            from egotap_tpu.ops.quant import QConv
            x = QConv(self.features, self.kernel_size, self.stride,
                      self.padding, self.groups, use_bias=True,
                      name="conv")(x)
            return nn.relu(x)
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            feature_group_count=self.groups,
            use_bias=True,
            name="conv",
            dtype=x.dtype,
        )(x)
        return nn.relu(x)


class FCBlock(nn.Module):
    """Linear (+ BatchNorm1d) (+ LeakyReLU 0.2) — ``make_fc_layer``.

    Input is (rows, features); the caller is responsible for flattening
    (B, J, F) -> (B*J, F) so train-mode BN statistics span the same rows as
    the reference.
    """

    features: int
    with_bn: bool = True
    with_relu: bool = True
    quant: bool = False  # int8 inference matmul (ops/quant.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.quant and not train:
            from egotap_tpu.ops.quant import QDense
            x = QDense(self.features, name="fc")(x)
        else:
            x = nn.Dense(self.features, name="fc", dtype=x.dtype)(x)
        if self.with_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                name="bn",
                dtype=x.dtype,
            )(x)
        if self.with_relu:
            x = leaky_relu(x)
        return x


class ConvBlock(nn.Module):
    """Conv2d + BatchNorm2d + LeakyReLU(0.2) — ``make_conv_layer``."""

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    with_bn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=True,
            name="conv",
            dtype=x.dtype,
        )(x)
        if self.with_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                name="bn",
                dtype=x.dtype,
            )(x)
        return leaky_relu(x)


class MLPDecoder(nn.Module):
    """Stack of FCBlocks + a final plain Linear head
    (reference ``MLPDecoder``, model/net_architecture.py:179-212).

    With ``hidden=[]`` (the shipped PU config) this is a single Linear.
    """

    out_features: int
    hidden: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, h in enumerate(self.hidden):
            x = FCBlock(h, name=f"fc{i}")(x, train=train)
        return nn.Dense(self.out_features, name="head", dtype=x.dtype)(x)
