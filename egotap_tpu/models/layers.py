"""Shared layer builders (flax.linen), NHWC, torch-parity semantics.

Mirrors the reference's layer factories (model/network_utils.py:91-148):
  * ``ConvReLU``  — Conv + ReLU (the UNet decoder's ``convrelu``),
  * ``FCBlock``   — Linear + BatchNorm1d + LeakyReLU(0.2)
    (``make_fc_layer``; BN runs over whatever leading dims are flattened
    into the batch — callers flatten (B, J) to B*J rows exactly like the
    reference, see SURVEY hard-parts note),
  * ``ConvBlock`` — Conv + BatchNorm2d + LeakyReLU(0.2) (``make_conv_layer``).

BatchNorm parity with torch: `TorchBatchNorm` reproduces
torch.nn.BatchNorm{1,2}d exactly — momentum 0.1 (decay 0.9), eps 1e-5,
biased batch variance for normalization, UNBIASED (Bessel-corrected)
variance for the running-stat update. flax.linen.BatchNorm differs in the
last point (it stores the biased variance), which makes running stats
drift from a torch twin over a training run — relevant because the
stage-2 frozen heatmap nets keep train-mode BN with evolving running
stats (reference train.py:91, egotap_autoencoder_model.py:177-216) and
the eval path consumes them. Variable layout (params scale/bias,
batch_stats mean/var) is identical to linen's, so checkpoints and the
`compat` converters are unaffected.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch defaults
BN_MOMENTUM = 0.9  # linen decay == 1 - torch momentum (0.1)
BN_EPS = 1e-5
LEAKY_SLOPE = 0.2


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch.nn.BatchNorm{1,2}d training semantics.

    Differences from flax.linen.BatchNorm (whose variable layout this
    module keeps: params scale/bias, batch_stats mean/var, all float32):

      * the running variance is updated with the UNBIASED batch variance
        (Bessel-corrected by n/(n-1), torch modules/batchnorm) while
        normalization uses the biased variance — linen stores the biased
        variance in both places;
      * the batch variance is computed two-pass (mean of squared
        deviations, like torch's kernels) instead of linen's
        E[x^2]-E[x]^2, avoiding that form's f32 cancellation error.

    Statistics are computed in float32 regardless of input dtype
    (matching torch autocast, which runs batch_norm in f32); the output
    is cast back to the input dtype. Channel axis is the last axis.

    ``stats_groups`` (train mode only): the leading batch axis holds
    G interleaved groups — row i belongs to group i % G, the layout
    produced by folding a (B, G, ...) tensor into (B*G, ...). Batch
    statistics are computed PER GROUP, each group is normalized with its
    own stats, and the running stats receive G sequential updates in
    group order. This reproduces the reference's weight-shared backbone
    exactly: it calls the encoder once per stereo view
    (net_architecture.py:45-51), so torch BN sees per-view batches and
    updates running stats twice per step — while the convs here still
    run one fused (B*V) pass. Caught by
    tests/test_traj_parity.py::TestStage1Trajectory.
    """

    use_running_average: bool = False
    momentum: float = BN_MOMENTUM  # decay; torch momentum = 1 - this
    epsilon: float = BN_EPS
    stats_groups: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        out_dt = self.dtype or x.dtype
        G = self.stats_groups
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif G > 1:
            assert x.shape[0] % G == 0, (x.shape, G)
            xg = x.astype(jnp.float32).reshape((-1, G) + x.shape[1:])
            axes = (0,) + tuple(range(2, xg.ndim - 1))
            mean = jnp.mean(xg, axes)                      # (G, C)
            var = jnp.mean(jnp.square(
                xg - mean.reshape((1, G) + (1,) * (xg.ndim - 3) + (feat,))),
                axes)
            if not self.is_initializing():
                n = x.size // (feat * G)
                unbiased = var * (n / max(n - 1, 1))
                rm, rv = ra_mean.value, ra_var.value
                for g in range(G):                 # sequential, view order
                    rm = self.momentum * rm + (1 - self.momentum) * mean[g]
                    rv = (self.momentum * rv
                          + (1 - self.momentum) * unbiased[g])
                ra_mean.value, ra_var.value = rm, rv
            inv = jax.lax.rsqrt(var + self.epsilon) * scale   # (G, C)
            bshape = (1, G) + (1,) * (xg.ndim - 3) + (feat,)
            y = ((xg - mean.reshape(bshape)) * inv.reshape(bshape)
                 + bias)
            return y.reshape(x.shape).astype(out_dt)
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf - mean), axes)
            if not self.is_initializing():
                n = x.size // feat
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * unbiased)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(out_dt)


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
            x = TorchBatchNorm(use_running_average=not train,
                               name="bn")(x)
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
            x = TorchBatchNorm(use_running_average=not train,
                               name="bn")(x)
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
