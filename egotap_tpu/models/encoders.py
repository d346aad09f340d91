"""Heatmap -> per-joint embedding encoders.

  * `GridViTEncoder`: Grid-ViT patch encoder + FC projection stack
    (reference ``PatchedHeatmapFeatureExtractorViT``,
    model/net_architecture.py:320-415).
  * `LimbFCEncoder`: per-limb FC encoder
    (reference ``HeatmapFeatureExtractorFC``, model/net_architecture.py:249-274).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from egotap_tpu.models.layers import FCBlock
from egotap_tpu.models.vit import GridViT


class GridViTEncoder(nn.Module):
    """(B, N, C, H, H) heatmaps — or pre-patchified (B, N, P*P, C*ps*ps)
    tokens — -> (B, N * hidden) joint embeddings."""

    num_tiles: int
    hidden_size: int = 128
    channels: int = 1
    vit_hidden: int = 1024
    vit_layers: int = 3
    heatmap_size: int = 64
    quant: bool = False   # int8 inference ViT matmuls

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, n = x.shape[0], x.shape[1]
        z = GridViT(num_tiles=self.num_tiles, channels=self.channels,
                    hidden_size=self.vit_hidden, num_layers=self.vit_layers,
                    heatmap_size=self.heatmap_size, quant=self.quant,
                    name="vit")(x)
        # FC stack over flattened (B*N) rows — train-mode BN spans B*N rows
        # exactly like the reference (net_architecture.py:406-411)
        q = self.quant
        z = z.reshape(b * n, -1)
        z = FCBlock(2048, quant=q, name="fc1")(z, train=train)
        z = FCBlock(512, quant=q, name="fc2")(z, train=train)
        z = FCBlock(self.hidden_size, quant=q, name="fc3")(z, train=train)
        return z.reshape(b, n * self.hidden_size)


class ConvHeatmapEncoder(nn.Module):
    """Legacy whole-stack conv encoder (reference ``HeatmapFeatureExtractor``,
    model/net_architecture.py:276-317): 3 stride-2 ConvBlocks + 3 FCBlocks
    producing one latent for the entire heatmap stack.

    Upstream note: the reference's forward references an undefined
    ``self.is_indep`` attribute, so the non-patched path crashes there
    unless the attribute is injected; the shipped configs never use it.
    Here the working (non-indep) semantics are implemented.
    """

    hidden_size: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, H, W, C) heatmap stack -> (B, hidden_size)."""
        from egotap_tpu.models.layers import ConvBlock
        b = x.shape[0]
        for i, feats in enumerate((32, 64, 128)):
            x = ConvBlock(feats, kernel_size=4, stride=2, padding=1,
                          name=f"conv{i + 1}")(x, train=train)
        x = x.reshape(b, -1)
        x = FCBlock(2048, name="fc1")(x, train=train)
        x = FCBlock(512, name="fc2")(x, train=train)
        return FCBlock(self.hidden_size, name="fc3")(x, train=train)


class HeatmapDecoder(nn.Module):
    """Vestigial heatmap reconstruction decoder (reference
    ``HeatmapDecoder``, model/net_architecture.py:417-464): FC stack to a
    (H/8, W/8, 128) grid, then 3 stride-2 deconv blocks. The reference
    instantiates it nowhere and returns zeros for reconstruction
    (net_architecture.py:756); provided for API completeness.
    """

    num_heatmap: int
    heatmap_size: int = 64

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, hidden) latent -> (B, H, W, num_heatmap)."""
        from egotap_tpu.models.layers import TorchBatchNorm, leaky_relu
        b = z.shape[0]
        g = self.heatmap_size // 8
        z = FCBlock(512, name="fc1")(z, train=train)
        z = FCBlock(2048, name="fc2")(z, train=train)
        z = FCBlock(g * g * 128, name="fc3")(z, train=train)
        x = z.reshape(b, g, g, 128)
        for i, feats in enumerate((64, 32, self.num_heatmap)):
            x = nn.ConvTranspose(feats, kernel_size=(4, 4), strides=(2, 2),
                                 padding="SAME",
                                 name=f"deconv{i + 1}")(x)
            x = TorchBatchNorm(use_running_average=not train,
                               name=f"deconv_bn{i + 1}")(x)
            x = leaky_relu(x)
        return x


class LimbFCEncoder(nn.Module):
    """(B, M, C, H, W) limb heatmaps -> (B, M * hidden) embeddings.

    M = views * num_rot_heatmap rows, each a flattened (C*H*W) vector with
    channel-major pixel order (the reference's reshape semantics,
    net_architecture.py:263-274). Accepts (B, M, C, H, W) or already
    row-flattened (B, M, C*H*W).
    """

    hidden_size: int = 128
    quant: bool = False   # int8 inference matmuls

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, m = x.shape[0], x.shape[1]
        q = self.quant
        z = x.reshape(b * m, -1)
        z = FCBlock(2048, quant=q, name="fc1")(z, train=train)
        z = FCBlock(512, quant=q, name="fc2")(z, train=train)
        z = FCBlock(self.hidden_size, quant=q, name="fc3")(z, train=train)
        return z.reshape(b, m * self.hidden_size)
