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
    """(B, N, C, H, H) heatmaps -> (B, N * hidden) joint embeddings."""

    num_tiles: int
    hidden_size: int = 128
    channels: int = 1
    vit_hidden: int = 1024
    vit_layers: int = 3
    heatmap_size: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, n = x.shape[0], x.shape[1]
        z = GridViT(num_tiles=self.num_tiles, channels=self.channels,
                    hidden_size=self.vit_hidden, num_layers=self.vit_layers,
                    heatmap_size=self.heatmap_size,
                    name="vit")(x)
        # FC stack over flattened (B*N) rows — train-mode BN spans B*N rows
        # exactly like the reference (net_architecture.py:406-411)
        z = z.reshape(b * n, -1)
        z = FCBlock(2048, name="fc1")(z, train=train)
        z = FCBlock(512, name="fc2")(z, train=train)
        z = FCBlock(self.hidden_size, name="fc3")(z, train=train)
        return z.reshape(b, n * self.hidden_size)


class LimbFCEncoder(nn.Module):
    """(B, M, C, H, W) limb heatmaps -> (B, M * hidden) embeddings.

    M = views * num_rot_heatmap rows, each a flattened (C*H*W) vector with
    channel-major pixel order (the reference's reshape semantics,
    net_architecture.py:263-274).
    """

    hidden_size: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, m = x.shape[0], x.shape[1]
        z = x.reshape(b * m, -1)
        z = FCBlock(2048, name="fc1")(z, train=train)
        z = FCBlock(512, name="fc2")(z, train=train)
        z = FCBlock(self.hidden_size, name="fc3")(z, train=train)
        return z.reshape(b, m * self.hidden_size)
