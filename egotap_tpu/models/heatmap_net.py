"""Stage-1 stereo heatmap estimator: shared ResNet encoder + UNet decoder.

Reference: ``HeatMap_UnrealEgo_Shared`` (model/net_architecture.py:25-173).
  * The backbone is weight-shared across the stereo views; the reference
    loops over views (net_architecture.py:45-51) — here both views are
    folded into the batch dimension for one large MXU-friendly pass.
  * The decoder concatenates the two views' feature pyramids channel-wise
    (view-major, matching torch.cat ordering) at every scale, then runs
    3 x (bilinear-up x2 [align_corners] -> 1x1 skip conv -> concat -> 3x3
    conv) and a final 1x1 conv to ``num_output_maps * views`` channels at
    1/4 input resolution (net_architecture.py:100-173).
  * The odd 258-channel width of the layer3 skip conv is reproduced as-is
    (net_architecture.py:123).

Layout: NHWC. Heatmap outputs are (B, H, W, C) with channel order identical
to the reference's NCHW dim-1 (view-major: all view-0 maps then view-1).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from egotap_tpu.models.layers import ConvReLU
from egotap_tpu.models.resnet import ResNetEncoder, feature_expansion
from egotap_tpu.ops.upsample import upsample2x_align_corners


def _merge_views(feat: jnp.ndarray, batch: int, views: int) -> jnp.ndarray:
    """(B*V, h, w, c) -> (B, h, w, V*c), view-major channel order."""
    _, h, w, c = feat.shape
    feat = feat.reshape(batch, views, h, w, c)
    feat = feat.transpose(0, 2, 3, 1, 4)
    return feat.reshape(batch, h, w, views * c)


class HeatmapUNet(nn.Module):
    """Weight-shared stereo encoder + channel-concat UNet decoder.

    Attributes:
      num_output_maps: per-view output channels
        (= num_heatmap + num_rot_heatmap * limb_dim).
      model_name: resnet18|resnet34|resnet50|resnet101.
      views: input_channel_scale (2 = stereo, 1 = mono).
    """

    num_output_maps: int
    model_name: str = "resnet18"
    views: int = 2

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """images: (B, V, H, W, 3) -> heatmaps (B, H/4, W/4, num_output_maps*V)."""
        b, v = images.shape[0], images.shape[1]
        assert v == self.views, f"expected {self.views} views, got {v}"
        flat = images.reshape((b * v,) + images.shape[2:])

        pyramid = ResNetEncoder(self.model_name, name="backbone")(flat, train=train)
        merged = [_merge_views(f, b, v) for f in pyramid]
        _, _, layer1, layer2, layer3, layer4 = merged

        fs = feature_expansion(self.model_name) * self.views

        layer4 = ConvReLU(512 * fs, 1, 0, name="layer4_1x1")(layer4)
        x = upsample2x_align_corners(layer4)
        layer3 = ConvReLU(258 * fs, 1, 0, name="layer3_1x1")(layer3)
        x = jnp.concatenate([x, layer3], axis=-1)
        x = ConvReLU(512 * fs, 3, 1, name="conv_up3")(x)

        x = upsample2x_align_corners(x)
        layer2 = ConvReLU(128 * fs, 1, 0, name="layer2_1x1")(layer2)
        x = jnp.concatenate([x, layer2], axis=-1)
        x = ConvReLU(256 * fs, 3, 1, name="conv_up2")(x)

        x = upsample2x_align_corners(x)
        layer1 = ConvReLU(64 * fs, 1, 0, name="layer1_1x1")(layer1)
        x = jnp.concatenate([x, layer1], axis=-1)
        x = ConvReLU(256 * fs, 3, 1, name="conv_up1")(x)

        out = nn.Conv(self.num_output_maps * self.views, kernel_size=(1, 1),
                      padding="VALID", use_bias=True, name="conv_heatmap",
                      dtype=x.dtype)(x)
        return out


def split_views(heatmap_cat: jnp.ndarray, views: int) -> Sequence[jnp.ndarray]:
    """Split the concatenated per-view channels (torch.chunk along dim 1
    equivalent; here the channel axis is last)."""
    if views == 1:
        return [heatmap_cat]
    c = heatmap_cat.shape[-1]
    assert c % views == 0
    per = c // views
    return [heatmap_cat[..., i * per:(i + 1) * per] for i in range(views)]
