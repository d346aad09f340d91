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

from typing import Sequence, Tuple

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
    # int8 inference convs throughout (ops/quant.py; identical param tree,
    # gated by Config.int8_heatmap_inference — eval/serving only)
    quant: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """images: (B, V, H, W, 3) -> heatmaps (B, H/4, W/4, num_output_maps*V)."""
        b, v = images.shape[0], images.shape[1]
        assert v == self.views, f"expected {self.views} views, got {v}"
        q = self.quant
        flat = images.reshape((b * v,) + images.shape[2:])

        # bn_views: the fold puts view v of sample b at row b*V+v, so
        # train-mode BN must compute per-view statistics (row i % V) to
        # match the reference's per-view encoder calls
        pyramid = ResNetEncoder(self.model_name, quant=q, bn_views=v,
                                name="backbone")(flat, train=train)
        merged = [_merge_views(f, b, v) for f in pyramid]
        _, _, layer1, layer2, layer3, layer4 = merged

        fs = feature_expansion(self.model_name) * self.views

        layer4 = ConvReLU(512 * fs, 1, 0, quant=q, name="layer4_1x1")(layer4)
        x = upsample2x_align_corners(layer4)
        layer3 = ConvReLU(258 * fs, 1, 0, quant=q, name="layer3_1x1")(layer3)
        x = jnp.concatenate([x, layer3], axis=-1)
        x = ConvReLU(512 * fs, 3, 1, quant=q, name="conv_up3")(x)

        x = upsample2x_align_corners(x)
        layer2 = ConvReLU(128 * fs, 1, 0, quant=q, name="layer2_1x1")(layer2)
        x = jnp.concatenate([x, layer2], axis=-1)
        x = ConvReLU(256 * fs, 3, 1, quant=q, name="conv_up2")(x)

        x = upsample2x_align_corners(x)
        layer1 = ConvReLU(64 * fs, 1, 0, quant=q, name="layer1_1x1")(layer1)
        x = jnp.concatenate([x, layer1], axis=-1)
        x = ConvReLU(256 * fs, 3, 1, quant=q, name="conv_up1")(x)

        if q:
            from egotap_tpu.ops.quant import QConv
            return QConv(self.num_output_maps * self.views, 1, 1, 0,
                         use_bias=True, name="conv_heatmap")(x)
        out = nn.Conv(self.num_output_maps * self.views, kernel_size=(1, 1),
                      padding="VALID", use_bias=True, name="conv_heatmap",
                      dtype=x.dtype)(x)
        return out


def _merge_views_grouped(feat: jnp.ndarray, batch: int, views: int,
                         groups: int) -> jnp.ndarray:
    """(B*V, h, w, G*c) -> (B, h, w, G*(V*c)): per-group view-major concat,
    keeping group blocks contiguous for the next grouped conv."""
    _, h, w, gc = feat.shape
    c = gc // groups
    feat = feat.reshape(batch, views, h, w, groups, c)
    feat = feat.transpose(0, 2, 3, 4, 1, 5)
    return feat.reshape(batch, h, w, groups * views * c)


class FusedHeatmapUNet(nn.Module):
    """Several weight-independent HeatmapUNets fused into ONE grouped-conv
    pass (a TPU-native optimization with no reference counterpart).

    The lifter evaluates two identical-architecture stage-1 nets (pos +
    rot) on the SAME stereo input; running them as feature groups of one
    network keeps weights independent and is numerically identical to
    running the nets separately (unit-tested). Build the fused variables
    from per-net checkpoints with `fuse_heatmap_variables`.

    STATUS: experimental, NOT used by default. Measured on v5e (XLA as of
    round 1): 46.4 ms vs 27.7 ms for the separate nets at batch 32 —
    XLA's grouped-convolution lowering loses far more than the wider ops
    gain (a single large grouped conv microbenchmarks 11% faster, but the
    full net regresses). Revisit if grouped-conv lowering improves or via
    a Pallas conv kernel.

    Output channels: [net0's num_maps*V | net1's ... ] — exactly the
    concatenated pred_heatmap_cat the lifter consumes.
    """

    out_maps: Tuple[int, ...]       # per-net output maps (e.g. (15, 30))
    model_name: str = "resnet18"
    views: int = 2

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, v = images.shape[0], images.shape[1]
        G = len(self.out_maps)
        flat = images.reshape((b * v,) + images.shape[2:])
        flat = jnp.concatenate([flat] * G, axis=-1)   # group-replicated RGB

        pyramid = ResNetEncoder(self.model_name, groups=G,
                                name="backbone")(flat, train=train)
        merged = [_merge_views_grouped(f, b, v, G) for f in pyramid[1:]]
        layer0, layer1, layer2, layer3, layer4 = merged

        fs = feature_expansion(self.model_name) * self.views

        def crelu(feats, k, p, name):
            return ConvReLU(feats * G, k, p, groups=G, name=name)

        layer4 = crelu(512 * fs, 1, 0, "layer4_1x1")(layer4)
        x = upsample2x_align_corners(layer4)
        layer3 = crelu(258 * fs, 1, 0, "layer3_1x1")(layer3)
        x = _concat_grouped([x, layer3], G)
        x = crelu(512 * fs, 3, 1, "conv_up3")(x)

        x = upsample2x_align_corners(x)
        layer2 = crelu(128 * fs, 1, 0, "layer2_1x1")(layer2)
        x = _concat_grouped([x, layer2], G)
        x = crelu(256 * fs, 3, 1, "conv_up2")(x)

        x = upsample2x_align_corners(x)
        layer1 = crelu(64 * fs, 1, 0, "layer1_1x1")(layer1)
        x = _concat_grouped([x, layer1], G)
        x = crelu(256 * fs, 3, 1, "conv_up1")(x)

        # per-net heads (different output widths -> separate 1x1 convs)
        per = x.shape[-1] // G
        outs = []
        for g, maps in enumerate(self.out_maps):
            xg = x[..., g * per:(g + 1) * per]
            outs.append(nn.Conv(maps * self.views, kernel_size=(1, 1),
                                padding="VALID", use_bias=True,
                                name=f"conv_heatmap_g{g}",
                                dtype=x.dtype)(xg))
        return jnp.concatenate(outs, axis=-1)


def _concat_grouped(parts, groups: int) -> jnp.ndarray:
    """Concatenate per-group channel blocks group-wise:
    [A=(...,G*a), B=(...,G*b)] -> (..., G*(a+b)) with blocks
    [g0:a,b | g1:a,b | ...]."""
    import jax.numpy as jnp
    shards = []
    for g in range(groups):
        for p in parts:
            c = p.shape[-1] // groups
            shards.append(p[..., g * c:(g + 1) * c])
    return jnp.concatenate(shards, axis=-1)


def fuse_heatmap_variables(variable_sets):
    """Zip N per-net HeatmapUNet variable trees into FusedHeatmapUNet
    variables: conv kernels/biases concat on the output-channel axis, BN
    leaves on axis 0, heads kept per-net."""
    import jax

    def zip_leaves(*leaves):
        l0 = leaves[0]
        axis = -1 if l0.ndim == 4 else 0
        return jnp.concatenate(leaves, axis=axis)

    fused = {"params": {}, "batch_stats": {}}
    for col in ("params", "batch_stats"):
        trees = [vs[col] for vs in variable_sets]
        body = [{k: v for k, v in t.items() if k != "conv_heatmap"}
                for t in trees]
        fused[col] = jax.tree.map(zip_leaves, *body)
        if col == "params":
            for g, t in enumerate(trees):
                fused[col][f"conv_heatmap_g{g}"] = t["conv_heatmap"]
    return fused


def split_views(heatmap_cat: jnp.ndarray, views: int) -> Sequence[jnp.ndarray]:
    """Split the concatenated per-view channels (torch.chunk along dim 1
    equivalent; here the channel axis is last)."""
    if views == 1:
        return [heatmap_cat]
    c = heatmap_cat.shape[-1]
    assert c % views == 0
    per = c // views
    return [heatmap_cat[..., i * per:(i + 1) * per] for i in range(views)]
