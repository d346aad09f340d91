"""Torch state_dict -> flax variables converters.

Key layouts follow the reference checkpoint structure:
  * stage-1 heatmap net (``{tag}_net_HeatMap.pth`` / ``_net_RotHeatMap.pth``):
    resnet under ``backbone.backbone.backbone.*`` (the Encoder_Block also
    re-registers the same shared tensors under ``backbone.backbone.layerN.*``
    — ignored), decoder under ``after_backbone.*``
    (reference model/net_architecture.py:25-43, 53-73, 100-136).
  * lifter (``{tag}_net_AutoEncoder.pth``): see `convert_lifter`.

Transforms: Conv OIHW->HWIO, Linear (O,I)->(I,O), BatchNorm
weight/bias/running_mean/running_var -> scale/bias + batch_stats mean/var.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _linear_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (1, 0)))


def _contig(f):
    return lambda w: np.ascontiguousarray(f(w))


# torch array -> flax array transform pairs, keyed by tag. The same
# transform applies to a parameter's Adam moments (exp_avg / exp_avg_sq
# are elementwise over the parameter), which is what makes the recorded
# mapping sufficient for optimizer-state interop (compat/export.py).
TRANSFORMS: Dict[str, Tuple[Any, Any]] = {
    "id": (lambda w: w, lambda w: w),
    "conv_w": (_conv_w, _contig(lambda w: np.transpose(w, (3, 2, 0, 1)))),
    "linear_w": (_linear_w, _contig(lambda w: np.transpose(w, (1, 0)))),
    # HF-ViT specials (see convert_vit)
    "vit_mask": (lambda w: w[0, 0], lambda w: w[None, None]),
    "vit_pos": (lambda w: w[0], lambda w: w[None]),
    # patch conv (hidden, C, P, P) applied stride-P == dense over patch
    # pixels flattened (c, ph, pw)-major
    "vit_patch": (
        lambda w: np.ascontiguousarray(
            w.transpose(1, 2, 3, 0).reshape(-1, w.shape[0])),
        None,  # inverse needs (C, P) — installed by convert_vit's recorder
    ),
}


class VariableBuilder:
    """Accumulates params / batch_stats trees, recording the torch-key ->
    (collection, flax_path, transform_tag) mapping as it goes — the single
    source of truth consumed by checkpoint export and torch-optimizer
    interop (compat/export.py)."""

    def __init__(self) -> None:
        self.params: Dict[str, Any] = {}
        self.batch_stats: Dict[str, Any] = {}
        # torch state_dict key -> (collection, flax_path, transform_tag)
        self.mapping: Dict[str, Tuple[str, Tuple[str, ...], str]] = {}

    def _rec(self, torch_key: str, col: str, path: Tuple[str, ...],
             tag: str) -> None:
        self.mapping[torch_key] = (col, path, tag)

    def conv(self, state, torch_key: str, *flax_path: str, bias: bool = True):
        _set(self.params, flax_path + ("kernel",), _conv_w(state[torch_key + ".weight"]))
        self._rec(torch_key + ".weight", "params", flax_path + ("kernel",),
                  "conv_w")
        if bias:
            _set(self.params, flax_path + ("bias",), state[torch_key + ".bias"])
            self._rec(torch_key + ".bias", "params", flax_path + ("bias",),
                      "id")

    def linear(self, state, torch_key: str, *flax_path: str):
        _set(self.params, flax_path + ("kernel",), _linear_w(state[torch_key + ".weight"]))
        _set(self.params, flax_path + ("bias",), state[torch_key + ".bias"])
        self._rec(torch_key + ".weight", "params", flax_path + ("kernel",),
                  "linear_w")
        self._rec(torch_key + ".bias", "params", flax_path + ("bias",), "id")

    def bn(self, state, torch_key: str, *flax_path: str):
        _set(self.params, flax_path + ("scale",), state[torch_key + ".weight"])
        _set(self.params, flax_path + ("bias",), state[torch_key + ".bias"])
        _set(self.batch_stats, flax_path + ("mean",), state[torch_key + ".running_mean"])
        _set(self.batch_stats, flax_path + ("var",), state[torch_key + ".running_var"])
        self._rec(torch_key + ".weight", "params", flax_path + ("scale",), "id")
        self._rec(torch_key + ".bias", "params", flax_path + ("bias",), "id")
        self._rec(torch_key + ".running_mean", "batch_stats",
                  flax_path + ("mean",), "id")
        self._rec(torch_key + ".running_var", "batch_stats",
                  flax_path + ("var",), "id")

    def raw(self, value: np.ndarray, *flax_path: str,
            torch_key: str = None, tag: str = "id"):
        _set(self.params, flax_path, value)
        if torch_key is not None:
            self._rec(torch_key, "params", flax_path, tag)

    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


def convert_resnet(state: Dict[str, np.ndarray], b: VariableBuilder,
                   torch_prefix: str, flax_prefix: str,
                   model_name: str) -> None:
    from egotap_tpu.models.resnet import RESNET_SPECS
    kind, depths = RESNET_SPECS[model_name]
    p = torch_prefix
    b.conv(state, p + "conv1", flax_prefix, "conv1", bias=False)
    b.bn(state, p + "bn1", flax_prefix, "bn1")
    n_convs = 2 if kind == "basic" else 3
    for li, depth in enumerate(depths, start=1):
        for bi in range(depth):
            tkey = f"{p}layer{li}.{bi}"
            fkey = f"layer{li}_{bi}"
            for ci in range(1, n_convs + 1):
                b.conv(state, f"{tkey}.conv{ci}", flax_prefix, fkey,
                       f"conv{ci}", bias=False)
                b.bn(state, f"{tkey}.bn{ci}", flax_prefix, fkey, f"bn{ci}")
            if f"{tkey}.downsample.0.weight" in state:
                b.conv(state, f"{tkey}.downsample.0", flax_prefix, fkey,
                       "downsample_0", bias=False)
                b.bn(state, f"{tkey}.downsample.1", flax_prefix, fkey,
                     "downsample_1")


def convert_heatmap_net(state: Dict[str, np.ndarray],
                        model_name: str = "resnet18",
                        with_mapping: bool = False) -> Dict[str, Any]:
    """Convert a ``*_net_HeatMap.pth`` state_dict to HeatmapUNet variables.
    ``with_mapping=True`` additionally returns the recorded torch-key ->
    (collection, flax_path, transform) mapping (optimizer interop)."""
    b = VariableBuilder()
    convert_resnet(state, b, "backbone.backbone.backbone.", "backbone", model_name)
    for name in ("layer1_1x1", "layer2_1x1", "layer3_1x1", "layer4_1x1",
                 "conv_up1", "conv_up2", "conv_up3"):
        b.conv(state, f"after_backbone.{name}.0", name, "conv")
    b.conv(state, "after_backbone.conv_heatmap", "conv_heatmap")
    if with_mapping:
        return b.variables(), b.mapping
    return b.variables()


def _fc_stack(state: Dict[str, np.ndarray], b: VariableBuilder,
              torch_prefix: str, flax_prefix: Tuple[str, ...],
              names: Tuple[str, ...]) -> None:
    """A chain of make_fc_layer blocks: ``{prefix}.fcN.fc`` + ``.bn``."""
    for n in names:
        b.linear(state, f"{torch_prefix}{n}.fc", *flax_prefix, n, "fc")
        b.bn(state, f"{torch_prefix}{n}.bn", *flax_prefix, n, "bn")


def convert_vit(state: Dict[str, np.ndarray], b: VariableBuilder,
                torch_prefix: str, flax_path: Tuple[str, ...],
                num_layers: int) -> None:
    """Vendored-HF ViT weights (reference model/modeling_vit.py) ->
    `egotap_tpu.models.vit.GridViT` params."""
    p = torch_prefix
    b.raw(state[p + "embeddings.mask_token"][0, 0], *flax_path, "mask_token",
          torch_key=p + "embeddings.mask_token", tag="vit_mask")
    b.raw(state[p + "embeddings.position_embeddings"][0],
          *flax_path, "pos_embed",
          torch_key=p + "embeddings.position_embeddings", tag="vit_pos")
    # patch conv (C, hidden, 16, 16) applied stride-16: equivalent dense on
    # flattened patch pixels, ordered (c, ph, pw)
    w = state[p + "embeddings.patch_embeddings.projection.weight"]
    hidden = w.shape[0]
    b.raw(TRANSFORMS["vit_patch"][0](w), *flax_path, "patch_proj", "kernel",
          torch_key=p + "embeddings.patch_embeddings.projection.weight",
          tag=f"vit_patch:{w.shape[1]}:{w.shape[2]}")
    b.raw(state[p + "embeddings.patch_embeddings.projection.bias"],
          *flax_path, "patch_proj", "bias",
          torch_key=p + "embeddings.patch_embeddings.projection.bias")
    for i in range(num_layers):
        lp = f"{p}encoder.layer.{i}."
        fl = flax_path + (f"layer{i}",)
        for t_name, f_name in (("attention.attention.query", "query"),
                               ("attention.attention.key", "key"),
                               ("attention.attention.value", "value"),
                               ("attention.output.dense", "attn_out"),
                               ("intermediate.dense", "mlp_in"),
                               ("output.dense", "mlp_out")):
            b.linear(state, lp + t_name, *fl, f_name)
        for t_name, f_name in (("layernorm_before", "ln_before"),
                               ("layernorm_after", "ln_after")):
            b.raw(state[lp + t_name + ".weight"], *fl, f_name, "scale",
                  torch_key=lp + t_name + ".weight")
            b.raw(state[lp + t_name + ".bias"], *fl, f_name, "bias",
                  torch_key=lp + t_name + ".bias")
    b.raw(state[p + "layernorm.weight"], *flax_path, "ln_final", "scale",
          torch_key=p + "layernorm.weight")
    b.raw(state[p + "layernorm.bias"], *flax_path, "ln_final", "bias",
          torch_key=p + "layernorm.bias")


def convert_pu(state: Dict[str, np.ndarray], b: VariableBuilder,
               torch_prefix: str, flax_prefix: str, num_layers: int) -> None:
    """PropagationUnit cells (reference model/custom_cells.py:72-147)."""
    for i in range(num_layers):
        lp = f"{torch_prefix}layers.{i}."
        fl = (flax_prefix, f"cell{i}")
        b.linear(state, lp + "x2f", *fl, "x2f")
        b.linear(state, lp + "x2h", *fl, "x2h")
        b.linear(state, lp + "h2h", *fl, "h2h")
        if lp + "b2h.weight" in state:
            b.linear(state, lp + "b2h", *fl, "b2h")


def convert_lifter(state: Dict[str, np.ndarray], num_vit_layers: int = 3,
                   num_pu_layers: int = 2,
                   with_mapping: bool = False) -> Dict[str, Any]:
    """Convert a ``*_net_AutoEncoder.pth`` (EgoTAPAutoEncoder) state_dict.

    Torch layout (reference model/net_architecture.py:579-677):
      pos_heatmap_encoder.{vit.*, fc1..fc3.{fc,bn}}
      rot_heatmap_encoder.{fc1..fc3.{fc,bn}}
      skel_sequential_layer.lstm_custom.layers.{0,1}.{x2f,x2h,b2h,h2h}
      pose_mlp.pose_fcs.0 (single Linear for the PU config)
      global_mlp.pose_fcs.0 (UnrealEgo only)
    """
    b = VariableBuilder()
    convert_vit(state, b, "pos_heatmap_encoder.vit.", ("pos_encoder", "vit"),
                num_vit_layers)
    _fc_stack(state, b, "pos_heatmap_encoder.", ("pos_encoder",),
              ("fc1", "fc2", "fc3"))
    _fc_stack(state, b, "rot_heatmap_encoder.", ("rot_encoder",),
              ("fc1", "fc2", "fc3"))
    convert_pu(state, b, "skel_sequential_layer.lstm_custom.", "skelnet",
               num_pu_layers)
    b.linear(state, "pose_mlp.pose_fcs.0", "pose_mlp", "head")
    if "global_mlp.pose_fcs.0.weight" in state:
        b.linear(state, "global_mlp.pose_fcs.0", "global_mlp", "head")
    if with_mapping:
        return b.variables(), b.mapping
    return b.variables()
