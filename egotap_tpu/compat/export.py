"""JAX checkpoints -> the reference's ``.pth`` layout, and torch optimizer
state -> optax (resume interop).

Export writes state_dicts that ``load_state_dict(strict=True)`` into the
real reference nets (reference model/base_model.py:64-92 layout:
``{tag}_net_{HeatMap,RotHeatMap,AutoEncoder}.pth``), so TPU-trained
weights can be consumed by the reference's own test.py. The inverse
direction (``compat.convert``) and this module are pinned together by a
bit-exact round-trip test (tests/test_torch_interop.py).

Quirks reproduced for strict-load compatibility:
  * the Encoder_Block re-registers the shared resnet tensors under
    ``backbone.backbone.layerN.*`` (reference net_architecture.py:68-73) —
    export emits those alias keys with identical values;
  * the torchvision classification head (``...backbone.fc``) and the HF
    ViT ``cls_token``/``pooler`` exist in the reference nets but are never
    used by its forward paths — export synthesizes zero tensors of the
    right shapes;
  * BatchNorm ``num_batches_tracked`` buffers (unused at torch momentum
    0.1) are emitted as int64 zeros.

Optimizer interop maps the reference's ``{tag}_optim_{i}.pth`` torch
Adam/AdamW moments (reference model/base_model.py:84-92, keyed by
position in ``net.parameters()`` order) into the ScaleByAdamState inside
an optax chain, applying the same torch->flax array transforms as the
weight converter (exp_avg/exp_avg_sq are elementwise over the parameter).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from egotap_tpu.compat.convert import (TRANSFORMS, convert_heatmap_net,
                                       convert_lifter)

_BN_BUFFERS = ("running_mean", "running_var", "num_batches_tracked")
# Encoder_Block's duplicate registrations (net_architecture.py:68-73);
# canonical keys live under "backbone.backbone.backbone."
_ALIAS_PREFIX = "backbone.backbone.layer"


def _get(tree: Dict, *path: str) -> np.ndarray:
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node, np.float32)


def _has(tree: Dict, *path: str) -> bool:
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return False
        node = node[p]
    return True


class _TorchWriter:
    def __init__(self, variables: Dict[str, Any], nbt: int = 0):
        self.p = variables["params"]
        self.s = variables.get("batch_stats", {})
        self.out: Dict[str, np.ndarray] = {}
        self.nbt = np.asarray(nbt, np.int64)

    def conv(self, torch_key: str, *flax_path: str, bias: bool = True):
        inv = TRANSFORMS["conv_w"][1]
        self.out[torch_key + ".weight"] = inv(_get(self.p, *flax_path,
                                                   "kernel"))
        if bias:
            self.out[torch_key + ".bias"] = _get(self.p, *flax_path, "bias")

    def linear(self, torch_key: str, *flax_path: str):
        inv = TRANSFORMS["linear_w"][1]
        self.out[torch_key + ".weight"] = inv(_get(self.p, *flax_path,
                                                   "kernel"))
        self.out[torch_key + ".bias"] = _get(self.p, *flax_path, "bias")

    def bn(self, torch_key: str, *flax_path: str):
        self.out[torch_key + ".weight"] = _get(self.p, *flax_path, "scale")
        self.out[torch_key + ".bias"] = _get(self.p, *flax_path, "bias")
        self.out[torch_key + ".running_mean"] = _get(self.s, *flax_path,
                                                     "mean")
        self.out[torch_key + ".running_var"] = _get(self.s, *flax_path,
                                                    "var")
        self.out[torch_key + ".num_batches_tracked"] = self.nbt

    def raw(self, torch_key: str, value: np.ndarray):
        self.out[torch_key] = np.asarray(value, np.float32)


def _export_resnet(w: _TorchWriter, flax_prefix: str, torch_prefix: str,
                   model_name: str) -> None:
    from egotap_tpu.models.resnet import RESNET_SPECS
    kind, depths = RESNET_SPECS[model_name]
    n_convs = 2 if kind == "basic" else 3
    t = torch_prefix
    w.conv(t + "conv1", flax_prefix, "conv1", bias=False)
    w.bn(t + "bn1", flax_prefix, "bn1")
    for li, depth in enumerate(depths, start=1):
        for bi in range(depth):
            fkey = f"layer{li}_{bi}"
            tkey = f"{t}layer{li}.{bi}"
            for ci in range(1, n_convs + 1):
                w.conv(f"{tkey}.conv{ci}", flax_prefix, fkey, f"conv{ci}",
                       bias=False)
                w.bn(f"{tkey}.bn{ci}", flax_prefix, fkey, f"bn{ci}")
            if _has(w.p, flax_prefix, fkey, "downsample_0"):
                w.conv(f"{tkey}.downsample.0", flax_prefix, fkey,
                       "downsample_0", bias=False)
                w.bn(f"{tkey}.downsample.1", flax_prefix, fkey,
                     "downsample_1")


def export_heatmap_net(variables: Dict[str, Any],
                       model_name: str = "resnet18",
                       num_batches_tracked: int = 0) -> Dict[str, np.ndarray]:
    """HeatmapUNet variables -> a ``*_net_HeatMap.pth``-layout state_dict
    (inverse of ``convert.convert_heatmap_net``), strict-load complete."""
    from egotap_tpu.models.resnet import feature_expansion
    w = _TorchWriter(variables, num_batches_tracked)
    canon = "backbone.backbone.backbone."
    _export_resnet(w, "backbone", canon, model_name)
    # unused torchvision classification head (kept by Encoder_Block's
    # self.backbone registration; never forwarded)
    e = feature_expansion(model_name)
    w.raw(canon + "fc.weight", np.zeros((1000, 512 * e), np.float32))
    w.raw(canon + "fc.bias", np.zeros((1000,), np.float32))
    # Encoder_Block alias registrations: layer0=Sequential(conv1,bn1,relu),
    # layer1=Sequential(maxpool, resnet.layer1), layer2..4=resnet.layer2..4
    alias: Dict[str, np.ndarray] = {}
    for k, v in w.out.items():
        if not k.startswith(canon):
            continue
        rest = k[len(canon):]
        if rest.startswith("conv1."):
            alias["backbone.backbone.layer0.0." + rest[6:]] = v
        elif rest.startswith("bn1."):
            alias["backbone.backbone.layer0.1." + rest[4:]] = v
        elif rest.startswith("layer1."):
            alias["backbone.backbone.layer1.1." + rest[7:]] = v
        elif rest.startswith(("layer2.", "layer3.", "layer4.")):
            alias["backbone.backbone." + rest] = v
    w.out.update(alias)
    for name in ("layer1_1x1", "layer2_1x1", "layer3_1x1", "layer4_1x1",
                 "conv_up1", "conv_up2", "conv_up3"):
        w.conv(f"after_backbone.{name}.0", name, "conv")
    w.conv("after_backbone.conv_heatmap", "conv_heatmap")
    return w.out


def _export_vit(w: _TorchWriter, flax_path: Tuple[str, ...],
                torch_prefix: str, num_layers: int) -> None:
    t = torch_prefix
    mask = _get(w.p, *flax_path, "mask_token")
    hidden = mask.shape[-1]
    w.raw(t + "embeddings.mask_token", TRANSFORMS["vit_mask"][1](mask))
    w.raw(t + "embeddings.cls_token",
          np.zeros((1, 1, hidden), np.float32))  # unused (GridViT path)
    w.raw(t + "embeddings.position_embeddings",
          TRANSFORMS["vit_pos"][1](_get(w.p, *flax_path, "pos_embed")))
    k = _get(w.p, *flax_path, "patch_proj", "kernel")  # (C*P*P, hidden)
    P = 16  # HF ViT patch size (reference model/modeling_vit.py)
    C = k.shape[0] // (P * P)
    w.raw(t + "embeddings.patch_embeddings.projection.weight",
          np.ascontiguousarray(
              k.reshape(C, P, P, hidden).transpose(3, 0, 1, 2)))
    w.raw(t + "embeddings.patch_embeddings.projection.bias",
          _get(w.p, *flax_path, "patch_proj", "bias"))
    for i in range(num_layers):
        tp = f"{t}encoder.layer.{i}."
        fl = flax_path + (f"layer{i}",)
        for t_name, f_name in (("attention.attention.query", "query"),
                               ("attention.attention.key", "key"),
                               ("attention.attention.value", "value"),
                               ("attention.output.dense", "attn_out"),
                               ("intermediate.dense", "mlp_in"),
                               ("output.dense", "mlp_out")):
            w.linear(tp + t_name, *fl, f_name)
        for t_name, f_name in (("layernorm_before", "ln_before"),
                               ("layernorm_after", "ln_after")):
            w.raw(tp + t_name + ".weight", _get(w.p, *fl, f_name, "scale"))
            w.raw(tp + t_name + ".bias", _get(w.p, *fl, f_name, "bias"))
    w.raw(t + "layernorm.weight", _get(w.p, *flax_path, "ln_final", "scale"))
    w.raw(t + "layernorm.bias", _get(w.p, *flax_path, "ln_final", "bias"))
    # unused HF pooler (never forwarded by the reference)
    w.raw(t + "pooler.dense.weight", np.zeros((hidden, hidden), np.float32))
    w.raw(t + "pooler.dense.bias", np.zeros((hidden,), np.float32))


def export_lifter(variables: Dict[str, Any], num_vit_layers: int = 3,
                  num_pu_layers: int = 2,
                  num_batches_tracked: int = 0) -> Dict[str, np.ndarray]:
    """EgoTAPAutoEncoder variables -> ``*_net_AutoEncoder.pth`` layout
    (inverse of ``convert.convert_lifter``)."""
    w = _TorchWriter(variables, num_batches_tracked)
    _export_vit(w, ("pos_encoder", "vit"), "pos_heatmap_encoder.vit.",
                num_vit_layers)
    for enc, tpre in (("pos_encoder", "pos_heatmap_encoder."),
                      ("rot_encoder", "rot_heatmap_encoder.")):
        for n in ("fc1", "fc2", "fc3"):
            w.linear(f"{tpre}{n}.fc", enc, n, "fc")
            w.bn(f"{tpre}{n}.bn", enc, n, "bn")
    for i in range(num_pu_layers):
        tp = f"skel_sequential_layer.lstm_custom.layers.{i}."
        for name in ("x2f", "x2h", "b2h", "h2h"):
            if name == "b2h" and not _has(w.p, "skelnet", f"cell{i}", "b2h"):
                continue
            w.linear(tp + name, "skelnet", f"cell{i}", name)
    w.linear("pose_mlp.pose_fcs.0", "pose_mlp", "head")
    if _has(w.p, "global_mlp"):
        w.linear("global_mlp.pose_fcs.0", "global_mlp", "head")
    return w.out


def save_torch_state_dict(state_dict: Dict[str, np.ndarray],
                          path: str) -> None:
    """Write a ``.pth`` the reference's torch.load can read (torch zip
    serialization). Uses the baked-in CPU torch; the loader direction
    (compat.torch_loader) stays torch-free."""
    import collections
    import torch

    def to_tensor(v):
        v = np.asarray(v)
        if v.ndim:  # ascontiguousarray would promote 0-d scalars to 1-d
            v = np.ascontiguousarray(v)
        return torch.from_numpy(v)

    od = collections.OrderedDict((k, to_tensor(v))
                                 for k, v in state_dict.items())
    torch.save(od, path)


def export_reference_checkpoints(state, out_dir: str, tag: str = "best",
                                 model_name: str = "resnet18",
                                 num_vit_layers: int = 3,
                                 num_pu_layers: int = 2) -> List[str]:
    """Emit the reference-layout ``{tag}_net_*.pth`` files from a
    TrainState (reference model/base_model.py:64-82 naming).

    HeatmapTask states (no frozen nets) -> ``{tag}_net_HeatMap.pth``;
    LifterTask states -> AutoEncoder + the two frozen stage-1 nets.
    """
    import os
    os.makedirs(out_dir, exist_ok=True)
    written = []

    def emit(name: str, sd: Dict[str, np.ndarray]):
        path = os.path.join(out_dir, f"{tag}_net_{name}.pth")
        save_torch_state_dict(sd, path)
        written.append(path)

    params = state.params
    frozen = state.frozen or {}
    if "pos_encoder" in params:  # lifter state
        variables = {"params": params, "batch_stats": state.batch_stats}
        emit("AutoEncoder", export_lifter(variables, num_vit_layers,
                                          num_pu_layers))
        for name, key in (("HeatMap", "heatmap"),
                          ("RotHeatMap", "rot_heatmap")):
            if key in frozen:
                emit(name, export_heatmap_net(frozen[key], model_name))
    else:
        variables = {"params": params, "batch_stats": state.batch_stats}
        emit("HeatMap", export_heatmap_net(variables, model_name))
    return written


# ---------------------------------------------------------------------------
# torch optimizer -> optax


def torch_param_names(net_state_dict: Dict[str, Any]) -> List[str]:
    """Parameter names in ``net.parameters()`` order, derived from the
    state_dict's insertion order: drop BN buffers and the Encoder_Block
    alias re-registrations (named_parameters() dedups by tensor identity,
    keeping the first-registered name — the canonical one)."""
    return [k for k in net_state_dict
            if not k.split(".")[-1] in _BN_BUFFERS
            and not k.startswith(_ALIAS_PREFIX)]


def load_torch_adam_state(optim_sd: Dict[str, Any],
                          net_sd: Dict[str, Any],
                          mapping: Dict[str, Tuple[str, Tuple[str, ...], str]],
                          params_template: Any,
                          ) -> Tuple[int, Any, Any]:
    """Map a torch Adam/AdamW ``optimizer.state_dict()`` to (count, mu, nu)
    trees shaped like ``params_template``.

    ``mapping`` is VariableBuilder.mapping from converting the matching
    net state_dict — the moments get the same array transforms as their
    parameters. Params without torch state (e.g. the unused ViT
    cls_token/pooler, never given gradients) keep zero moments, matching
    torch's lazily-created state. Torch keeps a per-param step; optax's
    ScaleByAdamState has one global count — asserts the steps agree.
    """
    import jax

    names = torch_param_names(net_sd)
    groups = optim_sd["param_groups"]
    idx_order = [i for g in groups for i in g["params"]]
    if len(idx_order) != len(names):
        raise ValueError(
            f"optimizer has {len(idx_order)} params, net has {len(names)}")
    mu = jax.tree.map(lambda p: np.zeros(p.shape, np.float32),
                      params_template)
    nu = jax.tree.map(lambda p: np.zeros(p.shape, np.float32),
                      params_template)

    def _set(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node[p]
        if node[path[-1]].shape != value.shape:
            raise ValueError(f"moment shape mismatch at {path}: "
                             f"{node[path[-1]].shape} vs {value.shape}")
        node[path[-1]] = value

    steps = set()
    for pos, idx in enumerate(idx_order):
        st = optim_sd["state"].get(idx)
        if st is None:
            continue  # param never updated: moments stay zero
        name = names[pos]
        if name not in mapping:
            # unused reference-only params (fc head, cls_token, pooler)
            continue
        col, path, tag = mapping[name]
        if col != "params":
            raise ValueError(f"{name} maps to non-param collection {col}")
        fwd = TRANSFORMS[tag.split(":")[0]][0]
        _set(mu, path, np.asarray(fwd(st["exp_avg"]), np.float32))
        _set(nu, path, np.asarray(fwd(st["exp_avg_sq"]), np.float32))
        steps.add(int(np.asarray(st["step"]).item()))
    if len(steps) > 1:
        raise ValueError(f"non-uniform torch Adam steps: {sorted(steps)}")
    count = steps.pop() if steps else 0
    return count, mu, nu


def install_adam_moments(opt_state: Any, count: int, mu: Any, nu: Any,
                         schedule_count: Optional[int] = None) -> Any:
    """Return ``opt_state`` with its (unique) ScaleByAdamState replaced by
    the given count/mu/nu, and any ScaleByScheduleState count (the lr
    schedule's own step, optax.scale_by_learning_rate) set to
    ``schedule_count`` (defaults to ``count``). Works on any optax.chain
    composition (e.g. the Adam and AdamW chains in train/optim.py)."""
    import jax
    import jax.numpy as jnp
    import optax

    sched_count = count if schedule_count is None else schedule_count
    found = [0]

    def visit(node):
        if isinstance(node, optax.ScaleByAdamState):
            found[0] += 1
            return node._replace(
                count=jnp.asarray(count, node.count.dtype),
                mu=jax.tree.map(lambda old, new: jnp.asarray(
                    new, old.dtype), node.mu, mu),
                nu=jax.tree.map(lambda old, new: jnp.asarray(
                    new, old.dtype), node.nu, nu))
        if isinstance(node, optax.ScaleByScheduleState):
            return node._replace(
                count=jnp.asarray(sched_count, node.count.dtype))
        if isinstance(node, tuple):
            vals = [visit(v) for v in node]
            if hasattr(node, "_fields"):
                return type(node)(*vals)
            return tuple(vals)
        return node

    out = visit(opt_state)
    if found[0] != 1:
        raise ValueError(f"expected exactly one ScaleByAdamState in the "
                         f"optimizer chain, found {found[0]}")
    return out


def resume_step_from_scheduler(sched_sd: Dict[str, Any], lr_policy: str,
                               iters_per_epoch: int) -> int:
    """Torch scheduler state -> the TrainState.step that makes our pure
    lr(step) schedule (train/optim.py:make_schedule) agree with the
    resumed torch scheduler. ``last_epoch`` counts scheduler.step() calls:
    per-epoch for 'lambda'/'step'/'exponent' (reference train.py:224),
    per-iteration for 'cos_anneal*' (train.py:129-130)."""
    last = int(sched_sd["last_epoch"])
    if lr_policy in ("lambda", "step", "exponent"):
        return last * iters_per_epoch
    return last


def load_reference_optimizer(optim_path: str, net_path: str,
                             params_template: Any, opt_state: Any,
                             model_name: str = "resnet18") -> Tuple[Any, int]:
    """One-call resume: read ``{tag}_optim_i.pth`` + its net ``.pth``,
    rebuild the key mapping, and install the moments into ``opt_state``.
    Returns (new_opt_state, torch_step_count)."""
    from egotap_tpu.compat.torch_loader import (load_torch_checkpoint,
                                                strip_module_prefix)
    net_sd = strip_module_prefix(load_torch_checkpoint(net_path))
    optim_sd = load_torch_checkpoint(optim_path)
    if "pos_heatmap_encoder.fc1.fc.weight" in net_sd:
        _, mapping = convert_lifter(net_sd, with_mapping=True)
    else:
        _, mapping = convert_heatmap_net(net_sd, model_name,
                                         with_mapping=True)
    count, mu, nu = load_torch_adam_state(optim_sd, net_sd, mapping,
                                          params_template)
    return install_adam_moments(opt_state, count, mu, nu), count
