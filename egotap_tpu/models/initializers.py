"""Reference-parity weight initialization.

The reference re-initializes networks after construction
(model/network_utils.py:37-58, 69-82):
  * Conv/Linear weights: kaiming normal, fan_in, a=0 (default init_type);
    biases zero. This applies to EVERYTHING with a Conv/Linear child —
    including the vendored ViT (overriding HF's trunc-normal) and the PU
    cells (overriding their uniform reset).
  * BatchNorm2d: weight ~ U[0.02, 1.0], bias 0. BatchNorm1d is NOT
    matched by the reference's classname check and keeps torch defaults
    (weight 1, bias 0) — the flax default.
  * With --init_ImageNet, the stage-1 resnet trunk keeps its pretrained
    weights and only the decoder is re-initialized
    (network_utils.py:76-80). Pretrained trunk weights can be supplied as
    a torchvision resnet state_dict (.pth) via `imagenet_backbone`.

`apply_reference_init` rewrites an initialized flax params tree in place
with these semantics (deterministic given the rng key).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# flax BatchNorm parameter leaf names
_BN_LEAVES = ("scale",)


def _is_bn2d_path(path: Tuple[str, ...]) -> bool:
    """BatchNorm2d instances live in the resnet trunk (named bn1/bn2/bn3
    or downsample_1); FC-stack norms (named plain 'bn') are BatchNorm1d
    and keep defaults, matching the reference's classname check."""
    parent = path[-2] if len(path) >= 2 else ""
    return parent in ("bn1", "bn2", "bn3", "downsample_1")


def kaiming_fan_in(rng, shape, dtype=jnp.float32):
    """torch kaiming_normal_(mode='fan_in', a=0): N(0, sqrt(2 / fan_in)).
    fan_in for conv HWIO = H*W*I; for dense (I, O) = I."""
    fan_in = int(np.prod(shape[:-1]))
    std = np.sqrt(2.0 / fan_in)
    return jax.random.normal(rng, shape, dtype) * std


def apply_reference_init(params: Dict[str, Any], rng,
                         skip_prefixes: Sequence[Tuple[str, ...]] = ()
                         ) -> Dict[str, Any]:
    """Re-draw kernels (kaiming fan_in), zero biases, U[0.02, 1] BN2d
    scales. Subtrees whose path starts with any of `skip_prefixes` are
    left untouched (e.g. (('backbone',),) for init_ImageNet)."""
    leaves = jax.tree_util.tree_leaves_with_path(params)
    rngs = jax.random.split(rng, len(leaves))

    flat = {}
    for key, (path, leaf) in zip(rngs, leaves):
        names = tuple(getattr(p, "key", str(p)) for p in path)
        if any(names[: len(sp)] == tuple(sp) for sp in skip_prefixes):
            flat[names] = leaf
            continue
        name = names[-1]
        parent = names[-2] if len(names) >= 2 else ""
        if name == "kernel" and leaf.ndim >= 2:
            flat[names] = kaiming_fan_in(key, leaf.shape, leaf.dtype)
        elif name == "bias":
            flat[names] = jnp.zeros_like(leaf)
        elif name == "scale" and _is_bn2d_path(names):
            flat[names] = jax.random.uniform(key, leaf.shape, leaf.dtype,
                                             0.02, 1.0)
        else:
            flat[names] = leaf

    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
        return flat[prefix]

    return rebuild(params)


def load_imagenet_backbone(variables: Dict[str, Any], pth_path: str,
                           model_name: str = "resnet18") -> Dict[str, Any]:
    """Overwrite the `backbone` subtree with a torchvision resnet
    state_dict (.pth), e.g. resnet18-f37072fd.pth."""
    from egotap_tpu.compat.convert import VariableBuilder, convert_resnet
    from egotap_tpu.compat.torch_loader import load_torch_checkpoint

    state = load_torch_checkpoint(pth_path)
    b = VariableBuilder()
    convert_resnet(state, b, "", "backbone", model_name)
    out = jax.tree.map(lambda x: x, variables)  # shallow copy
    out["params"]["backbone"] = jax.tree.map(
        jnp.asarray, b.params["backbone"])
    out["batch_stats"]["backbone"] = jax.tree.map(
        jnp.asarray, b.batch_stats["backbone"])
    return out
