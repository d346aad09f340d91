"""Tensor parallelism for the lifter (Megatron-style param shardings).

The reference has no model parallelism at all (its --distributed flag is
dead, options/base_options.py:81); `parallel/mesh.py` provides the
('data', 'model') mesh and data parallelism. This module puts the
'model' axis to work for serving: the lifter ViT's projection weights
are sharded column-/row-parallel so each chip holds 1/num_model of the
big matmuls and XLA/GSPMD inserts the reduce over ICI at the row-parallel
boundaries — the classic Megatron pattern, expressed as nothing but
`NamedSharding` placements on the parameter pytree (no model rewrite).

Rules (module name -> kernel spec):
  * query/key/value, mlp_in     -> P(None, 'model')   (column parallel;
    bias and per-output-channel quant scales shard with the output dim)
  * attn_out, mlp_out           -> P('model', None)   (row parallel;
    bias replicated — GSPMD adds it after the psum)
  * everything else (patch_proj, LayerNorms, PU cells, FC stacks,
    batch_stats, activation scales) -> replicated

The packed attention keeps q/k/v in (B, S, H*Dh) layout, so the
column-sharded output dim IS the head dim: head boundaries align with
the shards whenever num_model divides num_heads. Shardings never change
results — GSPMD partitions the same program — so parity with the
single-device predictor is exact (tests/test_serving.py).

Dims that num_model does not divide fall back to replicated, leaf by
leaf, so any (mesh, model) combination is safe.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COL_MODULES = frozenset({"query", "key", "value", "mlp_in"})
ROW_MODULES = frozenset({"attn_out", "mlp_out"})


def _spec(module: str, leaf: str, shape, num_model: int) -> P:
    if module in COL_MODULES:
        if leaf in ("kernel", "kernel_q") and len(shape) == 2 \
                and shape[1] % num_model == 0:
            return P(None, "model")
        if leaf in ("bias", "scale") and len(shape) == 1 \
                and shape[0] % num_model == 0:
            return P("model")
    elif module in ROW_MODULES:
        if leaf in ("kernel", "kernel_q") and len(shape) == 2 \
                and shape[0] % num_model == 0:
            return P("model", None)
        # bias / per-output scale apply after the row-parallel reduce:
        # replicated
    return P()


def lifter_tp_shardings(variables: Dict[str, Any], mesh: Mesh
                        ) -> Dict[str, Any]:
    """A NamedSharding pytree congruent with `variables` implementing the
    column/row-parallel rules above over the mesh's 'model' axis."""
    num_model = mesh.shape["model"]

    def walk(node, parent_name):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk(v, k)
            else:
                out[k] = NamedSharding(
                    mesh, _spec(parent_name, k, getattr(v, "shape", ()),
                                num_model))
        return out

    return walk(variables, "")


def shard_lifter_vars(variables: Dict[str, Any], mesh: Mesh
                      ) -> Dict[str, Any]:
    """Place lifter variables per `lifter_tp_shardings` (replicated when
    the mesh has no 'model' extent)."""
    sh = lifter_tp_shardings(variables, mesh)
    return jax.tree.map(jax.device_put, variables, sh)
