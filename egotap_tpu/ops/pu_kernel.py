"""Fused Propagation-Unit chain kernel (Pallas, TPU).

The PU chain is 15-17 sequential steps of small matmuls; as a `lax.scan`
each step is a separate dispatch (~2 ms/batch of pure latency on TPU).
This kernel runs the whole chain in ONE program with the recurrent weights
and (h, c) states resident in VMEM, so per-step cost is just the MXU time
of four [B,H]x[H,4H] matmuls (~9 MB VMEM total for the shipped config).

Math is identical to `egotap_tpu.models.cells.PUChain` (chain semantics,
2 layers): the (x, bridge)-only terms are precomputed outside and passed
in as `fh` (layer-0 h-forget gates) and `gates_pre` (layer-0 gate
preactivations including the h2h bias).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pu_kernel(fh_ref, gp_ref, wh2h_ref,
               wx2f1_ref, bx2f1_ref, wx2h1_ref, bx2h1_ref,
               wh2h1_ref, bh2h1_ref, out_ref, *, num_joints: int,
               hidden: int):
    H = hidden
    B = fh_ref.shape[0]

    def cell_update(gates, c):
        f = gates[:, :H]
        i = gates[:, H:2 * H]
        g = gates[:, 2 * H:3 * H]
        o = gates[:, 3 * H:]
        c_new = c * jax.nn.sigmoid(f) + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return h_new, c_new

    wh2h = wh2h_ref[:]
    wx2f1 = wx2f1_ref[:]
    wx2h1 = wx2h1_ref[:]
    wh2h1 = wh2h1_ref[:]
    bx2f1 = bx2f1_ref[:]
    bx2h1 = bx2h1_ref[:]
    bh2h1 = bh2h1_ref[:]

    def body(j, carry):
        h0, c0, h1, c1 = carry
        fh_t = fh_ref[:, j, :]
        gates = gp_ref[:, j, :] + jnp.dot(
            (fh_t * h0).astype(wh2h.dtype), wh2h,
            preferred_element_type=jnp.float32)
        h0, c0 = cell_update(gates, c0)

        x = h0.astype(wx2f1.dtype)
        fh1 = jax.nn.sigmoid(
            jnp.dot(x, wx2f1, preferred_element_type=jnp.float32) + bx2f1)
        gates1 = (jnp.dot(x, wx2h1, preferred_element_type=jnp.float32)
                  + bx2h1
                  + jnp.dot((fh1 * h1).astype(wh2h1.dtype), wh2h1,
                            preferred_element_type=jnp.float32)
                  + bh2h1)
        h1, c1 = cell_update(gates1, c1)
        out_ref[:, j, :] = h1.astype(out_ref.dtype)
        return (h0, c0, h1, c1)

    zeros = jnp.zeros((B, H), jnp.float32)
    jax.lax.fori_loop(0, num_joints, body, (zeros, zeros, zeros, zeros))


def pu_chain_fused(fh: jnp.ndarray, gates_pre: jnp.ndarray,
                   cell0_h2h_kernel: jnp.ndarray,
                   cell1: Dict[str, Dict[str, jnp.ndarray]]) -> jnp.ndarray:
    """Run the 2-layer PU chain in one Pallas program.

    fh: (B, J, H) layer-0 h-forget gates (sigmoid applied);
    gates_pre: (B, J, 4H) layer-0 preactivations incl. the h2h bias;
    cell0_h2h_kernel: (H, 4H); cell1: params of the bridge-less top cell.
    Returns (B, J, H) top-layer h per step, f32.
    """
    b, j, H = fh.shape
    # weight matrices are stored bf16 in VMEM (f32 would exceed the 16 MB
    # scoped budget: 3x [512,2048] + [512,512] is ~13 MB alone); matmuls
    # still accumulate in f32 via preferred_element_type
    dt = jnp.bfloat16
    kernel = functools.partial(_pu_kernel, num_joints=j, hidden=H)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, j, H), jnp.float32),
    )(fh.astype(jnp.float32), gates_pre.astype(jnp.float32),
      cell0_h2h_kernel.astype(dt),
      cell1["x2f"]["kernel"].astype(dt), cell1["x2f"]["bias"].astype(jnp.float32),
      cell1["x2h"]["kernel"].astype(dt), cell1["x2h"]["bias"].astype(jnp.float32),
      cell1["h2h"]["kernel"].astype(dt), cell1["h2h"]["bias"].astype(jnp.float32))
