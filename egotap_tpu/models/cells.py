"""Propagation Unit chain — the lifter's recurrent core, as `lax.scan`.

Reference: ``PropagationUnitCell`` / ``PropagationUnit``
(model/custom_cells.py:72-197) driven by ``SkelNet``
(model/net_architecture.py:466-576).

IMPORTANT parity note — flat chain, not a tree. The reference's SkelNet
"tree walk" passes the parent's (h, c) tensors into PropagationUnit, whose
``hidden[0][layer] = h`` writes mutate those tensors IN PLACE; every entry
of the reference's hs/cs lists aliases one tensor, so each joint actually
receives the state of the *previously processed* joint, regardless of its
kinematic parent (verified empirically against the reference). Released
checkpoints encode this behavior, so ``semantics="chain"`` (default)
reproduces it exactly. ``semantics="tree"`` implements the documented
intent (true parent-state propagation) as an opt-in variant.

Cell math (custom_cells.py:94-120), gate order [forget, in, cell, out]:
    bh   = x @ Wx2f + b_x2f
    h'   = sigmoid(bh[:, :H]) * h        # input-conditioned forget of h
    b'   = sigmoid(bh[:, H:]) * bridge   # ... and of the bridge feature
    gate = x @ Wx2h + h' @ Wh2h (+ b' @ Wb2h)
    c'   = c * sig(f) + sig(i) * tanh(g)
    h''  = sig(o) * tanh(c')

TPU mapping: everything that depends only on (x, bridge) — the forget
gates, x2h, and the bridged b2h term — is hoisted out of the scan into
batched (B*J) matmuls; the scan body keeps only the h-dependent recurrence
(one [B,H]x[H,4H] matmul per layer per step).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _uniform_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -std, std)
    return init


class PUChain(nn.Module):
    """num_layers stacked PropagationUnit cells scanned over the joints.

    inputs (B, J, input_size), bridges (B, J, bridge_size)
    -> outputs (B, J, hidden_size) (the top layer's h at each step).
    """

    input_size: int
    bridge_size: int
    hidden_size: int
    num_layers: int = 2
    semantics: str = "chain"          # "chain" (reference parity) | "tree"
    parents: Optional[Tuple[int, ...]] = None  # required for "tree"
    # Pallas chain kernel on TPU: numerically equivalent (unit-tested);
    # measured neutral vs the XLA scan at B=32 on v5e, so off by default.
    use_fused_kernel: bool = False

    def setup(self):
        H = self.hidden_size
        std = 1.0 / math.sqrt(H)

        def make(shapes):
            def init(rng):
                flat = [(m, p, s) for m, d in shapes.items()
                        for p, s in d.items()]
                keys = jax.random.split(rng, len(flat))
                out: dict = {}
                for k, (m, p, s) in zip(keys, flat):
                    out.setdefault(m, {})[p] = jax.random.uniform(
                        k, s, jnp.float32, -std, std)
                return out
            return init

        cells = {}
        for i in range(self.num_layers):
            in_sz = self.input_size if i == 0 else H
            br_sz = self.bridge_size if i == 0 else 0
            shapes = {
                "x2f": {"kernel": (in_sz, H + br_sz), "bias": (H + br_sz,)},
                "x2h": {"kernel": (in_sz, 4 * H), "bias": (4 * H,)},
                "h2h": {"kernel": (H, 4 * H), "bias": (4 * H,)},
            }
            if br_sz:
                shapes["b2h"] = {"kernel": (br_sz, 4 * H), "bias": (4 * H,)}
            cells[i] = self.param(f"cell{i}", make(shapes))
        self._cells = cells

    @staticmethod
    def _linear(p, x):
        # follow the input compute dtype (params are stored f32; bf16
        # inputs run the chain in bf16 like the rest of the model)
        return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)

    def __call__(self, inputs: jnp.ndarray, bridges: jnp.ndarray) -> jnp.ndarray:
        H = self.hidden_size
        b, J, _ = inputs.shape
        c0p = self._cells[0]

        # hoisted (x, bridge)-only terms, batched over all joints at once
        bh = self._linear(c0p["x2f"], inputs)          # (B, J, H + Hb)
        fh = jax.nn.sigmoid(bh[..., :H])               # forget gate for h
        fb = jax.nn.sigmoid(bh[..., H:])               # forget gate for bridge
        bridged = fb * bridges
        gates_pre = self._linear(c0p["x2h"], inputs)
        if "b2h" in c0p:
            gates_pre = gates_pre + self._linear(c0p["b2h"], bridged)

        def cell_update(gates, c):
            f, i, g, o = jnp.split(gates, 4, axis=-1)
            c_new = c * jax.nn.sigmoid(f) + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return h_new, c_new

        upper = [self._cells[i] for i in range(1, self.num_layers)]

        def step_stack(states, fh_t, gates_pre_t, x_upper_in=None):
            """Run the layer stack for one joint given per-layer (h, c)."""
            new_states = []
            h0, c0 = states[0]
            gates = gates_pre_t + self._linear(c0p["h2h"], fh_t * h0)
            h, c = cell_update(gates, c0)
            new_states.append((h, c))
            x = h
            for li, cp in enumerate(upper):
                hl, cl = states[li + 1]
                fhl = jax.nn.sigmoid(self._linear(cp["x2f"], x))
                gates = (self._linear(cp["x2h"], x)
                         + self._linear(cp["h2h"], fhl * hl))
                h, c = cell_update(gates, cl)
                new_states.append((h, c))
                x = h
            return new_states, x

        zeros = jnp.zeros((b, H), dtype=inputs.dtype)
        init_states = [(zeros, zeros) for _ in range(self.num_layers)]

        if self.semantics == "chain":
            if (self.use_fused_kernel and self.num_layers == 2
                    and jax.default_backend() == "tpu"):
                # one Pallas program: weights + (h, c) live in VMEM for the
                # whole walk instead of 15-17 separate dispatches
                from egotap_tpu.ops.pu_kernel import pu_chain_fused
                gp = gates_pre + self._cells[0]["h2h"]["bias"]
                out = pu_chain_fused(fh, gp,
                                     self._cells[0]["h2h"]["kernel"],
                                     self._cells[1])
                return out.astype(inputs.dtype)

            def body(carry, xs):
                fh_t, gp_t = xs
                new_states, out = step_stack(carry, fh_t, gp_t)
                return new_states, out

            xs = (jnp.swapaxes(fh, 0, 1), jnp.swapaxes(gates_pre, 0, 1))
            _, outs = jax.lax.scan(body, init_states, xs)
            return jnp.swapaxes(outs, 0, 1)

        elif self.semantics == "tree":
            assert self.parents is not None, "tree semantics needs parents"
            # parents for joints 1..J in preset order; step j consumes the
            # stored state of its parent node (0 = zero root state).
            parents = np.asarray(self.parents)[1:]  # (J,) values in [0, J]
            buf0 = jnp.zeros((J + 1, self.num_layers, 2, b, H),
                             dtype=inputs.dtype)

            def body(buf, xs):
                fh_t, gp_t, j, parent = xs
                parent_states = buf[parent]  # (L, 2, B, H)
                states = [(parent_states[i, 0], parent_states[i, 1])
                          for i in range(self.num_layers)]
                new_states, out = step_stack(states, fh_t, gp_t)
                stacked = jnp.stack(
                    [jnp.stack(s, axis=0) for s in new_states], axis=0)
                buf = buf.at[j + 1].set(stacked)
                return buf, out

            xs = (jnp.swapaxes(fh, 0, 1), jnp.swapaxes(gates_pre, 0, 1),
                  jnp.arange(J), jnp.asarray(parents))
            _, outs = jax.lax.scan(body, buf0, xs)
            return jnp.swapaxes(outs, 0, 1)

        raise ValueError(f"unknown semantics {self.semantics!r}")
