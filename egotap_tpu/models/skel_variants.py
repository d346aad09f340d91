"""Non-PU SkelNet variants (reference model/net_architecture.py:466-576).

Modes and their reference semantics:
  * "LSTM"      — torch nn.LSTM over concat(input, bridge); the child
    consumes its kinematic parent's (h, c). Unlike the PU path, nn.LSTM
    returns fresh state tensors, so this mode really is a TREE walk.
  * "LSTMSplit" — two sequential LSTM steps per joint (bridge then input).
  * "LSTMNoRel" — LSTM over the input embedding only.
  * "None"      — passthrough of concat(input, bridge).
  * "NoneNoRel" — passthrough of the input embedding.

The LSTM cell follows torch's gate order (i, f, g, o) and parameter layout
(w_ih/w_hh (4H, in), b_ih + b_hh), so torch checkpoints convert directly.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class LSTMTreeWalk(nn.Module):
    """Stacked torch-layout LSTM walked over the kinematic tree.

    inputs (B, J, in_size) -> outputs (B, J, hidden); each joint step seeds
    the stack with its parent's per-layer (h, c) (true tree propagation).
    """

    input_size: int
    hidden_size: int
    num_layers: int = 2
    parents: Optional[Tuple[int, ...]] = None

    def setup(self):
        H = self.hidden_size
        std = 1.0 / math.sqrt(H)

        def make(shapes):
            def init(rng):
                flat = list(shapes.items())
                keys = jax.random.split(rng, len(flat))
                return {k: jax.random.uniform(r, s, jnp.float32, -std, std)
                        for r, (k, s) in zip(keys, flat)}
            return init

        layers = []
        for i in range(self.num_layers):
            in_sz = self.input_size if i == 0 else H
            layers.append(self.param(f"layer{i}", make({
                "w_ih": (in_sz, 4 * H), "w_hh": (H, 4 * H),
                "b_ih": (4 * H,), "b_hh": (4 * H,)})))
        self._layers = layers

    def _cell(self, p, x, h, c):
        gates = (x @ p["w_ih"].astype(x.dtype) + p["b_ih"].astype(x.dtype)
                 + h @ p["w_hh"].astype(x.dtype) + p["b_hh"].astype(x.dtype))
        i, f, g, o = jnp.split(gates, 4, axis=-1)  # torch order
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return h_new, c_new

    def __call__(self, inputs: jnp.ndarray,
                 extra_inputs: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """extra_inputs: optional pre-step sequence (LSTMSplit's bridge pass
        runs through the stack first, its state feeding the main step)."""
        assert self.parents is not None
        b, J, _ = inputs.shape
        H = self.hidden_size
        L = self.num_layers
        parents = np.asarray(self.parents)[1:]

        def run_stack(states, x):
            new_states = []
            for li in range(L):
                h, c = states[li]
                h, c = self._cell(self._layers[li], x, h, c)
                new_states.append((h, c))
                x = h
            return new_states, x

        buf0 = jnp.zeros((J + 1, L, 2, b, H), dtype=inputs.dtype)

        def body(buf, xs):
            if extra_inputs is None:
                x_t, j, parent = xs
            else:
                x_t, pre_t, j, parent = xs
            ps = buf[parent]
            states = [(ps[i, 0], ps[i, 1]) for i in range(L)]
            if extra_inputs is not None:
                states, _ = run_stack(states, pre_t)
            states, out = run_stack(states, x_t)
            stacked = jnp.stack([jnp.stack(s) for s in states])
            return buf.at[j + 1].set(stacked), out

        xs = [jnp.swapaxes(inputs, 0, 1)]
        if extra_inputs is not None:
            xs.append(jnp.swapaxes(extra_inputs, 0, 1))
        xs += [jnp.arange(J), jnp.asarray(parents)]
        _, outs = jax.lax.scan(body, buf0, tuple(xs))
        return jnp.swapaxes(outs, 0, 1)


def skel_output_size(skel_layer: str, body_hidden: int) -> int:
    """SkelNet output width per joint (net_architecture.py:476-483)."""
    if skel_layer == "PU" or skel_layer == "LSTM" or skel_layer == "None":
        return 2 * body_hidden
    if skel_layer in ("LSTMSplit", "LSTMNoRel", "NoneNoRel"):
        return body_hidden
    raise ValueError(f"unknown skel_layer {skel_layer!r}")
