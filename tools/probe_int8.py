"""Feasibility probe: int8 vs bf16 conv throughput on the decoder shapes.

The heatmap UNets are ~26 ms of the ~35 ms eval step at ~65% bf16 MFU;
int8 doubles the MXU rate IF XLA lowers int8 convs well on this chip.
This probe times the three decoder conv shapes and the largest backbone
conv in bf16 vs int8 (with realistic quantize/dequantize overhead) to
decide whether a gated int8 inference path is worth building.

Run: python tools/probe_int8.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

from egotap_tpu.core.cache import enable_compilation_cache
from tools.perf_breakdown import timed_scan

B = 32
SHAPES = [  # (H, W, Cin, Cout, k) — decoder convs at fs=2 + backbone layer2
    (16, 16, 1540, 1024, 3),
    (32, 32, 768, 512, 3),
    (64, 64, 640, 512, 3),
    (32, 32, 128, 128, 3),
]


def conv_bf16(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_int8(x, w_i8, w_scale):
    # dynamic per-tensor activation quantization + int8 conv + dequant
    amax = jnp.max(jnp.abs(x))
    a_scale = amax / 127.0
    xq = jnp.clip(jnp.round(x / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, w_i8, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.bfloat16) * (a_scale * w_scale).astype(jnp.bfloat16)


def main():
    enable_compilation_cache()
    rng = jax.random.PRNGKey(0)
    for (h, w, ci, co, k) in SHAPES:
        x = jax.random.normal(rng, (B, h, w, ci), jnp.bfloat16)
        wt = jax.random.normal(jax.random.PRNGKey(1), (k, k, ci, co),
                               jnp.bfloat16) / 30.0
        # per-out-channel symmetric weight quantization (precomputed)
        wmax = jnp.max(jnp.abs(wt.astype(jnp.float32)), axis=(0, 1, 2))
        w_scale = wmax / 127.0
        w_i8 = jnp.clip(jnp.round(wt.astype(jnp.float32) / w_scale), -127,
                        127).astype(jnp.int8)

        # perturbation pinned to the input dtype: a raw `x + i*1e-6`
        # promotes the bf16 operand (and the whole conv) to f32
        def f_bf16(i, x, wt):
            return jnp.mean(conv_bf16(x + (i * 1e-6).astype(x.dtype), wt)
                            .astype(jnp.float32))
        def f_int8(i, x, w_i8, w_scale):
            return jnp.mean(conv_int8(x + (i * 1e-6).astype(x.dtype),
                                      w_i8, w_scale).astype(jnp.float32))
        label = f"{h}x{w}x{ci}->{co}"
        timed_scan(f_bf16, x, wt, label=f"bf16 {label}")
        timed_scan(f_int8, x, w_i8, w_scale, label=f"int8 {label}")


if __name__ == "__main__":
    main()
