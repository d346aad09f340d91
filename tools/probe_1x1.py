"""Probe: why do small-spatial int8 1x1 convs run at 10-30 TF/s?

tools/bench_decoder.py measured the decoder's 1x1 skip convs far below
both the MXU roofline and the bandwidth floor (l4_1x1 at 8x8 spatial:
0.43 ms for a 2048x1024x1024 contraction = 40x the matmul time). A 1x1
stride-1 conv IS a matmul over flattened pixels; this probe times the
conv form vs the explicit reshape->dot_general form (int8 and bf16), plus
a bare elementwise op to expose any fixed per-scan-iteration floor.

Run: python tools/probe_1x1.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

from egotap_tpu.core.cache import enable_compilation_cache
from egotap_tpu.ops.quant import quantize_weights, quantized_conv
from tools.perf_breakdown import timed_scan

B = 32


def case(hw, cin, cout):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, hw, hw, cin), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (1, 1, cin, cout),
                          jnp.float32) * 0.05
    wq, ws = quantize_weights(w)
    a_scale = jnp.float32(3.0 / 127.0)
    flops = 2 * B * hw * hw * cin * cout
    tag = f"{hw}x{hw}x{cin}"

    def f_conv(i, x, wq, ws):
        out = quantized_conv(x + (i * 1e-6).astype(x.dtype), None, 1, ((0, 0), (0, 0)),
                             precomputed=(wq, ws), a_scale=a_scale)
        return jnp.mean(out.astype(jnp.float32))

    def f_mm(i, x, wq, ws):
        xf = (x + (i * 1e-6).astype(x.dtype)).reshape(-1, cin)
        xq = jnp.clip(jnp.round(xf.astype(jnp.float32) / a_scale),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, wq.reshape(cin, cout),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (a_scale * ws)
        return jnp.mean(out)

    def f_bf(i, x, wb):
        out = jax.lax.conv_general_dilated(
            x + (i * 1e-6).astype(x.dtype), wb, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.mean(out.astype(jnp.float32))

    def f_relu(i, x):
        return jnp.mean(jax.nn.relu(x + (i * 1e-6).astype(x.dtype)).astype(jnp.float32))

    for name, f, args in ((f"i8conv_{tag}", f_conv, (x, wq, ws)),
                          (f"i8mm_{tag}", f_mm, (x, wq, ws)),
                          (f"bfconv_{tag}", f_bf, (x, w.astype(jnp.bfloat16))),
                          (f"relu_{tag}", f_relu, (x,))):
        per, _ = timed_scan(f, *args, label=name)
        print(f"    -> achieved {flops/per/1e12:6.1f} T/s")


def main():
    enable_compilation_cache()
    case(8, 1024, 1024)
    case(16, 512, 516)
    case(64, 128, 128)


if __name__ == "__main__":
    main()
