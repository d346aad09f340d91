"""Decoder budget split: each UNet decoder op in isolation (int8-static
vs bf16), weights passed as ARGUMENTS (see CLAUDE.md measurement trap).

The decoder's three 3x3 convs are ~84% of one heatmap net's FLOPs
(conv_up3 232 GF + conv_up2 386 GF + conv_up1 772 GF of 1658 GF total at
batch 32); `fullnet` runs at ~190 TF/s effective, so either the convs
only reach ~half the chip's int8 rate at these shapes or the glue
(upsample banded matmuls, 1x1 skips, concat+quantize) eats the rest.
This prints the split.

Usage: python tools/bench_decoder.py [bf16]
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
DT = jnp.bfloat16


def conv_case(label, hw, cin, cout, k, int8):
    rng = jax.random.PRNGKey(hash(label) % (2**31))
    x = jax.random.normal(rng, (B, hw, hw, cin), DT)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, k, cin, cout),
                          jnp.float32) * 0.05
    pad = ((k // 2, k // 2),) * 2
    flops = 2 * B * hw * hw * cin * cout * k * k
    if int8:
        wq, ws = quantize_weights(w)
        a_scale = jnp.float32(3.0 / 127.0)

        def f(i, x, wq, ws):
            out = quantized_conv(x + (i * 1e-6).astype(x.dtype), None, 1, pad,
                                 precomputed=(wq, ws), a_scale=a_scale)
            return jnp.mean(jax.nn.relu(out).astype(jnp.float32))
        per, _ = timed_scan(f, x, wq, ws, label=label + "_i8",
                           k=64 if k == 3 else 256)
    else:
        wb = w.astype(DT)

        def f(i, x, wb):
            out = jax.lax.conv_general_dilated(
                x + (i * 1e-6).astype(x.dtype), wb, (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.mean(jax.nn.relu(out).astype(jnp.float32))
        per, _ = timed_scan(f, x, wb, label=label + "_bf",
                           k=64 if k == 3 else 256)
    print(f"    -> nominal {flops/1e9:7.1f} GF, achieved "
          f"{flops/per/1e12:6.1f} T(op|f)/s")
    return per


def upsample_case(label, hw, c):
    from egotap_tpu.ops.upsample import upsample2x_align_corners
    x = jax.random.normal(jax.random.PRNGKey(0), (B, hw, hw, c), DT)

    def f(i, x):
        return jnp.mean(upsample2x_align_corners(x + (i * 1e-6).astype(x.dtype))
                        .astype(jnp.float32))
    per, _ = timed_scan(f, x, label=label, k=256)
    gb = B * hw * hw * c * 2 * (1 + 4) / 1e9  # read + 4x write (2x2 up)
    print(f"    -> ~{gb:.2f} GB moved, {gb/per:6.0f} GB/s")
    return per


def main():
    int8 = "bf16" not in sys.argv[1:]
    enable_compilation_cache()
    total = 0.0
    # (label, hw, cin, cout, k) for fs=2 (stereo resnet18)
    total += conv_case("conv_up3", 16, 1540, 1024, 3, int8)
    total += conv_case("conv_up2", 32, 1280, 512, 3, int8)
    total += conv_case("conv_up1", 64, 640, 512, 3, int8)
    total += conv_case("l4_1x1", 8, 1024, 1024, 1, int8)
    total += conv_case("l3_1x1", 16, 512, 516, 1, int8)
    total += conv_case("l2_1x1", 32, 256, 256, 1, int8)
    total += conv_case("l1_1x1", 64, 128, 128, 1, int8)
    total += conv_case("head", 64, 512, 30, 1, False)
    total += upsample_case("up8", 8, 1024)
    total += upsample_case("up16", 16, 1024)
    total += upsample_case("up32", 32, 512)
    print(f"decoder parts total {total*1e3:7.2f} ms "
          f"(fullnet measured ~8.7 ms incl. backbone)")


if __name__ == "__main__":
    main()
