"""Micro-benchmark: fused Pallas int8 layer1 vs the current paths on TPU.

Compares, at the real serving shape (128 images = batch 32 x 2 views x
2 nets, 64x64x64 feature maps):
  a) bf16 lax convs (what QConv falls back to for in_ch < 128 today),
  b) generic dynamic-int8 quantized_conv per conv,
  c) the fused Pallas kernel (ops/fused_layer1.py).
Also checks the kernel's numerical deviation vs (a) on-chip.

Run: python tools/bench_layer1.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from egotap_tpu.core.cache import enable_compilation_cache
from egotap_tpu.ops.fused_layer1 import (fused_layer1_int8,
                                         fused_layer1_reference,
                                         pack_blocks)
from egotap_tpu.ops.quant import quantized_conv

N, H, C = 128, 64, 64
K = 16


def timed(fn, *args):
    """Differential-scan timing (cancels relay dispatch overhead)."""
    @jax.jit
    def run(k_arr, *a):
        def body(carry, i):
            out = fn(a[0] + (i * 1e-6).astype(a[0].dtype), *a[1:])
            return carry + jnp.sum(out.astype(jnp.float32)), ()
        acc, _ = jax.lax.scan(body, jnp.zeros(()), k_arr)
        return acc

    short = jnp.arange(2, dtype=jnp.float32)
    longr = jnp.arange(2 + K, dtype=jnp.float32)
    float(run(short, *args))
    float(run(longr, *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(short, *args))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(longr, *args))
        tl = time.perf_counter() - t0
        best = min(best, (tl - ts) / K)
    return best


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)

    def blk():
        return {
            "conv1": jnp.asarray(rng.normal(size=(3, 3, C, C), scale=0.05),
                                 jnp.float32),
            "bn1_scale": jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32),
            "bn1_bias": jnp.asarray(rng.normal(size=C, scale=0.1),
                                    jnp.float32),
            "bn1_mean": jnp.asarray(rng.normal(size=C, scale=0.1),
                                    jnp.float32),
            "bn1_var": jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32),
            "conv2": jnp.asarray(rng.normal(size=(3, 3, C, C), scale=0.05),
                                 jnp.float32),
            "bn2_scale": jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32),
            "bn2_bias": jnp.asarray(rng.normal(size=C, scale=0.1),
                                    jnp.float32),
            "bn2_mean": jnp.asarray(rng.normal(size=C, scale=0.1),
                                    jnp.float32),
            "bn2_var": jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32),
        }

    blocks = [blk(), blk()]
    wq, ws, b = pack_blocks(blocks, eps=1e-5)
    x32 = jnp.asarray(rng.normal(size=(N, H, H, C)), jnp.float32)
    x = x32.astype(jnp.bfloat16)

    def bf16_path(x):
        from egotap_tpu.ops.fused_layer1 import fold_bn
        act = x
        res = x
        for bi, p in enumerate(blocks):
            for ci in ("1", "2"):
                w, bias = fold_bn(p[f"conv{ci}"], p[f"bn{ci}_scale"],
                                  p[f"bn{ci}_bias"], p[f"bn{ci}_mean"],
                                  p[f"bn{ci}_var"], 1e-5)
                out = jax.lax.conv_general_dilated(
                    act, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                out = out + bias.astype(x.dtype)
                if ci == "1":
                    act = jnp.maximum(out, 0)
                else:
                    act = jnp.maximum(out + res, 0)
                    res = act
        return act

    def int8_generic(x):
        from egotap_tpu.ops.fused_layer1 import fold_bn
        act = x
        res = x
        for p in blocks:
            for ci in ("1", "2"):
                w, bias = fold_bn(p[f"conv{ci}"], p[f"bn{ci}_scale"],
                                  p[f"bn{ci}_bias"], p[f"bn{ci}_mean"],
                                  p[f"bn{ci}_var"], 1e-5)
                out = quantized_conv(act, w, 1, ((1, 1), (1, 1)),
                                     bias=bias)
                if ci == "1":
                    act = jnp.maximum(out, 0)
                else:
                    act = jnp.maximum(out + res, 0)
                    res = act
        return act

    t_bf16 = timed(bf16_path, x)
    t_int8 = timed(int8_generic, x)
    t_fused = timed(lambda xx: fused_layer1_int8(xx, wq, ws, b), x)

    # deviation vs bf16 on-chip (bf16 input, f32 twin as the oracle)
    y_ref = np.asarray(fused_layer1_reference(x32, wq, ws, b))
    y_fused = np.asarray(fused_layer1_int8(x, wq, ws, b)).astype(np.float32)
    rel = float(np.linalg.norm(y_fused - y_ref) / np.linalg.norm(y_ref))

    print(json.dumps({
        "metric": "layer1_128imgs_ms",
        "bf16_lax_ms": round(t_bf16 * 1e3, 3),
        "int8_generic_ms": round(t_int8 * 1e3, 3),
        "fused_pallas_ms": round(t_fused * 1e3, 3),
        "fused_vs_f32twin_rel": round(rel, 5),
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
