"""Feasibility probe: does v5e execute int4 contractions faster than int8?

The remaining eval-step time is dominated by int8 convs already running
at ~315-320 TOP/s (tools/bench_decoder.py). If the MXU has a faster int4
mode (as some TPU generations do), a W4A8 or W4A4 rung would be the next
precision lever; if int4 lowers to the int8 (or worse) rate, the rung is
pointless and this probe documents that.

Run: python tools/probe_int4.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

from egotap_tpu.core.cache import enable_compilation_cache
from tools.perf_breakdown import timed_scan

B = 32


def main():
    enable_compilation_cache()
    rng = jax.random.PRNGKey(0)

    # --- big matmul: 8192 x 2048 x 2048 ---
    m, kdim, n = 8192, 2048, 2048
    flops = 2 * m * kdim * n
    for adt, wdt, tag in ((jnp.int8, jnp.int8, "i8i8"),
                          (jnp.int8, jnp.int4, "i8w4"),
                          (jnp.int4, jnp.int4, "i4i4")):
        try:
            x = jax.random.randint(rng, (m, kdim), -7, 7, jnp.int32)
            w = jax.random.randint(jax.random.PRNGKey(1), (kdim, n), -7, 7,
                                   jnp.int32)
            xq, wq = x.astype(adt), w.astype(wdt)

            def f(i, xq, wq):
                acc = jax.lax.dot_general(
                    xq, wq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return jnp.sum(acc, dtype=jnp.int32).astype(jnp.float32) + i

            per, _ = timed_scan(f, xq, wq, label=f"mm_{tag}")
            print(f"    -> {flops/per/1e12:6.1f} TOP/s")
        except Exception as e:
            print(f"mm_{tag}: FAILED ({type(e).__name__}: {e})")

    # --- conv_up1 shape: (32,64,64,640) -> 512, 3x3 ---
    ci, co, hw = 640, 512, 64
    cflops = 2 * B * hw * hw * ci * co * 9
    for adt, wdt, tag in ((jnp.int8, jnp.int8, "i8i8"),
                          (jnp.int8, jnp.int4, "i8w4"),
                          (jnp.int4, jnp.int4, "i4i4")):
        try:
            x = jax.random.randint(rng, (B, hw, hw, ci), -7, 7, jnp.int32)
            w = jax.random.randint(jax.random.PRNGKey(1), (3, 3, ci, co),
                                   -7, 7, jnp.int32)
            xq, wq = x.astype(adt), w.astype(wdt)

            def f(i, xq, wq):
                acc = jax.lax.conv_general_dilated(
                    xq, wq, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                return jnp.sum(acc, dtype=jnp.int32).astype(jnp.float32) + i

            per, _ = timed_scan(f, xq, wq, label=f"conv_{tag}")
            print(f"    -> {cflops/per/1e12:6.1f} TOP/s")
        except Exception as e:
            print(f"conv_{tag}: FAILED ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
