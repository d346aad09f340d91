"""Feasibility probe: does v5e execute int4 contractions faster than int8?

The remaining eval-step time is dominated by int8 convs already running
near the measured int8 rate (tools/bench_decoder.py). If the MXU has a
faster int4 mode (as some TPU generations do), a W4A8 or W4A4 rung would
be the next precision lever; if int4 lowers to the int8 (or worse) rate,
the rung is pointless and this probe documents that.

Methodology notes (both learned the hard way):
  * Integer operands cannot take the float `x + i*1e-6` anti-hoisting
    perturbation, and an UNperturbed integer contraction is loop-
    invariant — XLA hoists it out of the scan and the "rate" reads as
    thousands of TF/s (observed: 93,687). Each iteration therefore adds
    a CARRY-derived scalar to the activation (the carry is unknown at
    compile time, so the contraction serializes per iteration), and a
    matching perturb-only scan is timed and subtracted so the
    perturbation pass's HBM traffic doesn't bias the rate.
  * The axon backend rejects S4 jit ARGUMENTS (RecursionError in jit
    re-entry). Operands are passed as int8 and cast inside the program:
    the weight cast is loop-invariant (hoists, free), the activation
    cast fuses into the perturbation pass.

Run: python tools/probe_int4.py        # generic matmul + decoder conv
     python tools/probe_int4.py vit    # the lifter's REAL matmul shapes
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

from egotap_tpu.core.cache import enable_compilation_cache

B = 32
K = 16
REPEATS = 3


def paired_diff(make, args, k):
    """bench.py-style paired K/4K differential; returns s/iter."""
    run_s, run_l = make(k), make(4 * k)
    float(run_s(*args))
    float(run_l(*args))
    diffs = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(run_s(*args))
        t1 = time.perf_counter()
        float(run_l(*args))
        diffs.append((time.perf_counter() - t1) - (t1 - t0))
    return max(sorted(diffs)[len(diffs) // 2], 1e-9) / (3 * k)


def probe(tag, x8, w8, adt, wdt, contract, flops, k=K):
    """Time contract(x_i, w) minus the perturb-only pass, print TOP/s."""
    def make_full(kk):
        @jax.jit
        def run(x8, w8):
            w = w8.astype(wdt)  # loop-invariant: hoists out of the scan

            def body(c, i):
                # carry-derived int perturbation: value unknown at trace
                # time -> the contraction cannot be hoisted or CSE'd
                d = (c.astype(jnp.int32) % 2).astype(jnp.int8)
                xi = (x8 + d).astype(adt)
                acc = contract(xi, w)
                return c + acc.astype(jnp.float32) + i, ()
            out, _ = jax.lax.scan(body, jnp.ones(()), jnp.arange(kk))
            return out
        return run

    def make_perturb(kk):
        @jax.jit
        def run(x8, w8):
            def body(c, i):
                d = (c.astype(jnp.int32) % 2).astype(jnp.int8)
                xi = (x8 + d).astype(adt)
                # same traffic as the perturb+cast pass, no contraction
                acc = jnp.sum(xi.astype(jnp.int32), dtype=jnp.int32)
                return c + acc.astype(jnp.float32) + i, ()
            out, _ = jax.lax.scan(body, jnp.ones(()), jnp.arange(kk))
            return out
        return run

    try:
        t_full = paired_diff(make_full, (x8, w8), k)
        t_pert = paired_diff(make_perturb, (x8, w8), k)
        t = max(t_full - t_pert, 1e-9)
        print(f"{tag:10s} {t_full*1e3:8.3f} ms raw - {t_pert*1e3:6.3f} ms "
              f"perturb = {t*1e3:8.3f} ms -> {flops/t/1e12:6.1f} TOP/s")
    except Exception as e:  # noqa: BLE001 — probe records failures
        msg = str(e).splitlines()[0][:120]
        print(f"{tag:10s} FAILED ({type(e).__name__}: {msg})")


def main_vit_shapes():
    """int8 vs int4 at the lifter ViT's REAL matmul shapes (batch 32 ×
    577 tokens; hidden 1024, mlp 4096). These are the shapes a W4A4
    lifter rung would have to win at — recorded result (docs/ROUND4.md):
    int4 is neutral-to-worse at every one (mlp_out regresses 1.9x), so
    the rung is killed without building it."""
    enable_compilation_cache()
    rng = jax.random.PRNGKey(0)
    m = 32 * 577
    for (k, n) in ((1024, 1024), (1024, 4096), (4096, 1024)):
        flops = 2 * m * k * n
        x8 = jax.random.randint(rng, (m, k), -7, 7,
                                jnp.int32).astype(jnp.int8)
        w8 = jax.random.randint(jax.random.PRNGKey(1), (k, n), -7, 7,
                                jnp.int32).astype(jnp.int8)

        def mm(xi, w):
            acc = jax.lax.dot_general(xi, w, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return jnp.sum(acc, dtype=jnp.int32)

        for adt, wdt, tag in ((jnp.int8, jnp.int8, f"{m}x{k}x{n}_i8"),
                              (jnp.int4, jnp.int4, f"{m}x{k}x{n}_i4")):
            probe(tag, x8, w8, adt, wdt, mm, flops)


def main():
    enable_compilation_cache()
    rng = jax.random.PRNGKey(0)

    # --- big matmul: 8192 x 2048 x 2048 ---
    m, kdim, n = 8192, 2048, 2048
    flops = 2 * m * kdim * n
    x8 = jax.random.randint(rng, (m, kdim), -7, 7, jnp.int32).astype(jnp.int8)
    w8 = jax.random.randint(jax.random.PRNGKey(1), (kdim, n), -7, 7,
                            jnp.int32).astype(jnp.int8)

    def mm(xi, w):
        acc = jax.lax.dot_general(xi, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return jnp.sum(acc, dtype=jnp.int32)

    for adt, wdt, tag in ((jnp.int8, jnp.int8, "mm_i8i8"),
                          (jnp.int8, jnp.int4, "mm_i8w4"),
                          (jnp.int4, jnp.int4, "mm_i4i4")):
        probe(tag, x8, w8, adt, wdt, mm, flops)

    # --- conv_up1 shape: (32,64,64,640) -> 512, 3x3 ---
    ci, co, hw = 640, 512, 64
    cflops = 2 * B * hw * hw * ci * co * 9
    xc8 = jax.random.randint(rng, (B, hw, hw, ci), -7, 7,
                             jnp.int32).astype(jnp.int8)
    wc8 = jax.random.randint(jax.random.PRNGKey(1), (3, 3, ci, co), -7, 7,
                             jnp.int32).astype(jnp.int8)

    def conv(xi, w):
        acc = jax.lax.conv_general_dilated(
            xi, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return jnp.sum(acc, dtype=jnp.int32)

    for adt, wdt, tag in ((jnp.int8, jnp.int8, "conv_i8i8"),
                          (jnp.int8, jnp.int4, "conv_i8w4"),
                          (jnp.int4, jnp.int4, "conv_i4i4")):
        probe(tag, xc8, wc8, adt, wdt, conv, cflops, k=8)


if __name__ == "__main__":
    if "vit" in sys.argv[1:]:
        main_vit_shapes()
    else:
        main()
