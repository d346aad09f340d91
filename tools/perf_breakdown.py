"""Component-level timing + MFU + roofline accounting on the real chip.

Usage: python tools/perf_breakdown.py [component ...]
Components: heatmaps lifter metrics evalfull (add `int8` for the
calibrated serving config)

For each component prints: compile time, best ms/iter (amortized inside a
lax.scan so the relay's per-dispatch latency cancels), pairs/s, the XLA
cost-analysis FLOP count AND bytes-accessed for ONE iteration, achieved
TFLOP/s and GB/s, and the ROOFLINE FLOOR — max(flops/peak_compute,
bytes/peak_bw) — with the achieved time as a multiple of that floor.
Peaks: EGOTAP_PEAK_TFLOPS (default 197 = v5e bf16; int8 convs run at up
to 2x this but we keep the bf16 peak so the floor is conservative) and
EGOTAP_PEAK_GBPS (default 819 = v5e HBM). This substantiates the MFU and
"HBM-bound" claims in BASELINE.md/docs with checkable arithmetic.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

from egotap_tpu.core.cache import enable_compilation_cache
from egotap_tpu.data.synthetic import synthetic_config
from egotap_tpu.train.tasks import LifterTask

BATCH = 32
K = 16
PEAK_TFLOPS = float(os.environ.get("EGOTAP_PEAK_TFLOPS", "197"))
PEAK_GBPS = float(os.environ.get("EGOTAP_PEAK_GBPS", "819"))


def component_cost(fn, *args):
    """XLA cost-analysis (flops, bytes accessed) of one un-scanned
    iteration. `bytes accessed` counts HBM traffic XLA expects for the
    fused program (operand + output bytes per fusion, incl. parameter
    reads), which is the right numerator for a bandwidth roofline."""
    try:
        compiled = jax.jit(fn).lower(0, *args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        return (float(cost.get("flops", float("nan"))),
                float(cost.get("bytes accessed", float("nan"))))
    except Exception as e:  # cost analysis is best-effort on some backends
        print(f"  (cost analysis unavailable: {e})")
        return float("nan"), float("nan")


def component_flops(fn, *args) -> float:
    return component_cost(fn, *args)[0]


def timed_scan(fn, *args, k=K, label="", min_diff_s=0.05):
    """Two-scan-length differential with ADAPTIVE scan length.

    Times a k-iter and a 4k-iter scan (full host readback) and takes
    per_iter from PAIRED differences — median of (t_long - t_short)/3k
    over repeats — so any fixed per-dispatch cost (the relay's ~30-40 ms
    round-trip, host sync, readback) cancels exactly. If the measured
    differential is below `min_diff_s` (i.e. the kernel is so small that
    relay jitter would swamp the signal — sub-0.1 ms kernels at k=16
    once "measured" 9x the chip's peak), k is scaled up and the
    measurement repeated until the signal dominates. The previous
    subtract-a-trivial-dispatch-probe method drifted with relay
    conditions and could go negative."""
    def make(kk):
        @jax.jit
        def run(*a):
            def body(c, i):
                return c + fn(i, *a), ()
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(kk))
            return acc
        return run

    compile_s = 0.0
    while True:
        run_s, run_l = make(k), make(4 * k)
        t0 = time.perf_counter()
        float(run_s(*args))
        float(run_l(*args))
        compile_s += time.perf_counter() - t0
        diffs = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_s(*args))
            t1 = time.perf_counter()
            float(run_l(*args))
            diffs.append((time.perf_counter() - t1) - (t1 - t0))
        diff = sorted(diffs)[1]
        if diff >= min_diff_s or k >= 1 << 16:
            break
        if diff <= 0:
            k = 4 * k
        else:  # aim the next differential at ~2x the floor
            k = max(2 * k, int(k * 2 * min_diff_s / diff) + 1)
        k = min(k, 1 << 16)
    per_iter = max(diff, 1e-9) / (3 * k)

    flops, nbytes = component_cost(fn, *args)
    tflops = flops / per_iter / 1e12
    pct = 100.0 * tflops / PEAK_TFLOPS
    gbps = nbytes / per_iter / 1e9
    # roofline floor: this program can't run faster than its FLOPs at
    # peak compute nor its HBM traffic at peak bandwidth
    floor_s = max(flops / (PEAK_TFLOPS * 1e12), nbytes / (PEAK_GBPS * 1e9))
    bound = "mem" if nbytes / (PEAK_GBPS * 1e9) >= flops / (
        PEAK_TFLOPS * 1e12) else "flop"
    line = (f"{label:12s} compile {compile_s:6.1f}s  {per_iter * 1e3:8.2f} ms"
            f"  {BATCH / per_iter:8.1f} pairs/s  {flops / 1e9:8.1f} GFLOP"
            f"  {tflops:7.1f} TF/s  {pct:5.1f}% peak"
            f"  {nbytes / 1e6:8.1f} MB  {gbps:6.0f} GB/s")
    if floor_s > 0:  # NaN-safe: skip the floor columns if cost analysis failed
        line += (f"  floor {floor_s * 1e3:6.2f} ms ({bound})"
                 f" = {per_iter / floor_s:4.1f}x")
    print(line)
    return per_iter, flops


def main():
    which = set(sys.argv[1:]) or {"heatmaps", "lifter", "metrics", "evalfull"}
    int8 = "int8" in which  # e.g. `perf_breakdown.py heatmaps int8`
    which.discard("int8")
    enable_compilation_cache()
    cfg = synthetic_config(
        "/tmp/egotap_bench_data", "UnrealEgo",
        model="egotap_autoencoder", num_heatmap=15, num_rot_heatmap=15,
        heatmap_type="sin", skel_layer="PU", ae_hidden_size=128,
        patched_heatmap_ae=True, load_size_heatmap=(64, 64),
        batch_size=BATCH, use_amp=True, niter=1, niter_decay=15,
        int8_heatmap_inference=int8, int8_lifter_inference=int8)
    task = LifterTask(cfg)
    # init on host CPU (jit-init through the relay takes minutes)
    try:
        hostcpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(hostcpu):
            state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=1)
        state = jax.device_put(state, jax.devices()[0])
    except RuntimeError:
        state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=1)
    rgb = jax.random.normal(jax.random.PRNGKey(1),
                            (BATCH, 2, 256, 256, 3), jnp.float32)
    # int8 mode measures the shipped serving config: calibrated static
    # activation scales (see bench.py)
    state = task.prepare_inference(
        state, calib_batches=[{"input_rgb": rgb}] if int8 else None)
    gt = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 16, 3))
    hm = jax.random.normal(jax.random.PRNGKey(3), (BATCH, 64, 64, 90),
                           jnp.float32)
    pose = jax.random.normal(jax.random.PRNGKey(4), (BATCH, 16, 3))

    mode = ("bf16 + int8 calibrated (serving config)" if int8
            else "bf16 compute (use_amp)")
    print(f"batch {BATCH}, {mode}, peaks {PEAK_TFLOPS:.0f} TFLOP/s bf16 / "
          f"{PEAK_GBPS:.0f} GB/s HBM (EGOTAP_PEAK_TFLOPS / EGOTAP_PEAK_GBPS)")

    results = {}
    if "heatmaps" in which:
        def f_hm(i, state, rgb):
            out, _ = task._forward_heatmaps(
                state.frozen, {"input_rgb": rgb + i * 1e-6}, train=False)
            return jnp.mean(out)
        results["heatmaps"] = timed_scan(f_hm, state, rgb, label="heatmaps")

    if "lifter" in which:
        def f_lift(i, state, hm):
            from egotap_tpu.train.tasks import _dtype
            lv = {"params": state.params, "batch_stats": state.batch_stats}
            if "lifter_q" in state.frozen:
                lv["qparams"] = state.frozen["lifter_q"]
            p = task.lifter_eval.apply(
                lv, (hm + i * 1e-6).astype(_dtype(cfg)), train=False)
            return jnp.mean(p.astype(jnp.float32))
        results["lifter"] = timed_scan(f_lift, state, hm, label="lifter")

    if "metrics" in which:
        from egotap_tpu.eval.metrics import pose_metrics
        def f_met(i, pose, gt):
            m = pose_metrics(pose + i * 1e-6, gt)
            return jnp.mean(m["pa_mpjpe"]) + jnp.mean(m["mpjpe"])
        results["metrics"] = timed_scan(f_met, pose, gt, label="metrics")

    if "evalfull" in which:
        def f_full(i, state, rgb, gt):
            out = task.eval_step(state, {"input_rgb": rgb + i * 1e-6,
                                         "gt_local_pose": gt})
            return jnp.mean(out["pred_pose"]) + jnp.mean(
                out["metrics"]["pa_mpjpe"])
        results["evalfull"] = timed_scan(f_full, state, rgb, gt,
                                         label="evalfull")

    if "evalfull" in results and len(results) > 1:
        parts = sum(t for k, (t, _) in results.items() if k != "evalfull")
        full = results["evalfull"][0]
        print(f"{'(glue)':12s} evalfull - sum(parts) = "
              f"{(full - parts) * 1e3:+.2f} ms (fusion across components, "
              f"layout changes, or unattributed work)")


if __name__ == "__main__":
    main()
