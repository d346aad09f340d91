"""Component-level timing on the real chip (amortized inside lax.scan).

Usage: python tools/perf_breakdown.py [component ...]
Components: heatmaps lifter metrics evalfull
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


def timed_scan(fn, *args, k=K, label=""):
    @jax.jit
    def run(*a):
        def body(c, i):
            return c + fn(i, *a), ()
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(k))
        return acc

    t0 = time.perf_counter()
    float(run(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    per_iter = best / k
    print(f"{label:12s} compile {compile_s:7.1f}s   {per_iter * 1e3:8.2f} ms/iter"
          f"   {BATCH / per_iter:9.1f} pairs/s")


def main():
    which = set(sys.argv[1:]) or {"heatmaps", "lifter", "metrics", "evalfull"}
    enable_compilation_cache()
    cfg = synthetic_config(
        "/tmp/egotap_bench_data", "UnrealEgo",
        model="egotap_autoencoder", num_heatmap=15, num_rot_heatmap=15,
        heatmap_type="sin", skel_layer="PU", ae_hidden_size=128,
        patched_heatmap_ae=True, load_size_heatmap=(64, 64),
        batch_size=BATCH, use_amp=True, niter=1, niter_decay=15)
    task = LifterTask(cfg)
    state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=1)
    rgb = jax.random.normal(jax.random.PRNGKey(1),
                            (BATCH, 2, 256, 256, 3), jnp.float32)
    gt = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 16, 3))
    hm = jax.random.normal(jax.random.PRNGKey(3), (BATCH, 64, 64, 90))
    pose = jax.random.normal(jax.random.PRNGKey(4), (BATCH, 16, 3))

    if "heatmaps" in which:
        def f_hm(i, state, rgb):
            out, _ = task._forward_heatmaps(
                state.frozen, {"input_rgb": rgb + i * 1e-6}, train=False)
            return jnp.mean(out)
        timed_scan(f_hm, state, rgb, label="heatmaps")

    if "lifter" in which:
        def f_lift(i, state, hm):
            p = task.lifter.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                hm + i * 1e-6, train=False)
            return jnp.mean(p)
        timed_scan(f_lift, state, hm, label="lifter")

    if "metrics" in which:
        from egotap_tpu.eval.metrics import pose_metrics
        def f_met(i, pose, gt):
            m = pose_metrics(pose + i * 1e-6, gt)
            return jnp.mean(m["pa_mpjpe"]) + jnp.mean(m["mpjpe"])
        timed_scan(f_met, pose, gt, label="metrics")

    if "evalfull" in which:
        def f_full(i, state, rgb, gt):
            out = task.eval_step(state, {"input_rgb": rgb + i * 1e-6,
                                         "gt_local_pose": gt})
            return jnp.mean(out["pred_pose"]) + jnp.mean(
                out["metrics"]["pa_mpjpe"])
        timed_scan(f_full, state, rgb, gt, label="evalfull")


if __name__ == "__main__":
    main()
