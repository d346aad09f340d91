"""Serving LATENCY at small batch sizes (the deployment-sizing number).

bench.py reports throughput at the reference's batch-32 eval convention;
a latency-bound deployment (one request in flight) cares about the
on-device step time at batch 1-16. This times the full serving-config
eval step (bf16 + calibrated int8, identical to bench.py's headline
program) at several batch sizes with the paired two-scan differential,
so the CI relay's per-dispatch latency cancels and the number is the
on-device program time a real TPU host would see per request.

Run: python tools/bench_latency.py [B ...]   (default 1 4 16 32)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

from egotap_tpu.core.cache import enable_compilation_cache
from egotap_tpu.data.synthetic import synthetic_config
from egotap_tpu.train.tasks import LifterTask
from tools.perf_breakdown import timed_scan


def main():
    batches = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 4, 16, 32]
    enable_compilation_cache()

    cfg = synthetic_config(
        "/tmp/egotap_bench_data", "UnrealEgo",
        model="egotap_autoencoder", num_heatmap=15, num_rot_heatmap=15,
        heatmap_type="sin", skel_layer="PU", ae_hidden_size=128,
        patched_heatmap_ae=True, load_size_heatmap=(64, 64),
        batch_size=max(batches), use_amp=True, niter=1, niter_decay=15,
        int8_heatmap_inference=True, int8_lifter_inference=True)

    task = LifterTask(cfg)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=1)
    state = jax.device_put(state, jax.devices()[0])

    rgb_full = jax.random.normal(
        jax.random.PRNGKey(1),
        (max(batches), 2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    state = task.prepare_inference(
        state, calib_batches=[{"input_rgb": rgb_full}])
    gt_full = jax.random.normal(jax.random.PRNGKey(2),
                                (max(batches), 16, 3))

    rows = []
    for b in batches:
        rgb = rgb_full[:b]
        gt = gt_full[:b]

        def f(i, state, rgb, gt):
            out = task.eval_step(state, {"input_rgb": rgb + i * 1e-6,
                                         "gt_local_pose": gt})
            return (jnp.mean(out["pred_pose"])
                    + jnp.mean(out["metrics"]["pa_mpjpe"]))

        per, _ = timed_scan(f, state, rgb, gt, label=f"B={b}")
        rows.append({"batch": b, "step_ms": round(per * 1e3, 2),
                     "pairs_per_sec": round(b / per, 1)})

    print(json.dumps({"metric": "serving_latency", "rows": rows}))


if __name__ == "__main__":
    main()
