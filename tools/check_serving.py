"""TPU validation of the serving Predictor: compile time + throughput.

The pytest serving suite runs CPU-only (conftest design); this script
compiles and runs `egotap_tpu.serving.Predictor` on the real chip, the
path a deployment would use. It checks the jit-arguments discipline holds
in practice: variables are passed as arguments (never closed over), so
the compile must take seconds-scale relay time, not the minutes-scale
blowup of constant-inlined parameters.

Run: python tools/check_serving.py  (prints one JSON line)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from egotap_tpu.core.cache import enable_compilation_cache
    from egotap_tpu.data.synthetic import synthetic_config
    from egotap_tpu.serving import Predictor
    from egotap_tpu.train.tasks import LifterTask

    enable_compilation_cache()
    batch = 32

    cfg = synthetic_config(
        "/tmp/egotap_bench_data", "UnrealEgo",
        model="egotap_autoencoder", num_heatmap=15, num_rot_heatmap=15,
        heatmap_type="sin", skel_layer="PU", ae_hidden_size=128,
        patched_heatmap_ae=True, load_size_heatmap=(64, 64),
        batch_size=batch, use_amp=True, niter=1, niter_decay=15,
        int8_heatmap_inference=True, int8_lifter_inference=True)

    # random native weights, initialized on host CPU (jit-init through the
    # relay takes minutes), then placed on the TPU
    task = LifterTask(cfg)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=1)
    state = jax.device_put(state, jax.devices()[0])

    hv = state.frozen["heatmap"]
    rv = state.frozen["rot_heatmap"]
    lv = {"params": state.params, "batch_stats": state.batch_stats}
    pred = Predictor(cfg, hv, rv, lv, bf16=True)

    rgb = np.random.default_rng(0).normal(
        size=(batch, 2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    pred.calibrate([rgb])  # static activation scales (serving config)

    t0 = time.perf_counter()
    poses = pred(rgb)  # np.asarray readback blocks for real
    compile_s = time.perf_counter() - t0
    assert poses.shape == (batch, 16, 3) and np.isfinite(poses).all()

    # fixed per-dispatch overhead (relay round trip), measured separately
    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(5):
        float(trivial(jnp.zeros(())))
    overhead = (time.perf_counter() - t0) / 5

    # end-to-end: includes the host->device input transfer (under the CI
    # relay that is a ~50 MB tunnel copy per call and dominates; on a real
    # TPU host it is a PCIe DMA)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        pred(rgb)
        best = min(best, time.perf_counter() - t0)
    e2e = max(best - overhead, 1e-9)

    # on-device program time: input already resident
    rgb_dev = jnp.asarray(rgb)
    float(jnp.sum(pred._fn(pred._vars, rgb_dev)))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(pred._fn(pred._vars, rgb_dev)))
        best = min(best, time.perf_counter() - t0)
    step = max(best - overhead, 1e-9)

    # shard(1) smoke (VERDICT r3 item 8): the GSPMD-partitioned serving
    # program — NamedSharding'd inputs, mesh-placed variables — compiles
    # and runs on the real chip at least once. A 1-device mesh exercises
    # the same partitioned-program path the CPU-mesh tests cover at dp>1.
    t0 = time.perf_counter()
    pred.shard(1)
    sharded = pred(rgb)
    shard_compile_s = time.perf_counter() - t0
    shard_diff = float(np.max(np.abs(sharded - poses)))
    assert sharded.shape == poses.shape and np.isfinite(sharded).all()

    print(json.dumps({
        "metric": "serving_predictor",
        "compile_s": round(compile_s, 1),
        "dispatch_overhead_ms": round(overhead * 1e3, 1),
        "e2e_ms_incl_relay_transfer": round(e2e * 1e3, 2),
        "step_ms": round(step * 1e3, 2),
        "pairs_per_sec": round(batch / step, 1),
        "shard1_compile_s": round(shard_compile_s, 1),
        "shard1_max_diff_vs_unsharded": shard_diff,
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
