"""CLI-eval throughput validation on the real chip.

Runs `eval.evaluate` (the code path behind the test CLI and per-epoch
validation) over a synthetic dataset in the serving configuration and
prints its pairs/s next to bench.py's fused-scan figure. Through the CI
relay the eval loop is transfer-bound — every batch ships ~50 MB of RGB
host->device over the tunnel at ~2.4 s/batch (measured in
tools/check_serving.py) — so the printed number reflects the tunnel,
not the chip; on a real TPU host the feed is PCIe DMA and the overlap
(no per-batch sync) closes the gap to bench. The point of this check is
(a) the timing METHOD is honest (scalar-readback completion, warmup
excluded) and (b) the pipeline overlaps (total wall < sum of transfer +
compute).

Run: python tools/check_eval_throughput.py [f32|serving]
`f32` measures the reference-parity path (use_amp=False, no int8 — the
exact configuration cli/test.py forces, test_options parity); `serving`
(default) measures the calibrated-int8 deployment config.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import numpy as np


def main() -> None:
    from egotap_tpu.core.cache import enable_compilation_cache
    from egotap_tpu.data.synthetic import generate_dataset, synthetic_config
    from egotap_tpu.eval.evaluate import evaluate
    from egotap_tpu.train.tasks import LifterTask

    enable_compilation_cache()
    root = "/tmp/egotap_evalthr_data"
    if not os.path.exists(os.path.join(root, "test.txt")):
        generate_dataset(root, "UnrealEgo", num_sequences=4,
                         frames_per_seq=33, image_size=64)

    mode = sys.argv[1] if len(sys.argv) > 1 else "serving"
    serving = mode != "f32"
    cfg = synthetic_config(
        root, "UnrealEgo", model="egotap_autoencoder",
        num_heatmap=15, num_rot_heatmap=15, heatmap_type="sin",
        skel_layer="PU", ae_hidden_size=128, patched_heatmap_ae=True,
        load_size_heatmap=(64, 64), batch_size=32, use_amp=serving,
        niter=1, niter_decay=15,
        int8_heatmap_inference=serving, int8_lifter_inference=serving)

    task = LifterTask(cfg)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=1)
    state = jax.device_put(state, jax.devices()[0])
    rgb = np.random.default_rng(0).normal(
        size=(32, 2, 256, 256, 3)).astype(np.float32)
    state = task.prepare_inference(
        state, calib_batches=[{"input_rgb": rgb}] if serving else None)

    t0 = time.perf_counter()
    metrics, _, pps = evaluate(cfg, task, state, mode="test")
    wall = time.perf_counter() - t0
    print(json.dumps({
        "metric": "cli_eval_pairs_per_sec",
        "mode": mode,
        "pairs_per_sec": round(pps, 1),
        "wall_s": round(wall, 1),
        "mpjpe_finite": bool(np.isfinite(metrics.get("mpjpe", np.nan))),
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
