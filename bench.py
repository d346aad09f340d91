"""Benchmark: end-to-end stereo-pair -> 3D-pose throughput on one chip.

Default mode measures the fully fused eval step (stereo ResNet18-UNet pos
+ rot heatmap nets -> Grid-ViT/PU lifter -> pose + MPJPE/PA-MPJPE metrics)
at the reference's UnrealEgo test configuration (batch 32, 256x256 stereo
RGB, scripts/test/unrealego.sh), the computation the reference times
around ``model.evaluate`` (utils/evaluate.py:108-111).

Modes (CLI args):
  (none)     serving config: bf16 + calibrated int8        [headline]
  bf16       precision-parity bf16 eval path
  train      stage-2 lifter training step, batch 32
             (reference scripts/train/PoseEstimator/unrealego.sh)
  train1     stage-1 heatmap training step, batch 16
             (reference scripts/train/Heatmap/Joint/unrealego.sh)
  batch=N    override the batch size

Methodology: the step runs inside ``lax.scan`` (each iteration perturbs
the input and folds the output into the carry, so nothing is hoisted or
dead-code-eliminated), and throughput is taken from the difference of a
long and a short scan with full host readback — this cancels the fixed
per-dispatch latency (which, under the axon relay used in CI, is a ~37 ms
tunnel round-trip unrelated to chip speed).

Prints ONE JSON line:
  {"metric": "stereo_pairs_per_sec", "value": N, "unit": "pairs/s",
   "vs_baseline": N / REFERENCE_PAIRS_PER_SEC}

If the device backend is unreachable or the process is killed mid-run, a
DIAGNOSTIC JSON line (value 0.0 + "error" + the phase reached) is emitted
instead, so a relay outage at capture time leaves a parseable record
rather than empty output (the round-3 BENCH artifact was lost to exactly
that: rc=124, nothing on stdout).

REFERENCE_PAIRS_PER_SEC is the documented estimate of the reference
PyTorch pipeline's single-GPU eval throughput (see BASELINE.md — the
reference repo publishes no numbers; 250 pairs/s is the recorded
estimate for the single-GPU hardware it targets). The train-mode
baselines are derived estimates from the same ledger (BASELINE.md:
fwd+bwd+optimizer ~= 3x the eval step's cost on the same hardware).
"""

import json
import os
import signal
import sys
import time

REFERENCE_PAIRS_PER_SEC = 250.0
# Training-throughput baselines: documented ESTIMATES (BASELINE.md).
# fwd+bwd+opt of the same nets ~= 3x the eval forward on the reference's
# GPU; stage-1 additionally renders targets in its CPU dataloader but the
# bench measures the on-device step, so the 3x rule is applied to each
# stage's forward cost share.
REFERENCE_TRAIN_PAIRS_PER_SEC = {"train": 80.0, "train1": 110.0}
BATCH = 32
K = 16
REPEATS = 3

_PHASE = "startup"


def _diag(metric: str, error: str) -> None:
    print(json.dumps({
        "metric": metric, "value": 0.0, "unit": "pairs/s",
        "vs_baseline": 0.0,
        "error": f"{error} (phase={_PHASE})",
    }), flush=True)


def _phase(name: str) -> None:
    global _PHASE
    _PHASE = name


def _measure(make_run, args, batch: int) -> float:
    """Time a K-iter and a 4K-iter scan (`make_run(k)` returns the jitted
    program; scalar output read back to host) and take per-iteration time
    from PAIRED long-minus-short differences — median over REPEATS. Any
    fixed per-dispatch cost (the relay's ~37 ms round-trip, host sync,
    readback) cancels exactly in the pair. The earlier
    subtract-a-trivial-dispatch-probe method drifted with relay
    conditions — the overhead probe and the measured run sample the relay
    at different moments — which is the likely source of the round-4
    1469.7 pairs/s outlier capture (BASELINE.md measurement note)."""
    run_s, run_l = make_run(K), make_run(4 * K)
    _phase("compile")
    float(run_s(*args))
    float(run_l(*args))
    _phase("measure")
    diffs = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(run_s(*args))  # host readback blocks for real
        t1 = time.perf_counter()
        float(run_l(*args))
        diffs.append((time.perf_counter() - t1) - (t1 - t0))
    per_iter = max(sorted(diffs)[len(diffs) // 2], 1e-9) / (3 * K)
    return batch / per_iter


def main(bf16_only: bool = False, batch: int = BATCH) -> None:
    """Default: the serving config (bf16 + calibrated int8). `bf16_only`
    (CLI arg "bf16") times the precision-parity bf16 path instead —
    recorded in BASELINE.md each round."""
    import jax
    import jax.numpy as jnp
    from egotap_tpu.core.cache import enable_compilation_cache
    from egotap_tpu.data.synthetic import synthetic_config
    from egotap_tpu.train.tasks import LifterTask

    enable_compilation_cache()
    _phase("setup")

    # The deployment serving configuration: bf16 compute + int8 heatmap-net
    # inference (ops/quant.py — calibrated static per-module scales).
    # Numerics gates: bf16 lifter deviates 0.0064 mm pose vs f32 and the
    # int8 stage-1 path is deviation-bounded by tests/test_quantized.py and
    # tools/check_tpu.py; the f32 reference-parity path (test CLI) is
    # untouched. bf16-only throughput is tracked in BASELINE.md.
    cfg = synthetic_config(
        "/tmp/egotap_bench_data", "UnrealEgo",
        model="egotap_autoencoder", num_heatmap=15, num_rot_heatmap=15,
        heatmap_type="sin", skel_layer="PU", ae_hidden_size=128,
        patched_heatmap_ae=True, load_size_heatmap=(64, 64),
        batch_size=batch, use_amp=True, niter=1, niter_decay=15,
        int8_heatmap_inference=not bf16_only,
        int8_lifter_inference=not bf16_only)

    task = LifterTask(cfg)
    # init on the host CPU backend (fast) and transfer — jit-initializing
    # through the CI's remote-execute relay takes minutes
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=1)
    state = jax.device_put(state, jax.devices()[0])

    rgb = jax.random.normal(
        jax.random.PRNGKey(1),
        (batch, 2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    # pre-quantized int8 weights + CALIBRATED static activation scales
    # (ops/quant.py): removes the dynamic max-reduction HBM passes and
    # extends int8 to the 64-channel layer1 convs (1.07 ms bf16 ->
    # 0.25 ms static int8 measured, tools/bench_layer1.py). Calibration
    # data matches the benchmarked input distribution.
    _phase("calibrate")
    calib = [{"input_rgb": rgb + 0.1 * jax.random.normal(
        jax.random.PRNGKey(10 + i), rgb.shape)} for i in range(2)]
    state = task.prepare_inference(
        state, calib_batches=None if bf16_only else calib)
    gt_pose = jax.random.normal(jax.random.PRNGKey(2), (batch, 16, 3))

    def one_eval(state, rgb, gt_pose):
        data = {"input_rgb": rgb, "gt_local_pose": gt_pose}
        out = task.eval_step(state, data)
        return (jnp.mean(out["pred_pose"])
                + jnp.mean(out["metrics"]["pa_mpjpe"]))

    def make_run(k):
        @jax.jit
        def run(state, rgb, gt_pose):
            def body(carry, i):
                # perturb the input per iteration so no work can be CSE'd
                r = rgb + (i.astype(rgb.dtype) * 1e-6)
                return carry + one_eval(state, r, gt_pose), ()
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(k))
            return acc
        return run

    pairs_per_sec = _measure(make_run, (state, rgb, gt_pose), batch)

    suffix = ("_bf16" if bf16_only else "") + (
        "" if batch == BATCH else f"_b{batch}")
    print(json.dumps({
        "metric": "stereo_pairs_per_sec" + suffix,
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 3),
    }), flush=True)


def main_train(stage: str, batch: int = 0) -> None:
    """Training-step throughput (VERDICT r3 item 3): differential scan
    over the full fused train step (frozen fwd + lifter fwd + bwd +
    optimizer for stage 2; UNet fwd + bwd + Adam for stage 1), state
    carried through the scan exactly like the real epoch loop.

    stage: "train" = stage-2 lifter (reference
    scripts/train/PoseEstimator/unrealego.sh: batch 32, AdamW,
    cos_anneal_warmup), "train1" = stage-1 joint-heatmap net (reference
    scripts/train/Heatmap/Joint/unrealego.sh: batch 16, Adam 1e-3)."""
    import jax
    import jax.numpy as jnp
    from egotap_tpu.core.cache import enable_compilation_cache
    from egotap_tpu.data.synthetic import synthetic_config
    from egotap_tpu.train.tasks import create_task

    enable_compilation_cache()
    _phase(f"setup-{stage}")

    if stage == "train1":
        batch = batch or 16
        cfg = synthetic_config(
            "/tmp/egotap_bench_data", "UnrealEgo",
            model="heatmap_shared", num_heatmap=15, num_rot_heatmap=0,
            batch_size=batch, use_amp=True, optimizer_type="Adam",
            lr=1e-3, niter=5, niter_decay=5)
    else:
        batch = batch or BATCH
        cfg = synthetic_config(
            "/tmp/egotap_bench_data", "UnrealEgo",
            model="egotap_autoencoder", num_heatmap=15, num_rot_heatmap=15,
            heatmap_type="sin", skel_layer="PU", ae_hidden_size=128,
            patched_heatmap_ae=True, load_size_heatmap=(64, 64),
            batch_size=batch, use_amp=True, optimizer_type="AdamW",
            lr_policy="cos_anneal_warmup", lr=1e-3, niter=1,
            niter_decay=15)

    task = create_task(cfg)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=1000)
    state = jax.device_put(state, jax.devices()[0])

    r = jax.random.PRNGKey(1)
    feed = {"input_rgb": jax.random.normal(
        r, (batch, 2, cfg.image_size, cfg.image_size, 3), jnp.float32)}
    if stage == "train1":
        feed["gt_heatmap_left"] = jax.random.uniform(
            jax.random.PRNGKey(2), (batch, 64, 64, 15), jnp.float32)
        feed["gt_heatmap_right"] = jax.random.uniform(
            jax.random.PRNGKey(3), (batch, 64, 64, 15), jnp.float32)
    else:
        feed["gt_local_pose"] = jax.random.normal(
            jax.random.PRNGKey(2), (batch, 16, 3))

    def make_run(kk):
        @jax.jit
        def run(state, feed):
            def body(carry, i):
                b = {k: v + (i.astype(v.dtype) * 1e-6)
                     for k, v in feed.items()}
                new_state, loss_d = task.train_step(carry, b)
                return new_state, sum(jnp.mean(v) for v in loss_d.values())
            final, losses = jax.lax.scan(body, state, jnp.arange(kk))
            # read back a scalar that depends on the final state AND every
            # step's losses so the whole chain must execute
            return jnp.sum(losses) + final.step.astype(jnp.float32)
        return run

    pairs_per_sec = _measure(make_run, (state, feed), batch)
    base = REFERENCE_TRAIN_PAIRS_PER_SEC[stage]
    stage_name = "stage1" if stage == "train1" else "stage2"
    print(json.dumps({
        "metric": f"train_pairs_per_sec_{stage_name}",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / base, 3),
    }), flush=True)


def _wait_for_backend(max_wait_s: float = 600.0) -> bool:
    """The CI TPU relay occasionally drops for minutes at a time (backend
    init then raises 'Unavailable'). Probe device availability in a
    SUBPROCESS (a failed init poisons a process's jax backend cache) and
    wait, bounded, for the relay to recover before the real run — so a
    transient outage at measurement time degrades to a delay instead of a
    lost benchmark. No-op overhead (~2 s) when the backend is healthy.
    Returns False (after emitting the diagnostic JSON line) if the relay
    never recovers — bounded well inside the driver's timeout so the
    artifact records the outage instead of rc=124/empty stdout."""
    import subprocess
    max_wait_s = float(os.environ.get("EGOTAP_BENCH_WAIT_S", max_wait_s))
    deadline = time.time() + max_wait_s
    probe = ("import jax, jax.numpy as jnp; "
             "print(float(jnp.sum(jnp.ones((2,))))) ")
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=300)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        print("bench.py: device backend unavailable; retrying...",
              file=sys.stderr)
        time.sleep(30)


if __name__ == "__main__":
    _batch = 0
    _mode = "serving"
    for a in sys.argv[1:]:
        if a.startswith("batch="):
            _batch = int(a.split("=", 1)[1])
        elif a in ("bf16", "train", "train1"):
            _mode = a
    _metric = {"serving": "stereo_pairs_per_sec",
               "bf16": "stereo_pairs_per_sec_bf16",
               "train": "train_pairs_per_sec_stage2",
               "train1": "train_pairs_per_sec_stage1"}[_mode]

    def _on_term(signum, frame):
        _diag(_metric, f"killed by signal {signum} before completion")
        sys.exit(2)
    signal.signal(signal.SIGTERM, _on_term)

    _phase("backend-wait")
    if not _wait_for_backend():
        _diag(_metric, "device backend unavailable after bounded retries")
        sys.exit(3)
    try:
        if _mode in ("train", "train1"):
            main_train(_mode, batch=_batch)
        else:
            main(bf16_only=_mode == "bf16", batch=_batch or BATCH)
    except Exception as e:  # noqa: BLE001 — diagnostic line, then re-raise
        _diag(_metric, f"{type(e).__name__}: {e}")
        raise
