"""Training-step time breakdown: forward / backward / optimizer.

Complements `bench.py train|train1` (whole-step throughput) with the
per-phase attribution VERDICT r3 item 3 asks for. Three nested programs
are timed at each stage's bench configuration and the phases fall out
differentially:

  fwd   = time(loss value only)
  bwd   = time(value_and_grad) - fwd
  opt   = time(full train_step, state carried) - time(value_and_grad)

All three use the paired two-scan-length differential (the relay's
per-dispatch latency cancels; see tools/perf_breakdown.py:timed_scan).
The full-step program carries the TrainState through the scan exactly
like bench.py's train mode, so the optimizer update cannot be dead-code
eliminated. Stage-2 additionally reports the frozen heatmap-net forward
(train-mode BN, reference egotap_autoencoder_model.py:177-216) as a
line inside fwd.

Run: python tools/perf_train_breakdown.py [train|train1] ...
     (default: both stages)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

from egotap_tpu.core.cache import enable_compilation_cache
from egotap_tpu.data.synthetic import synthetic_config
from egotap_tpu.train.tasks import create_task
from tools.perf_breakdown import timed_scan

K = 8
REPEATS = 3


def timed_state_scan(task, state, feed, k=K):
    """Paired differential over the full train_step with the TrainState
    carried through the scan (mirrors bench.py:_measure + main_train)."""
    def make(kk):
        @jax.jit
        def run(state, feed):
            def body(carry, i):
                b = {kk_: v + (i.astype(v.dtype) * 1e-6)
                     for kk_, v in feed.items()}
                new_state, loss_d = task.train_step(carry, b)
                return new_state, sum(jnp.mean(v) for v in loss_d.values())
            final, losses = jax.lax.scan(body, state, jnp.arange(kk))
            return jnp.sum(losses) + final.step.astype(jnp.float32)
        return run

    run_s, run_l = make(k), make(4 * k)
    float(run_s(state, feed))
    float(run_l(state, feed))
    diffs = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(run_s(state, feed))
        t1 = time.perf_counter()
        float(run_l(state, feed))
        diffs.append((time.perf_counter() - t1) - (t1 - t0))
    return max(sorted(diffs)[len(diffs) // 2], 1e-9) / (3 * k)


def build(stage: str):
    if stage == "train1":
        batch = 16
        cfg = synthetic_config(
            "/tmp/egotap_bench_data", "UnrealEgo",
            model="heatmap_shared", num_heatmap=15, num_rot_heatmap=0,
            batch_size=batch, use_amp=True, optimizer_type="Adam",
            lr=1e-3, niter=5, niter_decay=5)
    else:
        batch = 32
        cfg = synthetic_config(
            "/tmp/egotap_bench_data", "UnrealEgo",
            model="egotap_autoencoder", num_heatmap=15, num_rot_heatmap=15,
            heatmap_type="sin", skel_layer="PU", ae_hidden_size=128,
            patched_heatmap_ae=True, load_size_heatmap=(64, 64),
            batch_size=batch, use_amp=True, optimizer_type="AdamW",
            lr_policy="cos_anneal_warmup", lr=1e-3, niter=1, niter_decay=15)

    task = create_task(cfg)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=1000)
    state = jax.device_put(state, jax.devices()[0])

    feed = {"input_rgb": jax.random.normal(
        jax.random.PRNGKey(1),
        (batch, 2, cfg.image_size, cfg.image_size, 3), jnp.float32)}
    if stage == "train1":
        feed["gt_heatmap_left"] = jax.random.uniform(
            jax.random.PRNGKey(2), (batch, 64, 64, 15), jnp.float32)
        feed["gt_heatmap_right"] = jax.random.uniform(
            jax.random.PRNGKey(3), (batch, 64, 64, 15), jnp.float32)
    else:
        feed["gt_local_pose"] = jax.random.normal(
            jax.random.PRNGKey(2), (batch, 16, 3))
    return cfg, task, state, feed, batch


def loss_value_fn(task, stage, cfg):
    """The train_step's loss_fn as a standalone value program (same math
    as tasks.py train_step, including stage-2's frozen train-mode fwd)."""
    from egotap_tpu.train.tasks import _dtype
    dt = _dtype(cfg)

    if stage == "train1":
        def value(state, batch):
            out, _ = task.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["input_rgb"].astype(dt), train=True,
                mutable=["batch_stats"])
            return sum(task._losses(out.astype(jnp.float32), batch).values())
        return value

    def value(state, batch):
        hm_cat, _ = task._forward_heatmaps(state.frozen, batch, train=True)
        hm_cat = jax.lax.stop_gradient(hm_cat)
        pose, _ = task.lifter.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            hm_cat.astype(dt), train=True, mutable=["batch_stats"])
        return sum(task._pose_losses(pose.astype(jnp.float32), batch).values())
    return value


def main():
    stages = [a for a in sys.argv[1:] if a in ("train", "train1")] or \
        ["train1", "train"]
    enable_compilation_cache()

    for stage in stages:
        cfg, task, state, feed, batch = build(stage)
        name = "stage1" if stage == "train1" else "stage2"
        print(f"== {name} (batch {batch}) ==")
        value = loss_value_fn(task, stage, cfg)

        # feeds are all f32 here, so `v + i * 1e-6` stays f32 (the bf16
        # promotion trap noted in docs/ROUND4.md does not apply) and a
        # literal i=0 also works for component_flops' un-scanned lowering
        def f_fwd(i, state, feed):
            b = {k: v + i * 1e-6 for k, v in feed.items()}
            return value(state, b)
        t_fwd, _ = timed_scan(f_fwd, state, feed, k=K, label="fwd")

        def f_grad(i, state, feed):
            b = {k: v + i * 1e-6 for k, v in feed.items()}
            loss, grads = jax.value_and_grad(
                lambda p: value(state.replace(params=p), b))(state.params)
            # fold every grad leaf into the scalar so nothing is DCE'd
            return loss + sum(jnp.sum(g.astype(jnp.float32))
                              for g in jax.tree.leaves(grads)) * 1e-12
        t_grad, _ = timed_scan(f_grad, state, feed, k=K, label="fwd+bwd")

        t_full = timed_state_scan(task, state, feed)
        print(f"{'full step':12s} {'':18s}  {t_full * 1e3:8.2f} ms"
              f"  {batch / t_full:8.1f} pairs/s")

        if stage == "train":
            def f_frozen(i, state, feed):
                b = {"input_rgb": feed["input_rgb"] + i * 1e-6}
                hm, _ = task._forward_heatmaps(state.frozen, b, train=True)
                return jnp.mean(hm.astype(jnp.float32))
            t_frozen, _ = timed_scan(f_frozen, state, feed,
                                     k=K, label="(frozen fwd)")
        else:
            t_frozen = None

        bwd = t_grad - t_fwd
        opt = t_full - t_grad
        line = {
            "metric": f"train_breakdown_{name}",
            "batch": batch,
            "fwd_ms": round(t_fwd * 1e3, 2),
            "bwd_ms": round(bwd * 1e3, 2),
            "opt_ms": round(opt * 1e3, 2),
            "full_ms": round(t_full * 1e3, 2),
            "pairs_per_sec": round(batch / t_full, 1),
        }
        if t_frozen is not None:
            line["frozen_fwd_ms"] = round(t_frozen * 1e3, 2)
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
