"""Training loop: epochs, watchdogs, restart semantics, artifacts.

Equivalent of the reference train.py:63-287:
  * NaN/Inf loss -> save a tagged checkpoint, reload the previous epoch and
    restart it (abort/restart at epoch 1; train.py:137-164).
  * Early-convergence watchdog during the first 3000 (heatmap) / 8000
    (pose) iterations: a loss that hasn't improved for 200/400 iterations
    triggers a from-scratch restart when --auto_restart (train.py:165-177).
  * Per-epoch validation, best-checkpoint tracking on the task's eval_key,
    periodic checkpoints with previous-epoch GC, final best-model test +
    per-motion-category evaluation written to test_result.txt.
"""

from __future__ import annotations

import math
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from egotap_tpu.compat.convert import convert_heatmap_net
from egotap_tpu.compat.torch_loader import load_torch_checkpoint
from egotap_tpu.core.config import Config
from egotap_tpu.data.pipeline import make_device_preprocess, make_loader
from egotap_tpu.eval.categories import MOTION_CATEGORIES
from egotap_tpu.eval.evaluate import evaluate
from egotap_tpu.train import state as state_lib
from egotap_tpu.train.tasks import create_task
from egotap_tpu.utils.logging import MetricWriter
from egotap_tpu.utils.profiling import step_annotation


def load_pretrained_heatmaps(cfg: Config) -> Tuple[Optional[Dict], Optional[Dict]]:
    """Resolve the reference's sibling-directory convention for pretrained
    stage-1 nets: ``{base}_pos`` and ``{base}_{heatmap_type}``
    (reference model/egotap_autoencoder_model.py:113-126). Supports both
    converted ``.pth`` files and this framework's Orbax checkpoints."""
    if cfg.path_to_trained_heatmap is None:
        return None, None
    path = cfg.path_to_trained_heatmap
    if path.startswith("./log/"):
        path = os.path.join(cfg.log_dir, path[len("./log/"):])
    base_dir, fname = os.path.split(path)

    out = []
    for suffix in ("_pos", "_" + cfg.heatmap_type):
        pth = os.path.join(base_dir + suffix, fname)
        ckpt = os.path.join(base_dir + suffix, "ckpt_best")
        if os.path.exists(pth):
            variables = convert_heatmap_net(
                load_torch_checkpoint(pth), cfg.model_name)
            out.append(jax.tree.map(jnp.asarray, variables))
        elif os.path.isdir(ckpt):
            import orbax.checkpoint as ocp
            with ocp.PyTreeCheckpointer() as ckptr:
                restored = ckptr.restore(os.path.abspath(ckpt))
            out.append(jax.tree.map(jnp.asarray, {
                "params": restored["params"],
                "batch_stats": restored["batch_stats"]}))
        else:
            raise FileNotFoundError(
                f"no pretrained heatmap checkpoint at {pth} or {ckpt}")
    return out[0], out[1]


def _init_task_state(cfg: Config, task, iters_per_epoch: int):
    rng = jax.random.PRNGKey(cfg.seed)
    if cfg.model == "egotap_autoencoder":
        hv, rv = load_pretrained_heatmaps(cfg)
        return task.init_state(rng, iters_per_epoch,
                               heatmap_vars=hv, rot_heatmap_vars=rv)
    return task.init_state(rng, iters_per_epoch)


def test_model(cfg: Config, task, state, writer=None) -> Dict[str, float]:
    metrics, _, pps = evaluate(cfg, task, state, mode="test")
    print("best test metrics:")
    for k, v in metrics.items():
        print(f"{k}: {v:.4e}")
    print(f"throughput: {pps:.1f} pairs/s")
    return metrics


class _NullWriter:
    """Metric-writer stand-in for non-main hosts (multi-host runs)."""

    def scalar(self, *a, **k):
        pass

    def scalars(self, *a, **k):
        pass

    def close(self):
        pass


class _NullFile:
    def write(self, *_):
        pass


def train_main(cfg: Config, epoch_callback=None) -> bool:
    """One training attempt. Returns True when finished; False requests a
    from-scratch restart (reference auto-restart protocol).

    epoch_callback: optional external-tuner hook (the surface the
    reference's dormant Ray Tune integration reported through,
    train.py:63-68, 102-103, 208-211). Called once per completed epoch —
    and once on a NaN/Inf loss event with bad_loss=True — with a report
    dict {epoch, train_losses, val_metrics, bad_loss, checkpoint_path};
    a truthy return requests a clean early stop (training proceeds to the
    final best-model test)."""
    os.makedirs(cfg.experiment_dir, exist_ok=True)
    if jax.process_index() == 0:
        cfg.save(os.path.join(cfg.experiment_dir, "train_opt.txt"))

    print("preparing dataset ...")
    train_loader = make_loader(cfg, "train")
    iters_per_epoch = len(train_loader)
    if iters_per_epoch == 0:
        raise RuntimeError("empty training split")
    pre = make_device_preprocess(cfg)

    task = create_task(cfg)
    state = _init_task_state(cfg, task, iters_per_epoch)

    if cfg.epoch_count > 1:
        state = state_lib.load_checkpoint(
            cfg.experiment_dir, cfg.epoch_count - 1, state)

    # data parallelism over the device mesh (cfg.data_parallel, 0 = all
    # devices): parameters replicated, batches sharded over 'data'; XLA
    # inserts the gradient all-reduce over ICI. Replaces the reference's
    # dead --distributed flag (options/base_options.py:81).
    from egotap_tpu.parallel.mesh import data_parallel_setup, replicate
    mesh, state, shard = data_parallel_setup(cfg, state)
    if mesh is not None:
        print(f"data-parallel training over {mesh.shape['data']} devices")

    # multi-host: exactly one process owns the shared filesystem artifacts
    # (summaries, checkpoints, result files) — concurrent writers would
    # race on the same paths
    main_host = jax.process_index() == 0
    writer = MetricWriter(os.path.join(cfg.experiment_dir, "summary"),
                          clear=(cfg.epoch_count == 1)) if main_host \
        else _NullWriter()

    def save_ckpt(tag):
        if main_host:
            state_lib.save_checkpoint(cfg.experiment_dir, tag, state)

    # dataset provenance copy (reference record_dataset_information,
    # train.py:36-47)
    prov = os.path.join(cfg.data_dir, "modify_dataset_log.txt")
    if main_host and os.path.exists(prov):
        import shutil
        ds_dir = os.path.join(cfg.experiment_dir, "dataset")
        os.makedirs(ds_dir, exist_ok=True)
        shutil.copy(prov, os.path.join(ds_dir, "modify_dataset_log.txt"))

    best_metric = math.inf
    best_metrics = None
    loss_records: Dict[str, Tuple[int, float]] = {}
    check_itr = cfg.watchdog_check_iters if cfg.watchdog_check_iters \
        else (3000 if "Heatmap" in task.name else 8000)
    stall_threshold = cfg.watchdog_stall_iters if cfg.watchdog_stall_iters \
        else (200 if "Heatmap" in task.name else 400)

    print("---------------------Start Training-----------------------")
    epoch = cfg.epoch_count
    total_itr = (cfg.epoch_count - 1) * iters_per_epoch
    while epoch <= cfg.niter + cfg.niter_decay:
        print(f"-----------------Train Epoch: {epoch}-----------------")
        restart_epoch = False
        abort = None
        epoch_losses: Dict[str, list] = {}
        val_metrics: Dict[str, float] = {}
        t0 = time.time()

        profiling = False
        pending = []  # (i, step, curr_itr, device loss dict)
        stall = None

        def flush_losses():
            """Host-sync buffered losses: logging, NaN/Inf protocol and the
            early-convergence watchdog (semantically identical to per-step
            checks, batched every cfg.loss_sync_every steps)."""
            nonlocal restart_epoch, abort, stall
            for (bi, step, curr_itr, dl) in pending:
                losses = {k: float(v) for k, v in dl.items()}
                for k, v in losses.items():
                    epoch_losses.setdefault(k, []).append(v)
                    writer.scalar(f"Batch/{k}", v, step)
                    if math.isnan(v) or math.isinf(v):
                        tag = "nan" if math.isnan(v) else "inf"
                        print(f"{k} loss is {tag.upper()}!")
                        save_ckpt(tag)
                        if epoch > 1:
                            restart_epoch = True
                        else:
                            abort = cfg.auto_terminate
                        return
                    if cfg.auto_restart and curr_itr < check_itr:
                        if k not in loss_records or v < loss_records[k][1]:
                            loss_records[k] = (curr_itr, v)
                        elif curr_itr - loss_records[k][0] > stall_threshold:
                            print(f"Early convergence detected at {bi} "
                                  f"({v:.3e}) for {k}!")
                            stall = True
                            return
            pending.clear()

        for i, batch in enumerate(train_loader):
            batch.pop("paths", None)
            if cfg.profile_dir and epoch == cfg.epoch_count and i == 2:
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True
            # shard the HOST batch, then preprocess on the sharded arrays:
            # target synthesis parallelizes over the mesh, and multi-host
            # assembly never round-trips device arrays through the host
            feed = pre(shard(batch) if mesh is not None else
                       {k: jnp.asarray(v) for k, v in batch.items()})
            with step_annotation("train", (epoch - 1) * iters_per_epoch + i):
                state, losses = task.train_step(state, feed)
            if profiling and i >= 2 + cfg.profile_steps:
                jax.profiler.stop_trace()
                profiling = False
            pending.append((i, (epoch - 1) * iters_per_epoch + i,
                            total_itr + i, losses))
            if len(pending) >= max(1, cfg.loss_sync_every):
                flush_losses()
            if restart_epoch or abort is not None or stall:
                break

        if not (restart_epoch or abort is not None or stall):
            flush_losses()
        if profiling:
            jax.profiler.stop_trace()
        if stall:
            writer.close()
            return False
        if (restart_epoch or abort is not None) and epoch_callback \
                is not None:
            # the reference's Ray hook reports bad_loss to the tuner
            # (train.py:102-103); a truthy return terminates the attempt
            if epoch_callback({"epoch": epoch, "train_losses": {},
                               "val_metrics": {}, "bad_loss": True,
                               "checkpoint_path": None}):
                writer.close()
                return True
        if abort is not None:
            writer.close()
            return abort
        if restart_epoch:
            state = state_lib.load_checkpoint(
                cfg.experiment_dir, epoch - 1, state)
            if mesh is not None:  # restored arrays land unreplicated
                state = replicate(state, mesh)
            continue

        if epoch % cfg.val_epoch_freq == 0:
            print(f"-----------------Validation Epoch: {epoch}--------------")
            metrics, _, _ = evaluate(cfg, task, state, mode="validation")
            writer.scalars("Validation", metrics, epoch)
            print(" ".join(f"{k}: {v:.4E}" for k, v in metrics.items()))
            val_metrics = metrics
            if metrics and metrics[task.eval_key] < best_metric:
                best_metric = metrics[task.eval_key]
                best_metrics = metrics
                save_ckpt("best")

        if epoch % cfg.print_epoch_freq == 0:
            means = {k: float(np.mean(v)) for k, v in epoch_losses.items()}
            writer.scalars("Train", means, epoch)
            print(f"(epoch: {epoch}, time: {time.time() - t0:.1f}s) "
                  + " ".join(f"{k}: {v:.3e}" for k, v in means.items()))

        if epoch % cfg.save_epoch_freq == 0:
            save_ckpt(epoch)

        total_itr += iters_per_epoch
        print(f"dir name: {cfg.experiment_name}")
        if epoch_callback is not None:
            # per-epoch tuner report (metrics + checkpoint path, reference
            # train.py:208-211); truthy return = clean early stop — fall
            # through to the final best-model test below
            ckpt = os.path.join(cfg.experiment_dir, f"ckpt_{epoch}")
            if epoch_callback({
                    "epoch": epoch,
                    "train_losses": {k: float(np.mean(v))
                                     for k, v in epoch_losses.items()},
                    "val_metrics": val_metrics, "bad_loss": False,
                    "checkpoint_path": ckpt if os.path.isdir(ckpt)
                    else None}):
                print(f"external tuner requested stop after epoch {epoch}")
                epoch += 1
                break
        epoch += 1

    print("\ntrain finished !!!")
    print(f"best validation metrics: {best_metrics}")

    print("-----------------Test Best Model-----------------")
    if state_lib.checkpoint_exists(cfg.experiment_dir, "best"):
        state = state_lib.load_checkpoint(cfg.experiment_dir, "best", state)
    metrics_test = test_model(cfg, task, state)

    import contextlib
    result_path = os.path.join(cfg.experiment_dir, "test_result.txt")
    with (open(result_path, "w") if main_host
          else contextlib.nullcontext(_NullFile())) as f:
        for k, v in metrics_test.items():
            f.write(f"{k}: {v:.4e}")
        f.write("\n")
        for key, name in MOTION_CATEGORIES.items():
            cat_metrics, _, _ = evaluate(cfg, task, state, mode="test",
                                         category_id=key)
            if not cat_metrics:
                continue
            f.write(f"category: {key}_{name}\n")
            for k, v in cat_metrics.items():
                f.write(f"{k}: {v}\n")

    writer.close()
    print("-----------------All Process Finished-----------------")
    return True


def run_training(cfg: Config, epoch_callback=None) -> None:
    """Auto-restart wrapper (reference train.py:282-287)."""
    while True:
        if train_main(cfg, epoch_callback=epoch_callback):
            break
