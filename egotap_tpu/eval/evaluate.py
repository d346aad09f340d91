"""Evaluation loops + result artifacts.

Equivalent of the reference's utils/evaluate.py:75-170 and test.py:
  * `evaluate`: timed no-grad loop over a split; per-sample metrics with
    padding masks; optional pred/gt pose dumps + input path list.
  * `write_detail_result` / `write_categorical_result`: the text artifact
    formats the reference emits (test.py:9-18, 60-77).

Timing convention: wall-clock around the blocked eval_step call, like the
reference's timing around model.evaluate (utils/evaluate.py:108-111) —
this is the throughput number BASELINE.md tracks.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from egotap_tpu.core.config import Config
from egotap_tpu.data.pipeline import make_device_preprocess, make_loader
from egotap_tpu.eval.metrics import MetricAccumulator


def evaluate(cfg: Config, task, state, mode: str = "test",
             category_id: Optional[str] = None,
             save_result: bool = False,
             max_batches: Optional[int] = None
             ) -> Tuple[Dict[str, float], Dict[str, list], float]:
    """Run eval over a split. Returns (mean metrics, per-sample stats,
    pairs/sec)."""
    loader = make_loader(cfg, mode, category_id)
    if len(loader) == 0:
        suffix = f" (category {category_id})" if category_id else ""
        print(f"Evaluation dataset is empty!{suffix}")
        return {}, {}, 0.0
    pre = make_device_preprocess(cfg)
    acc = MetricAccumulator()

    # shard eval batches over the data mesh when multiple devices are
    # available (per-sample metrics gather back automatically); eval batches
    # are always padded to batch_size, so only batch_size divisibility
    # matters — data_parallel_setup reduces the device count (with a log
    # line) rather than silently dropping to one device
    from egotap_tpu.parallel.mesh import data_parallel_setup
    mesh, state, shard_fn = data_parallel_setup(cfg, state)
    shard = shard_fn if mesh is not None else None
    if hasattr(task, "prepare_inference"):
        state = task.prepare_inference(state)  # pre-quantized int8 weights

    pred_poses, gt_poses, input_paths = [], [], []
    pending = []  # (device metrics, mask, device poses) — read back at end
    elapsed = 0.0
    n_samples = 0

    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        paths = batch.pop("paths")
        mask = batch["mask"]
        # shard the HOST batch first, then run the jitted preprocess on the
        # sharded arrays: target synthesis parallelizes over the data mesh
        # and multi-host assembly (make_global_batch) sees host numpy
        # instead of round-tripping device arrays
        feed = batch if shard is None else shard(batch)
        feed = pre({k: jnp.asarray(v) if shard is None else v
                    for k, v in feed.items()})
        t0 = time.perf_counter()
        out = task.eval_step(state, feed)
        out = jax.block_until_ready(out)
        elapsed += time.perf_counter() - t0

        n_samples += int(mask.sum())
        # keep results on device; host conversion happens after the loop so
        # the device pipeline is never stalled on metric readbacks
        poses = (out.get("pred_pose"), out.get("gt_pose")) if save_result \
            else None
        pending.append((out["metrics"], mask, poses))
        if save_result:
            input_paths.extend(paths)

    for metrics, mask, poses in pending:
        acc.update({k: _local_rows(v) for k, v in metrics.items()},
                   mask=mask)
        if poses is not None and poses[0] is not None:
            keep = np.asarray(mask).astype(bool)
            pred_poses.append(_local_rows(poses[0])[keep])
            gt_poses.append(_local_rows(poses[1])[keep])

    if save_result and pred_poses:
        save_path = cfg.results_dir
        os.makedirs(save_path, exist_ok=True)
        np.save(os.path.join(save_path, "pred_pose.npy"),
                np.concatenate(pred_poses, axis=0))
        data_name = os.path.normpath(cfg.data_dir).split("/")[-1].lower()
        np.save(os.path.join(save_path, os.pardir,
                             f"gt_{data_name}_pose.npy"),
                np.concatenate(gt_poses, axis=0))
        with open(os.path.join(save_path, "input_paths.pkl"), "wb") as f:
            pickle.dump(np.asarray(input_paths).reshape(-1, 1), f)

    pairs_per_sec = n_samples / elapsed if elapsed > 0 else 0.0
    means = acc.means()
    if jax.process_count() > 1:
        # each host accumulated only its shard's rows; reduce the means
        # (weighted by local counts) across hosts so every process reports
        # the global metric values
        from jax.experimental import multihost_utils
        local = np.asarray(
            [[means.get(k, 0.0) * acc.count, acc.count] for k in means]
            or [[0.0, 0]], dtype=np.float64)
        allhosts = multihost_utils.process_allgather(local)
        totals = allhosts.sum(axis=0)
        means = {k: float(totals[i, 0] / max(totals[i, 1], 1))
                 for i, k in enumerate(means)}
    return means, acc.per_sample, pairs_per_sec


def _local_rows(v) -> np.ndarray:
    """This process's rows of a batch-major array, in loader order — the
    identity for single-host arrays; for multi-host global arrays, the
    addressable shards concatenated by global row offset (exactly the rows
    this host's sharded loader produced, so local masks stay aligned)."""
    if isinstance(v, jax.Array) and not v.is_fully_addressable:
        shards = sorted(v.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(v)


def write_detail_result(path: str, stats: Dict[str, list]) -> None:
    """Per-frame metric table (reference test.py:9-18)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    keys = list(stats.keys())
    with open(path, "w") as f:
        f.write(" ".join(keys) + " \n")
        n = len(stats[keys[0]]) if keys else 0
        for i in range(n):
            f.write(" ".join(str(stats[k][i]) for k in keys) + " \n")


def write_categorical_header(path: str, metrics: Dict[str, float]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(" ".join(metrics.keys()) + " \n")
        f.write(" ".join(str(v) for v in metrics.values()) + " \n")


def append_categorical_result(path: str, key: str, name: str,
                              n_batches: int,
                              metrics: Dict[str, float]) -> None:
    with open(path, "a") as f:
        f.write(f"{key} {name} {n_batches} "
                + " ".join(str(v) for v in metrics.values()) + " \n")
