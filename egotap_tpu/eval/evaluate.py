"""Evaluation loops + result artifacts.

Equivalent of the reference's utils/evaluate.py:75-170 and test.py:
  * `evaluate`: timed no-grad loop over a split; per-sample metrics with
    padding masks; optional pred/gt pose dumps + input path list.
  * `write_detail_result` / `write_categorical_result`: the text artifact
    formats the reference emits (test.py:9-18, 60-77).

Timing convention: the device queue is kept fed (no per-batch sync) and
completion is forced once at the end by reading a scalar back — through
the TPU relay `block_until_ready` does NOT actually block (CLAUDE.md), so
per-batch blocked timing both under-measures and serializes the pipeline.
The first batch (compile + warmup) is excluded when more than one batch
runs, giving a steady-state number comparable to bench.py's fused scan.
The reference times around the per-batch blocked call
(utils/evaluate.py:108-111); on a GPU without a relay both conventions
agree at steady state.
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
    pairs/sec).

    Multi-host: mean metrics and pairs/sec are global (reduced across
    processes); `per_sample` stats remain shard-local to each process —
    only the save_result artifacts are gathered globally (written by
    process 0)."""
    loader = make_loader(cfg, mode, category_id)
    if len(loader) == 0:
        suffix = f" (category {category_id})" if category_id else ""
        print(f"Evaluation dataset is empty!{suffix}")
        return {}, {}, 0.0
    pre = make_device_preprocess(cfg)
    acc = MetricAccumulator()

    # pre-quantize int8 weights BEFORE sharding (the calibrate-then-shard
    # ordering from serving.py — the new frozen entries must be placed by
    # data_parallel_setup's replicate like everything else). When
    # cfg.calib_batches > 0, calibrate STATIC activation scales on the
    # first N eval batches so int8 outputs are batch-composition
    # independent (ops/quant.py; VERDICT r3 item 4) — otherwise the
    # dynamic per-call scales are used.
    int8_on = cfg.int8_heatmap_inference or cfg.int8_lifter_inference
    if hasattr(task, "prepare_inference"):
        calib = None
        n_calib = int(getattr(cfg, "calib_batches", 0) or 0)
        if int8_on and n_calib > 0 and not _has_calibrated_scales(
                state.frozen):
            calib = []
            for bi, batch in enumerate(loader):
                if bi >= n_calib:
                    break
                batch = {k: jnp.asarray(v) for k, v in batch.items()
                         if k != "paths"}
                calib.append({"input_rgb": pre(batch)["input_rgb"]})
        state = task.prepare_inference(state, calib_batches=calib)
        if calib is not None and jax.process_count() > 1:
            # each host calibrated on ITS loader shard, so the derived
            # a_scale trees differ per process; replicate() below assumes
            # replicated leaves are bit-identical everywhere. Max-reduce
            # the scales across processes (a_scale = amax/127 is monotone
            # in amax, so the elementwise max equals calibrating on the
            # union of all hosts' batches) so every host installs the
            # same static scales and per-sample int8 outputs stay
            # host-independent.
            state = state.replace(
                frozen=_sync_calibrated_scales(state.frozen))
        if int8_on:
            mode_s = (f"calibrated static ({len(calib)} batches)" if calib
                      else "calibrated static (pre-calibrated state)"
                      if _has_calibrated_scales(state.frozen)
                      else "dynamic per-call")
            print(f"int8 inference: {mode_s} activation scales")

    # shard eval batches over the data mesh when multiple devices are
    # available (per-sample metrics gather back automatically); eval batches
    # are always padded to batch_size, so only batch_size divisibility
    # matters — data_parallel_setup reduces the device count (with a log
    # line) rather than silently dropping to one device
    from egotap_tpu.parallel.mesh import data_parallel_setup
    mesh, state, shard_fn = data_parallel_setup(cfg, state)
    shard = shard_fn if mesh is not None else None

    pred_poses, gt_poses, input_paths = [], [], []
    pending = []  # (device metrics, mask, device poses) — read back at end
    n_samples = 0
    timed_samples = 0

    t_start = time.perf_counter()
    t_warm = None
    out = None
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
        out = task.eval_step(state, feed)

        n_samples += int(mask.sum())
        # keep results on device; host conversion happens after the loop so
        # the device pipeline is never stalled on metric readbacks — the
        # host runs ahead, double-buffering the feed
        poses = (out.get("pred_pose"), out.get("gt_pose")) if save_result \
            else None
        pending.append((out["metrics"], mask, poses))
        if save_result:
            input_paths.extend(paths)
        if bi == 0:
            _force_completion(out)   # compile + warmup boundary
            t_warm = time.perf_counter()
        else:
            timed_samples += int(mask.sum())
    if out is not None:
        # programs execute in queue order, so syncing the last step's
        # output bounds the whole pipeline
        _force_completion(out)
    t_end = time.perf_counter()
    if t_warm is not None and timed_samples > 0:
        elapsed, n_timed = t_end - t_warm, timed_samples
    else:
        elapsed, n_timed = t_end - t_start, n_samples

    for metrics, mask, poses in pending:
        acc.update({k: _local_rows(v) for k, v in metrics.items()},
                   mask=mask)
        if poses is not None and poses[0] is not None:
            keep = np.asarray(mask).astype(bool)
            pred_poses.append(_local_rows(poses[0])[keep])
            gt_poses.append(_local_rows(poses[1])[keep])

    # Multi-host: entered on save_result ALONE (not `and pred_poses`) —
    # every process must reach the allgather even if its shard produced
    # zero rows, or the others hang in the collective; an empty host
    # contributes a zero-row array. Single-host: skip entirely when the
    # task emitted no poses (e.g. HeatmapTask) — the reference writes
    # nothing in that case and a placeholder file would be
    # indistinguishable from a legitimately empty global result.
    if save_result and (pred_poses or jax.process_count() > 1):
        joints = getattr(getattr(task, "cfg", None), "num_joints_out", 1)
        pred = (np.concatenate(pred_poses, axis=0) if pred_poses
                else np.zeros((0, joints, 3), np.float32))
        gt = (np.concatenate(gt_poses, axis=0) if gt_poses
              else np.zeros((0, joints, 3), np.float32))
        paths_arr = np.asarray(input_paths, dtype=object)
        if jax.process_count() > 1:
            # each host holds only its shard's rows; gather everything so
            # the artifacts are global, and let exactly one process write
            # (concurrent writers to cfg.results_dir would race)
            pred = _allgather_rows(pred)
            gt = _allgather_rows(gt)
            paths_arr = _allgather_strings(paths_arr)
        if jax.process_index() == 0:
            save_path = cfg.results_dir
            os.makedirs(save_path, exist_ok=True)
            np.save(os.path.join(save_path, "pred_pose.npy"), pred)
            data_name = os.path.normpath(cfg.data_dir).split("/")[-1].lower()
            np.save(os.path.join(save_path, os.pardir,
                                 f"gt_{data_name}_pose.npy"), gt)
            with open(os.path.join(save_path, "input_paths.pkl"), "wb") as f:
                pickle.dump(paths_arr.reshape(-1, 1), f)

    pairs_per_sec = n_timed / elapsed if elapsed > 0 else 0.0
    means = acc.means()
    if jax.process_count() > 1:
        # each host accumulated only its shard's rows; reduce the means
        # (weighted by local counts) across hosts so every process reports
        # the global metric values. The key SCHEMA is gathered first (a
        # metric genuinely absent on one host — e.g. a host whose shard
        # ran dry — would otherwise give differently-shaped local arrays
        # and a failed collective); missing keys contribute zero-count
        # rows.
        from jax.experimental import multihost_utils
        keys = sorted(set(
            _allgather_strings(np.asarray(sorted(means), dtype=object))
            .tolist()))
        local = np.asarray(
            [[means.get(k, 0.0) * (acc.count if k in means else 0),
              acc.count if k in means else 0] for k in keys]
            or [[0.0, 0]], dtype=np.float64)
        allhosts = multihost_utils.process_allgather(local)
        totals = allhosts.sum(axis=0)
        means = {k: float(totals[i, 0] / max(totals[i, 1], 1))
                 for i, k in enumerate(keys)}
        # global throughput: all hosts' timed samples over the slowest
        # host's wall-clock (hosts run in lockstep on the same programs)
        tl = multihost_utils.process_allgather(
            np.asarray([float(n_timed), elapsed], dtype=np.float64))
        pairs_per_sec = float(tl[:, 0].sum()) / max(float(tl[:, 1].max()),
                                                    1e-9)
    return means, acc.per_sample, pairs_per_sec


def _sync_calibrated_scales(frozen: Dict) -> Dict:
    """Elementwise max of every 'a_scale' leaf in the pre-quantized
    ('*_q') frozen trees across processes. Leaves are per-tensor scalars
    (ops/quant.py:amax_to_qparams); they are flattened into one vector so
    the sync costs a single allgather."""
    from jax.experimental import multihost_utils
    out = dict(frozen)
    flat_scales, slots = [], []  # slots: (tree key, leaf index, shape)
    treedefs, leaf_lists = {}, {}
    for key in [k for k in frozen if k.endswith("_q")]:
        flat, treedef = jax.tree_util.tree_flatten_with_path(frozen[key])
        leaves = [v for _, v in flat]
        treedefs[key], leaf_lists[key] = treedef, leaves
        for i, (path, v) in enumerate(flat):
            if getattr(path[-1], "key", None) == "a_scale":
                arr = np.asarray(v, np.float64)
                slots.append((key, i, arr.shape, arr.dtype))
                flat_scales.append(arr.reshape(-1))
    if not flat_scales:
        return frozen
    local = np.concatenate(flat_scales)
    global_max = np.asarray(
        multihost_utils.process_allgather(local)).reshape(
            jax.process_count(), -1).max(axis=0)
    off = 0
    for key, i, shape, _dt in slots:
        n = int(np.prod(shape)) if shape else 1
        val = global_max[off:off + n].reshape(shape)
        leaf_lists[key][i] = jnp.asarray(val, jnp.float32)
        off += n
    for key in treedefs:
        out[key] = jax.tree_util.tree_unflatten(treedefs[key],
                                                leaf_lists[key])
    return out


def _has_calibrated_scales(frozen) -> bool:
    """True when any pre-quantized tree in `frozen` carries calibrated
    static 'a_scale' entries (ops/quant.py:amax_to_qparams) — used to skip
    redundant re-calibration across the test CLI's 30-category loop."""
    def visit(t) -> bool:
        if isinstance(t, dict):
            return "a_scale" in t or any(visit(v) for v in t.values())
        return False
    return any(visit(v) for k, v in frozen.items() if k.endswith("_q"))


def _force_completion(out) -> None:
    """Actually wait for a step's outputs: read one leaf back to host
    (`block_until_ready` does not block through the TPU relay)."""
    leaf = jax.tree.leaves(out["metrics"] if isinstance(out, dict)
                           and "metrics" in out else out)[0]
    np.asarray(_local_rows(leaf))


def _allgather_rows(arr: np.ndarray) -> np.ndarray:
    """Concatenate per-host row arrays (possibly unequal row counts) in
    process order. A host with ZERO rows may pass a placeholder trailing
    shape — the consensus trailing shape is gathered first so its padded
    contribution still matches the fixed-shape collective."""
    from jax.experimental import multihost_utils
    nd = 4  # max trailing dims shipped (poses are (N, J, 3))
    meta = np.full((1 + nd,), -1, dtype=np.int64)
    meta[0] = arr.shape[0]
    meta[1:1 + len(arr.shape[1:])] = arr.shape[1:]
    metas = np.atleast_2d(multihost_utils.process_allgather(meta))
    counts = metas[:, 0]
    maxn = int(counts.max())
    if maxn == 0:
        return arr
    ref = metas[counts > 0][0, 1:]
    tshape = tuple(int(d) for d in ref if d >= 0)
    if arr.shape[0] == 0 and arr.shape[1:] != tshape:
        arr = np.zeros((0,) + tshape, arr.dtype)
    if arr.shape[0] < maxn:
        pad = np.zeros((maxn - arr.shape[0],) + arr.shape[1:], arr.dtype)
        arr = np.concatenate([arr, pad], axis=0)
    gathered = multihost_utils.process_allgather(arr)
    return np.concatenate(
        [gathered[p, :int(counts[p])] for p in range(len(counts))], axis=0)


def _allgather_strings(arr: np.ndarray) -> np.ndarray:
    """Allgather a 1-D array of strings (utf-8, padded to the global max
    byte length for the fixed-shape collective)."""
    from jax.experimental import multihost_utils
    enc = [s.encode("utf-8") for s in arr.tolist()]
    local_max = max((len(b) for b in enc), default=0)
    width = int(np.atleast_1d(multihost_utils.process_allgather(
        np.asarray([local_max], dtype=np.int64))).max())
    width = max(width, 1)
    buf = np.zeros((len(enc), width), dtype=np.uint8)
    for i, b in enumerate(enc):
        buf[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
    out = _allgather_rows(buf)
    return np.asarray([bytes(row[row != 0]).decode("utf-8") for row in out])


def _local_rows(v) -> np.ndarray:
    """This process's rows of a batch-major array, in loader order — the
    identity for single-host arrays; for multi-host global arrays, the
    addressable shards concatenated by global row offset (exactly the rows
    this host's sharded loader produced, so local masks stay aligned)."""
    if isinstance(v, jax.Array) and not v.is_fully_addressable:
        # deduplicate shards with identical index tuples: a replicated
        # output (e.g. a scalar metric broadcast to every local device)
        # would otherwise be concatenated once per device
        unique = {}
        for s in v.addressable_shards:
            key = tuple((sl.start, sl.stop) for sl in s.index)
            unique.setdefault(key, s)
        shards = sorted(unique.values(), key=lambda s: s.index[0].start or 0)
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
