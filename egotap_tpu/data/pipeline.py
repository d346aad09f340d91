"""Batched input pipeline: host loading/prefetch + on-device target synthesis.

The reference renders every training target (gaussian joint maps, AA limb
lines, sin modulation) per frame on host CPU inside DataLoader workers —
its input-bound hot loop (dataloader/data_loader.py:76-215). Here the host
only reads raw arrays (`egotap_tpu.data.dataset`) and a single jitted
`device_preprocess` synthesizes all targets from the (J, 2)/(J, 3)
coordinates directly on the TPU, preserving the reference's target
semantics bit-for-bit at f32 (see data/device_render.py parity tests):

  * joint heatmaps from 2D coords [1:], peak-normalized       (:90-95)
  * limb line maps x2, per-side pixel lengths                 (:123-127)
  * sin-type (cos, sin) channels from the LEFT camera theta   (:193-199)
  * tail-slicing to num_heatmap / num_rot_heatmap             (:149-164)
  * head-relative pose variant when the root is not estimated (:153-157)
  * plength tiled limb_dim times                              (:210-214)

Batches are padded to a static shape with a validity mask so eval's ragged
final batch never retriggers XLA compilation.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from egotap_tpu.core.config import Config
from egotap_tpu.core.skeleton import get_skeleton
from egotap_tpu.data import device_render as dr
from egotap_tpu.data.dataset import FrameDataset


_PREPROCESS_CACHE: Dict[tuple, object] = {}


def make_device_preprocess(cfg: Config):
    """Build the jitted batch -> model-feed transform for a config.

    Cached on the fields the transform closes over: the test CLI calls
    this once per motion category (30+ times) and a fresh closure would
    re-trace each time — through the CI relay that dominates the
    category-evaluation loop."""
    key = (cfg.joint_preset, cfg.heatmap_res, cfg.image_size,
           cfg.num_heatmap, cfg.num_rot_heatmap, cfg.limb_dim,
           cfg.heatmap_type, cfg.estimate_head)
    cached = _PREPROCESS_CACHE.get(key)
    if cached is not None:
        return cached
    sk = get_skeleton(cfg.joint_preset)
    parents = sk.parents
    res = cfg.heatmap_res
    nh, nr, ld = cfg.num_heatmap, cfg.num_rot_heatmap, cfg.limb_dim

    @jax.jit
    def preprocess(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out: Dict[str, jnp.ndarray] = {}
        rgb_l = batch["input_rgb_left"]
        rgb_r = batch["input_rgb_right"]
        if rgb_l.dtype != jnp.float32:  # f16-packed splits (pack_split)
            rgb_l = rgb_l.astype(jnp.float32)
            rgb_r = rgb_r.astype(jnp.float32)
        if rgb_l.shape[1] != cfg.image_size:
            shape = rgb_l.shape[:1] + (cfg.image_size, cfg.image_size, 3)
            rgb_l = jax.image.resize(rgb_l, shape, method="bilinear")
            rgb_r = jax.image.resize(rgb_r, shape, method="bilinear")
        out["input_rgb"] = jnp.stack([rgb_l, rgb_r], axis=1)  # (B,V,H,W,3)

        pose = batch["gt_local_pose"]                    # (B, J, 3)
        pelvis_l = batch["gt_pelvis_left"]
        pelvis_r = batch["gt_pelvis_right"]

        if nh > 0:
            for side, key in (("left", "gt_camera_2d_left"),
                              ("right", "gt_camera_2d_right")):
                hm = dr.render_joint_heatmaps(batch[key][:, 1:], res)
                hm = hm[:, -nh:] if nh < sk.num_heatmaps else hm
                out[f"gt_heatmap_{side}"] = hm.transpose(0, 2, 3, 1)

        if nr > 0 and ld > 0:
            pts3d_l = pose + pelvis_l[:, None, :]
            pts3d_r = pose + pelvis_r[:, None, :]
            theta = dr.limb_theta(pts3d_l, parents)      # (B, J-1), LEFT side
            for side, p2k, p3 in (("left", "gt_camera_2d_left", pts3d_l),
                                  ("right", "gt_camera_2d_right", pts3d_r)):
                raw, plen = dr.render_limb_heatmaps(batch[p2k], parents, res)
                raw = raw * 2.0                          # (:127) x2 scale
                raw, plen, th = raw[:, -nr:], plen[:, -nr:], theta[:, -nr:]
                if cfg.heatmap_type == "sin":
                    cos_hm, sin_hm = dr.sin_limb_heatmaps(raw, th)
                    limb = jnp.concatenate([cos_hm, sin_hm], axis=1)
                else:  # "limb"
                    limb = raw
                out[f"gt_limb_heatmap_{side}"] = limb.transpose(0, 2, 3, 1)
                out[f"gt_plength_{side}"] = jnp.tile(plen, (1, ld))
            out["gt_limb_theta"] = theta[:, -nr:]

        if cfg.joint_preset == "UnrealEgo" and not cfg.estimate_head:
            pose = pose + pelvis_l[:, None, :]
            pelvis_l = jnp.zeros_like(pelvis_l)
            pelvis_r = jnp.zeros_like(pelvis_r)

        out["gt_local_pose"] = pose if cfg.estimate_head else pose[:, 1:]
        out["gt_local_rot"] = batch["gt_local_rot"]
        out["gt_pelvis_left"] = pelvis_l
        out["gt_pelvis_right"] = pelvis_r
        out["mask"] = batch["mask"]
        return out

    _PREPROCESS_CACHE[key] = preprocess
    return preprocess


def _stack_batch(frames, batch_size: int,
                 n_valid: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Stack frame dicts; pad to batch_size with a validity mask.
    n_valid overrides the valid-row count (0 = an all-padding lockstep
    batch from a dry multi-host shard)."""
    n = len(frames)
    batch: Dict[str, np.ndarray] = {}
    for k in frames[0]:
        if k == "path":
            continue
        arr = np.stack([f[k] for f in frames])
        if n < batch_size:
            pad = np.repeat(arr[-1:], batch_size - n, axis=0)
            arr = np.concatenate([arr, pad], axis=0)
        batch[k] = arr
    if n_valid is None:
        n_valid = n
    batch["mask"] = (np.arange(batch_size) < n_valid).astype(np.float32)
    batch["paths"] = [f["path"] for f in frames[:n_valid]]  # type: ignore[assignment]
    return batch


class BatchLoader:
    """Shuffling / padding batch iterator with threaded prefetch.

    train: shuffled, drop_last (reference dataloader_full,
    dataloader/data_loader.py:41-63); eval: ordered, final batch padded +
    masked so shapes stay static.
    """

    def __init__(self, dataset: FrameDataset, batch_size: int,
                 shuffle: bool, drop_last: bool,
                 num_threads: int = 2, seed: int = 0,
                 indices: Optional[np.ndarray] = None,
                 num_batches: Optional[int] = None):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_threads = max(1, num_threads)
        self.rng = np.random.default_rng(seed)
        self.indices = (np.arange(len(dataset)) if indices is None
                        else np.asarray(indices))
        # multi-host: every host must run the SAME number of batches or
        # collectives deadlock; the host-sharded make_loader passes the
        # common count computed from the global dataset size
        self._num_batches = num_batches

    def __len__(self) -> int:
        if self._num_batches is not None:
            return self._num_batches
        n = len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        idx = self.indices.copy()
        if self.shuffle:
            self.rng.shuffle(idx)
        nb = len(self)
        for i in range(nb):
            sel = idx[i * self.batch_size:(i + 1) * self.batch_size]
            n_valid = len(sel)
            if n_valid == 0:
                # a host whose shard ran dry emits fully-padded batches
                # (mask 0 everywhere) to stay in lockstep with its peers
                sel = idx[-1:] if len(idx) else np.zeros(1, np.int64)
            yield sel, n_valid

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        from concurrent.futures import ThreadPoolExecutor

        def load(args):
            indices, n_valid = args
            return _stack_batch([self.ds[i] for i in indices],
                                self.batch_size, n_valid=n_valid)

        with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
            futures = []
            gen = self._index_batches()
            for _ in range(2 * self.num_threads):
                try:
                    futures.append(pool.submit(load, next(gen)))
                except StopIteration:
                    break
            while futures:
                batch = futures.pop(0).result()
                try:
                    futures.append(pool.submit(load, next(gen)))
                except StopIteration:
                    pass
                yield batch


class PrefetchLoader:
    """Background-thread prefetch over any batch iterable (depth-bounded).

    The packed reader's gather is synchronous; JAX's async dispatch hides
    it one level deep, but the main thread also blocks on loss syncs,
    validation, and checkpoint writes — moments when an unwrapped loader
    sits idle. A daemon thread keeps up to `depth` batches staged (numpy
    work only, so the GIL is released inside the native gather / np.load).
    Re-iterable: each __iter__ spawns a fresh thread; abandoning the
    iterator mid-epoch (watchdog break) stops the thread promptly.
    """

    def __init__(self, inner, depth: int = 2):
        self._inner = inner
        self._depth = max(1, int(depth))

    def __len__(self) -> int:
        return len(self._inner)

    def __getattr__(self, name):  # delegate reader/indices/... to inner
        return getattr(self._inner, name)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self._depth)
        stop = threading.Event()
        done = object()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in self._inner:
                    if not put(b):
                        return
                put(done)
            except BaseException as e:  # re-raised on the consumer side
                put(e)

        t = threading.Thread(target=worker, daemon=True,
                             name="egotap-prefetch")
        t.start()
        try:
            while True:
                item = q.get()
                if item is done:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


class PackedBatchLoader:
    """Batch iterator over a packed .egr split: one native gather per batch
    (no per-frame python work). Same interface/semantics as BatchLoader."""

    def __init__(self, reader, batch_size: int, shuffle: bool,
                 drop_last: bool, indices: Optional[np.ndarray] = None,
                 seed: int = 0, num_batches: Optional[int] = None):
        self.reader = reader
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.indices = (np.arange(reader.num_records)
                        if indices is None else np.asarray(indices))
        self.rng = np.random.default_rng(seed)
        self._num_batches = num_batches  # multi-host lockstep override

    def __len__(self) -> int:
        if self._num_batches is not None:
            return self._num_batches
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self.indices.copy()
        if self.shuffle:
            self.rng.shuffle(idx)
        paths = self.reader.paths
        for b in range(len(self)):
            sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
            n = len(sel)
            if n == 0:  # dry multi-host shard: all-padding lockstep batch
                sel = idx[-1:] if len(idx) else np.zeros(1, np.int64)
            if len(sel) < self.batch_size:  # pad with the last frame + mask
                sel = np.concatenate(
                    [sel, np.repeat(sel[-1:], self.batch_size - len(sel))])
            batch = self.reader.gather(sel)
            batch["mask"] = (np.arange(self.batch_size) < n).astype(np.float32)
            batch["paths"] = ([paths[i] for i in sel[:n]] if paths
                              else [str(i) for i in sel[:n]])
            yield batch


def make_loader(cfg: Config, mode: str, category_id: Optional[str] = None):
    """Prefer the packed native-record path when the split has been packed
    (tools/pack_dataset.py); fall back to per-frame npy loading. Under a
    multi-host runtime (jax.process_count() > 1) every host loads only its
    own shard (make_host_sharded_loader)."""
    import jax
    if jax.process_count() > 1:
        return make_host_sharded_loader(cfg, mode, category_id)
    train = mode == "train"
    try:
        from egotap_tpu.native import recordio
        packed = recordio.packed_path(cfg, mode)
    except Exception:
        packed = None
    if packed and os.path.exists(packed):
        from egotap_tpu.native.recordio import RecordReader
        reader = RecordReader(packed, num_threads=cfg.num_threads)
        indices = None
        if category_id is not None:
            if reader.paths is None:
                raise ValueError("packed split lacks a .paths sidecar; "
                                 "cannot category-filter")
            indices = np.asarray(
                [i for i, p in enumerate(reader.paths)
                 if p.split("/")[-4] == category_id])
        loader = PackedBatchLoader(reader, cfg.batch_size, shuffle=train,
                                   drop_last=train, indices=indices,
                                   seed=cfg.seed)
        if cfg.prefetch_batches > 0:
            return PrefetchLoader(loader, depth=cfg.prefetch_batches)
        return loader
    ds = FrameDataset(cfg, mode, category_id)
    return BatchLoader(ds, cfg.batch_size, shuffle=train, drop_last=train,
                       num_threads=cfg.num_threads, seed=cfg.seed)


def make_host_sharded_loader(cfg: Config, mode: str,
                             category_id: Optional[str] = None,
                             host_index: Optional[int] = None,
                             host_count: Optional[int] = None):
    """Per-host sharded loader for multi-host data parallelism (the
    tf.data/grain-style replacement for DataLoader worker processes,
    SURVEY §5.8): host h loads dataset indices h::host_count with a local
    batch of cfg.batch_size // host_count, and every host runs the SAME
    number of batches (dry shards emit all-padding mask-0 batches) so
    collectives never deadlock. Assemble the per-host batches into global
    sharded arrays with `parallel.mesh.make_global_batch`."""
    import jax
    host_index = jax.process_index() if host_index is None else host_index
    host_count = jax.process_count() if host_count is None else host_count
    if host_count == 1:
        return make_loader(cfg, mode, category_id)
    assert cfg.batch_size % host_count == 0, \
        (cfg.batch_size, host_count, "global batch must divide across hosts")
    local_bs = cfg.batch_size // host_count

    train = mode == "train"

    def shard_plan(n):
        indices = np.arange(n)[host_index::host_count]
        if train:
            # drop_last over the smallest shard: all hosts see full batches
            num_batches = (n // host_count) // local_bs
        else:
            # cover the largest shard; smaller shards pad (mask handles it)
            largest = (n + host_count - 1) // host_count
            num_batches = (largest + local_bs - 1) // local_bs
        return indices, num_batches

    # packed native-record fast path per shard (same preference order as
    # make_loader — the single host CPU core must not fall back to the
    # per-frame npy loader just because the run is multi-host)
    try:
        from egotap_tpu.native import recordio
        packed = recordio.packed_path(cfg, mode)
    except Exception:
        packed = None
    if packed and os.path.exists(packed) and category_id is None:
        from egotap_tpu.native.recordio import RecordReader
        reader = RecordReader(packed, num_threads=cfg.num_threads)
        indices, num_batches = shard_plan(reader.num_records)
        loader = PackedBatchLoader(reader, local_bs, shuffle=train,
                                   drop_last=train, indices=indices,
                                   seed=cfg.seed + host_index,
                                   num_batches=num_batches)
        if cfg.prefetch_batches > 0:
            return PrefetchLoader(loader, depth=cfg.prefetch_batches)
        return loader

    ds = FrameDataset(cfg, mode, category_id)
    indices, num_batches = shard_plan(len(ds))
    return BatchLoader(ds, local_bs, shuffle=train, drop_last=train,
                       num_threads=cfg.num_threads,
                       seed=cfg.seed + host_index,
                       indices=indices, num_batches=num_batches)
