"""Device mesh + sharding rules.

The reference has no working distributed path (a dead --distributed flag,
commented-out DataParallel; reference options/base_options.py:81,
model/network_utils.py:73, SURVEY §2.7/§5.8). Here data parallelism is
first-class and TPU-native:

  * a `Mesh` over ('data', 'model') axes — training uses model=1 (the
    networks are 10-100M params; DP saturates ICI first), and serving
    puts the 'model' axis to work: `Predictor.shard(num_model=N)` shards
    the lifter ViT Megatron-style over it (`parallel/tp.py`);
  * batches sharded over 'data' with `NamedSharding`, parameters
    replicated; under `jit` XLA inserts the gradient all-reduce (psum)
    over ICI automatically;
  * eval batches shard the same way and per-sample metrics gather back.

Multi-host: call `jax.distributed.initialize()` before building the mesh;
device order follows jax.devices() so DCN-connected slices map to the
outer mesh dimension.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: call once per host before building the mesh
    (the NCCL/MPI-equivalent; collectives then ride ICI within a slice and
    DCN across slices). No-ops on a single process with no coordinator."""
    if coordinator_address is None and num_processes is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(num_data: int = 0, num_model: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh; num_data=0 uses all devices."""
    devices = jax.devices()
    if num_data == 0:
        num_data = len(devices) // num_model
    n = num_data * num_model
    grid = np.asarray(devices[:n]).reshape(num_data, num_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for batch pytrees."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch dict with the leading axis split over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def make_global_batch(local_batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Assemble per-host local batches into GLOBAL arrays sharded over
    'data' (jax.make_array_from_process_local_data): each host contributes
    its rows from `data.pipeline.make_host_sharded_loader`; the global
    leading dim is local_rows * process_count. Single-process this equals
    shard_batch."""
    sh = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local_batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


_REDUCTION_WARNED = set()


def choose_num_data(batch_size: int, requested: int = 0) -> int:
    """Number of data-mesh devices: `requested` (0 = all local devices),
    clamped to the device count and reduced to the largest divisor of
    `batch_size` so every device gets an equal batch slice (train batches
    are drop_last-full, eval batches are padded to batch_size)."""
    avail = len(jax.devices())
    want = min(requested or avail, avail)
    n_data = max(d for d in range(1, want + 1) if batch_size % d == 0)
    if n_data != want and (want, n_data) not in _REDUCTION_WARNED:
        _REDUCTION_WARNED.add((want, n_data))
        print(f"data-parallel: batch_size {batch_size} not divisible by "
              f"{want} devices; using {n_data}")
    return n_data


def data_parallel_setup(cfg, state):
    """The single entry point for data parallelism, shared by CLI training
    (train/loop.py), eval (eval/evaluate.py) and the driver's multi-chip
    dryrun: builds the ('data','model') mesh, replicates the train state and
    returns a batch-sharding function. Replaces the reference's dead
    --distributed flag (options/base_options.py:81).

    Returns (mesh | None, state, shard_fn); mesh is None when a single
    device is used (shard_fn is then the identity)."""
    n_data = choose_num_data(cfg.batch_size, cfg.data_parallel)
    if n_data <= 1:
        return None, state, (lambda b: b)
    mesh = make_mesh(num_data=n_data)
    if jax.process_count() > 1:
        # multi-host: each host contributes its local rows (from
        # data.pipeline.make_host_sharded_loader) to a global array
        return (mesh, replicate(state, mesh),
                lambda b: make_global_batch(b, mesh))
    return mesh, replicate(state, mesh), (lambda b: shard_batch(b, mesh))
