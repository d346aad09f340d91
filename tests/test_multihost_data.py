"""Per-host sharded data loading (multi-host DP input path).

Simulates N hosts inside one process by constructing
make_host_sharded_loader with explicit host_index/host_count, and checks
the lockstep/padding contract that keeps multi-host collectives safe.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egotap_tpu.data.pipeline import (make_host_sharded_loader, make_loader)
from egotap_tpu.data.synthetic import generate_dataset, synthetic_config


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mh"))
    generate_dataset(root, "UnrealEgo", num_sequences=2, frames_per_seq=7,
                     image_size=16)  # 2*7 = 14 frames per split
    return synthetic_config(root, "UnrealEgo", batch_size=8,
                            load_size_heatmap=(16, 16))


def _loaders(cfg, mode, host_count):
    return [make_host_sharded_loader(cfg, mode, host_index=h,
                                     host_count=host_count)
            for h in range(host_count)]


def test_shards_disjoint_and_cover(cfg):
    loaders = _loaders(cfg, "test", 2)
    shards = [set(ld.indices.tolist()) for ld in loaders]
    assert shards[0].isdisjoint(shards[1])
    n = sum(len(s) for s in shards)
    assert shards[0] | shards[1] == set(range(n))


def test_lockstep_batch_counts_and_local_batch(cfg):
    for mode in ("train", "test"):
        loaders = _loaders(cfg, mode, 4)
        counts = {len(ld) for ld in loaders}
        assert len(counts) == 1, f"hosts disagree on batch count: {counts}"
        batches = [list(ld) for ld in loaders]
        for bs in batches:
            for b in bs:
                assert b["input_rgb_left"].shape[0] == 2  # 8 global / 4 hosts


def test_eval_masks_cover_every_sample_once(cfg):
    """Across hosts, the number of mask-1 rows equals the dataset size
    (dry/ragged shards pad with mask-0 rows)."""
    loaders = _loaders(cfg, "test", 4)
    total_valid = sum(float(b["mask"].sum())
                      for ld in loaders for b in ld)
    n = sum(len(ld.indices) for ld in loaders)
    assert total_valid == n


def test_dry_shard_emits_all_padding(cfg):
    """With more hosts than samples-per-batch-slot, late batches of small
    shards must be mask-0 everywhere, never re-counting a sample."""
    import dataclasses
    small = dataclasses.replace(cfg, batch_size=12).derive()
    loaders = _loaders(small, "test", 6)  # 14 samples over 6 hosts
    counts = {len(ld) for ld in loaders}
    assert len(counts) == 1
    for ld in loaders:
        got = sum(float(b["mask"].sum()) for b in ld)
        assert got == len(ld.indices)


def test_make_global_batch_single_process(cfg):
    """make_global_batch == shard_batch semantics when one process owns
    all devices (the only case testable here)."""
    from egotap_tpu.parallel.mesh import (batch_sharding, make_global_batch,
                                          make_mesh)
    mesh = make_mesh()
    local = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    global_b = make_global_batch(local, mesh)
    assert global_b["x"].shape == (8, 2)
    assert global_b["x"].sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(global_b["x"]), local["x"])


def test_single_host_falls_back_to_make_loader(cfg):
    ld = make_host_sharded_loader(cfg, "test", host_index=0, host_count=1)
    ref = make_loader(cfg, "test")
    assert len(ld) == len(ref)
