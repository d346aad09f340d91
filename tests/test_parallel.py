"""Multi-device (8 virtual CPU) data-parallel tests."""

import pytest as _pytest
pytestmark = _pytest.mark.slow

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egotap_tpu.data.pipeline import make_device_preprocess, make_loader
from egotap_tpu.data.synthetic import generate_dataset, synthetic_config
from egotap_tpu.parallel.mesh import (
    make_mesh, replicate, shard_batch)
from egotap_tpu.train.tasks import create_task


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("par"))
    generate_dataset(path, "UnrealEgo", num_sequences=2, frames_per_seq=10,
                     image_size=16)
    return path


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_axes():
    mesh = make_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1


def test_data_parallel_train_step_matches_single_device(root):
    cfg = synthetic_config(
        root, model="heatmap_shared", num_heatmap=15, num_rot_heatmap=0,
        heatmap_type="none", load_size_heatmap=(16, 16), batch_size=8,
        niter=4, niter_decay=4)
    task = create_task(cfg)
    loader = make_loader(cfg, "train")
    pre = make_device_preprocess(cfg)
    batch = next(iter(loader))
    batch.pop("paths", None)
    feed = pre({k: jnp.asarray(v) for k, v in batch.items()})

    state0 = task.init_state(jax.random.PRNGKey(0), len(loader))
    # single-device result
    s1, losses_single = task.train_step(state0, jax.tree.map(jnp.copy, feed))

    # data-parallel: batch sharded over 8 devices, params replicated
    mesh = make_mesh()
    state_r = replicate(task.init_state(jax.random.PRNGKey(0), len(loader)),
                        mesh)
    feed_s = shard_batch(jax.tree.map(jnp.copy, feed), mesh)
    s2, losses_dp = task.train_step(state_r, feed_s)

    for k in losses_single:
        np.testing.assert_allclose(float(losses_single[k]),
                                   float(losses_dp[k]), rtol=1e-4)
    # updated parameters agree between single-device and sharded execution
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        # cross-replica reductions reorder f32 sums; Adam at step 1 is
        # sign-like (m_hat/sqrt(v_hat) ~ sign(g)), so a near-zero gradient
        # whose sign flips under reordering moves the parameter by up to
        # 2*lr — compare with that worst-case absolute bound
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3 + 1e-6)


def test_train_main_data_parallel_matches_single_device(root, tmp_path):
    """CLI training over the 8-virtual-device mesh (cfg.data_parallel)
    produces the same trained parameters as single-device training."""
    from egotap_tpu.train import state as state_lib
    from egotap_tpu.train.loop import train_main

    def run(tag, n_dev):
        cfg = synthetic_config(
            root, model="heatmap_shared", num_heatmap=15, num_rot_heatmap=0,
            heatmap_type="none", load_size_heatmap=(16, 16), batch_size=8,
            niter=1, niter_decay=0, val_epoch_freq=10)
        cfg.log_dir = str(tmp_path / tag)
        cfg.experiment_name = "dp"
        cfg.data_parallel = n_dev
        assert train_main(cfg)
        task_tmpl = create_task(cfg)
        tmpl = task_tmpl.init_state(jax.random.PRNGKey(0), 1)
        return state_lib.load_checkpoint(cfg.experiment_dir, 1, tmpl)

    s1 = run("single", 1)
    s8 = run("dp8", 8)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        # cross-replica f32 reduction reordering + sign-like Adam updates:
        # worst case ~2*lr per step, two steps in the epoch
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3 + 1e-6)


def test_lifter_eval_step_sharded(root):
    cfg = synthetic_config(
        root, model="egotap_autoencoder", num_heatmap=15, num_rot_heatmap=15,
        heatmap_type="sin", ae_hidden_size=32, use_gt_heatmap=True,
        load_size_heatmap=(16, 16), batch_size=8, niter=2, niter_decay=2)
    task = create_task(cfg)
    loader = make_loader(cfg, "validation")
    pre = make_device_preprocess(cfg)
    batch = next(iter(loader))
    batch.pop("paths", None)
    feed = pre({k: jnp.asarray(v) for k, v in batch.items()})

    mesh = make_mesh()
    state = replicate(task.init_state(jax.random.PRNGKey(0), len(loader)),
                      mesh)
    out = task.eval_step(state, shard_batch(feed, mesh))
    assert out["pred_pose"].shape == (8, 16, 3)
    assert np.isfinite(np.asarray(out["metrics"]["mpjpe"])).all()
