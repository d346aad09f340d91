"""End-to-end training/eval smoke tests on the synthetic dataset (tiny
shapes: 64px RGB, 16px heatmaps)."""

import pytest as _pytest
pytestmark = _pytest.mark.slow

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egotap_tpu.data.pipeline import make_device_preprocess, make_loader
from egotap_tpu.data.synthetic import generate_dataset, synthetic_config
from egotap_tpu.eval.evaluate import evaluate
from egotap_tpu.train import state as state_lib
from egotap_tpu.train.tasks import HeatmapTask, LifterTask, create_task


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("e2e"))
    generate_dataset(path, "UnrealEgo", num_sequences=2, frames_per_seq=6,
                     image_size=16)
    return path


def _cfg(root, **kw):
    base = dict(load_size_heatmap=(16, 16), batch_size=4, niter=10,
                niter_decay=10, lr=1e-3)
    base.update(kw)
    return synthetic_config(root, **base)


def _first_batch(cfg, mode="train"):
    loader = make_loader(cfg, mode)
    pre = make_device_preprocess(cfg)
    batch = next(iter(loader))
    batch.pop("paths", None)
    return pre({k: jnp.asarray(v) for k, v in batch.items()}), len(loader)


class TestHeatmapTask:
    def test_joint_train_and_eval(self, root):
        cfg = _cfg(root, model="heatmap_shared", num_heatmap=15,
                   num_rot_heatmap=0, heatmap_type="none")
        task = create_task(cfg)
        assert task.loss_names == ["heatmap_left", "heatmap_right"]
        feed, ipe = _first_batch(cfg)
        state = task.init_state(jax.random.PRNGKey(0), ipe)

        losses = []
        for _ in range(12):
            state, ld = task.train_step(state, dict(feed))
            losses.append({k: float(v) for k, v in ld.items()})
        assert all(np.isfinite(list(l.values())).all() for l in losses)
        # optimizing on one batch must reduce the loss (allow Adam/BN
        # transients in the first few steps)
        assert losses[-1]["heatmap_left"] < losses[0]["heatmap_left"]

        out = task.eval_step(state, feed)
        assert out["metrics"]["mse_heatmap"].shape == (4,)

    def test_limb_sin_train(self, root):
        cfg = _cfg(root, model="heatmap_shared", num_heatmap=0,
                   num_rot_heatmap=15, heatmap_type="sin")
        task = create_task(cfg)
        assert task.loss_names == ["limb_heatmap_left", "limb_heatmap_right"]
        feed, ipe = _first_batch(cfg)
        state = task.init_state(jax.random.PRNGKey(0), ipe)
        state, ld = task.train_step(state, feed)
        assert np.isfinite(float(ld["limb_heatmap_left"]))


class TestLifterTask:
    @pytest.fixture(scope="class")
    def pretrained(self, root, tmp_path_factory):
        """Train stage-1 nets briefly and save best checkpoints in the
        sibling-dir convention the lifter loader expects."""
        logdir = str(tmp_path_factory.mktemp("log"))
        for suffix, nh, nr, ht in (("_pos", 15, 0, "none"),
                                   ("_sin", 0, 15, "sin")):
            cfg = _cfg(root, model="heatmap_shared", num_heatmap=nh,
                       num_rot_heatmap=nr, heatmap_type=ht,
                       log_dir=logdir, experiment_name="hm" + suffix)
            task = create_task(cfg)
            feed, ipe = _first_batch(cfg)
            state = task.init_state(jax.random.PRNGKey(0), ipe)
            state, _ = task.train_step(state, feed)
            state_lib.save_checkpoint(cfg.experiment_dir, "best", state)
        return logdir

    def test_train_eval_with_pretrained(self, root, pretrained):
        cfg = _cfg(root, model="egotap_autoencoder", num_heatmap=15,
                   num_rot_heatmap=15, heatmap_type="sin", skel_layer="PU",
                   ae_hidden_size=32, patched_heatmap_ae=True,
                   log_dir=pretrained,
                   path_to_trained_heatmap=os.path.join(
                       pretrained, "hm", "unused.pth"))
        from egotap_tpu.train.loop import _init_task_state
        task = create_task(cfg)
        feed, ipe = _first_batch(cfg)
        state = _init_task_state(cfg, task, ipe)

        state, ld = task.train_step(state, dict(feed))
        assert set(ld) == {"pose", "cos_sim"}
        assert np.isfinite(float(ld["pose"]))

        out = task.eval_step(state, feed)
        assert out["pred_pose"].shape == (4, 16, 3)
        assert np.isfinite(np.asarray(out["metrics"]["mpjpe"])).all()

    def test_use_gt_heatmap_path(self, root):
        cfg = _cfg(root, model="egotap_autoencoder", num_heatmap=15,
                   num_rot_heatmap=15, heatmap_type="sin",
                   ae_hidden_size=32, use_gt_heatmap=True)
        task = create_task(cfg)
        feed, ipe = _first_batch(cfg)
        state = task.init_state(jax.random.PRNGKey(0), ipe)
        state, ld = task.train_step(state, dict(feed))
        assert np.isfinite(float(ld["pose"]))

    def test_evaluate_helper(self, root):
        cfg = _cfg(root, model="egotap_autoencoder", num_heatmap=15,
                   num_rot_heatmap=15, heatmap_type="sin",
                   ae_hidden_size=32, use_gt_heatmap=True)
        task = create_task(cfg)
        _, ipe = _first_batch(cfg)
        state = task.init_state(jax.random.PRNGKey(0), ipe)
        metrics, stats, pps = evaluate(cfg, task, state, mode="validation")
        assert set(metrics) == {"mpjpe", "pa_mpjpe"}
        assert len(stats["mpjpe"]) == 12  # all validation frames, no padding
        assert pps > 0
