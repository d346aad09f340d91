"""Checkpoint round-trip equivalence: save -> load -> identical outputs."""

import pytest as _pytest
pytestmark = _pytest.mark.slow

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egotap_tpu.data.pipeline import make_device_preprocess, make_loader
from egotap_tpu.data.synthetic import generate_dataset, synthetic_config
from egotap_tpu.train import state as state_lib
from egotap_tpu.train.tasks import create_task


def test_save_load_identical_predictions(tmp_path, rng):
    root = str(tmp_path / "data")
    generate_dataset(root, "UnrealEgo", num_sequences=1, frames_per_seq=6,
                     image_size=16)
    cfg = synthetic_config(
        root, model="egotap_autoencoder", num_heatmap=15, num_rot_heatmap=15,
        heatmap_type="sin", skel_layer="PU", ae_hidden_size=32,
        use_gt_heatmap=True, load_size_heatmap=(16, 16), batch_size=4,
        niter=5, niter_decay=5, log_dir=str(tmp_path / "log"),
        experiment_name="rt")
    task = create_task(cfg)
    loader = make_loader(cfg, "train")
    pre = make_device_preprocess(cfg)
    batch = next(iter(loader))
    batch.pop("paths", None)
    feed = pre({k: jnp.asarray(v) for k, v in batch.items()})

    state = task.init_state(jax.random.PRNGKey(0), len(loader))
    # a couple of optimizer steps so opt_state/batch_stats are non-trivial
    for _ in range(2):
        state, _ = task.train_step(state, dict(feed))

    before = np.asarray(task.eval_step(state, feed)["pred_pose"])
    state_lib.save_checkpoint(cfg.experiment_dir, 7, state)

    template = task.init_state(jax.random.PRNGKey(1), len(loader))
    restored = state_lib.load_checkpoint(cfg.experiment_dir, 7, template)
    after = np.asarray(task.eval_step(restored, feed)["pred_pose"])
    np.testing.assert_array_equal(before, after)

    # training continues identically from the restored state
    s1, l1 = task.train_step(state, dict(feed))
    s2, l2 = task.train_step(restored, dict(feed))
    for k in l1:
        assert float(l1[k]) == pytest.approx(float(l2[k]), rel=1e-6)
    assert int(s1.step) == int(s2.step)

    # eval-only restore must work across optimizer configs (the test CLI
    # may be launched without the training-run's optimizer flags)
    import dataclasses
    # saved run used Adam; restore into an AdamW-configured task, whose
    # opt_state tree differs — only model variables are taken
    cfg_adamw = dataclasses.replace(cfg, optimizer_type="AdamW",
                                    lr_policy="cos_anneal_warmup").derive()
    task2 = create_task(cfg_adamw)
    template2 = task2.init_state(jax.random.PRNGKey(2), 1)
    restored2 = state_lib.load_checkpoint(cfg.experiment_dir, 7, template2,
                                          restore_opt_state=False)
    after2 = np.asarray(task2.eval_step(restored2, feed)["pred_pose"])
    np.testing.assert_array_equal(before, after2)
