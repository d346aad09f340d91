"""train_main smoke test: full epoch loop with validation, best tracking,
checkpointing, and the final test + category evaluation."""

import pytest as _pytest
pytestmark = _pytest.mark.slow

import os

import pytest

from egotap_tpu.data.synthetic import generate_dataset, synthetic_config
from egotap_tpu.train.loop import train_main
from egotap_tpu.train import state as state_lib


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("loop"))
    generate_dataset(path, "UnrealEgo", num_sequences=2, frames_per_seq=5,
                     image_size=16)
    return path


def test_train_main_heatmap(root, tmp_path):
    logdir = str(tmp_path / "log")
    cfg = synthetic_config(
        root, model="heatmap_shared", num_heatmap=15, num_rot_heatmap=0,
        heatmap_type="none", load_size_heatmap=(16, 16), batch_size=4,
        niter=1, niter_decay=1, lr=1e-4, log_dir=logdir,
        result_dir=str(tmp_path / "results"),
        experiment_name="smoke")
    assert train_main(cfg) is True

    # artifacts
    assert os.path.exists(os.path.join(cfg.experiment_dir, "train_opt.txt"))
    assert os.path.exists(os.path.join(cfg.experiment_dir, "test_result.txt"))
    assert os.path.exists(os.path.join(cfg.experiment_dir, "summary",
                                       "metrics.jsonl"))
    assert state_lib.checkpoint_exists(cfg.experiment_dir, "best")
    assert state_lib.checkpoint_exists(cfg.experiment_dir, 2)
    # epoch-1 checkpoint was GC'd on saving epoch 2
    assert not state_lib.checkpoint_exists(cfg.experiment_dir, 1)


def test_epoch_callback_reports_and_early_stops(root, tmp_path):
    """External-tuner hook: per-epoch reports with metrics + checkpoint
    path; a truthy return stops training cleanly after that epoch."""
    logdir = str(tmp_path / "log")
    cfg = synthetic_config(
        root, model="heatmap_shared", num_heatmap=15, num_rot_heatmap=0,
        heatmap_type="none", load_size_heatmap=(16, 16), batch_size=4,
        niter=2, niter_decay=2, lr=1e-4, log_dir=logdir,
        result_dir=str(tmp_path / "results"),
        experiment_name="tuner")
    reports = []

    def fake_tuner(report):
        reports.append(report)
        return report["epoch"] >= 2   # stop after epoch 2 of 4

    assert train_main(cfg, epoch_callback=fake_tuner) is True
    assert [r["epoch"] for r in reports] == [1, 2]
    for r in reports:
        assert r["bad_loss"] is False
        assert "mse_heatmap" in r["val_metrics"]
        assert r["train_losses"]
        assert r["checkpoint_path"]
    # earlier epoch checkpoints are GC'd as later ones land; the last
    # report's checkpoint must still exist
    assert os.path.isdir(reports[-1]["checkpoint_path"])
    # early stop still runs the final best-model test
    assert os.path.exists(os.path.join(cfg.experiment_dir,
                                       "test_result.txt"))
    # epochs 3/4 never ran
    assert not state_lib.checkpoint_exists(cfg.experiment_dir, 3)
