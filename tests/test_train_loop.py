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
