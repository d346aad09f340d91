"""Failure-detection protocol tests (reference train.py:137-177)."""

import pytest as _pytest
pytestmark = _pytest.mark.slow

import os

import pytest

from egotap_tpu.data.synthetic import generate_dataset, synthetic_config
from egotap_tpu.train import state as state_lib
from egotap_tpu.train.loop import train_main


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("wd"))
    generate_dataset(path, "UnrealEgo", num_sequences=1, frames_per_seq=8,
                     image_size=16)
    return path


def _cfg(root, tmp_path, **kw):
    base = dict(model="heatmap_shared", num_heatmap=15, num_rot_heatmap=0,
                heatmap_type="none", load_size_heatmap=(16, 16), batch_size=4,
                log_dir=str(tmp_path / "log"),
                result_dir=str(tmp_path / "results"))
    base.update(kw)
    return synthetic_config(root, **base)


def test_nan_at_epoch_one_aborts_and_tags_checkpoint(root, tmp_path):
    # lr huge enough to overflow f32 within the first epoch
    cfg = _cfg(root, tmp_path, niter=1, niter_decay=0, lr=1e30,
               experiment_name="nan_run", auto_terminate=False)
    result = train_main(cfg)
    assert result is False  # requests restart (reference returns False)
    assert (state_lib.checkpoint_exists(cfg.experiment_dir, "nan")
            or state_lib.checkpoint_exists(cfg.experiment_dir, "inf"))


def test_nan_with_auto_terminate(root, tmp_path):
    cfg = _cfg(root, tmp_path, niter=1, niter_decay=0, lr=1e30,
               experiment_name="nan_term", auto_terminate=True)
    assert train_main(cfg) is True  # terminates instead of restarting


def test_early_convergence_watchdog(root, tmp_path):
    # lr=0 and exactly ONE batch per epoch -> the loss sequence is exactly
    # constant, so the no-improvement window (200 iterations for heatmap
    # models) elapses deterministically and the watchdog requests a
    # from-scratch restart
    cfg = _cfg(root, tmp_path, batch_size=8, niter=30, niter_decay=0,
               lr=0.0, experiment_name="stall", auto_restart=True,
               val_epoch_freq=10 ** 6, save_epoch_freq=10 ** 6,
               print_epoch_freq=10 ** 6,
               watchdog_check_iters=100, watchdog_stall_iters=10)
    assert train_main(cfg) is False  # early-convergence restart requested
