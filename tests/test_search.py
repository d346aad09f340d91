import pytest as _pytest
pytestmark = _pytest.mark.slow

import json
import os

import numpy as np
import pytest

from egotap_tpu.data.synthetic import generate_dataset, synthetic_config
from egotap_tpu.train.search import (
    _best_validation_metric, random_search, sample_overrides)


def test_sample_overrides():
    rng = np.random.default_rng(0)
    space = {"lr": [1e-3, 1e-4], "batch_size": [2, 4]}
    s = sample_overrides(space, rng)
    assert s["lr"] in space["lr"] and s["batch_size"] in space["batch_size"]


def test_best_validation_metric(tmp_path):
    d = tmp_path / "exp" / "summary"
    d.mkdir(parents=True)
    with open(d / "metrics.jsonl", "w") as f:
        for step, v in enumerate([5.0, 3.0, 4.0]):
            f.write(json.dumps({"tag": "Validation/mpjpe", "value": v,
                                "step": step}) + "\n")
        f.write(json.dumps({"tag": "Batch/pose", "value": 0.1, "step": 0}) + "\n")
    assert _best_validation_metric(str(tmp_path / "exp"), "mpjpe") == 3.0


def test_random_search_smoke(tmp_path):
    root = str(tmp_path / "data")
    generate_dataset(root, "UnrealEgo", num_sequences=1, frames_per_seq=5,
                     image_size=16)
    cfg = synthetic_config(
        root, model="heatmap_shared", num_heatmap=15, num_rot_heatmap=0,
        heatmap_type="none", load_size_heatmap=(16, 16), batch_size=4,
        niter=1, niter_decay=0, lr=1e-4, log_dir=str(tmp_path / "log"),
        result_dir=str(tmp_path / "results"), experiment_name="hs")
    best = random_search(cfg, {"lr": [1e-4, 5e-5]}, num_trials=2,
                         criteria="mse_heatmap")
    assert best["score"] < float("inf")
    results_file = os.path.join(str(tmp_path / "log"), "hs_search",
                                "search_results.json")
    assert os.path.exists(results_file)
    assert len(json.load(open(results_file))) == 2


def test_random_search_external_tuner_early_stop(tmp_path):
    """A fake external scheduler early-stops every trial after epoch 1 via
    the epoch_callback surface; trials still score on what they reached."""
    root = str(tmp_path / "data")
    generate_dataset(root, "UnrealEgo", num_sequences=1, frames_per_seq=5,
                     image_size=16)
    cfg = synthetic_config(
        root, model="heatmap_shared", num_heatmap=15, num_rot_heatmap=0,
        heatmap_type="none", load_size_heatmap=(16, 16), batch_size=4,
        niter=2, niter_decay=1, lr=1e-4, log_dir=str(tmp_path / "log"),
        result_dir=str(tmp_path / "results"), experiment_name="es")
    seen = []

    def scheduler(trial, report):
        seen.append((trial, report["epoch"]))
        return True   # stop every trial after its first epoch

    best = random_search(cfg, {"lr": [1e-4, 5e-5]}, num_trials=2,
                         criteria="mse_heatmap", epoch_callback=scheduler)
    assert best["score"] < float("inf")
    assert seen == [(0, 1), (1, 1)]   # exactly one epoch per trial
