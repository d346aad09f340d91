"""Stage-1 warm start from --path_to_trained_heatmap
(reference model/heatmap_shared_model.py:59-64)."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from egotap_tpu.core.config import Config
from egotap_tpu.data.synthetic import synthetic_config
from egotap_tpu.train.tasks import HeatmapTask


def test_warmstart_from_pth(tmp_path, rng):
    from tests.torch_twin import TorchHeatmapNet, randomize_bn_stats
    torch.manual_seed(0)
    twin = TorchHeatmapNet(num_output_maps=15, views=2).eval()
    randomize_bn_stats(twin)
    pth = str(tmp_path / "best_net_HeatMap.pth")
    torch.save(twin.state_dict(), pth)

    cfg = synthetic_config(str(tmp_path), model="heatmap_shared",
                           num_heatmap=15, num_rot_heatmap=0,
                           heatmap_type="none", niter=1, niter_decay=1,
                           path_to_trained_heatmap=pth)
    task = HeatmapTask(cfg)
    state = task.init_state(jax.random.PRNGKey(0), 1)
    # loaded weights, not random init: compare one conv kernel
    want = twin.state_dict()["after_backbone.conv_heatmap.weight"].numpy()
    got = np.asarray(state.params["conv_heatmap"]["kernel"])
    np.testing.assert_allclose(got.transpose(3, 2, 0, 1), want, atol=1e-6)


def test_warmstart_from_orbax(tmp_path):
    from egotap_tpu.train import state as state_lib
    cfg = synthetic_config(str(tmp_path), model="heatmap_shared",
                           num_heatmap=15, num_rot_heatmap=0,
                           heatmap_type="none", niter=1, niter_decay=1,
                           load_size_heatmap=(16, 16),
                           log_dir=str(tmp_path / "log"),
                           experiment_name="src")
    task = HeatmapTask(cfg)
    state = task.init_state(jax.random.PRNGKey(3), 1)
    state_lib.save_checkpoint(cfg.experiment_dir, "best", state)

    cfg2 = synthetic_config(str(tmp_path), model="heatmap_shared",
                            num_heatmap=15, num_rot_heatmap=0,
                            heatmap_type="none", niter=1, niter_decay=1,
                            load_size_heatmap=(16, 16),
                            path_to_trained_heatmap=cfg.experiment_dir)
    task2 = HeatmapTask(cfg2)
    state2 = task2.init_state(jax.random.PRNGKey(4), 1)
    np.testing.assert_array_equal(
        np.asarray(state.params["conv_heatmap"]["kernel"]),
        np.asarray(state2.params["conv_heatmap"]["kernel"]))


def test_warmstart_missing_path(tmp_path):
    cfg = synthetic_config(str(tmp_path), model="heatmap_shared",
                           num_heatmap=15, num_rot_heatmap=0,
                           heatmap_type="none", niter=1, niter_decay=1,
                           path_to_trained_heatmap=str(tmp_path / "nope.pth"))
    task = HeatmapTask(cfg)
    with pytest.raises(FileNotFoundError):
        task.init_state(jax.random.PRNGKey(0), 1)
