"""Mono (xR-Egopose-style, stereo=False) pipeline coverage."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egotap_tpu.data.pipeline import make_device_preprocess, make_loader
from egotap_tpu.data.synthetic import generate_dataset, synthetic_config
from egotap_tpu.models.heatmap_net import HeatmapUNet
from egotap_tpu.models.lifter import EgoTAPLifter


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mono"))
    generate_dataset(path, "UnrealEgo", num_sequences=1, frames_per_seq=5,
                     image_size=16)
    return path


def test_mono_heatmap_net():
    model = HeatmapUNet(num_output_maps=15, views=1)
    x = jnp.zeros((2, 1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 16, 16, 15)


def test_mono_lifter():
    model = EgoTAPLifter(num_heatmap=15, num_joints=16, views=1,
                         hidden_size=16, skel_layer="PU")
    x = jnp.zeros((1, 16, 16, 45))  # 15 pos + 15*2 rot, single view
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 16, 3)


def test_mono_preprocess_duplicates_left(root):
    cfg = synthetic_config(root, joint_preset="xR-Egopose",
                           load_size_heatmap=(16, 16), batch_size=2,
                           num_heatmap=15, num_rot_heatmap=15,
                           heatmap_type="sin")
    assert not cfg.stereo
    loader = make_loader(cfg, "train")
    batch = next(iter(loader))
    batch.pop("paths")
    # xR-Egopose preset uses the UnrealEgo-style skeleton fields; the
    # loader mirrors left into right for mono datasets
    np.testing.assert_array_equal(batch["gt_camera_2d_left"],
                                  batch["gt_camera_2d_right"])
