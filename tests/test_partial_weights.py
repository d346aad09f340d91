"""Substring-filtered partial weight transfer (reference
model/base_model.py:150-162 ``load_partial_weights``)."""

import numpy as np

import jax
import jax.numpy as jnp

from egotap_tpu.models.heatmap_net import HeatmapUNet
from egotap_tpu.train.state import load_partial_weights, merge_partial_weights


def _init(num_maps, seed):
    net = HeatmapUNet(num_output_maps=num_maps, model_name="resnet18")
    dummy = jnp.zeros((1, 2, 32, 32, 3))
    return dict(net.init(jax.random.PRNGKey(seed), dummy, train=False))


def test_merge_backbone_between_differently_shaped_nets():
    src = _init(15, 0)   # pos net
    dst = _init(30, 1)   # rot net: different conv_heatmap head shape
    merged, loaded = merge_partial_weights(dst, src, parts=["backbone"])

    # backbone leaves taken from the source...
    np.testing.assert_array_equal(
        merged["params"]["backbone"]["conv1"]["kernel"],
        src["params"]["backbone"]["conv1"]["kernel"])
    assert any("backbone" in k for k in loaded)
    # ...decoder and head untouched
    np.testing.assert_array_equal(
        merged["params"]["conv_heatmap"]["kernel"],
        dst["params"]["conv_heatmap"]["kernel"])
    assert not any("conv_up" in k or "conv_heatmap" in k for k in loaded)


def test_merge_skips_shape_mismatches():
    """strict=False semantics: a matching key with a different shape is
    kept from the target, not an error."""
    src = _init(15, 0)
    dst = _init(30, 1)
    merged, loaded = merge_partial_weights(dst, src,
                                           parts=["conv_heatmap", "conv1"])
    # conv_heatmap shapes differ (15*2 vs 30*2 out channels) -> kept
    np.testing.assert_array_equal(
        merged["params"]["conv_heatmap"]["kernel"],
        dst["params"]["conv_heatmap"]["kernel"])
    assert not any("conv_heatmap" in k for k in loaded)
    # conv1 matches everywhere it appears with equal shapes
    assert any("conv1" in k for k in loaded)


def test_load_partial_from_orbax(tmp_path):
    import orbax.checkpoint as ocp
    src = _init(15, 0)
    path = str(tmp_path / "ckpt_src")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(src))

    dst = _init(30, 1)
    merged, loaded = load_partial_weights(dst, path, parts=["backbone"])
    np.testing.assert_array_equal(
        merged["params"]["backbone"]["layer1_0"]["conv1"]["kernel"],
        src["params"]["backbone"]["layer1_0"]["conv1"]["kernel"])
    # BN running stats ride along with the backbone filter
    np.testing.assert_array_equal(
        merged["batch_stats"]["backbone"]["bn1"]["mean"],
        src["batch_stats"]["backbone"]["bn1"]["mean"])
    assert loaded
